"""On-device batched beam search for the follower.

Replaces tasks/R2R/follower.py:541-718 (beam_search).  The reference keeps
python lists of InferenceState and steps B x K C++ sims; here the whole
search is fixed-shape arrays under one jit per step count: B instances x K
slots, global top-K expansion over the (K x A) successor scores, a top-K
completed buffer, and action/node histories reindexed by parent slot.

Semantics parity:
  * successor score = parent score + log softmax of the valid-masked logit
    (follower.py:600-609);
  * per step, the top beam_size successors are kept (sorted merge of all
    slots' expansions, follower.py:640);
  * successors that chose stop (action 0) — or any successor at the final
    step — move to the completed list; the beam continues with the rest;
    a beam whose completed count reaches K dies (follower.py:667-676);
  * final output: top beam_size completed by score (follower.py:696-699).

The output trajectories duplicate the final state for the stop action like
the reference's (observation-recorded) paths do.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..env import vecenv
from ..models import follower as fmodels
from ..models.attention import NEG_INF


class BeamSearchResult(NamedTuple):
    scores: jnp.ndarray  # (B, K) completed scores, descending
    actions: jnp.ndarray  # (B, K, T) action sequences (0 = stop / pad)
    lengths: jnp.ndarray  # (B, K) number of actions incl. stop
    nodes: jnp.ndarray  # (B, K, T) node after each action
    headings: jnp.ndarray  # (B, K, T)
    elevs: jnp.ndarray  # (B, K, T)
    count: jnp.ndarray  # (B,) number of completed hypotheses (<= K)


def _flatten_state(state: vecenv.EnvState):
    return jax.tree.map(lambda x: x.reshape(-1), state)


@partial(jax.jit, static_argnames=("beam_size", "episode_len", "use_glove"))
def beam_search(
    params,
    tables: vecenv.EnvTables,
    batch,
    *,
    beam_size: int = 10,
    episode_len: int = 10,
    use_glove: bool = True,
) -> BeamSearchResult:
    """Batched beam search (inference only: no dropout)."""
    k = beam_size
    ctx, h0, c0 = fmodels.encoder_apply(
        params["encoder"], batch["seq"], batch["seq_length"], deterministic=True
    )
    seq_mask = batch["seq_mask"]
    b = ctx.shape[0]
    hdim = h0.shape[-1]
    a_num = vecenv.NUM_ACTIONS
    emb = tables.features.shape[-1] + vecenv.LOC_EMBED_DIM

    # beam state: slot 0 live with the start state, others dead
    state0 = vecenv.reset(batch["scan"], batch["start_node"], batch["heading"])

    def tile_slot0(x):
        rep = jnp.repeat(x[:, None], k, axis=1)
        return rep

    beam_state = jax.tree.map(tile_slot0, state0)  # (B, K) fields
    h = jnp.repeat(h0[:, None], k, axis=1)  # (B, K, H)
    c = jnp.repeat(c0[:, None], k, axis=1)
    u_prev = jnp.zeros((b, k, emb), ctx.dtype)
    scores = jnp.full((b, k), NEG_INF).at[:, 0].set(0.0)
    alive = jnp.zeros((b, k), bool).at[:, 0].set(True)

    t_steps = episode_len
    hist_actions = jnp.zeros((b, k, t_steps), jnp.int32)
    hist_nodes = jnp.zeros((b, k, t_steps), jnp.int32)
    hist_headings = jnp.zeros((b, k, t_steps), jnp.int32)
    hist_elevs = jnp.zeros((b, k, t_steps), jnp.int32)

    comp_scores = jnp.full((b, k), NEG_INF)
    comp_actions = jnp.zeros((b, k, t_steps), jnp.int32)
    comp_lens = jnp.zeros((b, k), jnp.int32)
    comp_nodes = jnp.zeros((b, k, t_steps), jnp.int32)
    comp_headings = jnp.zeros((b, k, t_steps), jnp.int32)
    comp_elevs = jnp.zeros((b, k, t_steps), jnp.int32)
    comp_count = jnp.zeros((b,), jnp.int32)

    goal = batch["goal_node"]  # teacher unused; observe needs a goal array

    def step_fn(carry, t):
        (beam_state, h, c, u_prev, scores, alive,
         hist_actions, hist_nodes, hist_headings, hist_elevs,
         comp_scores, comp_actions, comp_lens,
         comp_nodes, comp_headings, comp_elevs, comp_count) = carry

        flat_state = jax.tree.map(lambda x: x.reshape(-1), beam_state)
        goal_flat = jnp.repeat(goal[:, None], k, axis=1).reshape(-1)
        obs = vecenv.observe(tables, flat_state, goal_flat)

        h1f, c1f, alpha, logit, _ = fmodels.decoder_step(
            params["decoder"],
            u_prev.reshape(b * k, emb),
            obs.action_embedding,
            obs.pano_feature,
            h.reshape(b * k, hdim),
            c.reshape(b * k, hdim),
            jnp.repeat(ctx, k, axis=0),
            jnp.repeat(seq_mask, k, axis=0),
            deterministic=True,
        )
        logit = jnp.where(obs.action_valid, logit, NEG_INF)
        log_probs = jax.nn.log_softmax(logit, axis=-1).reshape(b, k, a_num)

        # successor scores over all (slot, action) pairs; dead slots -> -inf
        succ = scores[:, :, None] + log_probs
        succ = jnp.where(alive[:, :, None], succ, NEG_INF)
        valid = obs.action_valid.reshape(b, k, a_num) & alive[:, :, None]
        succ = jnp.where(valid, succ, NEG_INF)

        top_scores, top_idx = jax.lax.top_k(succ.reshape(b, k * a_num), k)
        parent = top_idx // a_num  # (B, K)
        action = (top_idx % a_num).astype(jnp.int32)
        top_valid = top_scores > NEG_INF / 2

        # gather parent payloads into the new slot order
        def g2(x):  # (B, K, ...) gathered by parent
            return jnp.take_along_axis(
                x, parent.reshape(parent.shape + (1,) * (x.ndim - 2)), axis=1
            )

        new_state = jax.tree.map(lambda x: jnp.take_along_axis(x, parent, axis=1),
                                 beam_state)
        h1 = g2(h1f.reshape(b, k, hdim))
        c1 = g2(c1f.reshape(b, k, hdim))
        # execute the chosen action for each new slot
        flat_new = jax.tree.map(lambda x: x.reshape(-1), new_state)
        stepped = vecenv.step(tables, flat_new, action.reshape(-1))
        stepped = jax.tree.map(lambda x: x.reshape(b, k), stepped)

        # next action embedding = chosen action's embedding (parent-ordered)
        act_emb = obs.action_embedding.reshape(b, k, a_num, emb)
        act_emb = g2(act_emb)
        u_next = jnp.take_along_axis(
            act_emb, action[:, :, None, None], axis=2
        )[:, :, 0]

        # histories
        ha = g2(hist_actions).at[:, :, t].set(action)
        hn = g2(hist_nodes).at[:, :, t].set(stepped.node)
        hh = g2(hist_headings).at[:, :, t].set(stepped.heading)
        he = g2(hist_elevs).at[:, :, t].set(stepped.elev)
        slot_len = t + 1

        # route: stop action or final step -> completed; else -> new beam
        is_stop = (action == 0) | (t == t_steps - 1)
        to_completed = top_valid & is_stop
        to_beam = top_valid & ~is_stop

        # a beam whose completed count already reached K stops expanding
        beam_dead = comp_count >= k
        to_completed = to_completed & ~beam_dead[:, None]
        to_beam = to_beam & ~beam_dead[:, None]

        # merge completed candidates into the top-K completed buffer
        cand_scores = jnp.where(to_completed, top_scores, NEG_INF)
        merged_scores = jnp.concatenate([comp_scores, cand_scores], axis=1)
        merged_actions = jnp.concatenate([comp_actions, ha], axis=1)
        merged_lens = jnp.concatenate(
            [comp_lens, jnp.full((b, k), slot_len, jnp.int32)], axis=1
        )
        merged_nodes = jnp.concatenate([comp_nodes, hn], axis=1)
        merged_headings = jnp.concatenate([comp_headings, hh], axis=1)
        merged_elevs = jnp.concatenate([comp_elevs, he], axis=1)
        mtop, midx = jax.lax.top_k(merged_scores, k)
        take = lambda x: jnp.take_along_axis(
            x, midx.reshape(midx.shape + (1,) * (x.ndim - 2)), axis=1
        )
        comp_scores2 = mtop
        comp_actions2 = take(merged_actions)
        comp_lens2 = jnp.take_along_axis(merged_lens, midx, axis=1)
        comp_nodes2 = take(merged_nodes)
        comp_headings2 = take(merged_headings)
        comp_elevs2 = take(merged_elevs)
        comp_count2 = jnp.minimum(comp_count + to_completed.sum(axis=1), 2 * k)

        new_scores = jnp.where(to_beam, top_scores, NEG_INF)

        carry = (
            stepped, h1, c1, u_next, new_scores, to_beam,
            ha, hn, hh, he,
            comp_scores2, comp_actions2, comp_lens2,
            comp_nodes2, comp_headings2, comp_elevs2, comp_count2,
        )
        return carry, None

    carry = (
        beam_state, h, c, u_prev, scores, alive,
        hist_actions, hist_nodes, hist_headings, hist_elevs,
        comp_scores, comp_actions, comp_lens,
        comp_nodes, comp_headings, comp_elevs, comp_count,
    )
    carry, _ = jax.lax.scan(step_fn, carry, jnp.arange(t_steps))
    (_, _, _, _, _, _, _, _, _, _,
     comp_scores, comp_actions, comp_lens,
     comp_nodes, comp_headings, comp_elevs, comp_count) = carry

    return BeamSearchResult(
        scores=comp_scores,
        actions=comp_actions,
        lengths=comp_lens,
        nodes=comp_nodes,
        headings=comp_headings,
        elevs=comp_elevs,
        count=jnp.minimum(comp_count, beam_size),
    )


def beam_trajectories(result: BeamSearchResult, batch, graph_bank):
    """Reference-format per-instance candidate lists (follower.py:694-716):
    [{'instr_id', 'trajectory', 'actions', 'score', ...}] sorted by score."""
    from ..data.graph import ANGLE_INC

    scores = np.asarray(result.scores)
    actions = np.asarray(result.actions)
    lengths = np.asarray(result.lengths)
    nodes = np.asarray(result.nodes)
    headings = np.asarray(result.headings)
    elevs = np.asarray(result.elevs)
    count = np.asarray(result.count)

    all_candidates = []
    b, k, t_max = actions.shape
    for i in range(b):
        sid = batch["scan_id"][i]
        g = graph_bank.graphs[sid]
        start_vp = g.node_ids[int(batch["start_node"][i])]
        start_heading = float(batch["heading"][i]) * ANGLE_INC
        cands = []
        for j in range(min(k, int(count[i]))):
            if scores[i, j] <= NEG_INF / 2:
                continue
            n = int(lengths[i, j])
            traj = [(start_vp, start_heading, 0.0)]
            for t in range(n):
                traj.append(
                    (
                        g.node_ids[int(nodes[i, j, t])],
                        float(headings[i, j, t]) * ANGLE_INC,
                        (float(elevs[i, j, t]) - 1.0) * ANGLE_INC,
                    )
                )
            cands.append(
                {
                    "instr_id": batch["instr_id"][i],
                    "trajectory": traj,
                    "actions": [int(a) for a in actions[i, j, :n]],
                    "score": float(scores[i, j]),
                    "instr_encoding": batch["item"][i].get("instr_encoding"),
                }
            )
        all_candidates.append(cands)
    return all_candidates
