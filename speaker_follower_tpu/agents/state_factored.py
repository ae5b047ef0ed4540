"""State-factored search for the follower.

Replaces tasks/R2R/follower.py:720-980 (state_factored_search): a best-first
search over *world states* rather than action sequences — hypotheses landing
on the same (viewpoint, heading, elevation) are deduplicated keeping the
best score, the best ``successor_size`` unexpanded states are expanded each
round, and the search runs until ``completion_size`` finished hypotheses
exist per instance.  It also maintains the physically-traversable
exploration order (the robot walking the search tree), used by
``--physical_traversal`` (rational_follower.py:83-102).

Architecture: the search bookkeeping (caches, heaps, linked-list hypotheses)
is tiny and stays on the host; the model evaluation is a jitted batched
decoder step over all states expanded this round (padded to a fixed bucket
size so recompiles stay bounded).  Successor world states come from the
host-side graph tables — no simulator stepping at all.  This trades a small
host loop for exact reference semantics; the standard beam search
(agents/beam.py) is the fully on-device fast path.
"""

from __future__ import annotations

import heapq
import itertools
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import ANGLE_INC, NUM_ACTIONS
from ..env import vecenv
from ..models import follower as fmodels
from ..models.attention import NEG_INF


@dataclass
class Hyp:
    """One hypothesis: a linked-list node (reference InferenceState).

    The last-action embedding is NOT stored: it is recomputed on device
    from (parent state, action) at expansion time — fetching the (cap, A,
    2176) action-embedding tensor to host every round costs ~4.4 MB per
    round over the tunnel and dominated the search wall-clock.
    """

    parent: Optional["Hyp"]
    node: int  # local node index (world state after arriving here)
    heading: int
    elev: int
    action: int  # action taken from parent (-1 for the root)
    action_count: int
    score: float
    h: np.ndarray  # decoder state to use when expanding this hyp
    c: np.ndarray
    action_score: float = 0.0  # log-prob of .action


def _ws_key(hyp: Hyp, first_n: int):
    # world state = (scanId, viewpointId, heading, elevation); scan is fixed
    # per instance, so first_n=4 -> (node, heading, elev), first_n=2 -> node
    if first_n >= 4:
        return (hyp.node, hyp.heading, hyp.elev)
    if first_n == 3:
        return (hyp.node, hyp.heading)
    return (hyp.node,)


def least_common_viewpoint_path(a: Hyp, b: Hyp):
    """Hypotheses from a back to X, then Y forward to b, where X/Y are the
    nearest ancestors of a/b sharing a viewpoint (follower.py:52-73)."""
    suffix_by_vp = {}
    chain = []
    cur = b
    while cur is not None:
        chain.append(cur)
        cur = cur.parent
    # path_to_b (in forward order) starting at each ancestor's viewpoint
    for i, hyp in enumerate(chain):
        suffix_by_vp.setdefault(hyp.node, list(reversed(chain[: i + 1])))
    path_from_a = []
    cur = a
    while cur is not None:
        path_from_a.append(cur)
        if cur.node in suffix_by_vp:
            path_to_b = suffix_by_vp[cur.node]
            assert path_from_a[-1].node == path_to_b[0].node
            return path_from_a + path_to_b[1:]
        cur = cur.parent
    raise AssertionError("no common ancestor found")


def backchain(hyp: Hyp):
    """Root-to-hyp list of hypotheses."""
    out = []
    cur = hyp
    while cur is not None:
        out.append(cur)
        cur = cur.parent
    return list(reversed(out))


@partial(jax.jit, static_argnames=("use_glove",))
def _encode(params, seq, seq_length, use_glove=True):
    return fmodels.encoder_apply(
        params["encoder"], seq, seq_length, deterministic=True, use_glove=use_glove
    )


@jax.jit
def _decode_step(params, tables, ctx, seq_mask, scan, node, heading, elev,
                 h, c, parent_node, parent_heading, parent_elev, action,
                 instance_ix):
    """Batched decoder step on arbitrary world states (padded bucket).

    The previous-action embedding is recomputed here from the PARENT state
    + taken action (zeros for roots, action < 0), so the host never
    transfers embedding tensors.
    """
    m = node.shape[0]
    state = vecenv.EnvState(
        scan=scan, node=node, heading=heading, elev=elev,
        step=jnp.zeros((m,), jnp.int32), done=jnp.zeros((m,), bool),
    )
    obs = vecenv.observe(tables, state, node)  # goal unused (teacher ignored)

    parent_state = vecenv.EnvState(
        scan=scan, node=jnp.maximum(parent_node, 0),
        heading=parent_heading, elev=parent_elev,
        step=jnp.zeros((m,), jnp.int32), done=jnp.zeros((m,), bool),
    )
    parent_obs = vecenv.observe(tables, parent_state, node)
    u = jnp.take_along_axis(
        parent_obs.action_embedding,
        jnp.maximum(action, 0)[:, None, None],
        axis=1,
    )[:, 0]
    u = jnp.where((action >= 0)[:, None], u, 0.0)

    h1, c1, alpha, logit, _ = fmodels.decoder_step(
        params["decoder"], u, obs.action_embedding, obs.pano_feature,
        h, c, ctx[instance_ix], seq_mask[instance_ix], deterministic=True,
    )
    logit = jnp.where(obs.action_valid, logit, NEG_INF)
    log_probs = jax.nn.log_softmax(logit, axis=-1)
    return log_probs, h1, c1, obs.action_valid


def _bucket(m: int) -> int:
    size = 8
    while size < m:
        size *= 2
    return size


def _retry_transient(fn, attempts: int = 4, base_delay: float = 2.0):
    """Retry transient backend errors.  Every device call in this search is
    stateless (all state re-sent per round), so a lost dispatch over a
    flaky tunneled backend is safely retryable."""
    import time as _time

    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:  # jax.errors.JaxRuntimeError and friends
            name = type(e).__name__
            transient = "INTERNAL" in str(e) or "JaxRuntimeError" in name
            if not transient or attempt == attempts - 1:
                raise
            import sys as _sys

            _sys.stderr.write(
                f"[state_factored] transient backend error ({name}), "
                f"retry {attempt + 1}/{attempts - 1}\n"
            )
            _time.sleep(base_delay * (attempt + 1))
    raise RuntimeError("unreachable")


def state_factored_search(
    params,
    tables: vecenv.EnvTables,
    batch,
    graph_bank,
    *,
    completion_size: int = 10,
    successor_size: int = 10,
    episode_len: int = 10,
    first_n_ws_key: int = 4,
    max_rounds: int = 400,
    use_glove: bool = True,
):
    """Returns (candidate_lists, completed_hyps, traversed_lists) mirroring
    the reference's (trajs, completed_list, traversed_lists)."""
    ctx, h0, c0 = _encode(
        params, jnp.asarray(batch["seq"]), jnp.asarray(batch["seq_length"]),
        use_glove=use_glove,
    )
    seq_mask = jnp.asarray(batch["seq_mask"])
    b = ctx.shape[0]
    hdim = np.asarray(h0).shape[-1]
    emb = tables.features.shape[-1] + vecenv.LOC_EMBED_DIM

    h0 = np.asarray(h0)
    c0 = np.asarray(c0)
    scan_np = np.asarray(batch["scan"])

    # per-instance host-side graph views
    graphs = [graph_bank.graphs[graph_bank.scan_ids[s]] for s in scan_np]

    roots = []
    for i in range(b):
        roots.append(
            Hyp(
                parent=None,
                node=int(batch["start_node"][i]),
                heading=int(batch["heading"][i]),
                elev=1,
                action=-1,
                action_count=0,
                score=0.0,
                h=h0[i],
                c=c0[i],
            )
        )

    state_cache = [dict() for _ in range(b)]  # key -> (hyp, expanded)
    completed_holding = [dict() for _ in range(b)]  # key -> (hyp, expanded)
    completed = [dict() for _ in range(b)]  # key -> hyp
    beams = [[roots[i]] for i in range(b)]
    for i in range(b):
        state_cache[i][_ws_key(roots[i], first_n_ws_key)] = (roots[i], True)

    last_expanded = [roots[i] for i in range(b)]
    traversed = [[roots[i]] for i in range(b)]

    def update_traversed(new_states_per_instance):
        for i, hyps in enumerate(new_states_per_instance):
            last = last_expanded[i]
            for hyp in hyps:
                path = least_common_viewpoint_path(last, hyp)
                assert path[0].node == last.node and path[-1].node == hyp.node
                traversed[i].extend(path[1:])
                last = hyp
            last_expanded[i] = last

    rounds = 0
    while any(len(completed[i]) < completion_size for i in range(b)):
        rounds += 1
        if rounds > max_rounds:
            break
        flat = [(i, hyp) for i in range(b) for hyp in beams[i]]
        if not flat:
            break
        m = len(flat)
        cap = _bucket(m)

        def padded(getter, shape, dtype):
            arr = np.zeros((cap,) + shape, dtype)
            for j, (i, hyp) in enumerate(flat):
                arr[j] = getter(i, hyp)
            return jnp.asarray(arr)

        def run_round():
            lp, h1_, c1_, v_ = _decode_step(
                params, tables, ctx, seq_mask,
                padded(lambda i, h_: scan_np[i], (), np.int32),
                padded(lambda i, h_: h_.node, (), np.int32),
                padded(lambda i, h_: h_.heading, (), np.int32),
                padded(lambda i, h_: h_.elev, (), np.int32),
                padded(lambda i, h_: h_.h, (hdim,), np.float32),
                padded(lambda i, h_: h_.c, (hdim,), np.float32),
                padded(lambda i, h_: h_.parent.node if h_.parent else -1, (), np.int32),
                padded(lambda i, h_: h_.parent.heading if h_.parent else 0, (), np.int32),
                padded(lambda i, h_: h_.parent.elev if h_.parent else 1, (), np.int32),
                padded(lambda i, h_: h_.action, (), np.int32),
                padded(lambda i, h_: i, (), np.int32),
            )
            return np.asarray(lp), np.asarray(h1_), np.asarray(c1_), np.asarray(v_)

        log_probs, h1, c1, valid = _retry_transient(run_round)

        # expand: all valid actions of every beam hypothesis
        all_successors = [[] for _ in range(b)]
        for j, (i, hyp) in enumerate(flat):
            g = graphs[i]
            count = int(g.adj_count[hyp.node])
            for a in range(count + 1):
                if not valid[j, a]:
                    continue
                lp = float(log_probs[j, a])
                if a == 0:
                    nxt, nh, ne = hyp.node, hyp.heading, hyp.elev
                else:
                    slot = int(g.adj_perm[hyp.node, hyp.heading, a - 1])
                    view = int(g.adj_view[hyp.node, slot])
                    nxt = int(g.adj_next[hyp.node, slot])
                    nh, ne = view % 12, view // 12
                all_successors[i].append(
                    Hyp(
                        parent=hyp,
                        node=nxt,
                        heading=nh,
                        elev=ne,
                        action=a,
                        action_count=hyp.action_count + 1,
                        score=hyp.score + lp,
                        h=h1[j],
                        c=c1[j],
                        action_score=lp,
                    )
                )

        new_beams = []
        newly_expanded = []
        for i in range(b):
            cache = state_cache[i]
            holding = completed_holding[i]
            if len(completed[i]) >= completion_size:
                new_beams.append([])
                newly_expanded.append([])
                continue
            for s in sorted(all_successors[i], key=lambda t: t.score, reverse=True):
                key = _ws_key(s, first_n_ws_key)
                if s.action == 0 or s.action_count == episode_len:
                    if key not in holding or holding[key][0].score < s.score:
                        holding[key] = (s, False)
                else:
                    if key not in cache or cache[key][0].score < s.score:
                        cache[key] = (s, False)

            to_consider = itertools.chain(
                ((k, hyp, False) for k, (hyp, exp) in cache.items() if not exp),
                ((k, hyp, True) for k, (hyp, exp) in holding.items() if not exp),
            )
            best = heapq.nlargest(successor_size, to_consider, key=lambda t: t[1].score)

            new_beam = []
            expanded_now = []
            for key, hyp, is_completed in best:
                if is_completed:
                    assert holding[key] == (hyp, False)
                    holding[key] = (hyp, True)
                    if key not in completed[i] or completed[i][key].score < hyp.score:
                        completed[i][key] = hyp
                else:
                    cache[key] = (hyp, True)
                    new_beam.append(hyp)
                    expanded_now.append(hyp)
            if len(completed[i]) >= completion_size:
                new_beams.append([])
            else:
                new_beams.append(new_beam)
            newly_expanded.append(new_beam)

        beams = new_beams
        update_traversed(newly_expanded)
        if not any(beams):
            break

    completed_lists = [
        sorted(completed[i].values(), key=lambda t: t.score, reverse=True)[
            :completion_size
        ]
        for i in range(b)
    ]
    update_traversed(completed_lists)

    candidates = []
    for i in range(b):
        g = graphs[i]
        start_heading = float(batch["heading"][i]) * ANGLE_INC
        cands = []
        for hyp in completed_lists[i]:
            chain = backchain(hyp)
            traj = [
                (
                    g.node_ids[hh.node],
                    float(hh.heading) * ANGLE_INC,
                    (float(hh.elev) - 1.0) * ANGLE_INC,
                )
                for hh in chain
            ]
            cands.append(
                {
                    "instr_id": batch["instr_id"][i],
                    "trajectory": traj,
                    "actions": [hh.action for hh in chain[1:]],
                    "scores": [hh.action_score for hh in chain[1:]],
                    "score": float(hyp.score),
                    "instr_encoding": batch["item"][i].get("instr_encoding"),
                }
            )
        candidates.append(cands)
    return candidates, completed_lists, traversed


def physical_trajectory(traversed_list, candidate_hyp, graph):
    """The robot's physically-traversable path ending at the candidate
    (rational_follower.py:83-102)."""
    last = traversed_list[-1]
    path = least_common_viewpoint_path(last, candidate_hyp)
    assert path[0].node == last.node and path[-1].node == candidate_hyp.node
    full = traversed_list + path[1:]
    return [
        (
            graph.node_ids[h.node],
            float(h.heading) * ANGLE_INC,
            (float(h.elev) - 1.0) * ANGLE_INC,
        )
        for h in full
    ]
