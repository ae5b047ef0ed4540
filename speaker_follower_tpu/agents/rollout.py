"""On-device follower rollouts: the whole episode loop under lax.scan.

This replaces the reference's per-step host loop (_rollout_with_loss,
tasks/R2R/follower.py:430-539) — where each timestep crossed
host->C++ sim (~36 makeActions) and host->GPU — with a single XLA program:
encoder + scan over [observe -> decoder step -> loss -> action select ->
env step].  Feedback modes (teacher / argmax / sample) are static branches.

Loss parity (follower.py:477-505):
  * invalid actions masked to -inf before CE;
  * target = teacher action, or -1 (ignored) for already-ended episodes;
  * per-step loss = mean CE over non-ignored episodes; total = sum over
    steps (unnormalized by episode length, follower.py:538);
  * steps after all episodes end contribute 0 (the reference breaks out).

Trajectory recording parity: the stop step records a duplicated final
state (ended is updated after recording, follower.py:507,518-530), and
action scores are log-probs of the chosen action.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..env import vecenv
from ..models import follower as fmodels
from ..models.attention import NEG_INF


class RolloutOutput(NamedTuple):
    loss: jnp.ndarray  # scalar
    nodes: jnp.ndarray  # (B, T) node after each step
    headings: jnp.ndarray  # (B, T) heading step after each step
    elevs: jnp.ndarray  # (B, T) elevation row after each step
    actions: jnp.ndarray  # (B, T) chosen action index
    action_scores: jnp.ndarray  # (B, T) log-prob of chosen action
    active: jnp.ndarray  # (B, T) True if episode was live at this step
    teacher: jnp.ndarray  # (B, T) teacher action (or -1 once ended)
    score: jnp.ndarray  # (B,) summed log-prob while live
    final_state: vecenv.EnvState


def _masked_log_softmax(logit, valid):
    logit = jnp.where(valid, logit, NEG_INF)
    return logit, jax.nn.log_softmax(logit, axis=-1)


def _select_action(feedback, logit, log_probs, target, valid, rng):
    if feedback == "teacher":
        return jnp.maximum(target, 0)
    if feedback == "argmax":
        return jnp.argmax(logit, axis=-1).astype(jnp.int32)
    if feedback == "sample":
        # categorical over the valid-masked logits (follower.py:491-497)
        return jax.random.categorical(rng, log_probs, axis=-1).astype(jnp.int32)
    raise ValueError(f"invalid feedback option {feedback!r}")


def _factored_tail(
    params, tables, ctx, seq_mask, actions, targets, h1_seq, drop_keys,
    gnode_seq, nbr_view_seq, rel_h_seq, rel_e_seq, valid_seq,
    *, dropout_ratio, deterministic, use_pallas=False, pallas_interpret=False,
):
    """Time-batched decoder tail + CE over the recorded trajectory.

    The env action planes come stacked from the scan (they are computed
    there anyway).  With ``use_pallas`` the neighbor-feature scoring term
    streams the bank blocks through the fused kernel (ops/bank_score.py);
    otherwise the rows are re-gathered in XLA (slow two-axis gather — the
    pallas path is the production config).  Returns (loss scalar f32,
    a_scores (T, B) f32) matching the in-scan computation exactly (same
    logits math, same dropout masks via drop_keys, same CE-with-ignore
    semantics)."""
    t_dim, b = targets.shape
    if use_pallas:
        af = None
        bank = (tables.features, gnode_seq, nbr_view_seq)
    else:
        nbrv = jnp.clip(nbr_view_seq, 0, tables.features.shape[1] - 1)
        af = tables.features[gnode_seq[..., None], nbrv]  # (T, B, MD, D)
        bank = None
    logits, _, _ = fmodels.decoder_tail_time_batched(
        params["decoder"],
        h1_seq,
        drop_keys,
        ctx,
        seq_mask,
        af,
        jnp.sin(rel_h_seq),
        jnp.cos(rel_h_seq),
        jnp.sin(rel_e_seq),
        jnp.cos(rel_e_seq),
        dropout_ratio=dropout_ratio,
        deterministic=deterministic,
        bank=bank,
        pallas_interpret=pallas_interpret,
    )
    _, log_probs = _masked_log_softmax(
        logits.astype(jnp.float32), valid_seq
    )  # (T, B, A)

    tgt_safe = jnp.maximum(targets, 0)
    ce = -jnp.take_along_axis(log_probs, tgt_safe[..., None], axis=-1)[..., 0]
    valid_tgt = targets >= 0
    count = valid_tgt.sum(axis=1)
    loss_t = jnp.where(
        count > 0, (ce * valid_tgt).sum(axis=1) / jnp.maximum(count, 1), 0.0
    )
    a_scores = jnp.take_along_axis(log_probs, actions[..., None], axis=-1)[..., 0]
    return loss_t.sum(), a_scores


@partial(
    jax.jit,
    static_argnames=(
        "feedback",
        "episode_len",
        "deterministic",
        "dropout_ratio",
        "use_glove",
        "forced",
        "use_pallas",
        "pallas_interpret",
        "compute_dtype",
        "remat",
        "factored_loss",
        "fused_tail",
        "inference",
    ),
)
def rollout(
    params,
    tables: vecenv.EnvTables,
    batch,
    rng,
    *,
    feedback: str = "teacher",
    episode_len: int = 10,
    deterministic: bool = True,
    dropout_ratio: float = 0.5,
    use_glove: bool = True,
    forced: bool = False,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    compute_dtype: str | None = None,
    remat: bool = False,
    factored_loss: bool = False,
    fused_tail: bool = True,
    inference: bool = False,
) -> RolloutOutput:
    """Run a full batched episode.

    ``batch`` needs: scan, start_node, goal_node, heading, seq, seq_mask,
    seq_length — all device arrays (see data/dataset.encode_batch).  With
    ``forced=True``, ``batch["forced_actions"]`` (B, T) and
    ``batch["forced_len"]`` (B,) replace the feedback policy: the rollout
    replays the given action sequence and scores it (the reference's
    _score_obs_actions_and_instructions, follower.py:342-428).

    ``compute_dtype="bfloat16"`` is the mixed-precision policy: f32 params
    are cast once so every matmul (encoder/decoder LSTMs, attentions,
    scoring) runs on the MXU in bf16, while the numerically-sensitive tail
    — masked log-softmax, CE, scores — is upcast back to f32.  Gradients
    flow through the casts, so value_and_grad over f32 master params
    yields f32 grads (standard mixed-precision training).

    ``remat=True`` wraps the per-step body in jax.checkpoint: the
    backward pass recomputes each step's activations instead of keeping
    all ``episode_len`` of them live, trading ~1 extra forward for an
    O(episode_len) cut in peak activation memory — what lets batch-4096
    training fit in a v5e's 16 GB HBM.

    ``factored_loss=True`` computes the CE loss (and action scores) in a
    TIME-BATCHED decoder tail outside the scan: gradients never flow
    through action selection (integers), so only the visual-attention +
    LSTM-cell chain is genuinely sequential — the text attention, scoring,
    log-softmax and CE for all T steps run as single (T*B)-row programs
    on the recorded trajectory (models/follower.decoder_tail_time_batched).
    For teacher/forced feedback the in-scan tail is skipped entirely; for
    sample/argmax it still runs (to pick actions) but under stop_gradient,
    so the backward pass through it batches over time either way.  The h1
    dropout masks reuse the scan's per-step keys — the factored loss
    equals the unfactored one exactly (tests/test_rollout_factored.py).

    ``inference=True`` is the production DECODE configuration (the
    reference's greedy/sampled test rollout, follower.py:430-539 with no
    backward pass): the loss, CE bookkeeping, and time-batched tail are
    dropped entirely — per-step action log-probs come from the (B, A)
    masked log-softmax that selection needs anyway — and the fused
    in-scan tail kernel engages for argmax/sample under ``use_pallas``
    without requiring ``factored_loss`` (selection never needs
    gradients at inference).  The teacher next-hop gather dead-codes out
    (targets are never formed).  Returns loss=0 and teacher=-1 planes;
    trajectories/actions/scores are bit-identical to the training-path
    rollout at the same feedback (tests/test_rollout_inference.py).
    """
    if inference:
        if forced or feedback not in ("argmax", "sample"):
            raise ValueError(
                "inference=True supports feedback in ('argmax', 'sample') "
                "and no forced replay (forced scoring IS the loss path)"
            )
        factored_loss = False
    if factored_loss and not use_pallas and jax.default_backend() != "cpu":
        # the (T*B, MD)-row XLA two-axis gather in _factored_tail is both
        # slower than the unfactored path (+22 ms at b2048,
        # runs/profile_b2048_factored_r4.log) and in the program-shape
        # class of a documented axon TPU worker fault (docs/ROUND3.md);
        # FollowerTrainer guards this pairing (trainer.py: factored_loss
        # and use_pallas) — warn any other TPU caller at trace time (CPU
        # is exempt: the tests exercise this pairing safely there).
        import warnings

        warnings.warn(
            "rollout(factored_loss=True, use_pallas=False) materializes a "
            "(T, B, MAX_DEGREE, D) gather: slower than unfactored and a "
            "known TPU-worker-fault program shape; pass use_pallas=True "
            "(production) or factored_loss=False",
            stacklevel=2,
        )
    if compute_dtype is not None:
        cd = jnp.dtype(compute_dtype)
        params = jax.tree.map(
            lambda x: x.astype(cd) if x.dtype == jnp.float32 else x, params
        )
    rng, enc_key = jax.random.split(rng)
    ctx, h_t, c_t = fmodels.encoder_apply(
        params["encoder"],
        batch["seq"],
        batch["seq_length"],
        dropout_ratio=dropout_ratio,
        use_glove=use_glove,
        deterministic=deterministic,
        rng=enc_key,
        use_pallas_lstm=use_pallas,
        pallas_interpret=pallas_interpret,
    )
    seq_mask = batch["seq_mask"]
    goal = batch["goal_node"]

    state = vecenv.reset(batch["scan"], batch["start_node"], batch["heading"])
    b = state.node.shape[0]
    emb_dim = tables.features.shape[-1] + vecenv.LOC_EMBED_DIM
    u_prev = jnp.zeros((b, emb_dim), ctx.dtype)  # decoder.u_begin

    if forced:
        forced_actions = batch["forced_actions"]
        forced_len = batch["forced_len"]

    if use_pallas:
        assert tables.features.shape[1] == 40, (
            "use_pallas requires view-padded tables "
            "(make_env_tables(..., pad_views=True))"
        )

    # Fused in-scan tail (ops/decoder_tail.py): under the factored loss,
    # sample/argmax selection needs the per-step logits but never their
    # gradients (the time-batched tail recomputes them), so the text
    # attention + scoring chain runs as ONE forward Pallas launch per step
    # on stop-gradient inputs.  The derived scoring matrices are computed
    # HERE (outside the scan): XLA does not reliably hoist them out of the
    # while-loop body.
    use_fused_tail = (
        fused_tail
        and use_pallas
        and (factored_loss or inference)
        and not forced
        and feedback in ("sample", "argmax")
    )
    if use_fused_tail:
        from ..ops.decoder_tail import tail_mats

        # stop-gradient the derived matrices too: any kernel input with a
        # tangent would make JAX try to linearize the (forward-only)
        # pallas_call
        tail_pack = jax.tree.map(
            jax.lax.stop_gradient,
            tail_mats(
                params["decoder"]["text_attention"],
                params["decoder"]["decoder2action"],
                tables.features.shape[-1],
            ),
        )
        ctx_sg = jax.lax.stop_gradient(ctx)

    def step_fn(carry, t):
        state, h, c, u_prev, rng = carry
        rng, drop_key, sample_key = jax.random.split(rng, 3)

        if use_pallas:
            # fully fused feature path (ops/pano_attention.py): ONE kernel
            # DMAs each episode's 40xD feature block HBM->VMEM and emits
            # the visual attention AND the <= MAX_DEGREE neighbor action
            # features from the same block; the (B, 36, D) panorama and
            # the (B, A, D+128) action embeddings never exist in HBM
            # (observe_lite materializes only integer/angle planes, and
            # the 128-d angle block folds into per-action scalars in
            # eltwise_prod_scoring_split)
            from ..models.core import linear
            from ..ops.pano_attention import pano_action_attention

            obs = vecenv.observe_lite(tables, state, goal)
            p_v = params["decoder"]["visual_attention"]
            t_proj = linear(p_v["linear_in_h"], h)  # (B, dot)
            w_v = p_v["linear_in_v"]["w"]  # (dot, D + 128)
            d_feat = tables.features.shape[-1]
            gnode = tables.offsets[state.scan] + state.node
            nbr_view16 = jnp.pad(obs.nbr_view, ((0, 0), (0, 1)))
            weighted, alpha_v_pre, af16 = pano_action_attention(
                tables.features,
                tables.loc_embed,
                gnode,
                obs.view_index,
                nbr_view16,
                t_proj @ w_v[:, :d_feat],
                t_proj @ w_v[:, d_feat:],
                t_proj @ p_v["linear_in_v"]["b"],
                None,  # block_b: None = block 8 (batch padded up by
                       # repeating row 0, result sliced back to B)
                pallas_interpret,
            )
            precomputed_visual = (weighted, alpha_v_pre)
            af = af16[:, : obs.nbr_view.shape[1]]
            sin_h, cos_h = jnp.sin(obs.rel_heading), jnp.cos(obs.rel_heading)
            sin_e, cos_e = jnp.sin(obs.rel_elevation), jnp.cos(obs.rel_elevation)
            precomputed_action = (af, sin_h, cos_h, sin_e, cos_e)
            action_embedding = None
            pano_feature = None
        else:
            obs = vecenv.observe(tables, state, goal)
            precomputed_visual = None
            precomputed_action = None
            action_embedding = obs.action_embedding
            pano_feature = obs.pano_feature

        if factored_loss:
            # stack the lite action planes for the time-batched tail —
            # recomputing them there with a flat (T*B) observe_lite costs
            # ~26 ms at b2048 (tiny-row gathers are latency-bound on TPU),
            # while emitting them is a few MB of scan outputs.  On the
            # non-pallas branch observe_lite shares its gathers with
            # observe(), so CSE makes the extra call free.
            lite = obs if use_pallas else vecenv.observe_lite(tables, state, goal)
            lite_gnode = tables.offsets[state.scan] + state.node
            lite_planes = (
                lite_gnode,
                lite.nbr_view,
                lite.rel_heading,
                lite.rel_elevation,
                lite.action_valid,
            )

        # with the factored loss, teacher/forced steps never need logits —
        # the tail (text attention + scoring + CE) runs time-batched after
        # the scan; only the visual attention + LSTM cell stay sequential
        skip_tail = factored_loss and (forced or feedback == "teacher")
        if skip_tail:
            if precomputed_visual is not None:
                feature = precomputed_visual[0].astype(h.dtype)
            else:
                from ..models import attention as fattn

                feature, _ = fattn.visual_soft_dot_fast(
                    params["decoder"]["visual_attention"],
                    h,
                    pano_feature.astype(h.dtype),
                )
            h1, c1 = fmodels.decoder_core(
                params["decoder"], u_prev, feature, h, c,
                dropout_ratio=dropout_ratio, deterministic=deterministic,
                rng=drop_key,
            )
            logit = log_probs = None
        elif use_fused_tail:
            from ..models.core import dropout as _dropout
            from ..ops.decoder_tail import fused_tail_logits

            feature = precomputed_visual[0].astype(h.dtype)
            h1, c1 = fmodels.decoder_core(
                params["decoder"], u_prev, feature, h, c,
                dropout_ratio=dropout_ratio, deterministic=deterministic,
                rng=drop_key,
            )
            h1d = _dropout(
                fmodels.h1_dropout_key(drop_key), h1, dropout_ratio,
                deterministic,
            )
            sg = jax.lax.stop_gradient
            logit = fused_tail_logits(
                sg(h1d), ctx_sg, seq_mask, sg(af16),
                sg(sin_h), sg(cos_h), sg(sin_e), sg(cos_e),
                obs.action_valid, tail_pack,
                interpret=pallas_interpret,
            )
            logit, log_probs = _masked_log_softmax(logit, obs.action_valid)
        else:
            h1, c1, alpha, logit, alpha_v = fmodels.decoder_step(
                params["decoder"],
                u_prev,
                action_embedding,
                pano_feature,
                h,
                c,
                ctx,
                seq_mask,
                dropout_ratio=dropout_ratio,
                deterministic=deterministic,
                rng=drop_key,
                precomputed_visual=precomputed_visual,
                precomputed_action=precomputed_action,
            )
            if factored_loss:
                # logits only pick actions here; the loss recomputes them
                # time-batched, so no residuals/backward through this tail
                logit = jax.lax.stop_gradient(logit)
            # softmax/CE always in f32 (bf16 has ~3 decimal digits; the loss
            # and sampling distribution must not quantize)
            logit, log_probs = _masked_log_softmax(
                logit.astype(jnp.float32), obs.action_valid
            )

        ended = state.done
        if forced:
            in_range = t < forced_len
            target = jnp.where(in_range, forced_actions[:, t], -1)
            a_t = jnp.maximum(target, 0)
            live = in_range
        elif inference:
            # never touch obs.teacher: the next-hop gather dead-codes out
            target = jnp.full_like(state.node, -1)
            a_t = _select_action(
                feedback, logit, log_probs, target, obs.action_valid, sample_key
            )
            live = ~ended
        else:
            target = jnp.where(ended, -1, obs.teacher)
            a_t = _select_action(
                feedback, logit, log_probs, target, obs.action_valid, sample_key
            )
            live = ~ended

        if factored_loss:
            loss_t = jnp.zeros((), jnp.float32)  # tail computes the loss
            a_score = jnp.zeros_like(target, jnp.float32)
        elif inference:
            loss_t = jnp.zeros((), jnp.float32)
            a_score = jnp.take_along_axis(log_probs, a_t[:, None], axis=1)[:, 0]
        else:
            # per-step CE, mean over non-ignored episodes (torch
            # CrossEntropyLoss with ignore_index=-1)
            tgt_safe = jnp.maximum(target, 0)
            ce = -jnp.take_along_axis(log_probs, tgt_safe[:, None], axis=1)[:, 0]
            valid_tgt = target >= 0
            count = valid_tgt.sum()
            loss_t = jnp.where(
                count > 0, (ce * valid_tgt).sum() / jnp.maximum(count, 1), 0.0
            )

            # log-prob of the chosen action (reference action_scores)
            a_score = jnp.take_along_axis(log_probs, a_t[:, None], axis=1)[:, 0]

        new_state = vecenv.step(tables, state, a_t)
        if use_pallas:
            # assemble ONLY the chosen action's embedding: its view feature
            # row from the kernel's af output + the 128-d angle embedding
            # (a_t == 0 is stop, whose embedding is zeros — env.py:60-66)
            slot = jnp.clip(a_t - 1, 0, af.shape[1] - 1)
            feat_sel = jnp.take_along_axis(af, slot[:, None, None], axis=1)[:, 0]
            rh = jnp.take_along_axis(obs.rel_heading, slot[:, None], axis=1)[:, 0]
            re = jnp.take_along_axis(obs.rel_elevation, slot[:, None], axis=1)[:, 0]
            u_next = jnp.concatenate(
                [
                    feat_sel.astype(u_prev.dtype),
                    vecenv._angle_embedding(rh, re).astype(u_prev.dtype),
                ],
                axis=-1,
            )
            u_next = jnp.where((a_t > 0)[:, None], u_next, 0.0)
        else:
            u_next = jnp.take_along_axis(
                obs.action_embedding, a_t[:, None, None], axis=1
            )[:, 0].astype(u_prev.dtype)  # tables may be f32 under bf16 compute
        u_next = jnp.where(live[:, None], u_next, u_prev)

        out = (
            new_state.node,
            new_state.heading,
            new_state.elev,
            a_t,
            a_score,
            live,
            target,
            loss_t,
        )
        if factored_loss:
            out = out + (h1, drop_key) + lite_planes
        return (new_state, h1, c1, u_next, rng), out

    if remat:
        step_fn = jax.checkpoint(step_fn)
    (final_state, _, _, _, _), outs = jax.lax.scan(
        step_fn,
        (state, h_t, c_t, u_prev, rng),
        jnp.arange(episode_len),
    )
    if factored_loss:
        (nodes, headings, elevs, actions, a_scores, active, targets, losses,
         h1_seq, drop_keys, gnode_seq, nbr_view_seq, rel_h_seq, rel_e_seq,
         valid_seq) = outs
        loss, a_scores = _factored_tail(
            params, tables, ctx, seq_mask, actions, targets, h1_seq,
            drop_keys, gnode_seq, nbr_view_seq, rel_h_seq, rel_e_seq,
            valid_seq, dropout_ratio=dropout_ratio,
            deterministic=deterministic, use_pallas=use_pallas,
            pallas_interpret=pallas_interpret,
        )
    else:
        nodes, headings, elevs, actions, a_scores, active, targets, losses = outs
        loss = losses.sum()
    # scan stacks along axis 0 (time); put batch first
    to_bt = lambda x: jnp.swapaxes(x, 0, 1)
    active_bt = to_bt(active)
    score = (to_bt(a_scores) * active_bt).sum(axis=1)
    return RolloutOutput(
        loss=loss,
        nodes=to_bt(nodes),
        headings=to_bt(headings),
        elevs=to_bt(elevs),
        actions=to_bt(actions),
        action_scores=to_bt(a_scores),
        active=active_bt,
        teacher=to_bt(targets),
        score=score,
        final_state=final_state,
    )


def trajectories_from_rollout(out: RolloutOutput, batch, graph_bank):
    """Convert fixed-shape rollout arrays into reference-format trajectory
    dicts: [{'instr_id', 'trajectory': [(viewpointId, heading_rad,
    elevation_rad), ...], 'score', 'scores', 'actions'}]."""
    import numpy as np

    from ..data.graph import ANGLE_INC

    nodes = np.asarray(out.nodes)
    headings = np.asarray(out.headings)
    elevs = np.asarray(out.elevs)
    actions = np.asarray(out.actions)
    a_scores = np.asarray(out.action_scores)
    active = np.asarray(out.active)
    score = np.asarray(out.score)

    results = []
    b, t_max = nodes.shape
    for i in range(b):
        sid = batch["scan_id"][i]
        g = graph_bank.graphs[sid]
        start_vp = g.node_ids[int(batch["start_node"][i])]
        start_heading = float(batch["heading"][i]) * ANGLE_INC
        traj = [(start_vp, start_heading, 0.0)]
        acts, scs = [], []
        for t in range(t_max):
            if not active[i, t]:
                break
            traj.append(
                (
                    g.node_ids[int(nodes[i, t])],
                    float(headings[i, t]) * ANGLE_INC,
                    (float(elevs[i, t]) - 1.0) * ANGLE_INC,
                )
            )
            acts.append(int(actions[i, t]))
            scs.append(float(a_scores[i, t]))
        results.append(
            {
                "instr_id": batch["instr_id"][i],
                "trajectory": traj,
                "actions": acts,
                "scores": scs,
                "score": float(score[i]),
                "instr_encoding": batch["item"][i].get("instr_encoding"),
            }
        )
    return results
