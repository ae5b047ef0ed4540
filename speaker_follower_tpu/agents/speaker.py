"""Speaker agent: gold-trajectory collection, instruction scoring/decoding,
and word-level beam search.

Replaces tasks/R2R/speaker.py.  The reference assembles per-step numpy
tensors by stepping C++ sims along teacher paths
(env.py:823-848 + speaker.py:68-121); here a jitted teacher rollout collects
the per-step panorama features and chosen-action embeddings directly on
device, and the word decoder runs as a lax.scan.

Parity notes:
  * the trajectory tensors exclude the post-stop duplicate observation and
    include the stop step with a zero action embedding
    (speaker.py:96-104 with _build_action_embedding's zero stop row);
  * padded steps are zero embeddings, and the encoder unroll length is the
    max path length IN THE BATCH (speaker.py:69-70) — we pass it as a
    static arg (at most ~7 distinct values -> bounded recompiles);
  * word loss: per-step NLL mean over non-<PAD> targets, summed over steps
    (speaker.py:182); word scores are log-probs of the chosen words;
  * the BOS input is vocab index 3 (speaker.py:137 with utils.py:19-24).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.text import BOS_IDX, EOS_IDX, PAD_IDX
from ..env import vecenv
from ..models import speaker as smodels


class GoldTrajectories(NamedTuple):
    action_embeddings: jnp.ndarray  # (B, T, E) chosen-action embedding
    world_features: jnp.ndarray | None  # (B, T, 36, E) pano features per
    #   step, or None in lazy mode (gnode/view_index carry the panorama
    #   IDENTITY instead; the encoder gathers one step at a time — the
    #   (B, T, 36, E) stack never exists, which is the structural fix for
    #   the axon forced-replay fault, docs/ROUND3.md)
    actions: jnp.ndarray  # (B, T) teacher actions taken
    nodes: jnp.ndarray  # (B, T) node AFTER each step
    path_mask: jnp.ndarray  # (B, T) True = padding (for ctx attention)
    path_len: jnp.ndarray  # (B,) number of actions incl. stop
    gnode: jnp.ndarray | None = None  # (B, T) global node BEFORE each step
    view_index: jnp.ndarray | None = None  # (B, T) viewIndex BEFORE each step


@partial(jax.jit, static_argnames=("episode_len", "lazy_features"))
def gold_rollout(tables: vecenv.EnvTables, batch, *, episode_len: int = 10,
                 lazy_features: bool = False):
    """Collect teacher trajectories + their observation tensors on device.

    ``lazy_features=True`` (same contract as forced_rollout): return
    world_features=None plus per-step (gnode, view_index) identity planes
    — the chosen-action embedding comes from ONE bank-row gather per
    step, and the (B, T, 36, D) panorama stack (3.2 GB at b2048
    full-dim) never materializes; the encoder gathers — or, with
    use_pallas, DMAs inside the fused attention kernel — one step at a
    time.  Value-exact vs the materialized path (tests/test_speaker_lazy.py).
    Round-5 roofline: the materialized gold rollout alone was 38 ms of
    the 154 ms speaker train step at b2048
    (runs/profile_speaker_b2048_r5.log)."""
    state = vecenv.reset(batch["scan"], batch["start_node"], batch["heading"])
    goal = batch["goal_node"]

    if lazy_features:
        feat_dtype = tables.features.dtype

        def lazy_step_fn(state, _):
            obs = vecenv.observe_lite(tables, state, goal)
            live = ~state.done
            a = jnp.where(live, obs.teacher, 0)
            gnode = tables.offsets[state.scan] + state.node
            slot = jnp.clip(a - 1, 0, obs.nbr_view.shape[1] - 1)
            view_sel = jnp.take_along_axis(obs.nbr_view, slot[:, None], 1)[:, 0]
            rh = jnp.take_along_axis(obs.rel_heading, slot[:, None], 1)[:, 0]
            re = jnp.take_along_axis(obs.rel_elevation, slot[:, None], 1)[:, 0]
            feat_row = tables.features[gnode, jnp.maximum(view_sel, 0)]
            a_emb = jnp.concatenate(
                [feat_row, vecenv._angle_embedding(rh, re).astype(feat_dtype)],
                axis=-1,
            )
            # stop (a == 0) has the all-zero embedding (env.py:60-66)
            a_emb = jnp.where((live & (a > 0))[:, None], a_emb, 0.0)
            new_state = vecenv.step(tables, state, a)
            return new_state, (
                a_emb, gnode, obs.view_index, a, new_state.node, live
            )

        _, (a_embs, gnodes, views, actions, nodes, live) = jax.lax.scan(
            lazy_step_fn, state, None, length=episode_len
        )
        to_bt = lambda x: jnp.swapaxes(x, 0, 1)
        live = to_bt(live)
        return GoldTrajectories(
            action_embeddings=to_bt(a_embs),
            world_features=None,
            actions=to_bt(actions),
            nodes=to_bt(nodes),
            path_mask=~live,
            path_len=live.sum(axis=1).astype(jnp.int32),
            gnode=to_bt(gnodes),
            view_index=to_bt(views),
        )

    def step_fn(state, _):
        obs = vecenv.observe(tables, state, goal)
        live = ~state.done
        a = jnp.where(live, obs.teacher, 0)
        a_emb = jnp.take_along_axis(
            obs.action_embedding, a[:, None, None], axis=1
        )[:, 0]
        # zero padded steps (reference zero-initializes the batch tensors)
        a_emb = jnp.where(live[:, None], a_emb, 0.0)
        feat = jnp.where(live[:, None, None], obs.pano_feature, 0.0)
        new_state = vecenv.step(tables, state, a)
        return new_state, (a_emb, feat, a, new_state.node, live)

    final_state, (a_embs, feats, actions, nodes, live) = jax.lax.scan(
        step_fn, state, None, length=episode_len
    )
    to_bt = lambda x: jnp.swapaxes(x, 0, 1)
    live = to_bt(live)
    return GoldTrajectories(
        action_embeddings=to_bt(a_embs),
        world_features=to_bt(feats),
        actions=to_bt(actions),
        nodes=to_bt(nodes),
        path_mask=~live,
        path_len=live.sum(axis=1).astype(jnp.int32),
    )


class SpeakerOutput(NamedTuple):
    loss: jnp.ndarray  # scalar
    words: jnp.ndarray  # (B, L) chosen word at each step
    word_scores: jnp.ndarray  # (B, L) log-prob of chosen word
    active: jnp.ndarray  # (B, L) True while not ended (EOS not yet emitted)
    score: jnp.ndarray  # (B,) summed log-prob while active


@partial(
    jax.jit,
    static_argnames=(
        "feedback",
        "instruction_len",
        "unroll_len",
        "deterministic",
        "dropout_ratio",
        "use_glove",
        "use_input_att_feed",
        "compute_dtype",
        "remat",
        "fused_teacher",
        "use_pallas",
        "pallas_interpret",
    ),
)
def score_instructions(
    params,
    gold: GoldTrajectories,
    instr_seq,  # (B, L) int32: NOT reversed, EOS appended, PAD padded
    rng,
    *,
    feedback: str = "teacher",
    instruction_len: int = 80,
    unroll_len: int = 10,
    deterministic: bool = True,
    dropout_ratio: float = 0.5,
    use_glove: bool = True,
    use_input_att_feed: bool = False,
    compute_dtype: str | None = None,
    remat: bool = False,
    encoder_valid_len=None,
    fused_teacher: bool = True,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
    tables: vecenv.EnvTables | None = None,
) -> SpeakerOutput:
    """Teacher/argmax/sample decode with NLL loss
    (speaker.py:123-202 _score_obs_actions_and_instructions).

    ``compute_dtype="bfloat16"``: mixed precision — matmuls in bf16,
    softmax/NLL in f32 (see agents/rollout.py).  ``remat``: recompute
    per-word activations in the backward pass (see agents/rollout.py).
    ``encoder_valid_len``: traced batch-max path length; reproduces the
    reference's dynamic batch-max encoder unroll under a static
    ``unroll_len`` (see speaker_encoder_apply) so callers need not sync
    max(path_len) to the host to pick unroll_len.

    ``fused_teacher``: with teacher forcing the word sequence is known in
    advance, so the 80-step sequential decoder loop collapses into ONE
    LSTM scan over the whole instruction plus three batched matmuls
    (attention scores, attention mix, vocab logits) — the MXU sees
    (B*L, .) matmuls instead of 80 tiny (B, .) ones.  Values equal the
    step loop exactly in deterministic mode (tested); under dropout only
    the RNG realization differs (one mask draw over (B, L, .) instead of
    L per-step draws).  Applies to feedback="teacher" without
    input-att-feed; other modes keep the sequential loop (the next input
    depends on the previous step's logits).
    """
    if compute_dtype is not None:
        cd = jnp.dtype(compute_dtype)
        params = jax.tree.map(
            lambda x: x.astype(cd) if x.dtype == jnp.float32 else x, params
        )
    b = gold.path_len.shape[0]
    rng, enc_key = jax.random.split(rng)
    if gold.world_features is None:
        # lazy features (gold_rollout / forced_rollout lazy_features=True):
        # the encoder gathers each step's panorama from ``tables`` inside
        # its scan — or, under use_pallas, fuses the gather with the
        # visual attention (ops/pano_attention.pano_attention)
        assert tables is not None, "lazy GoldTrajectories need tables"
        ctx, h_t, c_t = smodels.speaker_encoder_apply(
            params["encoder"],
            gold.action_embeddings[:, :unroll_len],
            None,
            dropout_ratio=dropout_ratio,
            deterministic=deterministic,
            rng=enc_key,
            valid_len=encoder_valid_len,
            tables=tables,
            gnode=gold.gnode[:, :unroll_len],
            view_index=gold.view_index[:, :unroll_len],
            live=~gold.path_mask[:, :unroll_len],
            use_pallas=use_pallas,
            pallas_interpret=pallas_interpret,
        )
    else:
        ctx, h_t, c_t = smodels.speaker_encoder_apply(
            params["encoder"],
            gold.action_embeddings[:, :unroll_len],
            gold.world_features[:, :unroll_len],
            dropout_ratio=dropout_ratio,
            deterministic=deterministic,
            rng=enc_key,
            valid_len=encoder_valid_len,
        )
    path_mask = gold.path_mask[:, :unroll_len]

    if fused_teacher and feedback == "teacher" and not use_input_att_feed:
        return _score_teacher_batched(
            params["decoder"], ctx, path_mask, h_t, c_t, instr_seq, rng,
            dropout_ratio=dropout_ratio, use_glove=use_glove,
            deterministic=deterministic, use_pallas=use_pallas,
            pallas_interpret=pallas_interpret, remat=remat,
        )

    w0 = jnp.full((b,), BOS_IDX, jnp.int32)
    ended0 = jnp.zeros((b,), bool)

    def step_fn(carry, t):
        w_t, h, c, ended, rng = carry
        rng, drop_key, sample_key = jax.random.split(rng, 3)
        h1, c1, alpha, logit = smodels.speaker_decoder_step(
            params["decoder"],
            w_t,
            h,
            c,
            ctx,
            path_mask,
            dropout_ratio=dropout_ratio,
            use_glove=use_glove,
            use_input_att_feed=use_input_att_feed,
            deterministic=deterministic,
            rng=drop_key,
        )
        target = instr_seq[:, t]
        logit = logit.astype(jnp.float32)  # softmax/NLL stay f32
        log_probs = jax.nn.log_softmax(logit, axis=-1)

        if feedback == "teacher":
            w_next = target
        elif feedback == "argmax":
            w_next = jnp.argmax(logit, axis=-1).astype(jnp.int32)
        elif feedback == "sample":
            w_next = jax.random.categorical(sample_key, logit, axis=-1).astype(
                jnp.int32
            )
        else:
            raise ValueError(f"invalid feedback option {feedback!r}")

        # loss: NLL of target, mean over non-PAD targets
        tgt_logp = jnp.take_along_axis(log_probs, target[:, None], axis=1)[:, 0]
        valid = target != PAD_IDX
        count = valid.sum()
        loss_t = jnp.where(
            count > 0, -(tgt_logp * valid).sum() / jnp.maximum(count, 1), 0.0
        )

        # word score: log-prob of the CHOSEN word (0 when it is PAD)
        w_logp = jnp.take_along_axis(log_probs, w_next[:, None], axis=1)[:, 0]
        w_logp = jnp.where(w_next == PAD_IDX, 0.0, w_logp)

        live = ~ended
        new_ended = ended | (w_next == EOS_IDX)
        return (w_next, h1, c1, new_ended, rng), (w_next, w_logp, live, loss_t)

    if remat:
        step_fn = jax.checkpoint(step_fn)
    (_, _, _, _, _), (words, w_scores, live, losses) = jax.lax.scan(
        step_fn,
        (w0, h_t, c_t, ended0, rng),
        jnp.arange(instruction_len),
    )
    to_bl = lambda x: jnp.swapaxes(x, 0, 1)
    live = to_bl(live)
    w_scores = to_bl(w_scores)
    return SpeakerOutput(
        loss=losses.sum(),
        words=to_bl(words),
        word_scores=w_scores,
        active=live,
        score=(w_scores * live).sum(axis=1),
    )


def _score_teacher_batched(
    p_dec, ctx, path_mask, h_t, c_t, instr_seq, rng, *,
    dropout_ratio, use_glove, deterministic,
    use_pallas=False, pallas_interpret=False, remat=False,
):
    """Teacher-forced decode with the time loop batched out (see
    score_instructions ``fused_teacher``).  The decoder LSTM input is the
    word embedding alone (model.py:487-505 default variant), so with the
    targets known the recurrence is one masked_lstm_scan and everything
    else (SoftDot attention + vocab logits, model.py:107-143/516-518) is a
    batched matmul over all L positions at once."""
    from ..models.attention import NEG_INF
    from ..models.core import (
        dropout as _dropout,
        embedding as _embedding,
        linear as _linear,
        masked_lstm_scan,
    )

    b, l = instr_seq.shape
    rng, k_w, k_h = jax.random.split(rng, 3)

    # inputs: BOS then the target words shifted right (w_next == target)
    words_in = jnp.concatenate(
        [jnp.full((b, 1), BOS_IDX, jnp.int32), instr_seq[:, :-1]], axis=1
    )
    embeds = _embedding(p_dec["embedding"], words_in)  # (B, L, E)
    if not use_glove:
        embeds = _dropout(k_w, embeds, dropout_ratio, deterministic)

    # the whole word chain as one LSTM scan (all L steps run, as in the
    # reference's fixed-range loop; ended-ness only affects the outputs)
    full = jnp.full((b,), l, jnp.int32)
    if use_pallas:
        from ..ops.lstm import masked_lstm_scan_pallas

        scan = partial(masked_lstm_scan_pallas, interpret=pallas_interpret)
    else:
        scan = masked_lstm_scan
    h_seq, _ = scan(p_dec["lstm"], embeds, full, h_t, c_t)
    h_drop = _dropout(k_h, h_seq, dropout_ratio, deterministic)  # (B, L, H)

    def attend_and_score(h_drop, ctx):
        # SoftDotAttention for every position at once (attention.py:27-39
        # semantics: the output concat uses the dropped query)
        pa = p_dec["attention"]
        target_q = _linear(pa["linear_in"], h_drop)  # (B, L, H)
        scores = jnp.einsum("bth,blh->blt", ctx, target_q)  # (B, L, T)
        scores = jnp.where(path_mask[:, None, :], NEG_INF, scores)
        alpha = jax.nn.softmax(scores, axis=-1)
        weighted = jnp.einsum("blt,bth->blh", alpha, ctx)
        h_tilde = jnp.tanh(
            _linear(pa["linear_out"], jnp.concatenate([weighted, h_drop], -1))
        )
        logit = _linear(p_dec["decoder2action"], h_tilde)  # (B, L, V)
        log_probs = jax.nn.log_softmax(logit.astype(jnp.float32), axis=-1)
        return jnp.take_along_axis(
            log_probs, instr_seq[..., None], axis=2
        )[..., 0]  # (B, L)

    if remat:
        # recompute attention + the (B, L, V) logits in the backward pass
        # instead of storing them — the vocab-logit tensor dominates the
        # fused path's activation memory
        attend_and_score = jax.checkpoint(attend_and_score)
    tgt_logp = attend_and_score(h_drop, ctx)
    valid = instr_seq != PAD_IDX
    count_t = valid.sum(axis=0)  # (L,)
    loss_t = jnp.where(
        count_t > 0,
        -(tgt_logp * valid).sum(axis=0) / jnp.maximum(count_t, 1),
        0.0,
    )
    w_scores = jnp.where(valid, tgt_logp, 0.0)
    # live at step t = no EOS among the chosen words before t
    eos = instr_seq == EOS_IDX
    live = (jnp.cumsum(eos, axis=1) - eos) == 0
    return SpeakerOutput(
        loss=loss_t.sum(),
        words=instr_seq,
        word_scores=w_scores,
        active=live,
        score=(w_scores * live).sum(axis=1),
    )


@partial(jax.jit, static_argnames=("episode_len", "lazy_features"))
def forced_rollout(
    tables: vecenv.EnvTables, batch, *, episode_len: int = 10,
    lazy_features: bool = False,
):
    """Like gold_rollout but replaying given action sequences — used to
    build the speaker's input tensors for arbitrary follower candidates
    (rational_follower.py:59-69 feeds candidate (obs, actions) into the
    speaker).  ``batch`` needs forced_actions (B, T) and forced_len (B,).

    ``lazy_features``: return world_features=None and the per-step
    (gnode, view_index) identity instead — the chosen-action embedding is
    assembled from ONE bank row per step, and the (B, T, 36, D) feature
    stack never materializes (the speaker encoder gathers per step:
    models/speaker.speaker_encoder_apply).  Value-exact vs the
    materialized path (tested); this is the structural fix for the axon
    backend fault on large replay batches over many-scan worlds
    (docs/ROUND3.md: the fault signature is the stacked gather program,
    B >= ~24 x 61 scans killed the worker)."""
    state = vecenv.reset(batch["scan"], batch["start_node"], batch["heading"])
    actions = batch["forced_actions"]
    forced_len = batch["forced_len"]
    goal = batch["start_node"]  # teacher unused

    if lazy_features:
        feat_dtype = tables.features.dtype

        def step_fn(carry, t):
            state = carry
            obs = vecenv.observe_lite(tables, state, goal)
            live = t < forced_len
            a = jnp.where(live, actions[:, t], 0)
            gnode = tables.offsets[state.scan] + state.node
            slot = jnp.clip(a - 1, 0, obs.nbr_view.shape[1] - 1)
            view_sel = jnp.take_along_axis(obs.nbr_view, slot[:, None], 1)[:, 0]
            rh = jnp.take_along_axis(obs.rel_heading, slot[:, None], 1)[:, 0]
            re = jnp.take_along_axis(obs.rel_elevation, slot[:, None], 1)[:, 0]
            feat_row = tables.features[gnode, jnp.maximum(view_sel, 0)]
            a_emb = jnp.concatenate(
                [feat_row, vecenv._angle_embedding(rh, re).astype(feat_dtype)],
                axis=-1,
            )
            # zero when stopped/padded AND when the forced action is out of
            # range (the materialized path's observe() zeroes invalid
            # slots, env.py:60-66 stop row + slot_valid masking)
            valid_a = jnp.take_along_axis(obs.action_valid, a[:, None], 1)[:, 0]
            a_emb = jnp.where((live & (a > 0) & valid_a)[:, None], a_emb, 0.0)
            new_state = vecenv.step(tables, state, a)
            return new_state, (
                a_emb, gnode, obs.view_index, a, new_state.node, live
            )

        _, (a_embs, gnodes, views, acts, nodes, live) = jax.lax.scan(
            step_fn, state, jnp.arange(episode_len)
        )
        to_bt = lambda x: jnp.swapaxes(x, 0, 1)
        live = to_bt(live)
        return GoldTrajectories(
            action_embeddings=to_bt(a_embs),
            world_features=None,
            actions=to_bt(acts),
            nodes=to_bt(nodes),
            path_mask=~live,
            path_len=live.sum(axis=1).astype(jnp.int32),
            gnode=to_bt(gnodes),
            view_index=to_bt(views),
        )

    def step_fn(carry, t):
        state = carry
        obs = vecenv.observe(tables, state, goal)
        live = t < forced_len
        a = jnp.where(live, actions[:, t], 0)
        a_emb = jnp.take_along_axis(
            obs.action_embedding, a[:, None, None], axis=1
        )[:, 0]
        a_emb = jnp.where(live[:, None], a_emb, 0.0)
        feat = jnp.where(live[:, None, None], obs.pano_feature, 0.0)
        new_state = vecenv.step(tables, state, a)
        return new_state, (a_emb, feat, a, new_state.node, live)

    final_state, (a_embs, feats, acts, nodes, live) = jax.lax.scan(
        step_fn, state, jnp.arange(episode_len)
    )
    to_bt = lambda x: jnp.swapaxes(x, 0, 1)
    live = to_bt(live)
    return GoldTrajectories(
        action_embeddings=to_bt(a_embs),
        world_features=to_bt(feats),
        actions=to_bt(acts),
        nodes=to_bt(nodes),
        path_mask=~live,
        path_len=live.sum(axis=1).astype(jnp.int32),
    )


class SpeakerBeamResult(NamedTuple):
    words: jnp.ndarray  # (B, K, L) word sequences (incl. final EOS)
    lengths: jnp.ndarray  # (B, K) number of words incl. EOS
    scores: jnp.ndarray  # (B, K) descending
    count: jnp.ndarray  # (B,)


@partial(
    jax.jit,
    static_argnames=(
        "beam_size", "instruction_len", "unroll_len",
        "use_glove", "use_input_att_feed",
    ),
)
def beam_search(
    params,
    gold: GoldTrajectories,
    *,
    beam_size: int = 10,
    instruction_len: int = 80,
    unroll_len: int = 10,
    use_glove: bool = True,
    use_input_att_feed: bool = False,
) -> SpeakerBeamResult:
    """Word-level beam search (speaker.py:211-318): global top-K expansion
    over (slot, word) successor scores; EOS (or final-step) successors move
    to a top-K completed buffer; a beam with >= K completions dies."""
    from ..models.attention import NEG_INF

    k = beam_size
    ctx, h0, c0 = smodels.speaker_encoder_apply(
        params["encoder"],
        gold.action_embeddings[:, :unroll_len],
        gold.world_features[:, :unroll_len],
        deterministic=True,
    )
    path_mask = gold.path_mask[:, :unroll_len]
    b, _, hdim = ctx.shape
    vocab = params["decoder"]["decoder2action"]["w"].shape[0]

    h = jnp.repeat(h0[:, None], k, axis=1)
    c = jnp.repeat(c0[:, None], k, axis=1)
    w_prev = jnp.full((b, k), BOS_IDX, jnp.int32)
    scores = jnp.full((b, k), NEG_INF).at[:, 0].set(0.0)
    alive = jnp.zeros((b, k), bool).at[:, 0].set(True)
    hist = jnp.zeros((b, k, instruction_len), jnp.int32)

    comp_scores = jnp.full((b, k), NEG_INF)
    comp_words = jnp.zeros((b, k, instruction_len), jnp.int32)
    comp_lens = jnp.zeros((b, k), jnp.int32)
    comp_count = jnp.zeros((b,), jnp.int32)

    ctx_rep = jnp.repeat(ctx, k, axis=0)
    mask_rep = jnp.repeat(path_mask, k, axis=0)

    def step_fn(carry, t):
        (h, c, w_prev, scores, alive, hist,
         comp_scores, comp_words, comp_lens, comp_count) = carry
        h1f, c1f, alpha, logit = smodels.speaker_decoder_step(
            params["decoder"],
            w_prev.reshape(-1),
            h.reshape(b * k, hdim),
            c.reshape(b * k, hdim),
            ctx_rep,
            mask_rep,
            deterministic=True,
            use_glove=use_glove,
            use_input_att_feed=use_input_att_feed,
        )
        log_probs = jax.nn.log_softmax(logit, axis=-1).reshape(b, k, vocab)
        succ = scores[:, :, None] + log_probs
        succ = jnp.where(alive[:, :, None], succ, NEG_INF)
        top_scores, top_idx = jax.lax.top_k(succ.reshape(b, k * vocab), k)
        parent = top_idx // vocab
        word = (top_idx % vocab).astype(jnp.int32)
        top_valid = top_scores > NEG_INF / 2

        g2 = lambda x: jnp.take_along_axis(
            x, parent.reshape(parent.shape + (1,) * (x.ndim - 2)), axis=1
        )
        h1 = g2(h1f.reshape(b, k, hdim))
        c1 = g2(c1f.reshape(b, k, hdim))
        hist1 = g2(hist).at[:, :, t].set(word)
        wlen = t + 1

        is_eos = (word == EOS_IDX) | (t == instruction_len - 1)
        beam_dead = comp_count >= k
        to_completed = top_valid & is_eos & ~beam_dead[:, None]
        to_beam = top_valid & ~is_eos & ~beam_dead[:, None]

        cand_scores = jnp.where(to_completed, top_scores, NEG_INF)
        merged_scores = jnp.concatenate([comp_scores, cand_scores], axis=1)
        merged_words = jnp.concatenate([comp_words, hist1], axis=1)
        merged_lens = jnp.concatenate(
            [comp_lens, jnp.full((b, k), wlen, jnp.int32)], axis=1
        )
        mtop, midx = jax.lax.top_k(merged_scores, k)
        comp_scores2 = mtop
        comp_words2 = jnp.take_along_axis(merged_words, midx[:, :, None], axis=1)
        comp_lens2 = jnp.take_along_axis(merged_lens, midx, axis=1)
        comp_count2 = jnp.minimum(comp_count + to_completed.sum(axis=1), 2 * k)

        carry = (
            h1, c1, word, jnp.where(to_beam, top_scores, NEG_INF), to_beam, hist1,
            comp_scores2, comp_words2, comp_lens2, comp_count2,
        )
        return carry, None

    carry = (h, c, w_prev, scores, alive, hist,
             comp_scores, comp_words, comp_lens, comp_count)
    carry, _ = jax.lax.scan(step_fn, carry, jnp.arange(instruction_len))
    (_, _, _, _, _, _, comp_scores, comp_words, comp_lens, comp_count) = carry
    return SpeakerBeamResult(
        words=comp_words,
        lengths=comp_lens,
        scores=comp_scores,
        count=jnp.minimum(comp_count, beam_size),
    )


def beam_results(result: SpeakerBeamResult, instr_ids, tokenizer):
    """Per-instance candidate lists in the reference output format
    (speaker.py:298-318): word_indices include the final EOS."""
    words = np.asarray(result.words)
    lengths = np.asarray(result.lengths)
    scores = np.asarray(result.scores)
    count = np.asarray(result.count)
    outputs = []
    from ..models.attention import NEG_INF

    for i, instr_id in enumerate(instr_ids):
        cands = []
        for j in range(int(count[i])):
            if scores[i, j] <= NEG_INF / 2:
                continue
            idxs = [int(w) for w in words[i, j, : lengths[i, j]]]
            cands.append(
                {
                    "instr_id": instr_id,
                    "word_indices": idxs,
                    "score": float(scores[i, j]),
                    "words": tokenizer.decode_sentence(
                        idxs, break_on_eos=True, join=False
                    ),
                }
            )
        outputs.append(cands)
    return outputs


def speaker_results_from_output(out: SpeakerOutput, instr_ids, tokenizer):
    """Reference-format output dicts: word_indices recorded while not ended
    (EOS itself included, speaker.py:184-191), words decoded break_on_eos."""
    words = np.asarray(out.words)
    scores = np.asarray(out.word_scores)
    active = np.asarray(out.active)
    total = np.asarray(out.score)
    results = {}
    for i, instr_id in enumerate(instr_ids):
        idxs = [int(w) for w, a in zip(words[i], active[i]) if a]
        results[instr_id] = {
            "instr_id": instr_id,
            "word_indices": idxs,
            "scores": [float(s) for s, a in zip(scores[i], active[i]) if a],
            "score": float(total[i]),
            "words": tokenizer.decode_sentence(idxs, break_on_eos=True, join=False),
        }
    return results
