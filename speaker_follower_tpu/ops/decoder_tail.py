"""Pallas TPU kernel: fused decoder-step tail for selection feedbacks.

With the factored loss (agents/rollout._factored_tail) the rollout's
in-scan decoder tail — text SoftDotAttention + EltwiseProdScoring —
exists only to pick the next action under ``sample``/``argmax``
feedback: gradients never flow through it (the time-batched tail
recomputes the logits for the loss), yet XLA still dispatches ~10 small
forward kernels per decoder cell for it (linear_in matmul, context
score/softmax/mix, linear_out+tanh, the reassociated scoring chain).
This kernel computes the whole chain — masked text attention over the
instruction context, h_tilde, and the split-form action logits over the
fused action kernel's neighbor features — in ONE launch per step.

Inputs come straight from what the scan already has in hand:
``h1_drop`` (post-cell, post-dropout hidden), the encoder context, the
action kernel's ``af`` output (ops/pano_attention.AF_ROWS rows), and the
per-action relative-angle trig.  Output is the valid-masked logits row
(B, 1 + MAX_DEGREE); log-softmax and the categorical/argmax draw stay in
XLA (three tiny (B, 16) ops) so selection semantics are bit-identical to
agents/rollout._select_action.

Forward-only by design: callers pass stop-gradient inputs (the factored
loss recomputes this math differentiably, time-batched, in
models/follower.decoder_tail_time_batched).

Reference semantics: tasks/R2R/model.py:107-143 (SoftDotAttention) +
:329-352 (EltwiseProdScoring) as reassociated in
models/attention.eltwise_prod_scoring_split.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.attention import NEG_INF

AF_ROWS = 16  # MAX_DEGREE=15 padded to the Mosaic sublane multiple
NUM_ACTIONS = 16  # 1 stop slot + MAX_DEGREE neighbors


def tail_mats(p_text, p_score, d_feat):
    """Derive the kernel's loop-invariant matrices from the decoder's
    text-attention and EltwiseProdScoring params (same reassociation as
    models/attention.eltwise_prod_scoring_split).  Call OUTSIDE the scan:
    XLA does not reliably hoist this out of a while-loop body.

    Returns a dict of f32 arrays:
      win_T (H, H), woc_T/woh_T (H, H): text attention weights,
        transposed for x @ w form; linear_out split into its context and
        hidden column halves.
      m_feat (H, D): h_tilde-side scoring matrix, feature columns.
      m_small (H, 8): [m_ang (4) | v1 (1) | zeros (3)] — the 32-block-
        summed angle columns and the stop-logit vector share one matmul.
      v2f (1, D): action-side bias vector, feature half.
      consts (1, 8): [v2_ang (4) | c (1) | zeros (3)].
    """
    w_in = p_text["linear_in"]["w"]  # (H, H), no bias
    w_out = p_text["linear_out"]["w"]  # (H, 2H), no bias
    hdim = w_in.shape[1]

    w_h = p_score["linear_in_h"]["w"].astype(jnp.float32)  # (dot, H)
    b_h = p_score["linear_in_h"]["b"].astype(jnp.float32)
    w_a = p_score["linear_in_a"]["w"].astype(jnp.float32)  # (dot, Da)
    b_a = p_score["linear_in_a"]["b"].astype(jnp.float32)
    w_o = p_score["linear_out"]["w"][0].astype(jnp.float32)  # (dot,)
    b_o = p_score["linear_out"]["b"][0].astype(jnp.float32)

    m = (w_h * w_o[:, None]).T @ w_a  # (H, Da)
    v1 = w_h.T @ (w_o * b_a)  # (H,)
    v2 = w_a.T @ (w_o * b_h)  # (Da,)
    c = jnp.dot(b_h * w_o, b_a) + b_o

    m_ang = m[:, d_feat:].reshape(-1, 4, 32).sum(-1)  # (H, 4)
    v2_ang = v2[d_feat:].reshape(4, 32).sum(-1)  # (4,)
    m_small = jnp.concatenate(
        [m_ang, v1[:, None], jnp.zeros((m.shape[0], 3), m.dtype)], axis=1
    )
    consts = jnp.concatenate(
        [v2_ang, c[None], jnp.zeros((3,), c.dtype)]
    )[None, :]
    return {
        "win_T": w_in.T.astype(jnp.float32),
        "woc_T": w_out[:, :hdim].T.astype(jnp.float32),
        "woh_T": w_out[:, hdim:].T.astype(jnp.float32),
        "m_feat": m[:, :d_feat].astype(jnp.float32),
        "m_small": m_small.astype(jnp.float32),
        "v2f": v2[:d_feat][None, :].astype(jnp.float32),
        "consts": consts.astype(jnp.float32),
    }


def _kernel(
    h_ref,  # (BB, H) f32 — post-cell post-dropout hidden
    ctx_ref,  # (BB, L, H) — encoder context (any float dtype)
    mask_ref,  # (BB, L) f32 — additive text mask (0 visible / NEG_INF)
    af_ref,  # (BB, AF_ROWS, D) — neighbor view features (bank dtype)
    trig_ref,  # (BB, 64) f32 — [sin_h | cos_h | sin_e | cos_e], each 16
    #   lanes (column MAX_DEGREE.. zero-padded)
    valid_ref,  # (BB, NUM_ACTIONS) f32 — 1.0 valid / 0.0 invalid
    win_ref,  # (H, H) f32
    woc_ref,  # (H, H) f32
    woh_ref,  # (H, H) f32
    mfeat_ref,  # (H, D) f32
    msmall_ref,  # (H, 8) f32
    v2f_ref,  # (1, D) f32
    consts_ref,  # (1, 8) f32
    shift_ref,  # (AF_ROWS, NUM_ACTIONS) f32 — shift-by-one selector:
    #   logits[:, 1 + j] = nbr[:, j]; built host-side (Mosaic lane concat
    #   of a (BB, 1) with a (BB, 15) slice is not supported)
    out_ref,  # (BB, NUM_ACTIONS) f32 — valid-masked logits
):
    f32 = jnp.float32
    h = h_ref[...]  # (BB, H) f32

    # ---- text SoftDotAttention (model.py:107-143) ----
    tgt = jax.lax.dot_general(
        h, win_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=f32
    )  # (BB, H)
    ctx = ctx_ref[...].astype(f32)  # (BB, L, H)
    scores = (ctx * tgt[:, None, :]).sum(axis=-1) + mask_ref[...]  # (BB, L)
    mx = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - mx)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    weighted = (ctx * attn[:, :, None]).sum(axis=1)  # (BB, H)
    h_tilde = jnp.tanh(
        jax.lax.dot_general(
            weighted, woc_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + jax.lax.dot_general(
            h, woh_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    )  # (BB, H)

    # ---- EltwiseProdScoring, split form (attention.py:133-171) ----
    hm = jax.lax.dot_general(
        h_tilde, mfeat_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (BB, D)
    small = jax.lax.dot_general(
        h_tilde, msmall_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (BB, 8): [hm_ang (4) | h.v1 (1) | _]
    q = hm + v2f_ref[...]  # (BB, D)
    af = af_ref[...].astype(f32)  # (BB, AF_ROWS, D)
    nbr = (af * q[:, None, :]).sum(axis=-1)  # (BB, AF_ROWS)
    trig = trig_ref[...]  # (BB, 64)
    consts = consts_ref[...]  # (1, 8)
    for j in range(4):
        tj = trig[:, j * AF_ROWS : (j + 1) * AF_ROWS]  # (BB, AF_ROWS)
        nbr = nbr + tj * small[:, j : j + 1] + tj * consts[:, j : j + 1]
    hv1c = small[:, 4:5] + consts[:, 4:5]  # (BB, 1)

    # assemble [stop | nbr[:, :MD]] + hv1c via the shift selector, then
    # mask invalid slots to NEG_INF (reference follower.py:477)
    shifted = jax.lax.dot_general(
        nbr, shift_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (BB, NUM_ACTIONS), column 0 = 0
    logits = shifted + hv1c  # stop slot = hv1c exactly
    valid = valid_ref[...]
    out_ref[...] = valid * logits + (1.0 - valid) * NEG_INF


@partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_tail_logits(
    h1_drop,  # (B, H)
    ctx,  # (B, L, H)
    ctx_mask,  # (B, L) bool True = masked, or None
    af,  # (B, AF_ROWS, D)
    sin_h, cos_h, sin_e, cos_e,  # (B, MAX_DEGREE) f32
    action_valid,  # (B, NUM_ACTIONS) bool
    mats,  # dict from tail_mats()
    *,
    block_b: int | None = None,
    interpret: bool = False,
):
    """Valid-masked action logits (B, NUM_ACTIONS) f32 for one decoder
    step: text attention + split scoring fused into one launch.  Matches
    soft_dot_attention + eltwise_prod_scoring_split composed with the
    _masked_log_softmax pre-masking (agents/rollout.py) up to f32
    reassociation."""
    b, hdim = h1_drop.shape
    d = af.shape[-1]
    l = ctx.shape[1]
    if block_b is None:
        block_b = 8
    pad = (-b) % block_b
    if pad:
        padb = lambda x: jnp.concatenate(  # noqa: E731
            [x, jnp.repeat(x[:1], pad, axis=0)], axis=0
        )
        out = fused_tail_logits(
            padb(h1_drop), padb(ctx),
            None if ctx_mask is None else padb(ctx_mask),
            padb(af), padb(sin_h), padb(cos_h), padb(sin_e), padb(cos_e),
            padb(action_valid), mats, block_b=block_b, interpret=interpret,
        )
        return out[:b]
    assert af.shape[1] == AF_ROWS

    md = sin_h.shape[1]
    padw = AF_ROWS - md
    trig = jnp.concatenate(
        [
            jnp.pad(t.astype(jnp.float32), ((0, 0), (0, padw)))
            for t in (sin_h, cos_h, sin_e, cos_e)
        ],
        axis=1,
    )  # (B, 64)
    if ctx_mask is None:
        mask_add = jnp.zeros((b, l), jnp.float32)
    else:
        mask_add = jnp.where(ctx_mask, NEG_INF, 0.0).astype(jnp.float32)
    shift = jnp.zeros((AF_ROWS, NUM_ACTIONS), jnp.float32)
    shift = shift.at[jnp.arange(md), 1 + jnp.arange(md)].set(1.0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, hdim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, l, hdim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, l), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, AF_ROWS, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 4 * AF_ROWS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, NUM_ACTIONS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # loop-invariant parameter blocks (constant index maps: the
            # revolving-window pipeline fetches them once)
            pl.BlockSpec((hdim, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, hdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((AF_ROWS, NUM_ACTIONS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, NUM_ACTIONS), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, NUM_ACTIONS), jnp.float32),
        interpret=interpret,
    )(
        h1_drop.astype(jnp.float32),
        ctx,
        mask_add,
        af,
        trig,
        action_valid.astype(jnp.float32),
        mats["win_T"], mats["woc_T"], mats["woh_T"],
        mats["m_feat"], mats["m_small"], mats["v2f"], mats["consts"],
        shift,
    )


def fused_tail_logits_reference(
    p_text, p_score, h1_drop, ctx, ctx_mask, af,
    sin_h, cos_h, sin_e, cos_e, action_valid,
):
    """Pure-XLA oracle: the exact in-scan tail this kernel replaces."""
    from ..models import attention as attn

    h_tilde, _ = attn.soft_dot_attention(p_text, h1_drop, ctx, ctx_mask)
    md = sin_h.shape[1]
    logit = attn.eltwise_prod_scoring_split(
        p_score, h_tilde, af[:, :md], sin_h, cos_h, sin_e, cos_e
    )
    return jnp.where(action_valid, logit.astype(jnp.float32), NEG_INF)
