"""Pallas TPU kernel: fused panorama gather + visual attention.

The rollout's visual-attention path is memory-bound: XLA first gathers each
episode's 36-view feature rows from the HBM bank into a (B, 36, D) buffer,
writes it to HBM, then re-reads it for the attention matmuls.  This kernel
fuses the gather with the (reassociated) attention math: per episode it
DMAs the feature rows HBM->VMEM once, computes the attention logits
(feat . v_feat + loc . v_loc + bias), the softmax, and the weighted
context, never materializing the gathered panorama in HBM.  The 36x128
location-embedding table lives entirely in VMEM.

Traffic per episode step drops from ~3x (gather write + 2 reads) to 1x
the 36xD feature block.

Matches models/attention.visual_soft_dot_fast composed with the
pano-feature assembly of env/vecenv.observe (feature | loc embedding).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..env.vecenv import LOC_EMBED_DIM

NUM_VIEWS = 36
PADDED_VIEWS = 40  # Mosaic DMA slices need the sublane dim aligned to 8


def pad_views_for_pallas(features):
    """Pad the feature bank's views dim 36 -> 40 (zero rows) so per-node
    DMA slices satisfy Mosaic's sublane alignment."""
    import jax.numpy as jnp

    t, v, d = features.shape
    assert v == NUM_VIEWS
    return jnp.pad(features, ((0, 0), (0, PADDED_VIEWS - v), (0, 0)))


def _kernel(
    # scalar prefetch
    gnode_ref,  # (B,) int32
    view_ref,  # (B,) int32
    # inputs
    features_hbm,  # (T, 40, D) in ANY/HBM (views padded to 40)
    loc_table_ref,  # (36, 36, 128) VMEM
    v_feat_ref,  # (BB, D) VMEM — W_v_feat^T t per element
    v_loc_ref,  # (BB, 128) VMEM — W_v_loc^T t per element
    bias_ref,  # (BB, 1) VMEM — b_v . t per element
    # outputs
    weighted_ref,  # (BB, D + 128) VMEM
    attn_ref,  # (BB, 36) VMEM
    # scratch
    feat_scratch,  # (BB, 36, D) VMEM
    loc_scratch,  # (BB, 36, 128) VMEM
    sem,  # DMA semaphores (BB,)
    *,
    block_b: int,
):
    b0 = pl.program_id(0) * block_b
    d = v_feat_ref.shape[-1]

    # launch all row gathers (HBM -> VMEM) for this block; they overlap
    for i in range(block_b):
        pltpu.make_async_copy(
            features_hbm.at[gnode_ref[b0 + i]], feat_scratch.at[i], sem.at[i]
        ).start()
    # per-row loc-embedding row copy (VMEM -> VMEM, cheap)
    for i in range(block_b):
        loc_scratch[i] = loc_table_ref[view_ref[b0 + i]]
    for i in range(block_b):
        pltpu.make_async_copy(
            features_hbm.at[gnode_ref[b0 + i]], feat_scratch.at[i], sem.at[i]
        ).wait()

    feat = feat_scratch[:, :NUM_VIEWS, :].astype(jnp.float32)  # (BB, 36, D)
    loc = loc_scratch[...].astype(jnp.float32)  # (BB, 36, 128)

    # attention logits via elementwise multiply + reduce (VPU; Mosaic's
    # dot_general doesn't support the 1D/batched forms needed here)
    logits = (
        (feat * v_feat_ref[...][:, None, :]).sum(axis=-1)
        + (loc * v_loc_ref[...][:, None, :]).sum(axis=-1)
        + bias_ref[...]
    )  # (BB, 36)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    attn_ref[...] = attn

    weighted_ref[:, :d] = (feat * attn[:, :, None]).sum(axis=1)
    weighted_ref[:, d:] = (loc * attn[:, :, None]).sum(axis=1)


@partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_pano_attention(
    features,  # (T, 40, D) feature bank, views padded (pad_views_for_pallas)
    loc_table,  # (36, 36, 128) loc embedding table
    gnode,  # (B,) int32 global node per episode
    view_index,  # (B,) int32 current viewIndex per episode
    v_feat,  # (B, D) float32: W_v_feat^T (W_h h + b_h)
    v_loc,  # (B, 128) float32: W_v_loc^T (W_h h + b_h)
    bias,  # (B,) float32: b_v . (W_h h + b_h)
    *,
    block_b: int | None = None,
    interpret: bool = False,
):
    """Returns (weighted (B, D+128) f32, attn (B, 36) f32).

    Mosaic requires the block batch dim divisible by 8, so batches that
    are not multiples of ``block_b`` (default 8) are padded up by
    repeating row 0 (the padded rows re-gather row gnode[0]'s features
    and are sliced off the result)."""
    b = gnode.shape[0]
    d = features.shape[-1]
    if block_b is None:
        block_b = 8
    pad = (-b) % block_b
    if pad:
        padb = lambda x: jnp.concatenate(
            [x, jnp.repeat(x[:1], pad, axis=0)], axis=0
        )
        w, a = fused_pano_attention(
            features, loc_table, padb(gnode), padb(view_index),
            padb(v_feat), padb(v_loc), padb(bias),
            block_b=block_b, interpret=interpret,
        )
        return w[:b], a[:b]
    assert b % block_b == 0, f"batch {b} must be a multiple of block_b={block_b}"
    assert features.shape[1] == PADDED_VIEWS, (
        "pass a view-padded bank (pad_views_for_pallas)"
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # features stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # loc table
            pl.BlockSpec((block_b, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_b, LOC_EMBED_DIM), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((block_b, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_b, d + LOC_EMBED_DIM),
                lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, NUM_VIEWS), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, PADDED_VIEWS, d), features.dtype),
            pltpu.VMEM((block_b, NUM_VIEWS, LOC_EMBED_DIM), loc_table.dtype),
            pltpu.SemaphoreType.DMA((block_b,)),
        ],
    )
    weighted, attn = pl.pallas_call(
        partial(_kernel, block_b=block_b),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, d + LOC_EMBED_DIM), jnp.float32),
            jax.ShapeDtypeStruct((b, NUM_VIEWS), jnp.float32),
        ],
        interpret=interpret,
    )(
        gnode.astype(jnp.int32),
        view_index.astype(jnp.int32),
        features,
        loc_table,
        v_feat.astype(jnp.float32),
        v_loc.astype(jnp.float32),
        bias.astype(jnp.float32)[:, None],
    )
    return weighted, attn


def _bwd_kernel(
    # scalar prefetch
    gnode_ref,  # (B,) int32
    view_ref,  # (B,) int32
    # inputs
    features_hbm,  # (T, 40, D) in ANY/HBM
    loc_table_ref,  # (36, 36, 128) VMEM
    attn_ref,  # (BB, 36) VMEM — saved forward softmax
    g_w_ref,  # (BB, D + 128) VMEM — d(weighted)
    g_a_ref,  # (BB, 36) VMEM — d(attn output)
    # outputs
    g_v_feat_ref,  # (BB, D) VMEM
    g_v_loc_ref,  # (BB, 128) VMEM
    g_bias_ref,  # (BB, 1) VMEM
    # scratch
    feat_scratch,  # (BB, 40, D) VMEM
    loc_scratch,  # (BB, 36, 128) VMEM
    sem,  # DMA semaphores (BB,)
    *,
    block_b: int,
):
    b0 = pl.program_id(0) * block_b
    d = g_v_feat_ref.shape[-1]

    for i in range(block_b):
        pltpu.make_async_copy(
            features_hbm.at[gnode_ref[b0 + i]], feat_scratch.at[i], sem.at[i]
        ).start()
    for i in range(block_b):
        loc_scratch[i] = loc_table_ref[view_ref[b0 + i]]
    for i in range(block_b):
        pltpu.make_async_copy(
            features_hbm.at[gnode_ref[b0 + i]], feat_scratch.at[i], sem.at[i]
        ).wait()

    feat = feat_scratch[:, :NUM_VIEWS, :].astype(jnp.float32)  # (BB, 36, D)
    loc = loc_scratch[...].astype(jnp.float32)  # (BB, 36, 128)
    attn = attn_ref[...]  # (BB, 36)

    # d(weighted)/d(attn): rows of [feat | loc], plus the direct d(attn).
    # Slice the REF (static vector loads): slicing the loaded value with
    # a mixed newaxis+slice index lowers through a gather that Mosaic's
    # TPU gather rule rejects ("Shape mismatch in input, indices and
    # output" at lowering, observed on v5e).
    g_w_feat = g_w_ref[:, :d]  # (BB, D)
    g_w_loc = g_w_ref[:, d:]  # (BB, 128)
    g_attn = (
        (feat * g_w_feat[:, None, :]).sum(axis=-1)
        + (loc * g_w_loc[:, None, :]).sum(axis=-1)
        + g_a_ref[...]
    )  # (BB, 36)
    # softmax jacobian: d logits = attn * (g_attn - sum(g_attn * attn))
    g_logits = attn * (g_attn - (g_attn * attn).sum(axis=-1, keepdims=True))
    g_v_feat_ref[...] = (feat * g_logits[:, :, None]).sum(axis=1)
    g_v_loc_ref[...] = (loc * g_logits[:, :, None]).sum(axis=1)
    g_bias_ref[...] = g_logits.sum(axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("block_b", "interpret"))
def _fused_pano_attention_bwd(
    features, loc_table, gnode, view_index, attn, g_w, g_a,
    *, block_b: int | None = None, interpret: bool = False,
):
    """Fused backward: re-gathers each episode's feature rows HBM->VMEM
    once and computes (g_v_feat, g_v_loc, g_bias) in-core — the XLA
    backward's (B, 36, D) gather materialization + re-reads never touch
    HBM."""
    b = gnode.shape[0]
    d = features.shape[-1]
    if block_b is None:
        block_b = 8
    pad = (-b) % block_b
    if pad:
        padb = lambda x: jnp.concatenate(  # noqa: E731
            [x, jnp.repeat(x[:1], pad, axis=0)], axis=0
        )
        gf, gl, gb = _fused_pano_attention_bwd(
            features, loc_table, padb(gnode), padb(view_index), padb(attn),
            padb(g_w), padb(g_a), block_b=block_b, interpret=interpret,
        )
        return gf[:b], gl[:b], gb[:b]
    assert features.shape[1] == PADDED_VIEWS

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # features stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # loc table
            pl.BlockSpec((block_b, NUM_VIEWS), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d + LOC_EMBED_DIM), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, NUM_VIEWS), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_b, d), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, LOC_EMBED_DIM), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, PADDED_VIEWS, d), features.dtype),
            pltpu.VMEM((block_b, NUM_VIEWS, LOC_EMBED_DIM), loc_table.dtype),
            pltpu.SemaphoreType.DMA((block_b,)),
        ],
    )
    return pl.pallas_call(
        partial(_bwd_kernel, block_b=block_b),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, LOC_EMBED_DIM), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        gnode.astype(jnp.int32),
        view_index.astype(jnp.int32),
        features,
        loc_table,
        attn.astype(jnp.float32),
        g_w.astype(jnp.float32),
        g_a.astype(jnp.float32),
    )


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def pano_attention(
    features, loc_table, gnode, view_index, v_feat, v_loc, bias,
    block_b=None, interpret=False,
):
    """Differentiable wrapper: fused Pallas forward AND backward.

    Gradients flow to (v_feat, v_loc, bias) — the feature bank and loc
    table are environment data (no grads).  Both passes DMA the feature
    rows HBM->VMEM directly; the gathered (B, 36, D) panorama never
    materializes in HBM in either direction (the XLA backward used to
    re-gather it, which kept training ~neutral; see ROUND2.md)."""
    w, a = fused_pano_attention(
        features, loc_table, gnode, view_index, v_feat, v_loc, bias,
        block_b=block_b, interpret=interpret,
    )
    return w, a


def _pa_fwd(features, loc_table, gnode, view_index, v_feat, v_loc, bias,
            block_b, interpret):
    out = pano_attention(
        features, loc_table, gnode, view_index, v_feat, v_loc, bias,
        block_b, interpret,
    )
    return out, (features, loc_table, gnode, view_index, out[1])


def _pa_bwd(block_b, interpret, res, grads):
    features, loc_table, gnode, view_index, attn = res
    g_w, g_a = grads
    g_v_feat, g_v_loc, g_bias = _fused_pano_attention_bwd(
        features, loc_table, gnode, view_index, attn, g_w, g_a,
        block_b=block_b, interpret=interpret,
    )
    return (None, None, None, None, g_v_feat, g_v_loc, g_bias[:, 0])


pano_attention.defvjp(_pa_fwd, _pa_bwd)


def _pa_bwd_xla(block_b, interpret, res, grads):
    """XLA reference backward (kept as the parity oracle for tests)."""
    features, loc_table, gnode, view_index, attn = res
    g_w, g_a = grads
    feat = features[gnode, :NUM_VIEWS].astype(jnp.float32)  # (B, 36, D)
    loc = loc_table[view_index].astype(jnp.float32)  # (B, 36, 128)
    d = feat.shape[-1]

    g_attn = (
        jnp.einsum("bd,bvd->bv", g_w[:, :d], feat)
        + jnp.einsum("bl,bvl->bv", g_w[:, d:], loc)
        + g_a
    )
    g_logits = attn * (g_attn - (g_attn * attn).sum(-1, keepdims=True))
    g_v_feat = jnp.einsum("bv,bvd->bd", g_logits, feat)
    g_v_loc = jnp.einsum("bv,bvl->bl", g_logits, loc)
    g_bias = g_logits.sum(-1)
    return (None, None, None, None, g_v_feat, g_v_loc, g_bias)


# --------------------------------------------------------------------------
# Extended kernel: pano attention + action-feature gather in one DMA pass.
#
# The rollout's other per-step consumer of the feature bank is the action
# embedding: the <= MAX_DEGREE neighbor view rows of the SAME node block the
# attention just DMA'd (env/vecenv.observe gathers them again from HBM as
# (B, MD, D), then materializes (B, A, D+128) embeddings that the scoring
# einsums re-read).  Here the neighbor rows are copied out of the
# VMEM-resident block instead — the HBM cost of the action path drops to
# one aligned (B, 16, D) write, and the 128-d angle block never
# materializes at all (models/attention.eltwise_prod_scoring_split folds
# it into per-action scalars).
#
# Reference semantics: tasks/R2R/env.py:60-75 (_build_action_embedding view
# feature half) + model.py:329-352 (EltwiseProdScoring over those rows).

AF_ROWS = 16  # MAX_DEGREE=15 padded to the Mosaic sublane multiple


def _action_kernel(
    # scalar prefetch
    gnode_ref,  # (B,) int32
    view_ref,  # (B,) int32
    nbr_ref,  # (B * AF_ROWS,) int32 — permuted neighbor absViewIndex, pads
    #   0, flattened: a 2-D (B, 16) scalar-prefetch operand is lane-padded
    #   to (B, 128) in SMEM (1 MB at B=2048 — overflows the 1 MB budget);
    #   the flat form stays at B*16*4 bytes
    # inputs
    features_hbm,  # (T, 40, D) in ANY/HBM
    loc_table_ref,  # (36, 36, 128) VMEM
    v_feat_ref,  # (BB, D) VMEM
    v_loc_ref,  # (BB, 128) VMEM
    bias_ref,  # (BB, 1) VMEM
    # outputs
    weighted_ref,  # (BB, D + 128) VMEM
    attn_ref,  # (BB, 36) VMEM
    af_ref,  # (BB, AF_ROWS, D) VMEM — gathered neighbor view features
    # scratch
    feat_scratch,  # (BB, 40, D) VMEM
    loc_scratch,  # (BB, 36, 128) VMEM
    sem,  # DMA semaphores (BB,)
    *,
    block_b: int,
):
    b0 = pl.program_id(0) * block_b
    d = v_feat_ref.shape[-1]

    for i in range(block_b):
        pltpu.make_async_copy(
            features_hbm.at[gnode_ref[b0 + i]], feat_scratch.at[i], sem.at[i]
        ).start()
    for i in range(block_b):
        loc_scratch[i] = loc_table_ref[view_ref[b0 + i]]
    for i in range(block_b):
        pltpu.make_async_copy(
            features_hbm.at[gnode_ref[b0 + i]], feat_scratch.at[i], sem.at[i]
        ).wait()

    feat = feat_scratch[:, :NUM_VIEWS, :].astype(jnp.float32)  # (BB, 36, D)
    loc = loc_scratch[...].astype(jnp.float32)  # (BB, 36, 128)

    logits = (
        (feat * v_feat_ref[...][:, None, :]).sum(axis=-1)
        + (loc * v_loc_ref[...][:, None, :]).sum(axis=-1)
        + bias_ref[...]
    )  # (BB, 36)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    attn_ref[...] = attn

    weighted_ref[:, :d] = (feat * attn[:, :, None]).sum(axis=1)
    weighted_ref[:, d:] = (loc * attn[:, :, None]).sum(axis=1)

    # action-feature gather from the VMEM-resident block.  A dynamic
    # sublane load (feat_scratch[i, nbr, :]) is rejected by Mosaic ("cannot
    # statically prove that index in dimension 1 is a multiple of 8"), so
    # the gather is expressed as a one-hot (AF_ROWS, 40) x (40, D) matmul
    # per element — the selector matrix is exact in bf16 and the MXU does
    # the row selection; zero extra HBM traffic either way.
    row = jax.lax.broadcasted_iota(jnp.int32, (AF_ROWS, PADDED_VIEWS), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (AF_ROWS, PADDED_VIEWS), 1)
    for i in range(block_b):
        nbr_mat = jnp.zeros((AF_ROWS, PADDED_VIEWS), jnp.int32)
        for k in range(AF_ROWS):
            nbr_mat = jnp.where(row == k, nbr_ref[(b0 + i) * AF_ROWS + k], nbr_mat)
        onehot = (col == nbr_mat).astype(feat_scratch.dtype)
        af_ref[i, :, :] = jax.lax.dot_general(
            onehot,
            feat_scratch[i],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(af_ref.dtype)


@partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_pano_action_attention(
    features,  # (T, 40, D) view-padded feature bank
    loc_table,  # (36, 36, 128)
    gnode,  # (B,) int32
    view_index,  # (B,) int32
    nbr_view,  # (B, AF_ROWS) int32 — permuted neighbor absViewIndex (pads
    #   may be any value in [0, 40); callers clip -1 pads to 0)
    v_feat,  # (B, D)
    v_loc,  # (B, 128)
    bias,  # (B,)
    *,
    block_b: int | None = None,
    interpret: bool = False,
):
    """Returns (weighted (B, D+128) f32, attn (B, 36) f32,
    af (B, AF_ROWS, D) features.dtype)."""
    b = gnode.shape[0]
    d = features.shape[-1]
    if block_b is None:
        block_b = 8
    pad = (-b) % block_b
    if pad:
        padb = lambda x: jnp.concatenate(  # noqa: E731
            [x, jnp.repeat(x[:1], pad, axis=0)], axis=0
        )
        w, a, af = fused_pano_action_attention(
            features, loc_table, padb(gnode), padb(view_index),
            padb(nbr_view), padb(v_feat), padb(v_loc), padb(bias),
            block_b=block_b, interpret=interpret,
        )
        return w[:b], a[:b], af[:b]
    assert b % block_b == 0
    assert features.shape[1] == PADDED_VIEWS, (
        "pass a view-padded bank (pad_views_for_pallas)"
    )
    assert nbr_view.shape == (b, AF_ROWS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # features stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # loc table
            pl.BlockSpec((block_b, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_b, LOC_EMBED_DIM), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((block_b, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_b, d + LOC_EMBED_DIM),
                lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, NUM_VIEWS), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_b, AF_ROWS, d), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, PADDED_VIEWS, d), features.dtype),
            pltpu.VMEM((block_b, NUM_VIEWS, LOC_EMBED_DIM), loc_table.dtype),
            pltpu.SemaphoreType.DMA((block_b,)),
        ],
    )
    weighted, attn, af = pl.pallas_call(
        partial(_action_kernel, block_b=block_b),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, d + LOC_EMBED_DIM), jnp.float32),
            jax.ShapeDtypeStruct((b, NUM_VIEWS), jnp.float32),
            jax.ShapeDtypeStruct((b, AF_ROWS, d), features.dtype),
        ],
        interpret=interpret,
    )(
        gnode.astype(jnp.int32),
        view_index.astype(jnp.int32),
        jnp.clip(nbr_view.astype(jnp.int32), 0, PADDED_VIEWS - 1).reshape(-1),
        features,
        loc_table,
        v_feat.astype(jnp.float32),
        v_loc.astype(jnp.float32),
        bias.astype(jnp.float32)[:, None],
    )
    return weighted, attn, af


@partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def pano_action_attention(
    features, loc_table, gnode, view_index, nbr_view, v_feat, v_loc, bias,
    block_b=None, interpret=False,
):
    """Differentiable wrapper around fused_pano_action_attention.

    Gradients flow to (v_feat, v_loc, bias) exactly as in pano_attention;
    ``af`` is environment data gathered from the (grad-free) feature bank,
    so its cotangent is dropped and the backward kernel is SHARED with
    pano_attention (_fused_pano_attention_bwd)."""
    return fused_pano_action_attention(
        features, loc_table, gnode, view_index, nbr_view, v_feat, v_loc,
        bias, block_b=block_b, interpret=interpret,
    )


def _paa_fwd(features, loc_table, gnode, view_index, nbr_view, v_feat,
             v_loc, bias, block_b, interpret):
    out = pano_action_attention(
        features, loc_table, gnode, view_index, nbr_view, v_feat, v_loc,
        bias, block_b, interpret,
    )
    return out, (features, loc_table, gnode, view_index, out[1])


def _paa_bwd(block_b, interpret, res, grads):
    features, loc_table, gnode, view_index, attn = res
    g_w, g_a, _g_af = grads  # af: bank data, no grads
    g_v_feat, g_v_loc, g_bias = _fused_pano_attention_bwd(
        features, loc_table, gnode, view_index, attn, g_w, g_a,
        block_b=block_b, interpret=interpret,
    )
    return (None, None, None, None, None, g_v_feat, g_v_loc, g_bias[:, 0])


pano_action_attention.defvjp(_paa_fwd, _paa_bwd)


def pano_action_attention_reference(
    features, loc_table, gnode, view_index, nbr_view, v_feat, v_loc, bias
):
    """Pure-XLA reference for the extended kernel."""
    w, a = pano_attention_reference(
        features, loc_table, gnode, view_index, v_feat, v_loc, bias
    )
    nv = jnp.clip(nbr_view, 0, features.shape[1] - 1)
    af = features[gnode[:, None], nv]  # (B, AF_ROWS, D)
    return w, a, af


def pano_attention_reference(
    features, loc_table, gnode, view_index, v_feat, v_loc, bias
):
    """Pure-XLA reference implementation (gather + fast visual attention)."""
    feat = features[gnode, :NUM_VIEWS].astype(jnp.float32)  # (B, 36, D)
    loc = loc_table[view_index].astype(jnp.float32)  # (B, 36, 128)
    logits = (
        jnp.einsum("bvd,bd->bv", feat, v_feat)
        + jnp.einsum("bvl,bl->bv", loc, v_loc)
        + bias[:, None]
    )
    attn = jax.nn.softmax(logits, axis=-1)
    weighted = jnp.concatenate(
        [
            jnp.einsum("bv,bvd->bd", attn, feat),
            jnp.einsum("bv,bvl->bl", attn, loc),
        ],
        axis=-1,
    )
    return weighted, attn
