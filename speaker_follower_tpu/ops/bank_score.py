"""Pallas TPU kernel: fused bank-row gather + per-action score dot.

The factored decoder tail (agents/rollout._factored_tail) scores each
recorded step's <= MAX_DEGREE candidate actions as

    scores[n, a] = features[gnode[n], nbr_view[n, a], :] . q[n, :]

(models/attention.eltwise_prod_scoring_split's neighbor term with
q = hm + v2).  XLA lowers the two-axis (N, A)-row gather from the
(T_nodes, 40, D) bank into a catastrophically slow loop of dynamic
slices (the flat (T*B) observe_lite recompute measured 26 ms at b2048
for the same reason), and materializes the (N, A, D) gathered tensor in
HBM before the dot.  This kernel DMAs each element's (40, D) node block
HBM->VMEM once, reduces it against q on the VPU, and selects the A
neighbor entries with the same one-hot trick as ops/pano_attention's
action kernel — the (N, A, D) tensor never exists, and HBM traffic is
one streaming read of N x 40 x D.

Backward (custom VJP): dq[n] = sum_a dl[n, a] * features[gnode, nbr_a]
is the mirror kernel — scatter dl into the 40 view slots, then reduce
the SAME node block against it.  The feature bank itself never receives
gradients (it is data, not parameters).

Reference semantics: tasks/R2R/model.py:329-352 (EltwiseProdScoring)
over tasks/R2R/env.py:60-66 action view features.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

A_ROWS = 16  # MAX_DEGREE=15 padded to the Mosaic sublane multiple


def _fwd_kernel(
    gnode_ref,  # (N,) int32 scalar prefetch (drives the DMA addressing)
    features_hbm,  # (T, 40, D) ANY/HBM
    nbr_ref,  # (BB, A) int32 VMEM — values only used VECTORIZED, so no
    #   SMEM scalar prefetch (a (N, A) prefetch is 1.25 MB at N=20480,
    #   over the 1 MB SMEM budget)
    q_ref,  # (BB, D) f32 VMEM
    out_ref,  # (BB, A) f32 VMEM
    feat_scratch,  # (BB, 40, D) VMEM
    sem,  # DMA semaphores (BB,)
    *,
    block_b: int,
):
    n0 = pl.program_id(0) * block_b
    for i in range(block_b):
        pltpu.make_async_copy(
            features_hbm.at[gnode_ref[n0 + i]], feat_scratch.at[i], sem.at[i]
        ).start()
    for i in range(block_b):
        pltpu.make_async_copy(
            features_hbm.at[gnode_ref[n0 + i]], feat_scratch.at[i], sem.at[i]
        ).wait()

    nviews = feat_scratch.shape[1]
    feat = feat_scratch[...].astype(jnp.float32)  # (BB, 40, D)
    # per-view dot with q: VPU multiply + reduce (Mosaic's dot_general
    # rejects the 1-D/batched forms this would need)
    v40 = (feat * q_ref[...][:, None, :]).sum(axis=-1)  # (BB, 40)

    # select the A neighbor views per element: one-hot built from VECTOR
    # comparisons (no scalar reads of nbr), reduced over the view lanes
    col = jax.lax.broadcasted_iota(jnp.int32, (block_b, A_ROWS, nviews), 2)
    onehot = (col == nbr_ref[...][:, :, None]).astype(jnp.float32)
    out_ref[...] = (onehot * v40[:, None, :]).sum(axis=-1)  # (BB, A)


def _bwd_kernel(
    gnode_ref,  # (N,) int32 scalar prefetch
    features_hbm,  # (T, 40, D) ANY/HBM
    nbr_ref,  # (BB, A) int32 VMEM
    dl_ref,  # (BB, A) f32 VMEM — upstream d(scores)
    dq_ref,  # (BB, D) f32 VMEM out
    feat_scratch,  # (BB, 40, D) VMEM
    sem,
    *,
    block_b: int,
):
    n0 = pl.program_id(0) * block_b
    for i in range(block_b):
        pltpu.make_async_copy(
            features_hbm.at[gnode_ref[n0 + i]], feat_scratch.at[i], sem.at[i]
        ).start()
    for i in range(block_b):
        pltpu.make_async_copy(
            features_hbm.at[gnode_ref[n0 + i]], feat_scratch.at[i], sem.at[i]
        ).wait()

    nviews = feat_scratch.shape[1]
    feat = feat_scratch[...].astype(jnp.float32)  # (BB, 40, D)
    # w[i, v] = sum_a dl[i, a] [nbr[i, a] == v]  (duplicate views
    # accumulate, matching the gather's linearity)
    col = jax.lax.broadcasted_iota(jnp.int32, (block_b, A_ROWS, nviews), 2)
    onehot = (col == nbr_ref[...][:, :, None]).astype(jnp.float32)
    w40 = (onehot * dl_ref[...][:, :, None]).sum(axis=1)  # (BB, 40)
    dq_ref[...] = (feat * w40[:, :, None]).sum(axis=1)  # (BB, D)


def _call(kernel, features, gnode, nbr, x, out_width, block_b, interpret):
    n = gnode.shape[0]
    d = features.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // block_b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # features stay in HBM
            pl.BlockSpec(
                (block_b, A_ROWS), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_b, x.shape[-1]), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_b, out_width), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, features.shape[1], d), features.dtype),
            pltpu.SemaphoreType.DMA((block_b,)),
        ],
    )
    return pl.pallas_call(
        partial(kernel, block_b=block_b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_width), jnp.float32),
        interpret=interpret,
    )(gnode, features, nbr, x)


def _pad_args(block_b, gnode, nbr_view, x):
    n = gnode.shape[0]
    pad = (-n) % block_b
    if pad:
        padb = lambda v: jnp.concatenate(  # noqa: E731
            [v, jnp.repeat(v[:1], pad, axis=0)], axis=0
        )
        return padb(gnode), padb(nbr_view), padb(x), n
    return gnode, nbr_view, x, n


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def bank_score(features, gnode, nbr_view, q, block_b=8, interpret=False):
    """scores[n, a] = features[gnode[n], nbr_view[n, a], :] . q[n, :].

    features: (T, V, D) bank (V=40 view-padded or 36); gnode: (N,) int32;
    nbr_view: (N, A_ROWS) int32 in [0, V) (clip pads); q: (N, D) f32.
    Returns (N, A_ROWS) f32.  Differentiable in q only (the bank is data).
    """
    return _bank_score_impl(features, gnode, nbr_view, q, block_b, interpret)


def _bank_score_impl(features, gnode, nbr_view, q, block_b, interpret):
    gnode, nbr_view, q, n = _pad_args(
        block_b, gnode.astype(jnp.int32),
        jnp.clip(nbr_view.astype(jnp.int32), 0, features.shape[1] - 1),
        q.astype(jnp.float32),
    )
    out = _call(
        _fwd_kernel, features, gnode, nbr_view, q, A_ROWS, block_b, interpret
    )
    return out[:n]


def _bs_fwd(features, gnode, nbr_view, q, block_b, interpret):
    out = _bank_score_impl(features, gnode, nbr_view, q, block_b, interpret)
    return out, (features, gnode, nbr_view)


def _bs_bwd(block_b, interpret, res, dl):
    features, gnode, nbr_view = res
    gnode_p, nbr_p, dl_p, n = _pad_args(
        block_b, gnode.astype(jnp.int32),
        jnp.clip(nbr_view.astype(jnp.int32), 0, features.shape[1] - 1),
        dl.astype(jnp.float32),
    )
    dq = _call(
        _bwd_kernel, features, gnode_p, nbr_p, dl_p,
        features.shape[-1], block_b, interpret,
    )
    return None, None, None, dq[:n]


bank_score.defvjp(_bs_fwd, _bs_bwd)


def bank_score_reference(features, gnode, nbr_view, q):
    """XLA oracle for tests."""
    nbrv = jnp.clip(nbr_view.astype(jnp.int32), 0, features.shape[1] - 1)
    af = features[gnode[:, None], nbrv].astype(jnp.float32)  # (N, A, D)
    return jnp.einsum("nad,nd->na", af, q.astype(jnp.float32))
