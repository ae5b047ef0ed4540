"""Pallas TPU kernel: weights-resident multi-step LSTM scan.

The XLA `masked_lstm_scan` (models/core.py) runs L sequential scan steps;
each step is one small (B, H) x (H, 4H) recurrent matmul plus ~10
elementwise VPU ops whose intermediates round-trip HBM.  At h=512 the
per-step compute is ~20 us but the measured step cost is ~0.5 ms — the
encoder scan is sequential-small-op latency/HBM-bound, not FLOP-bound
(docs/ROUND2.md: encoder scan 38 ms at b1024).

This kernel fuses the ENTIRE time loop into one `pallas_call`:

  * grid = (B / block_b, L) — TPU grids run sequentially, so the hidden
    state lives in VMEM scratch and is carried across time steps of the
    same batch block; w_hh (4H x H, ~4 MB f32) is loaded into VMEM once
    and reused for all steps;
  * the input projection xg = x W_ih^T + b (the parallelizable part) is
    one big MXU matmul in XLA, outside the kernel; per step the kernel
    streams one (block_b, 4H) xg slice in and one (block_b, H) hidden
    slice out via the Pallas pipeline (double-buffered automatically);
  * arrays that are sliced per time step are laid out TIME-MAJOR
    (L, B, ...) so each block's trailing dims are the Mosaic-aligned
    (block_b, 4H/H/1) — a (B, L, ...) slice of one time step would have
    an unaligned sublane dim of 1;
  * HBM traffic per step drops from ~10 intermediate round-trips to the
    irreducible xg read + h/c write.

Training: `jax.custom_vjp` with a time-reversed backward kernel that
recomputes the gate activations from (xg, h_prev) instead of storing
them (saves a (B, L, 4H) residual — at b2048/L80 that is 1.3 GB).
dW_hh is reduced outside the kernel as one (4H, L*B) x (L*B, H) MXU
matmul over the kernel's d_gates output.

Workload: EncoderLSTM, reference model.py:43-104 (the follower
instruction encoder this replaces runs L=80 steps at h=512).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _split_gates(gates, hidden):
    """torch gate order i, f, g, o (models/core.py:65)."""
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden :])
    return i, f, g, o


# ---------------------------------------------------------------- forward


def _fwd_kernel(
    whh_ref,  # (4H, H) VMEM — resident across the whole grid
    xg_ref,  # (1, BB, 4H) VMEM — this step's input projection
    valid_ref,  # (1, BB, 1) VMEM f32 — 1.0 while t < length
    h0_ref,  # (BB, H) VMEM
    c0_ref,  # (BB, H) VMEM
    hseq_ref,  # out (1, BB, H) — post-step carry (NOT zero-masked)
    cseq_ref,  # out (1, BB, H)
    hf_ref,  # out (BB, H) — final carry
    cf_ref,  # out (BB, H)
    h_s,  # scratch (BB, H) f32
    c_s,  # scratch (BB, H) f32
):
    k = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        h_s[:] = h0_ref[:].astype(jnp.float32)
        c_s[:] = c0_ref[:].astype(jnp.float32)

    hidden = h_s.shape[-1]
    # recurrent matmul: (BB, H) x (4H, H)^T — contract last dims (MXU)
    gates = xg_ref[0].astype(jnp.float32) + jax.lax.dot_general(
        h_s[:],
        whh_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    i, f, g, o = _split_gates(gates, hidden)
    c1 = f * c_s[:] + i * g
    h1 = o * jnp.tanh(c1)
    v = valid_ref[0]  # (BB, 1), broadcasts over H
    h_new = v * h1 + (1.0 - v) * h_s[:]
    c_new = v * c1 + (1.0 - v) * c_s[:]
    h_s[:] = h_new
    c_s[:] = c_new
    hseq_ref[0] = h_new.astype(hseq_ref.dtype)
    cseq_ref[0] = c_new.astype(cseq_ref.dtype)

    @pl.when(k == n_t - 1)
    def _():
        hf_ref[:] = h_new.astype(hf_ref.dtype)
        cf_ref[:] = c_new.astype(cf_ref.dtype)


def _fwd_call(whh, xg, valid, h0, c0, reverse: bool, block_b: int,
              interpret: bool):
    l, b, g4 = xg.shape  # time-major
    hidden = g4 // 4
    nb = b // block_b
    dtype = xg.dtype

    if reverse:
        t_of = lambda k: l - 1 - k  # noqa: E731 — data index of step k
    else:
        t_of = lambda k: k  # noqa: E731

    return pl.pallas_call(
        _fwd_kernel,
        grid=(nb, l),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whh, whole array
            pl.BlockSpec((1, block_b, g4), lambda i, k: (t_of(k), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, 1), lambda i, k: (t_of(k), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hidden), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hidden), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_b, hidden), lambda i, k: (t_of(k), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, hidden), lambda i, k: (t_of(k), i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hidden), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hidden), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((l, b, hidden), dtype),
            jax.ShapeDtypeStruct((l, b, hidden), dtype),
            jax.ShapeDtypeStruct((b, hidden), dtype),
            jax.ShapeDtypeStruct((b, hidden), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, hidden), jnp.float32),
            pltpu.VMEM((block_b, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(whh, xg, valid, h0, c0)


# --------------------------------------------------------------- backward


def _bwd_kernel(
    whh_ref,  # (4H, H) VMEM
    xg_ref,  # (1, BB, 4H)
    valid_ref,  # (1, BB, 1) f32
    hprev_ref,  # (1, BB, H) — carry BEFORE this step (data-indexed)
    cprev_ref,  # (1, BB, H)
    dh_in_ref,  # (1, BB, H) — incoming d(h_seq[t])
    dhf_ref,  # (BB, H) — d(h_f)
    dcf_ref,  # (BB, H) — d(c_f)
    dxg_ref,  # out (1, BB, 4H) — d(gates) = d(xg[t])
    dh0_ref,  # out (BB, H)
    dc0_ref,  # out (BB, H)
    dh_s,  # scratch (BB, H) f32 — carry gradient
    dc_s,  # scratch (BB, H) f32
):
    j = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        dh_s[:] = dhf_ref[:].astype(jnp.float32)
        dc_s[:] = dcf_ref[:].astype(jnp.float32)

    hidden = dh_s.shape[-1]
    v = valid_ref[0]  # (BB, 1)

    dh_total = dh_s[:] + dh_in_ref[0].astype(jnp.float32)
    dc_total = dc_s[:]
    # valid step: grads flow through the gate math; masked step: the carry
    # was passed through unchanged, so grads pass straight to h/c_prev
    dh1 = v * dh_total
    dc1 = v * dc_total
    pass_h = (1.0 - v) * dh_total
    pass_c = (1.0 - v) * dc_total

    h_prev = hprev_ref[0].astype(jnp.float32)
    c_prev = cprev_ref[0].astype(jnp.float32)
    # recompute this step's gate activations (cheaper than storing them)
    gates = xg_ref[0].astype(jnp.float32) + jax.lax.dot_general(
        h_prev,
        whh_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    i, f, g, o = _split_gates(gates, hidden)
    c1 = f * c_prev + i * g
    tc1 = jnp.tanh(c1)

    do = dh1 * tc1
    dc1_tot = dc1 + dh1 * o * (1.0 - tc1 * tc1)
    dgates = jnp.concatenate(
        [
            (dc1_tot * g) * i * (1.0 - i),
            (dc1_tot * c_prev) * f * (1.0 - f),
            (dc1_tot * i) * (1.0 - g * g),
            do * o * (1.0 - o),
        ],
        axis=-1,
    )  # (BB, 4H)
    dxg_ref[0] = dgates.astype(dxg_ref.dtype)

    # d h_prev = dgates @ whh  ((BB, 4H) x (4H, H), MXU)
    dh_s[:] = pass_h + jax.lax.dot_general(
        dgates,
        whh_ref[:].astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dc_s[:] = pass_c + dc1_tot * f

    @pl.when(j == n_t - 1)
    def _():
        dh0_ref[:] = dh_s[:].astype(dh0_ref.dtype)
        dc0_ref[:] = dc_s[:].astype(dc0_ref.dtype)


def _bwd_call(whh, xg, valid, hprev_seq, cprev_seq, dh_seq, dhf, dcf,
              reverse: bool, block_b: int, interpret: bool):
    l, b, g4 = xg.shape  # time-major
    hidden = g4 // 4
    nb = b // block_b
    dtype = xg.dtype

    # backward processes steps in reverse of the forward processing order;
    # grid step j handles forward step k = L-1-j, i.e. data index:
    if reverse:
        t_of = lambda j: j  # noqa: E731
    else:
        t_of = lambda j: l - 1 - j  # noqa: E731

    seq_spec = lambda width: pl.BlockSpec(  # noqa: E731
        (1, block_b, width), lambda i, j: (t_of(j), i, 0),
        memory_space=pltpu.VMEM,
    )
    vec_spec = pl.BlockSpec((block_b, hidden), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(nb, l),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whh
            seq_spec(g4),  # xg
            seq_spec(1),  # valid
            seq_spec(hidden),  # hprev
            seq_spec(hidden),  # cprev
            seq_spec(hidden),  # dh_in
            vec_spec,  # dhf
            vec_spec,  # dcf
        ],
        out_specs=[seq_spec(g4), vec_spec, vec_spec],
        out_shape=[
            jax.ShapeDtypeStruct((l, b, g4), dtype),
            jax.ShapeDtypeStruct((b, hidden), dtype),
            jax.ShapeDtypeStruct((b, hidden), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, hidden), jnp.float32),
            pltpu.VMEM((block_b, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(whh, xg, valid, hprev_seq, cprev_seq, dh_seq, dhf, dcf)


# --------------------------------------------------- differentiable core


def _prev_seq(seq, x0, reverse: bool):
    """Carry value BEFORE the step at each data index t (time-major):
    forward scans use seq[t-1] (x0 at t=0); reverse scans use seq[t+1]
    (x0 at t=L-1)."""
    if reverse:
        return jnp.concatenate([seq[1:], x0[None]], axis=0)
    return jnp.concatenate([x0[None], seq[:-1]], axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _lstm_core(whh, xg, valid, h0, c0, reverse, block_b, interpret):
    h_seq, c_seq, h_f, c_f = _fwd_call(
        whh, xg, valid, h0, c0, reverse, block_b, interpret
    )
    return h_seq, h_f, c_f


def _lstm_core_fwd(whh, xg, valid, h0, c0, reverse, block_b, interpret):
    h_seq, c_seq, h_f, c_f = _fwd_call(
        whh, xg, valid, h0, c0, reverse, block_b, interpret
    )
    return (h_seq, h_f, c_f), (whh, xg, valid, h0, c0, h_seq, c_seq)


def _lstm_core_bwd(reverse, block_b, interpret, res, grads):
    whh, xg, valid, h0, c0, h_seq, c_seq = res
    dh_seq, dhf, dcf = grads
    hprev_seq = _prev_seq(h_seq, h0, reverse)
    cprev_seq = _prev_seq(c_seq, c0, reverse)
    d_xg, d_h0, d_c0 = _bwd_call(
        whh, xg, valid, hprev_seq, cprev_seq, dh_seq, dhf, dcf,
        reverse, block_b, interpret,
    )
    # gates[t,b,g] = xg[t,b,g] + sum_h hprev[t,b,h] whh[g,h]
    # -> dW_hh = sum_{t,b} dgates (x) hprev: ONE (4H, L*B) x (L*B, H) matmul
    d_whh = jnp.einsum(
        "tbg,tbh->gh",
        d_xg.astype(jnp.float32),
        hprev_seq.astype(jnp.float32),
    ).astype(whh.dtype)
    return d_whh, d_xg, None, d_h0, d_c0


_lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


# ----------------------------------------------------------- public entry


def masked_lstm_scan_pallas(
    p,
    xs,  # (B, L, D)
    lengths,  # (B,) int
    h0,
    c0,
    reverse: bool = False,
    *,
    block_b: int | None = None,
    interpret: bool = False,
):
    """Drop-in for models.core.masked_lstm_scan backed by the fused Pallas
    scan: returns (out (B, L, H) zero-masked at padding, (h_f, c_f)).

    Semantics (torch pack_padded_sequence emulation) match
    models/core.py:101-129; parity is asserted by tests/test_ops_lstm.py.
    Batches are zero-padded up to a multiple of ``block_b`` (padded rows
    have valid=0 everywhere, so they pass (h0, c0)=(0, 0) through and are
    sliced off).  Internally everything runs time-major; the input
    projection matmul emits (L, B, 4H) directly so only the final ctx
    transposes back.
    """
    b, l, _ = xs.shape
    if block_b is None:
        block_b = min(128, _round_up(b, 8))
    bp = _round_up(b, block_b)

    xst = jnp.swapaxes(xs, 0, 1)  # (L, B, D) — cheap: D << 4H
    xg = xst @ p["w_ih"].T + p["b_ih"] + p["b_hh"]  # (L, B, 4H), one matmul
    valid = (
        jnp.arange(l)[:, None] < lengths[None, :]
    ).astype(xg.dtype)[..., None]  # (L, B, 1)

    pad = bp - b
    if pad:
        xg = jnp.pad(xg, ((0, 0), (0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
        c0 = jnp.pad(c0, ((0, pad), (0, 0)))

    h_seq, h_f, c_f = _lstm_core(
        p["w_hh"].astype(xg.dtype), xg, valid, h0, c0,
        reverse, block_b, interpret,
    )
    out = jnp.swapaxes(valid * h_seq, 0, 1)  # (B, L, H), zero at padding
    if pad:
        out, h_f, c_f = out[:b], h_f[:b], c_f[:b]
    return out, (h_f, c_f)
