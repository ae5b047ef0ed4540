"""Parity tests for the fused Pallas LSTM scan (ops/lstm.py) against the
XLA oracle (models/core.masked_lstm_scan) — values and gradients, forward
and reverse directions, padded batches, on CPU interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_follower_tpu.models.core import lstm_cell_init, masked_lstm_scan
from speaker_follower_tpu.ops.lstm import masked_lstm_scan_pallas

B, L, D, H = 8, 7, 24, 16


@pytest.fixture(scope="module")
def problem():
    key = jax.random.PRNGKey(0)
    kp, kx, kl = jax.random.split(key, 3)
    p = lstm_cell_init(kp, D, H)
    xs = jax.random.normal(kx, (B, L, D))
    lengths = jax.random.randint(kl, (B,), 1, L + 1)
    lengths = lengths.at[0].set(L)  # include a full-length row
    lengths = lengths.at[1].set(1)  # and a minimal one
    h0 = jnp.zeros((B, H))
    c0 = jnp.zeros((B, H))
    return p, xs, lengths, h0, c0


@pytest.mark.parametrize("reverse", [False, True])
def test_forward_parity(problem, reverse):
    p, xs, lengths, h0, c0 = problem
    out_ref, (hf_ref, cf_ref) = masked_lstm_scan(
        p, xs, lengths, h0, c0, reverse=reverse
    )
    out, (hf, cf) = masked_lstm_scan_pallas(
        p, xs, lengths, h0, c0, reverse=reverse, block_b=8, interpret=True
    )
    np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(hf, hf_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cf, cf_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("reverse", [False, True])
def test_gradient_parity(problem, reverse):
    """Grads w.r.t. every LSTM param, the inputs, and the initial state
    match the XLA scan's autodiff (same loss on out, h_f and c_f)."""
    p, xs, lengths, h0, c0 = problem
    wo = jax.random.normal(jax.random.PRNGKey(9), (L, H))

    def loss(fn, p, xs, h0, c0):
        out, (hf, cf) = fn(p, xs, lengths, h0, c0)
        return (
            jnp.sum(out * wo[None]) + 2.0 * jnp.sum(hf) + jnp.sum(cf**2)
        )

    def pallas_fn(p, xs, lengths, h0, c0):
        return masked_lstm_scan_pallas(
            p, xs, lengths, h0, c0, reverse=reverse, block_b=8,
            interpret=True,
        )

    def ref_fn(p, xs, lengths, h0, c0):
        return masked_lstm_scan(p, xs, lengths, h0, c0, reverse=reverse)

    g_ref = jax.grad(lambda *a: loss(ref_fn, *a), argnums=(0, 1, 2, 3))(
        p, xs, h0, c0
    )
    g_pal = jax.grad(lambda *a: loss(pallas_fn, *a), argnums=(0, 1, 2, 3))(
        p, xs, h0, c0
    )
    flat_ref, tree_ref = jax.tree.flatten(g_ref)
    flat_pal, tree_pal = jax.tree.flatten(g_pal)
    assert tree_ref == tree_pal
    for a, b in zip(flat_pal, flat_ref):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_unpadded_batch_and_default_block(problem):
    """Batch not a multiple of block_b: rows are zero-padded internally and
    results sliced back; default block picks min(128, round_up(b, 8))."""
    p, xs, lengths, h0, c0 = problem
    n = 5  # not a multiple of 8
    out_ref, (hf_ref, _) = masked_lstm_scan(
        p, xs[:n], lengths[:n], h0[:n], c0[:n]
    )
    out, (hf, _) = masked_lstm_scan_pallas(
        p, xs[:n], lengths[:n], h0[:n], c0[:n], interpret=True
    )
    assert out.shape == (n, L, H)
    np.testing.assert_allclose(out, out_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(hf, hf_ref, rtol=1e-5, atol=1e-6)


def test_bfloat16_forward_close_to_f32(problem):
    """--bfloat16_compute + --pallas: the kernel must accept bf16 inputs
    (f32 math inside, bf16 storage) and stay close to the f32 oracle."""
    p, xs, lengths, h0, c0 = problem
    to_bf16 = lambda t: jax.tree.map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16), t
    )
    out_ref, (hf_ref, cf_ref) = masked_lstm_scan(p, xs, lengths, h0, c0)
    out, (hf, cf) = masked_lstm_scan_pallas(
        to_bf16(p), to_bf16(xs), lengths, to_bf16(h0), to_bf16(c0),
        block_b=8, interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        out.astype(jnp.float32), out_ref, rtol=0.05, atol=0.05
    )
    np.testing.assert_allclose(
        hf.astype(jnp.float32), hf_ref, rtol=0.05, atol=0.05
    )

    # grads exist and are finite in bf16
    def loss(p_, xs_):
        o, (hf_, cf_) = masked_lstm_scan_pallas(
            p_, xs_, lengths, to_bf16(h0), to_bf16(c0), block_b=8,
            interpret=True,
        )
        return (
            o.astype(jnp.float32).sum()
            + hf_.astype(jnp.float32).sum()
            + cf_.astype(jnp.float32).sum()
        )

    g = jax.grad(loss, argnums=(0, 1))(to_bf16(p), to_bf16(xs))
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf, np.float32)).all()
