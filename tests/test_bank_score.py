"""ops/bank_score kernel == XLA gather-dot oracle, values and grads."""

import numpy as np
import jax
import jax.numpy as jnp

from speaker_follower_tpu.ops.bank_score import (
    A_ROWS,
    bank_score,
    bank_score_reference,
)


def _mk(n=13, t_nodes=9, v=40, d=256, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    features = jax.random.normal(k1, (t_nodes, v, d), jnp.float32)
    gnode = jax.random.randint(k2, (n,), 0, t_nodes)
    nbr = jax.random.randint(k3, (n, A_ROWS), 0, 36)
    q = jax.random.normal(k4, (n, d), jnp.float32)
    return features, gnode, nbr, q


def test_bank_score_matches_reference():
    features, gnode, nbr, q = _mk()
    out = bank_score(features, gnode, nbr, q, 8, True)
    ref = bank_score_reference(features, gnode, nbr, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-4)


def test_bank_score_bf16_bank():
    features, gnode, nbr, q = _mk(d=128)
    features = features.astype(jnp.bfloat16)
    out = bank_score(features, gnode, nbr, q, 8, True)
    ref = bank_score_reference(features, gnode, nbr, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-4)


def test_bank_score_duplicate_views_accumulate_in_grad():
    """nbr rows may repeat a view (pads clip to 0); dq must sum them."""
    features, gnode, nbr, q = _mk(n=8, d=128, seed=3)
    nbr = nbr.at[:, 1].set(nbr[:, 0])  # force duplicates

    def f(qq, impl):
        return jnp.sum(impl(features, gnode, nbr, qq) ** 2)

    g_kernel = jax.grad(lambda qq: f(qq, lambda *a: bank_score(*a, 8, True)))(q)
    g_ref = jax.grad(lambda qq: f(qq, bank_score_reference))(q)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-3)


def test_bank_score_grad_matches_reference():
    features, gnode, nbr, q = _mk(n=17, d=128, seed=1)  # 17: exercises padding
    dl = jax.random.normal(jax.random.PRNGKey(9), (17, A_ROWS), jnp.float32)

    def f(qq, impl):
        return jnp.sum(impl(features, gnode, nbr, qq) * dl)

    g_kernel = jax.grad(lambda qq: f(qq, lambda *a: bank_score(*a, 8, True)))(q)
    g_ref = jax.grad(lambda qq: f(qq, bank_score_reference))(q)
    np.testing.assert_allclose(np.asarray(g_kernel), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-3)
