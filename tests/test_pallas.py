"""Pallas kernel tests (interpret mode on CPU): the fused pano-attention
kernel must match the pure-XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_follower_tpu.ops.pano_attention import (
    fused_pano_attention,
    pad_views_for_pallas,
    pano_attention_reference,
)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_reference(dtype):
    rng = np.random.RandomState(0)
    t, d, b = 50, 256, 16
    features = pad_views_for_pallas(
        jnp.asarray(rng.randn(t, 36, d).astype(np.float32), dtype)
    )
    loc_table = jnp.asarray(rng.randn(36, 36, 128).astype(np.float32))
    gnode = jnp.asarray(rng.randint(t, size=b).astype(np.int32))
    view_index = jnp.asarray(rng.randint(36, size=b).astype(np.int32))
    v_feat = jnp.asarray(rng.randn(b, d).astype(np.float32) * 0.1)
    v_loc = jnp.asarray(rng.randn(b, 128).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(b).astype(np.float32))

    w_ref, a_ref = pano_attention_reference(
        features, loc_table, gnode, view_index, v_feat, v_loc, bias
    )
    w_k, a_k = fused_pano_attention(
        features, loc_table, gnode, view_index, v_feat, v_loc, bias,
        block_b=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_ref), atol=1e-4)


def test_fused_rejects_unaligned_batch():
    features = pad_views_for_pallas(jnp.zeros((4, 36, 64)))
    loc_table = jnp.zeros((36, 36, 128))
    with pytest.raises(AssertionError):
        fused_pano_attention(
            features, loc_table,
            jnp.zeros(7, jnp.int32), jnp.zeros(7, jnp.int32),
            jnp.zeros((7, 64)), jnp.zeros((7, 128)), jnp.zeros(7),
            block_b=8, interpret=True,
        )
