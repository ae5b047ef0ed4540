"""Checkpoint conversion: synthetic torch state_dicts with the reference's
key layout must map onto working param pytrees."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from speaker_follower_tpu.training.checkpoint import (
    convert_torch_follower,
    convert_torch_speaker,
    export_reference_style,
    import_reference_style,
)

V, E, H, A, F = 40, 12, 16, 140, 140  # vocab, word emb, hidden, action, feature


def _t(*shape):
    return torch.randn(*shape)


def _follower_state_dicts():
    enc = {
        "embedding.weight": _t(V, E),
        "lstm.weight_ih_l0": _t(4 * H, E),
        "lstm.weight_hh_l0": _t(4 * H, H),
        "lstm.bias_ih_l0": _t(4 * H),
        "lstm.bias_hh_l0": _t(4 * H),
        "encoder2decoder.weight": _t(H, H),
        "encoder2decoder.bias": _t(H),
    }
    dec = {
        "lstm.weight_ih": _t(4 * H, A + F),
        "lstm.weight_hh": _t(4 * H, H),
        "lstm.bias_ih": _t(4 * H),
        "lstm.bias_hh": _t(4 * H),
        "visual_attention_layer.linear_in_h.weight": _t(256, H),
        "visual_attention_layer.linear_in_h.bias": _t(256),
        "visual_attention_layer.linear_in_v.weight": _t(256, F),
        "visual_attention_layer.linear_in_v.bias": _t(256),
        "text_attention_layer.linear_in.weight": _t(H, H),
        "text_attention_layer.linear_out.weight": _t(H, 2 * H),
        "decoder2action.linear_in_h.weight": _t(256, H),
        "decoder2action.linear_in_h.bias": _t(256),
        "decoder2action.linear_in_a.weight": _t(256, A),
        "decoder2action.linear_in_a.bias": _t(256),
        "decoder2action.linear_out.weight": _t(1, 256),
        "decoder2action.linear_out.bias": _t(1),
    }
    return enc, dec


def test_follower_conversion_runs_model(tmp_path):
    enc, dec = _follower_state_dicts()
    enc_p, dec_p = str(tmp_path / "f_enc"), str(tmp_path / "f_dec")
    torch.save(enc, enc_p)
    torch.save(dec, dec_p)
    params = convert_torch_follower(enc_p, dec_p)

    from speaker_follower_tpu.models import follower as fm

    seq = jnp.array([[5, 6, 7, 0], [8, 9, 0, 0]], jnp.int32)
    ctx, h0, c0 = fm.encoder_apply(params["encoder"], seq, jnp.array([3, 2]))
    assert ctx.shape == (2, 4, H)
    h1, c1, alpha, logit, alpha_v = fm.decoder_step(
        params["decoder"],
        jnp.zeros((2, A)),
        jnp.zeros((2, 5, A)),
        jnp.zeros((2, 36, F)),
        h0, c0, ctx,
    )
    assert logit.shape == (2, 5)


def test_speaker_conversion_runs_model(tmp_path):
    enc = {
        "visual_attention_layer.linear_in_h.weight": _t(256, H),
        "visual_attention_layer.linear_in_h.bias": _t(256),
        "visual_attention_layer.linear_in_v.weight": _t(256, F),
        "visual_attention_layer.linear_in_v.bias": _t(256),
        "lstm.weight_ih": _t(4 * H, A + F),
        "lstm.weight_hh": _t(4 * H, H),
        "lstm.bias_ih": _t(4 * H),
        "lstm.bias_hh": _t(4 * H),
        "encoder2decoder.weight": _t(H, H),
        "encoder2decoder.bias": _t(H),
    }
    dec = {
        "embedding.weight": _t(V, E),
        "lstm.weight_ih": _t(4 * H, E),
        "lstm.weight_hh": _t(4 * H, H),
        "lstm.bias_ih": _t(4 * H),
        "lstm.bias_hh": _t(4 * H),
        "attention_layer.linear_in.weight": _t(H, H),
        "attention_layer.linear_out.weight": _t(H, 2 * H),
        "decoder2action.weight": _t(V, H),
        "decoder2action.bias": _t(V),
    }
    enc_p, dec_p = str(tmp_path / "s_enc"), str(tmp_path / "s_dec")
    torch.save(enc, enc_p)
    torch.save(dec, dec_p)
    params = convert_torch_speaker(enc_p, dec_p)

    from speaker_follower_tpu.models import speaker as sm

    ctx, h0, c0 = sm.speaker_encoder_apply(
        params["encoder"], jnp.zeros((2, 4, A)), jnp.zeros((2, 4, 36, F))
    )
    h1, c1, alpha, logit = sm.speaker_decoder_step(
        params["decoder"], jnp.array([3, 3]), h0, c0, ctx
    )
    assert logit.shape == (2, V)


def test_reference_style_two_file_roundtrip(tmp_path):
    params = {
        "encoder": {"w": np.arange(6.0).reshape(2, 3)},
        "decoder": {"b": np.ones((4,))},
    }
    prefix = str(tmp_path / "model")
    export_reference_style(prefix, params)
    back = import_reference_style(prefix)
    np.testing.assert_array_equal(back["encoder"]["w"], params["encoder"]["w"])
    np.testing.assert_array_equal(back["decoder"]["b"], params["decoder"]["b"])
