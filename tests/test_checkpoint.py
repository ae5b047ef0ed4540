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


class TestNpzFormat:
    """The data-only checkpoint format (ADVICE r1: pickle executes
    arbitrary code on load)."""

    def _state(self):
        import optax

        from speaker_follower_tpu.training.optim import adam_with_torch_wd

        params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
        tx = adam_with_torch_wd(1e-3)
        opt_state = tx.init(params)
        import random

        r = random.Random(7)
        return tx, params, {
            "params": params,
            "opt_state": opt_state,
            "rng": jax.random.PRNGKey(0),
            "iteration": 17,
            "data_log": {"loss": [1.0, 0.5], "split": ["a", "b"]},
            "dataset_state": {"ix": 3, "order": ["x_0", "y_1"],
                              "rng_state": r.getstate()},
        }

    def test_roundtrip_and_no_pickle(self, tmp_path):
        from speaker_follower_tpu.training import checkpoint as ckpt

        tx, params, state = self._state()
        path = str(tmp_path / "ck")
        ckpt.save_state(path, state)
        # the file must be a zip (npz), not a pickle
        with open(path, "rb") as f:
            assert f.read(2) == b"PK"
        loaded = ckpt.load_state(path)
        assert loaded["iteration"] == 17
        assert loaded["data_log"]["split"] == ["a", "b"]
        np.testing.assert_array_equal(loaded["params"]["w"], np.asarray(state["params"]["w"]))
        # python-random state survives (nested tuples of ints)
        import random

        r2 = random.Random()
        r2.setstate(loaded["dataset_state"]["rng_state"])
        r_ref = random.Random(7)
        assert r2.random() == r_ref.random()
        # namedtuple optax state comes back as plain tuples; restructure
        rebuilt = ckpt.restructure_like(tx.init(params), loaded["opt_state"])
        assert type(rebuilt) is type(state["opt_state"])
        for a, b in zip(jax.tree_util.tree_leaves(rebuilt),
                        jax.tree_util.tree_leaves(state["opt_state"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_legacy_pickle_still_loads(self, tmp_path):
        import pickle

        from speaker_follower_tpu.training import checkpoint as ckpt

        path = str(tmp_path / "legacy")
        with open(path, "wb") as f:
            pickle.dump({"params": {"w": np.ones(3)}}, f)
        loaded = ckpt.load_state(path)
        np.testing.assert_array_equal(loaded["params"]["w"], np.ones(3))

    @pytest.mark.slow
    def test_trainer_resume_roundtrip_npz(self, tmp_path):
        """Full trainer save -> load through the npz path continues
        training with identical state (incl. restructured opt_state)."""
        from speaker_follower_tpu.data.dataset import R2RDataset
        from speaker_follower_tpu.data.features import random_feature_bank
        from speaker_follower_tpu.data.graph import load_graph_bank
        from speaker_follower_tpu.data.text import Tokenizer, read_vocab
        from speaker_follower_tpu.env import vecenv
        from speaker_follower_tpu.models.follower import init_follower
        from speaker_follower_tpu.training.trainer import FollowerTrainer, TrainConfig

        vocab = read_vocab("/root/reference/tasks/R2R/data/sub_train_vocab.txt")
        ds = R2RDataset(["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab),
                        batch_size=4, seed=3)
        keep = sorted(ds.scans)[:1]
        ds.data = [d for d in ds.data if d["scan"] in keep]
        bank = load_graph_bank(keep, "/root/reference/connectivity")
        tables = vecenv.make_env_tables(bank, random_feature_bank(bank, dim=8, seed=0))
        params = init_follower(
            jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=8,
            hidden_size=16, action_embedding_size=8 + 128, feature_size=8 + 128,
        )
        cfg = TrainConfig(learning_rate=1e-3, feedback="teacher",
                          use_glove=False, no_save=True)
        tr = FollowerTrainer(params, tables, ds, bank, cfg)
        tr.train_interval(2)
        path = str(tmp_path / "resume_ck")
        tr.save_training_state(path, iteration=2)

        import copy

        tr2 = FollowerTrainer(params, tables, copy.deepcopy(ds), bank, cfg)
        it = tr2.load_training_state(path)
        assert it == 2
        a = tr.train_interval(1)
        b = tr2.train_interval(1)
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_convert_cli_script(tmp_path, monkeypatch):
    """scripts/convert_torch_checkpoint.py: torch pair -> loadable npz."""
    import os
    import runpy
    import sys

    from speaker_follower_tpu.training.checkpoint import load_params

    enc, dec = _follower_state_dicts()
    enc_p, dec_p = str(tmp_path / "f_enc"), str(tmp_path / "f_dec")
    torch.save(enc, enc_p)
    torch.save(dec, dec_p)
    out = str(tmp_path / "follower.npz")
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "convert_torch_checkpoint.py",
    )
    monkeypatch.setattr(sys, "argv", [script, "follower", enc_p, dec_p, out])
    runpy.run_path(script, run_name="__main__")
    params = load_params(out)
    assert "encoder" in params and "decoder" in params
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["lstm"]["w_hh"]),
        dec["lstm.weight_hh"].numpy(), atol=1e-6,
    )


def test_torch_export_convert_roundtrip(tmp_path):
    """export_torch_* -> convert_torch_* must reproduce the exact pytree
    (the parity harness synthesizes release-format checkpoints this way,
    and users export trained models for the reference's load())."""
    import jax

    from speaker_follower_tpu.models.follower import init_follower
    from speaker_follower_tpu.models.speaker import init_speaker
    from speaker_follower_tpu.training import checkpoint as ckpt

    f = init_follower(jax.random.PRNGKey(0), vocab_size=50,
                      word_embedding_size=12, hidden_size=16,
                      action_embedding_size=24, feature_size=24,
                      bidirectional=True)
    ckpt.export_torch_follower(f, str(tmp_path / "f_enc"), str(tmp_path / "f_dec"))
    f2 = ckpt.convert_torch_follower(str(tmp_path / "f_enc"), str(tmp_path / "f_dec"))
    assert jax.tree_util.tree_structure(
        jax.tree.map(lambda x: None, f)
    ) == jax.tree_util.tree_structure(jax.tree.map(lambda x: None, f2))
    for a, b in zip(jax.tree.leaves(f), jax.tree.leaves(f2)):
        np.testing.assert_array_equal(np.asarray(a, np.float32), b)

    for feed in (False, True):
        s = init_speaker(jax.random.PRNGKey(1), vocab_size=50,
                         action_embedding_size=24, feature_size=24,
                         word_embedding_size=12, hidden_size=16,
                         use_input_att_feed=feed)
        ckpt.export_torch_speaker(s, str(tmp_path / "s_enc"),
                                  str(tmp_path / "s_dec"),
                                  use_input_att_feed=feed)
        s2 = ckpt.convert_torch_speaker(str(tmp_path / "s_enc"),
                                        str(tmp_path / "s_dec"),
                                        use_input_att_feed=feed)
        for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(s2)):
            np.testing.assert_array_equal(np.asarray(a, np.float32), b)
