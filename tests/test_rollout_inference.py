"""Inference-mode rollout == training-path rollout, trajectory for
trajectory.

``rollout(inference=True)`` is the production decode configuration: no
loss/CE bookkeeping in the scan, no time-batched tail afterwards, fused
in-scan tail for argmax/sample under use_pallas WITHOUT factored_loss.
Selection semantics must be bit-identical to the training-path rollout
at the same feedback and rng (reference greedy decode:
tasks/R2R/follower.py:430-539 with train=False)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speaker_follower_tpu.agents import rollout as ra
from speaker_follower_tpu.data.dataset import R2RDataset, encode_batch
from speaker_follower_tpu.data.features import random_feature_bank
from speaker_follower_tpu.data.graph import load_graph_bank
from speaker_follower_tpu.data.text import Tokenizer, read_vocab
from speaker_follower_tpu.env import vecenv
from speaker_follower_tpu.models.follower import init_follower

CONN = "/root/reference/connectivity"
DATA = "/root/reference/tasks/R2R/data"
FEAT = 64


@pytest.fixture(scope="module")
def world():
    vocab = read_vocab(f"{DATA}/sub_train_vocab.txt")
    ds = R2RDataset(
        ["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab), batch_size=6, seed=3
    )
    keep = sorted(ds.scans)[:2]
    ds.data = [d for d in ds.data if d["scan"] in keep]
    bank = load_graph_bank(keep, CONN)
    feats = random_feature_bank(bank, dim=FEAT, seed=0)
    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT + 128,
        feature_size=FEAT + 128,
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in encode_batch(ds.next_minibatch(), bank).items()
        if k in ("scan", "start_node", "goal_node", "heading", "seq",
                 "seq_mask", "seq_length")
    }
    return bank, feats, params, batch


def _run(tables, params, batch, **kw):
    kw.setdefault("episode_len", 10)
    kw.setdefault("deterministic", True)
    kw.setdefault("use_glove", False)
    return ra.rollout(params, tables, batch, jax.random.PRNGKey(7), **kw)


@pytest.mark.parametrize("feedback", ["argmax", "sample"])
def test_inference_matches_training_path(world, feedback):
    bank, feats, params, batch = world
    tables = vecenv.make_env_tables(bank, feats)
    base = _run(tables, params, batch, feedback=feedback)
    inf = _run(tables, params, batch, feedback=feedback, inference=True)
    np.testing.assert_array_equal(np.asarray(base.actions), np.asarray(inf.actions))
    np.testing.assert_array_equal(np.asarray(base.nodes), np.asarray(inf.nodes))
    np.testing.assert_array_equal(np.asarray(base.active), np.asarray(inf.active))
    np.testing.assert_allclose(
        np.asarray(base.action_scores), np.asarray(inf.action_scores),
        rtol=2e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(base.score), np.asarray(inf.score), rtol=2e-5, atol=1e-6
    )
    # no loss, no teacher targets in inference mode
    assert float(inf.loss) == 0.0
    assert np.all(np.asarray(inf.teacher) == -1)


def test_inference_fused_tail_interpret(world):
    """The fused in-scan tail kernel (interpret mode) engages at inference
    without factored_loss and reproduces the plain-XLA decode."""
    bank, feats, params, batch = world
    tables = vecenv.make_env_tables(bank, feats)
    tables_p = vecenv.make_env_tables(bank, feats, pad_views=True)
    base = _run(tables, params, batch, feedback="argmax", inference=True)
    fused = _run(
        tables_p, params, batch, feedback="argmax", inference=True,
        use_pallas=True, pallas_interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(base.actions), np.asarray(fused.actions)
    )
    np.testing.assert_array_equal(np.asarray(base.nodes), np.asarray(fused.nodes))
    np.testing.assert_allclose(
        np.asarray(base.score), np.asarray(fused.score), rtol=2e-4, atol=1e-5
    )


def test_inference_rejects_invalid_modes(world):
    bank, feats, params, batch = world
    tables = vecenv.make_env_tables(bank, feats)
    with pytest.raises(ValueError, match="inference=True"):
        _run(tables, params, batch, feedback="teacher", inference=True)
    with pytest.raises(ValueError, match="inference=True"):
        b = dict(batch)
        b["forced_actions"] = jnp.zeros((6, 10), jnp.int32)
        b["forced_len"] = jnp.ones((6,), jnp.int32)
        _run(tables, params, b, feedback="argmax", inference=True, forced=True)
