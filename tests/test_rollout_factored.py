"""Factored (time-batched tail) rollout loss == in-scan loss, exactly.

The factored path moves text attention + scoring + CE out of the scan
(agents/rollout._factored_tail).  Gradients flow only through h1_seq back
into the sequential chain; the loss must equal the unfactored rollout —
including under dropout, because the tail reuses the scan's per-step keys
(models/follower.h1_dropout_key)."""

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
    tables = vecenv.make_env_tables(bank, feats)
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
    return tables, params, batch


def _run(tables, params, batch, *, factored, feedback, deterministic,
         forced_batch=None, use_glove=False):
    b = dict(batch)
    kwargs = {}
    if forced_batch is not None:
        b.update(forced_batch)
        kwargs["forced"] = True
    return ra.rollout(
        params, tables, b, jax.random.PRNGKey(7), feedback=feedback,
        episode_len=10, deterministic=deterministic, use_glove=use_glove,
        factored_loss=factored, **kwargs,
    )


@pytest.mark.parametrize("feedback", ["teacher", "sample", "argmax"])
def test_factored_matches_unfactored_deterministic(world, feedback):
    tables, params, batch = world
    base = _run(tables, params, batch, factored=False, feedback=feedback,
                deterministic=True)
    fac = _run(tables, params, batch, factored=True, feedback=feedback,
               deterministic=True)
    np.testing.assert_array_equal(np.asarray(base.actions), np.asarray(fac.actions))
    np.testing.assert_array_equal(np.asarray(base.active), np.asarray(fac.active))
    np.testing.assert_allclose(
        float(base.loss), float(fac.loss), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(base.action_scores), np.asarray(fac.action_scores),
        rtol=2e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(base.score), np.asarray(fac.score), rtol=2e-4, atol=1e-5
    )


def test_factored_matches_under_dropout(world):
    """Same rng => same dropout masks in scan and tail => same loss."""
    tables, params, batch = world
    base = _run(tables, params, batch, factored=False, feedback="sample",
                deterministic=False)
    fac = _run(tables, params, batch, factored=True, feedback="sample",
               deterministic=False)
    np.testing.assert_array_equal(np.asarray(base.actions), np.asarray(fac.actions))
    np.testing.assert_allclose(
        float(base.loss), float(fac.loss), rtol=2e-5, atol=2e-6
    )


def test_factored_forced_scoring(world):
    """Forced-replay scoring (the rescoring API) through the factored tail."""
    tables, params, batch = world
    gold = _run(tables, params, batch, factored=False, feedback="teacher",
                deterministic=True)
    forced_batch = {
        "forced_actions": gold.actions,
        "forced_len": gold.active.sum(axis=1).astype(jnp.int32),
    }
    base = _run(tables, params, batch, factored=False, feedback="teacher",
                deterministic=True, forced_batch=forced_batch)
    fac = _run(tables, params, batch, factored=True, feedback="teacher",
               deterministic=True, forced_batch=forced_batch)
    np.testing.assert_allclose(
        float(base.loss), float(fac.loss), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(base.score), np.asarray(fac.score), rtol=2e-4, atol=1e-5
    )


def test_factored_pallas_matches_xla(world):
    """Factored rollout on the Pallas path (fused action kernel in the
    scan + bank-score kernel in the tail, both interpret mode) == the
    factored XLA path: same loss, actions, scores."""
    tables, params, batch = world
    from speaker_follower_tpu.data.features import random_feature_bank
    from speaker_follower_tpu.data.graph import load_graph_bank
    from speaker_follower_tpu.data.text import Tokenizer, read_vocab
    from speaker_follower_tpu.data.dataset import R2RDataset

    # view-padded tables over the same world
    vocab = read_vocab(f"{DATA}/sub_train_vocab.txt")
    ds = R2RDataset(
        ["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab), batch_size=6, seed=3
    )
    keep = sorted(ds.scans)[:2]
    bank = load_graph_bank(keep, CONN)
    feats = random_feature_bank(bank, dim=FEAT, seed=0)
    tables_p = vecenv.make_env_tables(bank, feats, pad_views=True)

    def run(tp, use_pallas):
        return ra.rollout(
            params, tp, batch, jax.random.PRNGKey(7), feedback="teacher",
            episode_len=10, deterministic=True, use_glove=False,
            factored_loss=True, use_pallas=use_pallas,
            pallas_interpret=use_pallas,
        )

    base = run(tables, False)
    pal = run(tables_p, True)
    np.testing.assert_array_equal(np.asarray(base.actions), np.asarray(pal.actions))
    np.testing.assert_allclose(float(base.loss), float(pal.loss), rtol=2e-5,
                               atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(base.action_scores), np.asarray(pal.action_scores),
        rtol=2e-4, atol=1e-5,
    )


@pytest.mark.slow
def test_factored_pallas_grads_match_xla(world):
    tables, params, batch = world
    from speaker_follower_tpu.data.features import random_feature_bank
    from speaker_follower_tpu.data.graph import load_graph_bank
    from speaker_follower_tpu.data.text import Tokenizer, read_vocab
    from speaker_follower_tpu.data.dataset import R2RDataset

    vocab = read_vocab(f"{DATA}/sub_train_vocab.txt")
    ds = R2RDataset(
        ["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab), batch_size=6, seed=3
    )
    keep = sorted(ds.scans)[:2]
    bank = load_graph_bank(keep, CONN)
    feats = random_feature_bank(bank, dim=FEAT, seed=0)
    tables_p = vecenv.make_env_tables(bank, feats, pad_views=True)

    def loss_fn(p, tp, use_pallas):
        return ra.rollout(
            p, tp, batch, jax.random.PRNGKey(7), feedback="teacher",
            episode_len=10, deterministic=False, use_glove=False,
            factored_loss=True, use_pallas=use_pallas,
            pallas_interpret=use_pallas,
        ).loss

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(p, tables, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss_fn(p, tables_p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5, atol=2e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree.leaves(g1)
    for (path, a), b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
@pytest.mark.parametrize("feedback", ["teacher", "sample"])
def test_factored_grads_match(world, feedback):
    """value_and_grad through the factored path == unfactored (the whole
    point: same loss surface, cheaper program)."""
    tables, params, batch = world

    def loss_fn(p, factored):
        return _run(tables, p, batch, factored=factored, feedback=feedback,
                    deterministic=False).loss

    l0, g0 = jax.value_and_grad(lambda p: loss_fn(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss_fn(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5, atol=2e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree.leaves(g1)
    assert len(flat0) == len(flat1)
    for (path, a), b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )
