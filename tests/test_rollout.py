"""Follower rollout invariants (the reference's self-consistency checks,
follower.py:147-180, promoted to real tests):

  * teacher-forced rollout follows the gold shortest path exactly;
  * re-scoring the rollout's own (observations, actions) teacher-forced
    reproduces the rollout score and loss;
  * argmax and sample rollouts emit only valid actions and stop states.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_follower_tpu.data.dataset import R2RDataset, encode_batch, encode_gold_paths
from speaker_follower_tpu.data.features import random_feature_bank
from speaker_follower_tpu.data.graph import load_graph_bank
from speaker_follower_tpu.data.text import Tokenizer, read_vocab
from speaker_follower_tpu.env import vecenv
from speaker_follower_tpu.agents import rollout as ra
from speaker_follower_tpu.models.follower import init_follower

CONN = "/root/reference/connectivity"
FEAT_DIM = 32
EP_LEN = 10


@pytest.fixture(scope="module")
def world():
    vocab = read_vocab("/root/reference/tasks/R2R/data/sub_train_vocab.txt")
    tok = Tokenizer(vocab=vocab)
    ds = R2RDataset(["sub_val_seen"], tokenizer=tok, batch_size=6, seed=10)
    keep = sorted(ds.scans)[:3]
    ds.data = [d for d in ds.data if d["scan"] in keep]
    bank = load_graph_bank(keep, CONN)
    feats = random_feature_bank(bank, dim=FEAT_DIM, seed=0)
    tables = vecenv.make_env_tables(bank, feats)
    params = init_follower(
        jax.random.PRNGKey(0),
        vocab_size=len(vocab),
        word_embedding_size=16,
        hidden_size=32,
        action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
    )
    return ds, bank, tables, params


def _device_batch(enc):
    keys = ["scan", "start_node", "goal_node", "heading", "seq", "seq_mask", "seq_length"]
    return {k: jnp.asarray(enc[k]) for k in keys}


def test_teacher_rollout_follows_gold_path(world):
    ds, bank, tables, params = world
    enc = encode_batch(ds.next_minibatch(), bank)
    out = ra.rollout(
        params, tables, _device_batch(enc), jax.random.PRNGKey(1),
        feedback="teacher", episode_len=EP_LEN,
    )
    gold_nodes, gold_len = encode_gold_paths(enc["item"], bank, max_steps=EP_LEN)
    nodes = np.asarray(out.nodes)
    active = np.asarray(out.active)
    for i in range(nodes.shape[0]):
        n_actions = int(gold_len[i])
        assert active[i, :n_actions].all()
        assert not active[i, n_actions:].any()
        # trajectory node sequence = gold next-hop path (with the stop step
        # duplicating the final node)
        got = [int(enc["start_node"][i])] + [int(x) for x in nodes[i, :n_actions]]
        want = list(gold_nodes[i, : n_actions]) + [gold_nodes[i, n_actions - 1]]
        want = [int(w) for w in want]
        assert got == want, (i, got, want)
    assert np.isfinite(float(out.loss))


def test_forced_rescoring_matches_rollout(world):
    """score(rollout actions) == rollout score; loss identical (the
    reference asserted this equivalence in its commented check)."""
    ds, bank, tables, params = world
    enc = encode_batch(ds.next_minibatch(), bank)
    batch = _device_batch(enc)
    out = ra.rollout(
        params, tables, batch, jax.random.PRNGKey(2),
        feedback="teacher", episode_len=EP_LEN,
    )
    # replay the exact actions the rollout took
    n_act = np.asarray(out.active).sum(axis=1).astype(np.int32)
    batch_forced = dict(batch)
    batch_forced["forced_actions"] = out.actions
    batch_forced["forced_len"] = jnp.asarray(n_act)
    out2 = ra.rollout(
        params, tables, batch_forced, jax.random.PRNGKey(3),
        feedback="teacher", episode_len=EP_LEN, forced=True,
    )
    np.testing.assert_allclose(
        np.asarray(out.score), np.asarray(out2.score), atol=1e-5
    )
    np.testing.assert_allclose(float(out.loss), float(out2.loss), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.nodes), np.asarray(out2.nodes))


@pytest.mark.parametrize("feedback", ["argmax", "sample"])
def test_rollout_actions_are_valid(world, feedback):
    ds, bank, tables, params = world
    enc = encode_batch(ds.next_minibatch(), bank)
    out = ra.rollout(
        params, tables, _device_batch(enc), jax.random.PRNGKey(4),
        feedback=feedback, episode_len=EP_LEN, deterministic=True,
    )
    actions = np.asarray(out.actions)
    active = np.asarray(out.active)
    nodes = np.asarray(out.nodes)
    for i in range(actions.shape[0]):
        sid = enc["scan_id"][i]
        g = bank.graphs[sid]
        cur = int(enc["start_node"][i])
        for t in range(EP_LEN):
            if not active[i, t]:
                break
            a = int(actions[i, t])
            count = int(g.adj_count[cur])
            assert 0 <= a <= count
            cur = int(nodes[i, t])
    # scores are log-probs of chosen actions: <= 0
    assert (np.asarray(out.action_scores)[active] <= 1e-6).all()


def test_trajectory_formatting(world):
    ds, bank, tables, params = world
    enc = encode_batch(ds.next_minibatch(), bank)
    out = ra.rollout(
        params, tables, _device_batch(enc), jax.random.PRNGKey(5),
        feedback="argmax", episode_len=EP_LEN,
    )
    trajs = ra.trajectories_from_rollout(out, enc, bank)
    assert len(trajs) == 6
    for tr, item in zip(trajs, enc["item"]):
        assert tr["instr_id"] == item["instr_id"]
        assert tr["trajectory"][0][0] == item["path"][0]
        assert len(tr["trajectory"]) == len(tr["actions"]) + 1
        assert abs(tr["score"] - sum(tr["scores"])) < 1e-4


@pytest.mark.slow
def test_bfloat16_compute_matches_f32_closely(world):
    """Mixed precision (compute_dtype='bfloat16'): matmuls run in bf16 but
    loss/softmax stay f32 — the teacher-forced loss must track the f32
    loss within bf16 tolerance, grads must be finite f32, and the same
    path must be followed (teacher forcing is dtype-independent)."""
    ds, bank, tables, params = world
    enc = encode_batch(ds.next_minibatch(), bank)
    batch = _device_batch(enc)
    rng = jax.random.PRNGKey(5)

    out32 = ra.rollout(params, tables, batch, rng,
                       feedback="teacher", episode_len=EP_LEN)
    out16 = ra.rollout(params, tables, batch, rng,
                       feedback="teacher", episode_len=EP_LEN,
                       compute_dtype="bfloat16")
    assert out16.loss.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out16.nodes), np.asarray(out32.nodes))
    np.testing.assert_allclose(float(out16.loss), float(out32.loss), rtol=0.05)

    def loss16(p):
        return ra.rollout(p, tables, batch, rng, feedback="teacher",
                          episode_len=EP_LEN, compute_dtype="bfloat16").loss

    grads = jax.grad(loss16)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert leaf.dtype == jnp.float32
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_remat_rollout_matches_exactly(world):
    """remat=True (jax.checkpoint around the scan body) must change only
    peak memory, not semantics: the same PRNG stream is replayed in the
    recompute, so loss and gradients agree up to XLA reduction
    reassociation (the two programs may sum in different orders)."""
    ds, bank, tables, params = world
    enc = encode_batch(ds.next_minibatch(), bank)
    batch = _device_batch(enc)
    rng = jax.random.PRNGKey(7)

    def loss(p, remat):
        return ra.rollout(p, tables, batch, rng, feedback="sample",
                          episode_len=EP_LEN, deterministic=False,
                          dropout_ratio=0.5, remat=remat).loss

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    # atol 5e-7, not 1e-7: XLA may reassociate reductions differently
    # between the remat and non-remat programs, so single-element jitter
    # at ~2e-7 is within spec (same bound as the speaker remat test)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=5e-7)
