"""Multi-device data-parallel training on the 8-device virtual CPU mesh:
the sharded train step must produce the same params as single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_follower_tpu.agents import rollout as ra
from speaker_follower_tpu.data.dataset import R2RDataset, encode_batch
from speaker_follower_tpu.data.features import random_feature_bank
from speaker_follower_tpu.data.graph import load_graph_bank
from speaker_follower_tpu.data.text import Tokenizer, read_vocab
from speaker_follower_tpu.env import vecenv
from speaker_follower_tpu.models.follower import init_follower
from speaker_follower_tpu.parallel import mesh as pm
from speaker_follower_tpu.training.optim import adam_with_torch_wd

CONN = "/root/reference/connectivity"
FEAT = 32


@pytest.fixture(scope="module")
def world():
    vocab = read_vocab("/root/reference/tasks/R2R/data/sub_train_vocab.txt")
    tok = Tokenizer(vocab=vocab)
    ds = R2RDataset(["sub_val_seen"], tokenizer=tok, batch_size=8, seed=10)
    keep = sorted(ds.scans)[:2]
    ds.data = [d for d in ds.data if d["scan"] in keep]
    bank = load_graph_bank(keep, CONN)
    feats = random_feature_bank(bank, dim=FEAT, seed=0)
    tables = vecenv.make_env_tables(bank, feats)
    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT + 128, feature_size=FEAT + 128,
    )
    return vocab, ds, bank, tables, params


def _loss_fn(params, tables, batch, rng):
    return ra.rollout(
        params, tables, batch, rng, feedback="teacher", episode_len=10
    ).loss


@pytest.mark.slow
def test_data_parallel_step_matches_single_device(world):
    vocab, ds, bank, tables, params = world
    assert len(jax.devices()) == 8
    mesh = pm.make_mesh()

    enc = encode_batch(ds.next_minibatch(), bank)
    batch_np = {
        k: enc[k]
        for k in ["scan", "start_node", "goal_node", "heading", "seq", "seq_mask", "seq_length"]
    }

    tx = adam_with_torch_wd(1e-3)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(7)

    def step(params, opt_state, tables, batch, rng):
        loss, grads = jax.value_and_grad(_loss_fn)(params, tables, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state, loss

    # single device
    step1 = jax.jit(step)
    p1, o1, l1 = step1(
        params, opt_state, tables,
        {k: jnp.asarray(v) for k, v in batch_np.items()}, rng,
    )

    # 8-device data-parallel: shard the batch, replicate the rest
    params_r = pm.replicate(mesh, params)
    opt_r = pm.replicate(mesh, opt_state)
    tables_r = vecenv.EnvTables(*[
        jax.device_put(x, pm.replicated(mesh)) for x in tables
    ])
    batch_s = pm.shard_batch(mesh, batch_np)
    step8 = jax.jit(step)
    p8, o8, l8 = step8(params_r, opt_r, tables_r, batch_s, rng)

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pad_batch_to(world):
    vocab, ds, bank, tables, params = world
    enc = encode_batch(ds.next_minibatch(), bank)
    batch_np = {k: enc[k] for k in ["scan", "seq"]}
    padded, true_b = pm.pad_batch_to(batch_np, 16)
    assert true_b == 8
    assert padded["scan"].shape[0] == 16
    assert (padded["scan"][8:] == padded["scan"][7]).all()


@pytest.mark.slow
def test_speaker_trainer_on_mesh(world):
    """SpeakerTrainer with a data-parallel mesh runs and reduces loss."""
    from speaker_follower_tpu.data.text import Tokenizer
    from speaker_follower_tpu.models.speaker import init_speaker
    from speaker_follower_tpu.training.trainer import SpeakerTrainer, TrainConfig

    vocab, ds, bank, tables, _ = world
    mesh = pm.make_mesh()
    params = init_speaker(
        jax.random.PRNGKey(3), vocab_size=len(vocab),
        action_embedding_size=FEAT + 128, feature_size=FEAT + 128,
        word_embedding_size=16, hidden_size=32,
    )
    cfg = TrainConfig(
        learning_rate=3e-3, use_glove=False, no_save=True,
        max_instruction_length=24,
    )
    tr = SpeakerTrainer(params, tables, ds, bank, cfg,
                        tokenizer=Tokenizer(vocab=vocab), mesh=mesh)
    first = tr.train_interval(2)
    last = tr.train_interval(4)
    assert np.isfinite(first).all() and np.isfinite(last).all()
    assert np.mean(last) < np.mean(first)


@pytest.mark.slow
def test_follower_trainer_on_mesh(world):
    from speaker_follower_tpu.models.follower import init_follower
    from speaker_follower_tpu.training.trainer import FollowerTrainer, TrainConfig

    vocab, ds, bank, tables, params = world
    mesh = pm.make_mesh()
    cfg = TrainConfig(learning_rate=3e-3, feedback="teacher",
                      use_glove=False, no_save=True)
    tr = FollowerTrainer(params, tables, ds, bank, cfg, mesh=mesh)
    first = tr.train_interval(2)
    last = tr.train_interval(4)
    assert np.mean(last) < np.mean(first)
    # eval path also works sharded
    results, _ = tr.test(ds, feedback="argmax")
    assert len(results) == len(ds)


@pytest.mark.slow
def test_data_parallel_training_equivalence_50_iters(world):
    """50 full training iterations on the 8-device mesh vs one device:
    the parameter trajectories must track (teacher feedback, no dropout).
    Extends the single-step check to a real optimization trajectory
    (VERDICT r1 #9).  Early iterations are compared tightly; the sharded
    psum reduces in a different order than the single-device sum, and
    Adam's sqrt(v) normalization amplifies that ~1e-7 relative seed
    chaotically over 50 steps, so the tail gets a drift tolerance
    (observed worst-case drift across runs: ~1e-3 relative by iter 50)."""
    vocab, ds, bank, tables, params = world
    mesh = pm.make_mesh()
    tx = adam_with_torch_wd(1e-3)

    def step(params, opt_state, tables, batch, rng):
        loss, grads = jax.value_and_grad(_loss_fn)(params, tables, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state, loss

    step_j = jax.jit(step)

    # identical batch schedule for both runs
    import copy

    ds1 = copy.deepcopy(ds)
    ds8 = copy.deepcopy(ds)

    p1, o1 = params, tx.init(params)
    p8 = pm.replicate(mesh, params)
    o8 = pm.replicate(mesh, tx.init(params))
    tables_r = vecenv.EnvTables(*[
        jax.device_put(x, pm.replicated(mesh)) for x in tables
    ])
    rng = jax.random.PRNGKey(11)
    keys = ["scan", "start_node", "goal_node", "heading", "seq", "seq_mask",
            "seq_length"]
    losses1, losses8 = [], []
    for it in range(50):
        rng, k = jax.random.split(rng)
        b1 = {kk: jnp.asarray(v) for kk, v in
              encode_batch(ds1.next_minibatch(), bank).items() if kk in keys}
        b8 = pm.shard_batch(
            mesh,
            {kk: v for kk, v in
             encode_batch(ds8.next_minibatch(), bank).items() if kk in keys},
        )
        p1, o1, l1 = step_j(p1, o1, tables, b1, k)
        p8, o8, l8 = step_j(p8, o8, tables_r, b8, k)
        losses1.append(float(l1))
        losses8.append(float(l8))

    np.testing.assert_allclose(losses1[:15], losses8[:15], rtol=2e-4)
    np.testing.assert_allclose(losses1, losses8, rtol=2e-2)
    assert np.mean(losses1[-10:]) < np.mean(losses1[:10])  # it actually learns
    assert np.mean(losses8[-10:]) < np.mean(losses8[:10])
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


@pytest.mark.slow
def test_tensor_parallel_step_matches_single_device(world):
    """2-D (data=4, model=2) mesh: Megatron-style column-sharded params
    (gate axis over "model") + episode sharding over "data" must reproduce
    the single-device train step — GSPMD inserts the per-step h
    all-gathers and gradient reductions from the annotations alone."""
    vocab, ds, bank, tables, params = world
    mesh = pm.make_mesh2(model=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 4, "model": 2}

    enc = encode_batch(ds.next_minibatch(), bank)
    batch_np = {
        k: enc[k]
        for k in ["scan", "start_node", "goal_node", "heading", "seq", "seq_mask", "seq_length"]
    }

    tx = adam_with_torch_wd(1e-3)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(3)

    def step(params, opt_state, tables, batch, rng):
        loss, grads = jax.value_and_grad(_loss_fn)(params, tables, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state, loss

    p1, o1, l1 = jax.jit(step)(
        params, opt_state, tables,
        {k: jnp.asarray(v) for k, v in batch_np.items()}, rng,
    )

    # min_dim=32 so the 4H=128 gate axes shard at this test's hidden=32
    params_s = pm.shard_params(mesh, params, min_dim=32)
    specs = jax.tree.map(
        lambda s: s.spec, pm.param_shardings(mesh, params, min_dim=32)
    )
    sharded_leaves = [
        s for s in jax.tree_util.tree_leaves(specs, is_leaf=lambda x: hasattr(x, "index"))
        if len(s) > 0
    ]
    assert sharded_leaves, "no param was actually tensor-sharded"
    opt_s = jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), s),
        opt_state, jax.tree.map(lambda _: pm.replicated(mesh), opt_state),
    )
    tables_s = vecenv.EnvTables(*[
        jax.device_put(x, pm.replicated(mesh)) for x in tables
    ])
    batch_s = pm.shard_batch(mesh, batch_np)
    p2, o2, l2 = jax.jit(step)(params_s, opt_s, tables_s, batch_s, rng)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        # 5e-5: GSPMD reduce reassociation jitters a few ULPs more than
        # the pure-DP layout
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


@pytest.mark.slow
def test_follower_trainer_on_2d_mesh(world):
    """FollowerTrainer with a (data=4, model=2) mesh: params come out
    column-sharded, training runs, and loss matches the replicated-mesh
    trainer (same seed) — TP is numerically transparent."""
    from speaker_follower_tpu.data.dataset import R2RDataset
    from speaker_follower_tpu.data.text import Tokenizer
    from speaker_follower_tpu.training.trainer import FollowerTrainer, TrainConfig

    vocab, ds, bank, tables, params = world
    cfg = TrainConfig(feedback="teacher", use_glove=False, no_save=True,
                      learning_rate=3e-3)

    def make(mesh):
        tok = Tokenizer(vocab=vocab)
        d = R2RDataset(["sub_val_seen"], tokenizer=tok, batch_size=8, seed=4)
        d.data = [x for x in d.data if x["scan"] in set(bank.scan_ids)]
        return FollowerTrainer(
            jax.tree.map(jnp.array, params), tables, d, bank, cfg,
            rng=jax.random.PRNGKey(2), mesh=mesh,
        )

    l_dp = make(pm.make_mesh()).train_interval(3)
    tr_tp = make(pm.make_mesh2(model=2))
    specs = {
        len(getattr(leaf.sharding, "spec", ()))
        for leaf in jax.tree_util.tree_leaves(tr_tp.params)
    }
    assert 1 in specs, "no param leaf is model-sharded on the 2-D mesh"
    l_tp = tr_tp.train_interval(3)
    np.testing.assert_allclose(l_dp, l_tp, rtol=1e-4)


@pytest.mark.slow
def test_speaker_trainer_on_2d_mesh(world):
    """SpeakerTrainer on the (4, 2) TP+DP mesh runs and model-shards."""
    from speaker_follower_tpu.data.dataset import R2RDataset
    from speaker_follower_tpu.data.text import Tokenizer
    from speaker_follower_tpu.models.speaker import init_speaker
    from speaker_follower_tpu.training.trainer import SpeakerTrainer, TrainConfig

    vocab, ds, bank, tables, _ = world
    params = init_speaker(
        jax.random.PRNGKey(1), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT + 128, feature_size=FEAT + 128,
    )
    tok = Tokenizer(vocab=vocab)
    d = R2RDataset(["sub_val_seen"], tokenizer=tok, batch_size=8, seed=4)
    d.data = [x for x in d.data if x["scan"] in set(bank.scan_ids)]
    cfg = TrainConfig(feedback="teacher", use_glove=False, no_save=True,
                      max_instruction_length=40)
    tr = SpeakerTrainer(params, tables, d, bank, cfg,
                        rng=jax.random.PRNGKey(2), mesh=pm.make_mesh2(model=2))
    specs = {
        len(getattr(leaf.sharding, "spec", ()))
        for leaf in jax.tree_util.tree_leaves(tr.params)
    }
    assert 1 in specs
    losses = tr.train_interval(2)
    assert all(np.isfinite(losses))


def test_multihost_helpers_single_process():
    """init_multihost is a no-op summary on a single process; the batch
    slice covers the whole batch."""
    # NOTE: jax.distributed.initialize on a 1-process CPU backend is
    # itself legal but mutates global state; only exercise the
    # already-initialized/no-coordinator summary path and the slice math.
    assert pm.data_parallel_batch_slice(64) == (0, 64)
    assert pm.data_parallel_batch_slice(1) == (0, 1)
    info = pm.init_multihost()
    assert info["num_processes"] == 1
    assert pm.init_multihost() == info  # idempotent
