"""End-to-end training smoke tests on the in-repo sub splits with random
features: losses must drop and the plumbing (val + eval + checkpointing)
must run."""

import os

import jax
import numpy as np
import pytest

from speaker_follower_tpu.data.dataset import R2RDataset
from speaker_follower_tpu.data.features import random_feature_bank
from speaker_follower_tpu.data.graph import load_graph_bank
from speaker_follower_tpu.data.text import Tokenizer, read_vocab
from speaker_follower_tpu.env import vecenv
from speaker_follower_tpu.models.follower import init_follower
from speaker_follower_tpu.models.speaker import init_speaker
from speaker_follower_tpu.training.trainer import (
    FollowerTrainer,
    SpeakerTrainer,
    TrainConfig,
)

CONN = "/root/reference/connectivity"
FEAT_DIM = 32


@pytest.fixture(scope="module")
def world():
    vocab = read_vocab("/root/reference/tasks/R2R/data/sub_train_vocab.txt")
    tok = Tokenizer(vocab=vocab)
    ds = R2RDataset(["sub_val_seen"], tokenizer=tok, batch_size=8, seed=10)
    keep = sorted(ds.scans)[:2]
    ds.data = [d for d in ds.data if d["scan"] in keep]
    bank = load_graph_bank(keep, CONN)
    feats = random_feature_bank(bank, dim=FEAT_DIM, seed=0)
    tables = vecenv.make_env_tables(bank, feats)
    return vocab, tok, ds, bank, tables


@pytest.mark.slow
def test_follower_training_reduces_loss(world, tmp_path):
    vocab, tok, ds, bank, tables = world
    params = init_follower(
        jax.random.PRNGKey(0),
        vocab_size=len(vocab),
        word_embedding_size=16,
        hidden_size=32,
        action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
    )
    cfg = TrainConfig(
        learning_rate=3e-3,
        feedback="teacher",
        use_glove=False,
        no_save=True,
        snapshot_dir=str(tmp_path),
        plot_dir=str(tmp_path),
    )
    trainer = FollowerTrainer(params, tables, ds, bank, cfg)
    first = trainer.train_interval(3)
    for _ in range(6):
        last = trainer.train_interval(3)
    assert np.mean(last) < np.mean(first) * 0.9, (first, last)

    # argmax test pass produces one result per instruction
    results, _ = trainer.test(ds, feedback="argmax")
    assert len(results) == len(ds)
    assert all("trajectory" in r for r in results.values())


@pytest.mark.slow
def test_speaker_training_reduces_loss(world, tmp_path):
    vocab, tok, ds, bank, tables = world
    params = init_speaker(
        jax.random.PRNGKey(1),
        vocab_size=len(vocab),
        action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
        word_embedding_size=16,
        hidden_size=32,
    )
    cfg = TrainConfig(
        learning_rate=3e-3,
        feedback="teacher",
        use_glove=False,
        no_save=True,
        max_instruction_length=40,
        snapshot_dir=str(tmp_path),
        plot_dir=str(tmp_path),
    )
    trainer = SpeakerTrainer(params, tables, ds, bank, cfg, tokenizer=tok)
    first = trainer.train_interval(3)
    for _ in range(6):
        last = trainer.train_interval(3)
    assert np.mean(last) < np.mean(first) * 0.9, (first, last)

    results, _ = trainer.test(ds, feedback="argmax")
    assert len(results) == len(ds)
    some = next(iter(results.values()))
    assert "words" in some and "score" in some


def test_speaker_gold_teacher_test_pass(world):
    """The validate_speaker --gold_results_output_file leg: a TEACHER
    decode (allow_cheat) must produce scoreable, JSON-dumpable results
    whose word_indices are the gold instructions (reference
    validate_speaker.py:12-25, the commented-out gold block)."""
    import json

    from speaker_follower_tpu.evaluation.speaker_eval import SpeakerEvaluation

    vocab, tok, ds, bank, tables = world
    params = init_speaker(
        jax.random.PRNGKey(1), vocab_size=len(vocab),
        action_embedding_size=FEAT_DIM + 128, feature_size=FEAT_DIM + 128,
        word_embedding_size=16, hidden_size=32,
    )
    cfg = TrainConfig(
        feedback="teacher", use_glove=False, no_save=True,
        max_instruction_length=40,
    )
    trainer = SpeakerTrainer(params, tables, ds, bank, cfg, tokenizer=tok)
    gold_results, _ = trainer.test(ds, feedback="teacher", allow_cheat=True)
    assert len(gold_results) == len(ds)
    ev = SpeakerEvaluation(["sub_val_seen"])
    ev.instr_ids = {d["instr_id"] for d in ds.data}
    summary, _ = ev.score_results(gold_results)
    assert np.isfinite(summary["model_score"])
    json.dumps(gold_results)  # the dump leg must serialize


@pytest.mark.slow
def test_frozen_embedding_stays_frozen(world):
    vocab, tok, ds, bank, tables = world
    glove = np.random.RandomState(0).randn(len(vocab), 16).astype(np.float32)
    params = init_follower(
        jax.random.PRNGKey(2),
        vocab_size=len(vocab),
        word_embedding_size=16,
        hidden_size=32,
        action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
        glove=glove,
    )
    cfg = TrainConfig(feedback="teacher", use_glove=True, no_save=True)
    trainer = FollowerTrainer(params, tables, ds, bank, cfg)
    # snapshot BEFORE training: the interval program donates params, so
    # pre-training device arrays are invalidated once it runs
    w_ih_before = np.asarray(params["encoder"]["lstm_fwd"]["w_ih"])
    trainer.train_interval(2)
    np.testing.assert_array_equal(
        np.asarray(trainer.params["encoder"]["embedding"]["w"]), glove
    )
    # but other params moved
    assert not np.allclose(
        np.asarray(trainer.params["encoder"]["lstm_fwd"]["w_ih"]),
        w_ih_before,
    )


@pytest.mark.slow
def test_full_state_checkpoint_resume(world, tmp_path):
    """Resume must be bit-exact: save after k iters, train m more; reload
    and train the same m — identical params."""
    vocab, tok, ds, bank, tables = world
    import copy

    def make_trainer(seed=5):
        params = init_follower(
            jax.random.PRNGKey(seed), vocab_size=len(vocab),
            word_embedding_size=16, hidden_size=32,
            action_embedding_size=FEAT_DIM + 128, feature_size=FEAT_DIM + 128,
        )
        cfg = TrainConfig(feedback="teacher", use_glove=False, no_save=True)
        return FollowerTrainer(params, tables, ds, bank, cfg,
                               rng=jax.random.PRNGKey(7))

    t1 = make_trainer()
    t1.train_interval(2)
    path = str(tmp_path / "state.ckpt")
    t1.save_training_state(path, iteration=2)
    t1.train_interval(3)

    t2 = make_trainer()
    it = t2.load_training_state(path)  # restores dataset iterator state too
    assert it == 2
    t2.train_interval(3)

    a = jax.tree_util.tree_leaves(t1.params)
    b = jax.tree_util.tree_leaves(t2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_kill_resume_bit_identical(world, tmp_path):
    """A run killed mid-training and resumed from the trainstate
    checkpoint must reproduce the unkilled run's validation trajectory
    bit-for-bit: same data_log (train losses, val losses, success rates)
    and same final params.  This is the semantics the reference cannot
    offer (follower.py:1032 saves weights only)."""
    from speaker_follower_tpu.evaluation.follower_eval import Evaluation

    vocab, tok, ds, bank, tables = world
    keep = set(bank.scan_ids)

    def make_trainer():
        params = init_follower(
            jax.random.PRNGKey(0), vocab_size=len(vocab),
            word_embedding_size=16, hidden_size=32,
            action_embedding_size=FEAT_DIM + 128, feature_size=FEAT_DIM + 128,
        )
        cfg = TrainConfig(feedback="teacher", use_glove=False, no_save=True,
                          log_every=2, save_every=2)
        d = R2RDataset(["sub_val_seen"], tokenizer=tok, batch_size=8, seed=10)
        d.data = [x for x in d.data if x["scan"] in keep]
        vd = R2RDataset(["sub_val_seen"], tokenizer=tok, batch_size=8, seed=11)
        vd.data = [x for x in vd.data if x["scan"] in keep]
        ev = Evaluation(["sub_val_seen"], bank)
        ev.gt = {k: v for k, v in ev.gt.items() if v["scan"] in keep}
        ev.instr_ids = {
            i for i in ev.instr_ids if int(i.split("_")[0]) in ev.gt
        }
        val_envs = {"val": (vd, ev)}
        return FollowerTrainer(params, tables, d, bank, cfg,
                               val_envs=val_envs, rng=jax.random.PRNGKey(7))

    # control: 4 intervals straight through
    t_a = make_trainer()
    t_a.train(8, log_every=2)

    # killed at iteration 4 (state checkpointed there), then resumed
    path = str(tmp_path / "trainstate")
    t_b = make_trainer()
    t_b.train(4, log_every=2, state_path=path, phase="main")
    del t_b

    t_c = make_trainer()
    start = t_c.load_training_state(path)
    assert start == 4
    assert t_c.resume_extra["phase"] == "main"
    t_c.train(8, log_every=2, start_iter=start, state_path=path,
              phase="main", resume_extra=t_c.resume_extra)

    assert set(t_a.data_log) == set(t_c.data_log)
    for k in t_a.data_log:
        np.testing.assert_array_equal(
            np.asarray(t_a.data_log[k]), np.asarray(t_c.data_log[k]),
            err_msg=f"data_log[{k!r}] diverged after resume",
        )
    for x, y in zip(jax.tree_util.tree_leaves(t_a.params),
                    jax.tree_util.tree_leaves(t_c.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_load_glove_word_maps_sub_vocab():
    """Sub-vocab GloVe rows are word-mapped from the full-vocab matrix
    (every sub-vocab word exists in train_vocab, so rows match exactly)."""
    from speaker_follower_tpu import paths
    from speaker_follower_tpu.cli.common import load_glove
    from speaker_follower_tpu.data.text import read_vocab

    full_vocab = read_vocab(paths.TRAIN_VOCAB)
    sub_vocab = read_vocab(paths.SUBTRAIN_VOCAB)
    full = load_glove(None, full_vocab)
    sub = load_glove(None, sub_vocab)
    assert full.shape == (len(full_vocab), 300)
    assert sub.shape == (len(sub_vocab), 300)
    full_index = {w: i for i, w in enumerate(full_vocab)}
    for i in range(0, len(sub_vocab), 97):
        np.testing.assert_array_equal(sub[i], full[full_index[sub_vocab[i]]])
    # a vocab of unknown words falls back to trained embeddings
    assert load_glove(None, ["zzz%d" % i for i in range(100)]) is None


@pytest.mark.slow
def test_bfloat16_compute_training_step(world):
    """Both trainers run a bf16-compute train step: finite f32 loss, f32
    params after the update, and the speaker's mixed-precision scoring
    tracks its f32 loss within bf16 tolerance."""
    import jax.numpy as jnp

    from speaker_follower_tpu.agents import speaker as sa
    from speaker_follower_tpu.data.dataset import encode_batch

    vocab, tok, ds, bank, tables = world
    fparams = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
    )
    cfg = TrainConfig(feedback="teacher", use_glove=False, no_save=True,
                      compute_dtype="bfloat16")
    tr = FollowerTrainer(fparams, tables, ds, bank, cfg)
    losses = tr.train_interval(2)
    assert all(np.isfinite(losses))
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(tr.params)
        if leaf.dtype in (jnp.float32, jnp.bfloat16)
    )

    sparams = init_speaker(
        jax.random.PRNGKey(1), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
    )
    enc = encode_batch(ds.next_minibatch(), bank, max_instruction_length=40,
                       reverse_instructions=False)
    db = {k: jnp.asarray(enc[k])
          for k in ["scan", "start_node", "goal_node", "heading"]}
    gold = sa.gold_rollout(tables, db, episode_len=10)
    seq = jnp.asarray(enc["seq"])
    o32 = sa.score_instructions(sparams, gold, seq, jax.random.PRNGKey(2),
                                instruction_len=40, use_glove=False)
    o16 = sa.score_instructions(sparams, gold, seq, jax.random.PRNGKey(2),
                                instruction_len=40, use_glove=False,
                                compute_dtype="bfloat16")
    assert o16.loss.dtype == jnp.float32
    np.testing.assert_allclose(float(o16.loss), float(o32.loss), rtol=0.05)


@pytest.mark.slow
def test_pallas_trainer_matches_xla(world):
    """FollowerTrainer with use_pallas (interpret mode on CPU): the fused
    kernel's custom VJP must reproduce the XLA train step's losses on
    view-padded tables."""
    from speaker_follower_tpu.data.features import random_feature_bank as rfb

    vocab, tok, ds, bank, tables = world
    feats = rfb(bank, dim=FEAT_DIM, seed=0)
    tables_padded = vecenv.make_env_tables(bank, feats, pad_views=True)
    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
    )

    def losses(tbl, use_pallas):
        import jax.numpy as jnp

        cfg = TrainConfig(
            feedback="teacher", use_glove=False, no_save=True,
            use_pallas=use_pallas, pallas_interpret=use_pallas,
        )
        ds2 = R2RDataset(["sub_val_seen"],
                         tokenizer=Tokenizer(vocab=vocab), batch_size=8, seed=10)
        ds2.data = [d for d in ds2.data if d["scan"] in set(bank.scan_ids)]
        tr = FollowerTrainer(jax.tree.map(jnp.array, params), tbl, ds2, bank, cfg,
                             rng=jax.random.PRNGKey(3))
        return tr.train_interval(2)

    l_xla = losses(tables, False)
    l_pallas = losses(tables_padded, True)
    np.testing.assert_allclose(l_xla, l_pallas, rtol=2e-4)


@pytest.mark.slow
def test_follower_device_interval_matches_per_step(world):
    """The K-step scanned device-resident interval (cfg.device_data) must
    reproduce the per-iteration dispatch path exactly: same minibatch
    order, same per-step keys => same losses and params."""
    import jax.numpy as jnp

    from speaker_follower_tpu.data.dataset import encode_batch
    from speaker_follower_tpu.data.text import Tokenizer
    from speaker_follower_tpu.training.trainer import _device_batch

    vocab, tok, ds, bank, tables = world
    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
    )
    cfg = TrainConfig(feedback="teacher", use_glove=False, no_save=True)

    def make_ds():
        d = R2RDataset(["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab),
                       batch_size=8, seed=10)
        d.data = [x for x in d.data if x["scan"] in set(bank.scan_ids)]
        return d

    K = 3
    tr = FollowerTrainer(jax.tree.map(jnp.array, params), tables, make_ds(),
                         bank, cfg, rng=jax.random.PRNGKey(7))
    assert tr.cfg.device_data
    dev_losses = tr.train_interval(K)

    # oracle: per-iteration dispatch with the SAME key derivation
    ds2 = make_ds()
    keys = jax.random.split(jax.random.PRNGKey(7), K + 1)
    p, o = jax.tree.map(jnp.array, params), None
    tr2 = FollowerTrainer(p, tables, ds2, bank, cfg)
    p, o = tr2.params, tr2.opt_state
    host_losses = []
    for i in range(K):
        enc = encode_batch(ds2.next_minibatch(), bank)
        p, o, loss = tr2._step_fn(p, o, tables, _device_batch(enc), keys[1 + i])
        host_losses.append(float(loss))

    np.testing.assert_allclose(dev_losses, host_losses, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_speaker_device_interval_matches_per_step(world):
    """Scanned speaker interval == per-iteration path.  Also proves the
    traced encoder_valid_len (static unroll_len=episode_len + batch-max
    masking) matches the host path's unroll_len=max(path_len)
    shrink-wrap.  dropout=0: the two compilations draw dropout masks of
    different static shapes (t_max vs episode_len), so only the
    dropout-free values can be compared exactly."""
    import jax.numpy as jnp

    from speaker_follower_tpu.data.text import Tokenizer

    vocab, tok, ds, bank, tables = world
    params = init_speaker(
        jax.random.PRNGKey(1), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
    )
    cfg = TrainConfig(feedback="teacher", use_glove=False, no_save=True,
                      max_instruction_length=40, dropout_ratio=0.0)

    def make_ds():
        d = R2RDataset(["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab),
                       batch_size=8, seed=10)
        d.data = [x for x in d.data if x["scan"] in set(bank.scan_ids)]
        return d

    K = 3
    tr = SpeakerTrainer(jax.tree.map(jnp.array, params), tables, make_ds(),
                        bank, cfg, tokenizer=tok, rng=jax.random.PRNGKey(9))
    dev_losses = tr.train_interval(K)

    tr2 = SpeakerTrainer(jax.tree.map(jnp.array, params), tables, make_ds(),
                         bank, cfg, tokenizer=tok)
    keys = jax.random.split(jax.random.PRNGKey(9), K + 1)
    p, o = tr2.params, tr2.opt_state
    host_losses = []
    for i in range(K):
        enc = tr2._encode_speaker_batch(tr2.train_ds.next_minibatch())
        gold, instr_seq, unroll_len = tr2._gold_and_instr(enc)
        p, o, loss = tr2._step_fn(p, o, gold, instr_seq, keys[1 + i],
                                  tr2.tables, unroll_len=unroll_len)
        host_losses.append(float(loss))

    # the 3 chained losses are the semantic check (loss at step i sees the
    # params produced by steps < i); params themselves pass through Adam's
    # m/(sqrt(v)+eps), which amplifies reassociation-level (~1e-7) jitter
    # on near-zero-gradient leaves, hence the looser param tolerance
    np.testing.assert_allclose(dev_losses, host_losses, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-4)


@pytest.mark.slow
def test_speaker_best_loss_snapshot(world, tmp_path):
    """Speaker training keys snapshots on val BLEU (reference parity,
    train_speaker.py:134-151) AND on val teacher-forced loss — the
    quantity pragmatic rescoring actually consumes (the speaker scores
    candidate trajectories by likelihood, never by decoding).  Both best
    trackers must rotate: exactly one surviving snapshot per key."""
    from speaker_follower_tpu.evaluation.speaker_eval import SpeakerEvaluation

    vocab, tok, ds, bank, tables = world
    params = init_speaker(
        jax.random.PRNGKey(1), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
    )
    cfg = TrainConfig(
        feedback="teacher", use_glove=False, no_save=False,
        max_instruction_length=40, log_every=2, save_every=0,
        snapshot_dir=str(tmp_path), model_prefix="sp",
    )
    ev = SpeakerEvaluation(["sub_val_seen"])
    ev.instr_ids = {d["instr_id"] for d in ds.data}
    trainer = SpeakerTrainer(params, tables, ds, bank, cfg, tokenizer=tok,
                             val_envs={"val": (ds, ev)},
                             rng=jax.random.PRNGKey(3))
    best = trainer.train(4, log_every=2)

    assert ("val", "loss") in best and ("val", "bleu") in best
    snaps = sorted(os.listdir(tmp_path))
    loss_snaps = [s for s in snaps if "-loss=" in s]
    bleu_snaps = [s for s in snaps if "-bleu=" in s]
    # rotation: the superseded best is deleted, one snapshot per key
    assert len(loss_snaps) == 1, snaps
    assert len(bleu_snaps) == 1, snaps
    # the surviving loss snapshot carries the best (latest-improved) value
    assert "%.4f" % best[("val", "loss")] in loss_snaps[0]
    # and it round-trips through the checkpoint loader with the live tree
    from speaker_follower_tpu.training import checkpoint as ckpt

    loaded = ckpt.load_params(os.path.join(str(tmp_path), loss_snaps[0]))
    assert (jax.tree_util.tree_structure(loaded)
            == jax.tree_util.tree_structure(trainer.params))


def test_follower_device_eval_matches_host(world):
    """Scanned eval epoch (one dispatch) == per-minibatch host loop:
    identical result sets and trajectories (argmax eval is deterministic,
    and follower rollouts have no cross-item coupling)."""
    import jax.numpy as jnp

    vocab, tok, ds, bank, tables = world
    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
    )

    def run(device_data):
        cfg = TrainConfig(feedback="teacher", use_glove=False, no_save=True,
                          device_data=device_data)
        tr = FollowerTrainer(jax.tree.map(jnp.array, params), tables, ds,
                             bank, cfg, rng=jax.random.PRNGKey(11))
        return tr.test(ds, feedback="argmax", collect_loss=True)

    res_dev, loss_dev = run(True)
    res_host, loss_host = run(False)
    assert set(res_dev) == set(res_host) == {d["instr_id"] for d in ds.data}
    for iid in res_dev:
        assert res_dev[iid]["trajectory"] == res_host[iid]["trajectory"], iid
    assert len(loss_dev) == len(loss_host)
    # the final (wrapped) batch is padded differently by the two paths
    # (host reshuffles at wrap, device pads cyclically), so its logged
    # loss covers different duplicate items; full batches must agree
    np.testing.assert_allclose(loss_dev[:-1], loss_host[:-1], rtol=1e-5)


def test_speaker_device_eval_matches_host(world):
    """Scanned speaker eval epoch == host loop on a wrap-free dataset
    (full batches only: the speaker's batch-max encoder unroll couples
    items within a batch, and the two paths compose the final wrapped
    batch differently — reference quirk, not a bug)."""
    import jax.numpy as jnp

    from speaker_follower_tpu.data.text import Tokenizer

    vocab, tok, ds, bank, tables = world
    params = init_speaker(
        jax.random.PRNGKey(1), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
    )

    def make_ds():
        d = R2RDataset(["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab),
                       batch_size=8, seed=10)
        d.data = [x for x in d.data if x["scan"] in set(bank.scan_ids)]
        d.data = d.data[: (len(d.data) // 8) * 8]  # wrap-free
        return d

    def run(device_data, d):
        cfg = TrainConfig(feedback="teacher", use_glove=False, no_save=True,
                          max_instruction_length=40, device_data=device_data)
        tr = SpeakerTrainer(jax.tree.map(jnp.array, params), tables, d,
                            bank, cfg, tokenizer=tok,
                            rng=jax.random.PRNGKey(13))
        return tr.test(d, feedback="argmax", collect_loss=True)

    res_dev, loss_dev = run(True, make_ds())
    res_host, loss_host = run(False, make_ds())
    assert set(res_dev) == set(res_host)
    for iid in res_dev:
        assert res_dev[iid]["words"] == res_host[iid]["words"], iid
    # wrap-free: the host loop still runs one extra all-duplicate batch
    # before detecting the repeat; the device epoch runs exactly M
    np.testing.assert_allclose(
        loss_dev, loss_host[: len(loss_dev)], rtol=1e-5
    )


@pytest.mark.slow
def test_speaker_remat_matches_exactly(world):
    """Speaker score_instructions with remat=True: identical loss/grads."""
    import jax.numpy as jnp

    from speaker_follower_tpu.agents import speaker as sa
    from speaker_follower_tpu.data.dataset import encode_batch

    vocab, tok, ds, bank, tables = world
    params = init_speaker(
        jax.random.PRNGKey(1), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
    )
    enc = encode_batch(ds.next_minibatch(), bank, max_instruction_length=40,
                       reverse_instructions=False)
    db = {k: jnp.asarray(enc[k])
          for k in ["scan", "start_node", "goal_node", "heading"]}
    gold = sa.gold_rollout(tables, db, episode_len=10)
    instr_seq = jnp.asarray(enc["seq"])
    rng = jax.random.PRNGKey(3)

    def loss(p, remat):
        return sa.score_instructions(
            p, gold, instr_seq, rng, feedback="teacher",
            instruction_len=40, unroll_len=6, use_glove=False,
            deterministic=False, dropout_ratio=0.5, remat=remat,
        ).loss

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    # atol 5e-7: XLA may reassociate reductions differently between the
    # remat and non-remat compilations (observed 1e-7 on single elements)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=5e-7)
