"""Lazy gold rollout + fused encoder attention == the materialized
speaker path.

Round-5 speaker roofline work (runs/profile_speaker_b2048_r5.log): the
materialized gold rollout (38 ms) and the trajectory encoder (56 ms)
dominated the b2048 speaker train step.  gold_rollout(lazy_features=True)
drops the (B, T, 36, D) panorama stack; speaker_encoder_apply(use_pallas)
fuses the per-step bank gather with the visual attention
(ops/pano_attention.pano_attention, the follower decoder's kernel).
Reference semantics: tasks/R2R/speaker.py:68-121 (trajectory batching) +
model.py:437-457 (per-step VisualSoftDotAttention)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speaker_follower_tpu.agents import speaker as sa
from speaker_follower_tpu.data.dataset import R2RDataset, encode_batch
from speaker_follower_tpu.data.features import random_feature_bank
from speaker_follower_tpu.data.graph import load_graph_bank
from speaker_follower_tpu.data.text import Tokenizer, read_vocab
from speaker_follower_tpu.env import vecenv
from speaker_follower_tpu.models.speaker import init_speaker

CONN = "/root/reference/connectivity"
DATA = "/root/reference/tasks/R2R/data"
FEAT = 64
INSTR_LEN = 40


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
    params = init_speaker(
        jax.random.PRNGKey(1), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT + 128,
        feature_size=FEAT + 128,
    )
    enc = encode_batch(ds.next_minibatch(), bank,
                       max_instruction_length=INSTR_LEN,
                       reverse_instructions=False)
    db = {k: jnp.asarray(enc[k])
          for k in ["scan", "start_node", "goal_node", "heading"]}
    seq = jnp.asarray(enc["seq"])
    return bank, feats, params, db, seq


def test_lazy_gold_matches_materialized(world):
    bank, feats, params, db, seq = world
    tables = vecenv.make_env_tables(bank, feats)
    g_mat = sa.gold_rollout(tables, db, episode_len=10)
    g_lazy = sa.gold_rollout(tables, db, episode_len=10, lazy_features=True)
    np.testing.assert_array_equal(np.asarray(g_mat.actions),
                                  np.asarray(g_lazy.actions))
    np.testing.assert_array_equal(np.asarray(g_mat.nodes),
                                  np.asarray(g_lazy.nodes))
    np.testing.assert_array_equal(np.asarray(g_mat.path_len),
                                  np.asarray(g_lazy.path_len))
    np.testing.assert_allclose(
        np.asarray(g_mat.action_embeddings),
        np.asarray(g_lazy.action_embeddings), rtol=1e-6, atol=1e-7,
    )
    assert g_lazy.world_features is None
    # identity planes reconstruct the panoramas the materialized path saw
    assert g_lazy.gnode.shape == g_mat.actions.shape


@pytest.mark.parametrize("use_pallas", [False, True])
def test_lazy_scoring_matches_materialized(world, use_pallas):
    """score_instructions over lazy gold — XLA per-step gather and the
    fused kernel (interpret mode) — reproduces the materialized loss and
    word scores (deterministic teacher forcing)."""
    bank, feats, params, db, seq = world
    tables = vecenv.make_env_tables(bank, feats, pad_views=use_pallas)
    g_mat = sa.gold_rollout(tables, db, episode_len=10)
    g_lazy = sa.gold_rollout(tables, db, episode_len=10, lazy_features=True)
    kw = dict(feedback="teacher", instruction_len=INSTR_LEN, unroll_len=10,
              deterministic=True, use_glove=False)
    o_mat = sa.score_instructions(
        params, g_mat, seq, jax.random.PRNGKey(5), **kw
    )
    o_lazy = sa.score_instructions(
        params, g_lazy, seq, jax.random.PRNGKey(5), tables=tables,
        use_pallas=use_pallas, pallas_interpret=use_pallas, **kw
    )
    tol = dict(rtol=2e-4, atol=1e-5) if use_pallas else dict(rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(float(o_mat.loss), float(o_lazy.loss), **tol)
    np.testing.assert_allclose(
        np.asarray(o_mat.word_scores), np.asarray(o_lazy.word_scores), **tol
    )


def test_kernel_encoder_grads_match_xla(world):
    """Gradients through the fused encoder attention (custom VJP,
    interpret mode) match the lazy XLA encoder."""
    bank, feats, params, db, seq = world
    tables = vecenv.make_env_tables(bank, feats, pad_views=True)
    g_lazy = sa.gold_rollout(tables, db, episode_len=10, lazy_features=True)

    def loss(p, use_pallas):
        return sa.score_instructions(
            p, g_lazy, seq, jax.random.PRNGKey(5), feedback="teacher",
            instruction_len=INSTR_LEN, unroll_len=10, deterministic=True,
            use_glove=False, tables=tables,
            use_pallas=use_pallas, pallas_interpret=use_pallas,
        ).loss

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-4)
    # same pytree structure on both sides -> leaves_with_path align;
    # (DictKey is not orderable, so no sorted())
    for (k, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5,
            err_msg=str(k),
        )


def test_trainer_lazy_interval_runs(world):
    """SpeakerTrainer with use_pallas (interpret) runs the lazy+kernel
    interval end to end and its loss tracks the XLA trainer's."""
    from speaker_follower_tpu.training.trainer import SpeakerTrainer, TrainConfig

    bank, feats, params, db, seq = world
    vocab = read_vocab(f"{DATA}/sub_train_vocab.txt")
    tok = Tokenizer(vocab=vocab)

    def make_ds():
        d = R2RDataset(["sub_val_seen"], tokenizer=tok, batch_size=6, seed=3)
        d.data = [x for x in d.data if x["scan"] in set(bank.scan_ids)]
        return d

    def run(use_pallas):
        tables = vecenv.make_env_tables(bank, feats, pad_views=use_pallas)
        cfg = TrainConfig(feedback="teacher", use_glove=False, no_save=True,
                          max_instruction_length=INSTR_LEN, dropout_ratio=0.0,
                          use_pallas=use_pallas, pallas_interpret=use_pallas)
        tr = SpeakerTrainer(jax.tree.map(jnp.array, params), tables, make_ds(),
                            bank, cfg, tokenizer=tok,
                            rng=jax.random.PRNGKey(9))
        return tr.train_interval(2)

    l_xla = run(False)
    l_pallas = run(True)
    np.testing.assert_allclose(l_xla, l_pallas, rtol=2e-4)
