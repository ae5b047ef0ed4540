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


def test_fused_pads_unaligned_batch():
    """Batches not divisible by block_b (Mosaic needs the block batch dim
    % 8 == 0) are zero-padded up and sliced back: batch 7 must equal the
    reference math row for row."""
    import numpy as np

    from speaker_follower_tpu.ops.pano_attention import pano_attention_reference

    k = jax.random.PRNGKey(0)
    feats = jax.random.normal(k, (4, 36, 64))
    features = pad_views_for_pallas(feats)
    loc_table = jax.random.normal(k, (36, 36, 128))
    gnode = jnp.array([0, 1, 2, 3, 1, 2, 0], jnp.int32)
    view = jnp.array([0, 5, 35, 12, 7, 30, 1], jnp.int32)
    v_feat = jax.random.normal(k, (7, 64))
    v_loc = jax.random.normal(k, (7, 128))
    bias = jax.random.normal(k, (7,))
    w, a = fused_pano_attention(
        features, loc_table, gnode, view, v_feat, v_loc, bias,
        block_b=8, interpret=True,
    )
    w_ref, a_ref = pano_attention_reference(
        feats, loc_table, gnode, view, v_feat, v_loc, bias
    )
    assert w.shape == (7, 64 + 128) and a.shape == (7, 36)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(a_ref), atol=1e-6)


def test_fused_action_kernel_matches_reference():
    """Extended kernel (pano attention + action-feature gather in one DMA
    pass) vs the XLA reference: attention identical to the base kernel,
    af rows == direct bank gathers."""
    from speaker_follower_tpu.ops.pano_attention import (
        AF_ROWS,
        fused_pano_action_attention,
        pano_action_attention_reference,
    )

    rng = np.random.RandomState(1)
    t, d, b = 40, 128, 11  # 11: exercises the pad-to-block path too
    features = pad_views_for_pallas(
        jnp.asarray(rng.randn(t, 36, d).astype(np.float32), jnp.bfloat16)
    )
    loc_table = jnp.asarray(rng.randn(36, 36, 128).astype(np.float32))
    gnode = jnp.asarray(rng.randint(t, size=b).astype(np.int32))
    view_index = jnp.asarray(rng.randint(36, size=b).astype(np.int32))
    # -1 pads must be tolerated (clipped to row 0 inside)
    nbr_view = rng.randint(36, size=(b, AF_ROWS)).astype(np.int32)
    nbr_view[:, -3:] = -1
    nbr_view = jnp.asarray(nbr_view)
    v_feat = jnp.asarray(rng.randn(b, d).astype(np.float32) * 0.1)
    v_loc = jnp.asarray(rng.randn(b, 128).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(b).astype(np.float32))

    w_k, a_k, af_k = fused_pano_action_attention(
        features, loc_table, gnode, view_index, nbr_view, v_feat, v_loc,
        bias, block_b=8, interpret=True,
    )
    w_r, a_r, af_r = pano_action_attention_reference(
        features, loc_table, gnode, view_index,
        jnp.maximum(nbr_view, 0), v_feat, v_loc, bias,
    )
    assert af_k.shape == (b, AF_ROWS, d) and af_k.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_r), atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(af_k, np.float32), np.asarray(af_r, np.float32)
    )


def test_scoring_split_matches_fast():
    """eltwise_prod_scoring_split over (af, trig) == eltwise_prod_scoring
    over the materialized [feat | 32x4 angle blocks] embeddings, with the
    stop row (zeros) at slot 0."""
    from speaker_follower_tpu.models import attention as attn

    rng = np.random.RandomState(2)
    b, md, d, h_dim = 6, 15, 64, 32
    p = attn.eltwise_prod_scoring_init(jax.random.PRNGKey(0), h_dim, d + 128)
    h = jnp.asarray(rng.randn(b, h_dim).astype(np.float32))
    af = jnp.asarray(rng.randn(b, md, d).astype(np.float32))
    rel_h = jnp.asarray(rng.uniform(-np.pi, np.pi, (b, md)).astype(np.float32))
    rel_e = jnp.asarray(rng.uniform(-0.6, 0.6, (b, md)).astype(np.float32))

    split = attn.eltwise_prod_scoring_split(
        p, h, af, jnp.sin(rel_h), jnp.cos(rel_h), jnp.sin(rel_e), jnp.cos(rel_e)
    )

    ang = jnp.concatenate(
        [
            jnp.repeat(jnp.sin(rel_h)[..., None], 32, -1),
            jnp.repeat(jnp.cos(rel_h)[..., None], 32, -1),
            jnp.repeat(jnp.sin(rel_e)[..., None], 32, -1),
            jnp.repeat(jnp.cos(rel_e)[..., None], 32, -1),
        ],
        axis=-1,
    )
    u = jnp.concatenate([af, ang], axis=-1)  # (B, MD, D+128)
    u = jnp.concatenate([jnp.zeros_like(u[:, :1]), u], axis=1)  # stop slot
    ref = attn.eltwise_prod_scoring(p, h, u)
    np.testing.assert_allclose(np.asarray(split), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_train_grads_match_xla():
    """value_and_grad of the teacher-feedback rollout loss through the
    fully fused path (pano+action kernel, split scoring, kernel-fed
    u_next) vs the pure-XLA rollout: same loss, same parameter grads."""
    from speaker_follower_tpu.agents import rollout as ra
    from speaker_follower_tpu.data.dataset import R2RDataset, encode_batch
    from speaker_follower_tpu.data.features import random_feature_bank
    from speaker_follower_tpu.data.graph import load_graph_bank
    from speaker_follower_tpu.data.text import Tokenizer, read_vocab
    from speaker_follower_tpu.env import vecenv
    from speaker_follower_tpu.models.follower import init_follower

    vocab = read_vocab("/root/reference/tasks/R2R/data/sub_train_vocab.txt")
    ds = R2RDataset(["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab),
                    batch_size=6, seed=4)
    keep = sorted(ds.scans)[:2]
    ds.data = [d for d in ds.data if d["scan"] in keep]
    bank = load_graph_bank(keep, "/root/reference/connectivity")
    feats = random_feature_bank(bank, dim=64, seed=0)
    tables_x = vecenv.make_env_tables(bank, feats)
    tables_p = vecenv.make_env_tables(bank, feats, pad_views=True)
    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=64 + 128, feature_size=64 + 128,
    )
    enc = encode_batch(ds.next_minibatch(), bank, max_instruction_length=40)
    db = {k: jnp.asarray(enc[k]) for k in
          ["scan", "start_node", "goal_node", "heading", "seq", "seq_mask", "seq_length"]}

    def loss(p, tbl, pallas):
        return ra.rollout(
            p, tbl, db, jax.random.PRNGKey(7), feedback="teacher",
            episode_len=10, use_glove=False,
            use_pallas=pallas, pallas_interpret=pallas,
        ).loss

    l_x, g_x = jax.value_and_grad(loss)(params, tables_x, False)
    l_p, g_p = jax.value_and_grad(loss)(params, tables_p, True)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-5)
    flat_x = jax.tree.leaves(g_x)
    flat_p = jax.tree.leaves(g_p)
    for a, b_ in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=1e-3, atol=1e-5
        )


def test_pallas_rollout_matches_xla_rollout():
    """Full argmax rollout with the fused kernel == the pure-XLA rollout
    (same trajectories, scores to float tolerance)."""
    from speaker_follower_tpu.agents import rollout as ra
    from speaker_follower_tpu.data.dataset import R2RDataset, encode_batch
    from speaker_follower_tpu.data.features import random_feature_bank
    from speaker_follower_tpu.data.graph import load_graph_bank
    from speaker_follower_tpu.data.text import Tokenizer, read_vocab
    from speaker_follower_tpu.env import vecenv
    from speaker_follower_tpu.models.follower import init_follower

    vocab = read_vocab("/root/reference/tasks/R2R/data/sub_train_vocab.txt")
    ds = R2RDataset(["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab),
                    batch_size=8, seed=10)
    keep = sorted(ds.scans)[:2]
    ds.data = [d for d in ds.data if d["scan"] in keep]
    bank = load_graph_bank(keep, "/root/reference/connectivity")
    feats = random_feature_bank(bank, dim=64, seed=0)
    tables_x = vecenv.make_env_tables(bank, feats)
    tables_p = vecenv.make_env_tables(bank, feats, pad_views=True)
    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=64 + 128, feature_size=64 + 128,
    )
    enc = encode_batch(ds.next_minibatch(), bank, max_instruction_length=40)
    db = {k: jnp.asarray(enc[k]) for k in
          ["scan", "start_node", "goal_node", "heading", "seq", "seq_mask", "seq_length"]}

    out_x = ra.rollout(params, tables_x, db, jax.random.PRNGKey(1),
                       feedback="argmax", episode_len=10)
    out_p = ra.rollout(params, tables_p, db, jax.random.PRNGKey(1),
                       feedback="argmax", episode_len=10,
                       use_pallas=True, pallas_interpret=True)
    np.testing.assert_array_equal(np.asarray(out_x.nodes), np.asarray(out_p.nodes))
    np.testing.assert_array_equal(np.asarray(out_x.actions), np.asarray(out_p.actions))
    np.testing.assert_allclose(
        np.asarray(out_x.score), np.asarray(out_p.score), atol=1e-4
    )


def test_pano_attention_gradients_match_xla():
    """custom_vjp backward must equal XLA autodiff of the reference path."""
    from speaker_follower_tpu.ops.pano_attention import (
        pano_attention,
        pano_attention_reference,
    )

    rng = np.random.RandomState(3)
    t, d, b = 30, 128, 8
    features = pad_views_for_pallas(
        jnp.asarray(rng.randn(t, 36, d).astype(np.float32))
    )
    loc_table = jnp.asarray(rng.randn(36, 36, 128).astype(np.float32))
    gnode = jnp.asarray(rng.randint(t, size=b).astype(np.int32))
    view = jnp.asarray(rng.randint(36, size=b).astype(np.int32))
    v_feat = jnp.asarray(rng.randn(b, d).astype(np.float32) * 0.1)
    v_loc = jnp.asarray(rng.randn(b, 128).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(b).astype(np.float32))

    def loss_fused(vf, vl, bb):
        w, a = pano_attention(features, loc_table, gnode, view, vf, vl, bb,
                              8, True)
        return (w**2).sum() + (a * jnp.arange(36)).sum()

    def loss_ref(vf, vl, bb):
        w, a = pano_attention_reference(features, loc_table, gnode, view, vf, vl, bb)
        return (w**2).sum() + (a * jnp.arange(36)).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(v_feat, v_loc, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(v_feat, v_loc, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-4)

    # unaligned batch (5 % 8 != 0): the backward pads rows internally and
    # slices the grads back — padded-row grads must not leak in
    def loss_fused5(vf, vl, bb):
        w, a = pano_attention(
            features, loc_table, gnode[:5], view[:5], vf, vl, bb, None, True
        )
        return (w**2).sum() + (a * jnp.arange(36)).sum()

    def loss_ref5(vf, vl, bb):
        w, a = pano_attention_reference(
            features, loc_table, gnode[:5], view[:5], vf, vl, bb
        )
        return (w**2).sum() + (a * jnp.arange(36)).sum()

    g1 = jax.grad(loss_fused5, argnums=(0, 1, 2))(
        v_feat[:5], v_loc[:5], bias[:5]
    )
    g2 = jax.grad(loss_ref5, argnums=(0, 1, 2))(v_feat[:5], v_loc[:5], bias[:5])
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-4)


def test_fused_pano_backward_matches_xla_oracle():
    """The Pallas backward (_fused_pano_attention_bwd) against the retained
    XLA backward oracle (_pa_bwd_xla) on identical residuals/cotangents —
    keeps the oracle itself exercised."""
    from speaker_follower_tpu.ops import pano_attention as pa

    rng = np.random.RandomState(5)
    t, d, b = 20, 128, 8
    features = pad_views_for_pallas(
        jnp.asarray(rng.randn(t, 36, d).astype(np.float32))
    )
    loc_table = jnp.asarray(rng.randn(36, 36, 128).astype(np.float32))
    gnode = jnp.asarray(rng.randint(t, size=b).astype(np.int32))
    view = jnp.asarray(rng.randint(36, size=b).astype(np.int32))
    attn = jax.nn.softmax(
        jnp.asarray(rng.randn(b, 36).astype(np.float32)), axis=-1
    )
    g_w = jnp.asarray(rng.randn(b, d + 128).astype(np.float32))
    g_a = jnp.asarray(rng.randn(b, 36).astype(np.float32))

    res = (features, loc_table, gnode, view, attn)
    gf_x, gl_x, gb_x = pa._pa_bwd_xla(None, True, res, (g_w, g_a))[4:]
    gf_p, gl_p, gb_p = pa._pa_bwd(8, True, res, (g_w, g_a))[4:]
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl_p), np.asarray(gl_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_x),
                               rtol=1e-4, atol=1e-4)


def test_fused_tail_logits_matches_reference():
    """ops/decoder_tail.fused_tail_logits (interpret) == the exact in-scan
    tail it replaces: text SoftDotAttention -> eltwise_prod_scoring_split
    -> valid masking."""
    from speaker_follower_tpu.models.attention import (
        eltwise_prod_scoring_init,
        soft_dot_attention_init,
    )
    from speaker_follower_tpu.ops.decoder_tail import (
        fused_tail_logits,
        fused_tail_logits_reference,
        tail_mats,
    )

    rng = np.random.RandomState(3)
    b, hdim, l, d, md = 13, 64, 24, 128, 15
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p_text = soft_dot_attention_init(k1, hdim)
    p_score = eltwise_prod_scoring_init(k2, hdim, d + 128, dot_dim=32)

    h1d = jnp.asarray(rng.randn(b, hdim).astype(np.float32) * 0.3)
    ctx = jnp.asarray(rng.randn(b, l, hdim).astype(np.float32) * 0.3)
    ctx_mask = jnp.asarray(rng.rand(b, l) < 0.3)
    ctx_mask = ctx_mask.at[:, 0].set(False)  # at least one visible token
    af = jnp.asarray(rng.randn(b, 16, d).astype(np.float32))
    trig = [jnp.asarray(rng.randn(b, md).astype(np.float32)) for _ in range(4)]
    valid = jnp.asarray(rng.rand(b, 16) < 0.7)
    valid = valid.at[:, 0].set(True)  # stop always valid

    ref = fused_tail_logits_reference(
        p_text, p_score, h1d, ctx, ctx_mask, af, *trig, valid
    )
    got = fused_tail_logits(
        h1d, ctx, ctx_mask, af, *trig, valid,
        tail_mats(p_text, p_score, d), block_b=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("feedback", ["argmax", "sample"])
def test_fused_tail_rollout_matches_unfused(feedback):
    """Full factored pallas rollout with the fused in-scan tail ==
    the same rollout with the XLA in-scan tail: identical trajectories
    and (tail-recomputed) loss."""
    from speaker_follower_tpu.agents import rollout as ra
    from speaker_follower_tpu.data.dataset import R2RDataset, encode_batch
    from speaker_follower_tpu.data.features import random_feature_bank
    from speaker_follower_tpu.data.graph import load_graph_bank
    from speaker_follower_tpu.data.text import Tokenizer, read_vocab
    from speaker_follower_tpu.env import vecenv
    from speaker_follower_tpu.models.follower import init_follower

    vocab = read_vocab("/root/reference/tasks/R2R/data/sub_train_vocab.txt")
    ds = R2RDataset(["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab),
                    batch_size=8, seed=11)
    keep = sorted(ds.scans)[:2]
    ds.data = [d for d in ds.data if d["scan"] in keep]
    bank = load_graph_bank(keep, "/root/reference/connectivity")
    feats = random_feature_bank(bank, dim=64, seed=0)
    tables = vecenv.make_env_tables(bank, feats, pad_views=True)
    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=64 + 128, feature_size=64 + 128,
    )
    enc = encode_batch(ds.next_minibatch(), bank, max_instruction_length=40)
    db = {k: jnp.asarray(enc[k]) for k in
          ["scan", "start_node", "goal_node", "heading", "seq", "seq_mask",
           "seq_length"]}

    kw = dict(feedback=feedback, episode_len=10, deterministic=False,
              dropout_ratio=0.4, use_pallas=True, pallas_interpret=True,
              factored_loss=True)
    out_u = ra.rollout(params, tables, db, jax.random.PRNGKey(2),
                       fused_tail=False, **kw)
    out_f = ra.rollout(params, tables, db, jax.random.PRNGKey(2),
                       fused_tail=True, **kw)
    np.testing.assert_array_equal(np.asarray(out_u.actions),
                                  np.asarray(out_f.actions))
    np.testing.assert_array_equal(np.asarray(out_u.nodes),
                                  np.asarray(out_f.nodes))
    np.testing.assert_allclose(np.asarray(out_f.loss), np.asarray(out_u.loss),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_f.action_scores),
                               np.asarray(out_u.action_scores),
                               rtol=1e-4, atol=1e-5)


def test_fused_tail_rollout_grads_match_unfused():
    """Gradients of the factored sample rollout are identical with the
    fused selection tail (it is forward-only, stop-gradient: the backward
    path — factored tail + LSTM chain — is untouched)."""
    from speaker_follower_tpu.agents import rollout as ra
    from speaker_follower_tpu.data.dataset import R2RDataset, encode_batch
    from speaker_follower_tpu.data.features import random_feature_bank
    from speaker_follower_tpu.data.graph import load_graph_bank
    from speaker_follower_tpu.data.text import Tokenizer, read_vocab
    from speaker_follower_tpu.env import vecenv
    from speaker_follower_tpu.models.follower import init_follower

    vocab = read_vocab("/root/reference/tasks/R2R/data/sub_train_vocab.txt")
    ds = R2RDataset(["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab),
                    batch_size=4, seed=12)
    keep = sorted(ds.scans)[:1]
    ds.data = [d for d in ds.data if d["scan"] in keep]
    bank = load_graph_bank(keep, "/root/reference/connectivity")
    feats = random_feature_bank(bank, dim=32, seed=0)
    tables = vecenv.make_env_tables(bank, feats, pad_views=True)
    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=8,
        hidden_size=16, action_embedding_size=32 + 128, feature_size=32 + 128,
    )
    enc = encode_batch(ds.next_minibatch(), bank, max_instruction_length=24)
    db = {k: jnp.asarray(enc[k]) for k in
          ["scan", "start_node", "goal_node", "heading", "seq", "seq_mask",
           "seq_length"]}

    def loss(p, fused):
        return ra.rollout(
            p, tables, db, jax.random.PRNGKey(3), feedback="sample",
            episode_len=6, deterministic=False, dropout_ratio=0.3,
            use_pallas=True, pallas_interpret=True, factored_loss=True,
            fused_tail=fused,
        ).loss

    g_u = jax.grad(lambda p: loss(p, False))(params)
    g_f = jax.grad(lambda p: loss(p, True))(params)
    flat_u, _ = jax.tree.flatten(g_u)
    flat_f, _ = jax.tree.flatten(g_f)
    for a, b_ in zip(flat_u, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6)
