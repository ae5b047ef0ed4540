"""Model numerics parity vs PyTorch (CPU).

We build equivalent computations with stock torch.nn modules, copy weights
into our pytrees, and require allclose outputs.  This pins down the LSTM
gate order/packed-sequence emulation, attention math, and the follower/
speaker step semantics the agents depend on.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from speaker_follower_tpu.models import attention as attn
from speaker_follower_tpu.models import core


def t2n(t):
    return t.detach().numpy()


class TestLSTMCell:
    def test_matches_torch(self):
        torch.manual_seed(0)
        b, din, h = 5, 7, 11
        cell = torch.nn.LSTMCell(din, h)
        p = {
            "w_ih": jnp.asarray(t2n(cell.weight_ih)),
            "w_hh": jnp.asarray(t2n(cell.weight_hh)),
            "b_ih": jnp.asarray(t2n(cell.bias_ih)),
            "b_hh": jnp.asarray(t2n(cell.bias_hh)),
        }
        x = torch.randn(b, din)
        h0 = torch.randn(b, h)
        c0 = torch.randn(b, h)
        th, tc = cell(x, (h0, c0))
        jh, jc = core.lstm_cell(p, jnp.asarray(t2n(x)), jnp.asarray(t2n(h0)), jnp.asarray(t2n(c0)))
        np.testing.assert_allclose(np.asarray(jh), t2n(th), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jc), t2n(tc), atol=1e-5)


class TestMaskedLSTM:
    def _torch_packed(self, lstm, x, lengths):
        from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

        packed = pack_padded_sequence(x, lengths, batch_first=True, enforce_sorted=False)
        out, (h_t, c_t) = lstm(packed)
        ctx, _ = pad_packed_sequence(out, batch_first=True, total_length=x.shape[1])
        return ctx, h_t, c_t

    def test_forward_packed_equivalence(self):
        torch.manual_seed(1)
        b, l, din, h = 4, 6, 5, 8
        lstm = torch.nn.LSTM(din, h, 1, batch_first=True)
        p = {
            "w_ih": jnp.asarray(t2n(lstm.weight_ih_l0)),
            "w_hh": jnp.asarray(t2n(lstm.weight_hh_l0)),
            "b_ih": jnp.asarray(t2n(lstm.bias_ih_l0)),
            "b_hh": jnp.asarray(t2n(lstm.bias_hh_l0)),
        }
        x = torch.randn(b, l, din)
        lengths = torch.tensor([6, 4, 3, 1])
        ctx, h_t, c_t = self._torch_packed(lstm, x, lengths)
        h0 = jnp.zeros((b, h))
        jctx, (jh, jc) = core.masked_lstm_scan(
            p, jnp.asarray(t2n(x)), jnp.asarray(lengths.numpy()), h0, h0
        )
        np.testing.assert_allclose(np.asarray(jctx), t2n(ctx), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jh), t2n(h_t[-1]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jc), t2n(c_t[-1]), atol=1e-5)

    def test_bidirectional_packed_equivalence(self):
        torch.manual_seed(2)
        b, l, din, h = 4, 7, 5, 6
        lstm = torch.nn.LSTM(din, h, 1, batch_first=True, bidirectional=True)
        pf = {
            "w_ih": jnp.asarray(t2n(lstm.weight_ih_l0)),
            "w_hh": jnp.asarray(t2n(lstm.weight_hh_l0)),
            "b_ih": jnp.asarray(t2n(lstm.bias_ih_l0)),
            "b_hh": jnp.asarray(t2n(lstm.bias_hh_l0)),
        }
        pb = {
            "w_ih": jnp.asarray(t2n(lstm.weight_ih_l0_reverse)),
            "w_hh": jnp.asarray(t2n(lstm.weight_hh_l0_reverse)),
            "b_ih": jnp.asarray(t2n(lstm.bias_ih_l0_reverse)),
            "b_hh": jnp.asarray(t2n(lstm.bias_hh_l0_reverse)),
        }
        x = torch.randn(b, l, din)
        lengths = torch.tensor([7, 5, 2, 1])
        ctx, h_t, c_t = self._torch_packed(lstm, x, lengths)

        xj = jnp.asarray(t2n(x))
        lj = jnp.asarray(lengths.numpy())
        h0 = jnp.zeros((b, h))
        ctx_f, (hf, cf) = core.masked_lstm_scan(pf, xj, lj, h0, h0)
        ctx_b, (hb, cb) = core.masked_lstm_scan(pb, xj, lj, h0, h0, reverse=True)
        jctx = jnp.concatenate([ctx_f, ctx_b], axis=-1)
        np.testing.assert_allclose(np.asarray(jctx), t2n(ctx), atol=1e-5)
        # torch bi-LSTM final states: h_t[0] = forward, h_t[1] = backward
        np.testing.assert_allclose(np.asarray(hf), t2n(h_t[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(hb), t2n(h_t[1]), atol=1e-5)


class TestAttention:
    def test_soft_dot(self):
        torch.manual_seed(3)
        b, l, d = 3, 9, 8
        lin_in = torch.nn.Linear(d, d, bias=False)
        lin_out = torch.nn.Linear(2 * d, d, bias=False)
        h = torch.randn(b, d)
        ctx = torch.randn(b, l, d)
        mask = torch.zeros(b, l, dtype=torch.bool)
        mask[0, 5:] = True
        mask[2, 2:] = True

        target = lin_in(h).unsqueeze(2)
        a = torch.bmm(ctx, target).squeeze(2)
        a.masked_fill_(mask, -float("inf"))
        a = torch.softmax(a, dim=1)
        weighted = torch.bmm(a.unsqueeze(1), ctx).squeeze(1)
        h_tilde = torch.tanh(lin_out(torch.cat([weighted, h], 1)))

        p = {
            "linear_in": {"w": jnp.asarray(t2n(lin_in.weight))},
            "linear_out": {"w": jnp.asarray(t2n(lin_out.weight))},
        }
        jh, ja = attn.soft_dot_attention(
            p, jnp.asarray(t2n(h)), jnp.asarray(t2n(ctx)), jnp.asarray(mask.numpy())
        )
        np.testing.assert_allclose(np.asarray(jh), t2n(h_tilde), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ja), t2n(a), atol=1e-5)

    def test_visual_soft_dot(self):
        torch.manual_seed(4)
        b, v, dv, dh, dot = 3, 36, 16, 12, 10
        lin_h = torch.nn.Linear(dh, dot, bias=True)
        lin_v = torch.nn.Linear(dv, dot, bias=True)
        h = torch.randn(b, dh)
        vis = torch.randn(b, v, dv)
        target = lin_h(h).unsqueeze(2)
        context = lin_v(vis)
        a = torch.softmax(torch.bmm(context, target).squeeze(2), dim=1)
        weighted = torch.bmm(a.unsqueeze(1), vis).squeeze(1)

        p = {
            "linear_in_h": {"w": jnp.asarray(t2n(lin_h.weight)), "b": jnp.asarray(t2n(lin_h.bias))},
            "linear_in_v": {"w": jnp.asarray(t2n(lin_v.weight)), "b": jnp.asarray(t2n(lin_v.bias))},
        }
        jw, ja = attn.visual_soft_dot(p, jnp.asarray(t2n(h)), jnp.asarray(t2n(vis)))
        np.testing.assert_allclose(np.asarray(jw), t2n(weighted), atol=1e-5)

    def test_eltwise_prod_scoring(self):
        torch.manual_seed(5)
        b, a_num, da, dh, dot = 3, 14, 16, 12, 10
        lin_h = torch.nn.Linear(dh, dot, bias=True)
        lin_a = torch.nn.Linear(da, dot, bias=True)
        lin_o = torch.nn.Linear(dot, 1, bias=True)
        h = torch.randn(b, dh)
        u = torch.randn(b, a_num, da)
        logits = lin_o(lin_h(h).unsqueeze(1) * lin_a(u)).squeeze(2)

        p = {
            "linear_in_h": {"w": jnp.asarray(t2n(lin_h.weight)), "b": jnp.asarray(t2n(lin_h.bias))},
            "linear_in_a": {"w": jnp.asarray(t2n(lin_a.weight)), "b": jnp.asarray(t2n(lin_a.bias))},
            "linear_out": {"w": jnp.asarray(t2n(lin_o.weight)), "b": jnp.asarray(t2n(lin_o.bias))},
        }
        jl = attn.eltwise_prod_scoring(p, jnp.asarray(t2n(h)), jnp.asarray(t2n(u)))
        np.testing.assert_allclose(np.asarray(jl), t2n(logits), atol=1e-5)


class TestFollowerModels:
    def test_encoder_shapes_and_masking(self):
        from speaker_follower_tpu.models import follower as fm

        key = jax.random.PRNGKey(0)
        p = fm.encoder_init(key, vocab_size=30, embedding_size=8, hidden_size=16)
        seq = jnp.array([[5, 6, 7, 0, 0], [8, 9, 0, 0, 0]], jnp.int32)
        lengths = jnp.array([3, 2], jnp.int32)
        ctx, h0, c0 = fm.encoder_apply(p, seq, lengths)
        assert ctx.shape == (2, 5, 16)
        assert h0.shape == (2, 16) and c0.shape == (2, 16)
        # padded ctx positions are zero (pad_packed semantics)
        assert np.allclose(np.asarray(ctx[0, 3:]), 0.0)
        assert np.allclose(np.asarray(ctx[1, 2:]), 0.0)
        # final state independent of padding content
        seq2 = seq.at[0, 3].set(11)
        ctx2, h02, c02 = fm.encoder_apply(p, seq2, lengths)
        np.testing.assert_allclose(np.asarray(h0), np.asarray(h02), atol=1e-6)

    def test_decoder_step_shapes(self):
        from speaker_follower_tpu.models import follower as fm

        key = jax.random.PRNGKey(1)
        b, a_num, v, e, f, h = 3, 16, 36, 20, 20, 16
        p = fm.decoder_init_params(key, embedding_size=e, hidden_size=h, feature_size=f)
        u_prev = jnp.zeros((b, e))
        all_u = jax.random.normal(key, (b, a_num, e))
        vis = jax.random.normal(key, (b, v, f))
        ctx = jax.random.normal(key, (b, 7, h))
        h0 = jnp.zeros((b, h))
        h1, c1, alpha, logit, alpha_v = fm.decoder_step(
            p, u_prev, all_u, vis, h0, h0, ctx
        )
        assert h1.shape == (b, h) and logit.shape == (b, a_num)
        assert alpha.shape == (b, 7) and alpha_v.shape == (b, v)


class TestSpeakerModels:
    def test_speaker_encoder_no_length_masking(self):
        """Padded steps (zero embeddings) still update h — reference
        behavior (speaker.py:96-104 with model.py:437-457)."""
        from speaker_follower_tpu.models import speaker as sm

        key = jax.random.PRNGKey(2)
        p = sm.speaker_encoder_init(key, 10, 12, 16)
        b, t, v = 2, 5, 4
        a_emb = jax.random.normal(key, (b, t, 10))
        w_feat = jax.random.normal(key, (b, t, v, 12))
        ctx, h0, c0 = sm.speaker_encoder_apply(p, a_emb, w_feat)
        assert ctx.shape == (b, t, 16)
        # zeroing the tail inputs changes ctx tail but h0 still comes from
        # the full unroll (no masking)
        a_emb2 = a_emb.at[:, 3:].set(0.0)
        w_feat2 = w_feat.at[:, 3:].set(0.0)
        ctx2, h02, _ = sm.speaker_encoder_apply(p, a_emb2, w_feat2)
        assert not np.allclose(np.asarray(h0), np.asarray(h02))

    def test_speaker_decoder_step(self):
        from speaker_follower_tpu.models import speaker as sm

        key = jax.random.PRNGKey(3)
        p = sm.speaker_decoder_init(key, vocab_size=20, vocab_embedding_size=8, hidden_size=16)
        b, t = 3, 5
        ctx = jax.random.normal(key, (b, t, 16))
        h0 = jnp.zeros((b, 16))
        mask = jnp.zeros((b, t), bool).at[1, 3:].set(True)
        h1, c1, alpha, logit = sm.speaker_decoder_step(
            p, jnp.array([3, 3, 3]), h0, h0, ctx, mask
        )
        assert logit.shape == (b, 20)
        assert np.allclose(np.asarray(alpha[1, 3:]), 0.0)


class TestFastAttentionEquivalence:
    """The reassociated fast paths compute the same function as the exact
    reference formulations (up to f32 reassociation rounding)."""

    def test_visual_soft_dot_fast(self):
        key = jax.random.PRNGKey(7)
        p = attn.visual_soft_dot_init(key, 512, 2176)
        h = jax.random.normal(key, (4, 512))
        vis = jax.random.normal(jax.random.PRNGKey(8), (4, 36, 2176))
        w1, a1 = attn.visual_soft_dot(p, h, vis)
        w2, a2 = attn.visual_soft_dot_fast(p, h, vis)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=2e-4)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=2e-3)

    def test_eltwise_prod_scoring_fast(self):
        key = jax.random.PRNGKey(9)
        p = attn.eltwise_prod_scoring_init(key, 512, 2176)
        h = jax.random.normal(key, (4, 512))
        u = jax.random.normal(jax.random.PRNGKey(10), (4, 16, 2176))
        l1 = attn.eltwise_prod_scoring(p, h, u)
        l2 = attn.eltwise_prod_scoring_fast(p, h, u)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-3)

    def test_decoder_step_fast_vs_exact(self):
        from speaker_follower_tpu.models import follower as fm

        key = jax.random.PRNGKey(11)
        b, a_num, v, e, f, h = 3, 16, 36, 64, 64, 32
        p = fm.decoder_init_params(key, embedding_size=e, hidden_size=h, feature_size=f)
        u_prev = jax.random.normal(key, (b, e))
        all_u = jax.random.normal(key, (b, a_num, e))
        vis = jax.random.normal(key, (b, v, f))
        ctx = jax.random.normal(key, (b, 7, h))
        h0 = jnp.zeros((b, h))
        out_fast = fm.decoder_step(p, u_prev, all_u, vis, h0, h0, ctx, fast=True)
        out_exact = fm.decoder_step(p, u_prev, all_u, vis, h0, h0, ctx, fast=False)
        for x, y in zip(out_fast, out_exact):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4)


class TestVariants:
    def test_speaker_input_att_feed_variant(self):
        from speaker_follower_tpu.models import speaker as sm

        key = jax.random.PRNGKey(20)
        p = sm.speaker_decoder_init(
            key, vocab_size=30, vocab_embedding_size=8, hidden_size=16,
            use_input_att_feed=True,
        )
        assert "output_l1" in p
        ctx = jax.random.normal(key, (2, 5, 16))
        h0 = jnp.zeros((2, 16))
        h1, c1, alpha, logit = sm.speaker_decoder_step(
            p, jnp.array([3, 3]), h0, h0, ctx, use_input_att_feed=True
        )
        assert logit.shape == (2, 30)

    def test_bidirectional_follower_encoder(self):
        from speaker_follower_tpu.models import follower as fm

        key = jax.random.PRNGKey(21)
        p = fm.init_follower(
            key, vocab_size=30, word_embedding_size=8, hidden_size=16,
            action_embedding_size=40, feature_size=40, bidirectional=True,
        )
        seq = jnp.array([[5, 6, 7, 0], [8, 9, 0, 0]], jnp.int32)
        ctx, h0, c0 = fm.encoder_apply(p["encoder"], seq, jnp.array([3, 2]))
        # enc hidden halved, directions concatenated back to hidden_size
        assert ctx.shape == (2, 4, 16)
        assert h0.shape == (2, 16)
