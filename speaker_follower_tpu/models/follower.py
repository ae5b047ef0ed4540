"""Follower models: instruction encoder + panoramic-attention action decoder.

Reference: tasks/R2R/model.py:43-104 (EncoderLSTM) and :355-397
(AttnDecoderLSTM).  Dims are kept identical (hidden 512, word emb 300,
action/feature 2048+128) so released checkpoints can be converted for
parity testing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import attention as attn
from .core import (
    dropout,
    embedding,
    embedding_init,
    linear,
    linear_init,
    lstm_cell,
    lstm_cell_init,
    masked_lstm_scan,
)


def encoder_init(
    key,
    vocab_size: int,
    embedding_size: int = 300,
    hidden_size: int = 512,
    bidirectional: bool = False,
    glove=None,
    dtype=jnp.float32,
):
    """EncoderLSTM params. With ``bidirectional`` the reference halves the
    hidden size at construction (train.py:194) — callers pass the halved
    size here, matching ``enc_hidden_size``."""
    k = jax.random.split(key, 4)
    num_directions = 2 if bidirectional else 1
    p = {
        "embedding": embedding_init(k[0], vocab_size, embedding_size, dtype),
        "lstm_fwd": lstm_cell_init(k[1], embedding_size, hidden_size, dtype),
        "encoder2decoder": linear_init(
            k[3], hidden_size * num_directions, hidden_size * num_directions
        ),
    }
    if bidirectional:
        p["lstm_bwd"] = lstm_cell_init(k[2], embedding_size, hidden_size, dtype)
    if glove is not None:
        # reference overwrites the whole matrix with GloVe AFTER the
        # padding_idx zeroing (model.py:55-59), so row 0 is glove's row 0
        p["embedding"]["w"] = jnp.asarray(glove, dtype)
    else:
        # nn.Embedding(padding_idx=0) zero-initializes row 0
        p["embedding"]["w"] = p["embedding"]["w"].at[0].set(0.0)
    return p


def encoder_apply(
    p,
    seq,
    lengths,
    *,
    dropout_ratio: float = 0.5,
    use_glove: bool = True,
    deterministic: bool = True,
    rng=None,
    use_pallas_lstm: bool = False,
    pallas_interpret: bool = False,
):
    """Returns (ctx (B, L, H*dirs), decoder_h0 (B, H*dirs), c0 (B, H*dirs)).

    Semantics parity with model.py:81-104: GloVe embeddings skip the input
    dropout; packed-sequence behavior is emulated by masked scan (final
    state at t = len-1, zero ctx at padding); for the bi-LSTM the final
    states are concat(h_last_layer_bwd? ...) — torch orders
    (enc_h_t[-1], enc_h_t[-2]) = (backward, forward) for a single-layer
    bi-LSTM, and ctx is concat(forward, backward) per timestep.
    """
    b = seq.shape[0]
    embeds = embedding(p["embedding"], seq)  # (B, L, E)
    if not use_glove and rng is not None:
        rng, k = jax.random.split(rng)
        embeds = dropout(k, embeds, dropout_ratio, deterministic)
    hidden = p["lstm_fwd"]["w_hh"].shape[-1]
    h0 = jnp.zeros((b, hidden), embeds.dtype)
    c0 = jnp.zeros((b, hidden), embeds.dtype)

    if use_pallas_lstm:
        # fused weights-resident Pallas scan (ops/lstm.py): whole time
        # loop as one kernel, w_hh resident in VMEM
        from ..ops.lstm import masked_lstm_scan_pallas

        scan = partial(masked_lstm_scan_pallas, interpret=pallas_interpret)
    else:
        scan = masked_lstm_scan
    ctx_f, (h_f, c_f) = scan(p["lstm_fwd"], embeds, lengths, h0, c0)
    if "lstm_bwd" in p:
        ctx_b, (h_b, c_b) = scan(
            p["lstm_bwd"], embeds, lengths, h0, c0, reverse=True
        )
        ctx = jnp.concatenate([ctx_f, ctx_b], axis=-1)
        # torch cat((enc_h_t[-1], enc_h_t[-2])): last = backward direction
        h_t = jnp.concatenate([h_b, h_f], axis=-1)
        c_t = jnp.concatenate([c_b, c_f], axis=-1)
    else:
        ctx = ctx_f
        h_t, c_t = h_f, c_f

    decoder_init = jnp.tanh(linear(p["encoder2decoder"], h_t))
    if rng is not None:
        rng, k = jax.random.split(rng)
        ctx = dropout(k, ctx, dropout_ratio, deterministic)
    return ctx, decoder_init, c_t


def decoder_init_params(
    key,
    embedding_size: int = 2048 + 128,  # action embedding size
    hidden_size: int = 512,
    feature_size: int = 2048 + 128,
    dtype=jnp.float32,
):
    """AttnDecoderLSTM params (model.py:355-375)."""
    k = jax.random.split(key, 4)
    return {
        "lstm": lstm_cell_init(k[0], embedding_size + feature_size, hidden_size, dtype),
        "visual_attention": attn.visual_soft_dot_init(k[1], hidden_size, feature_size),
        "text_attention": attn.soft_dot_attention_init(k[2], hidden_size),
        "decoder2action": attn.eltwise_prod_scoring_init(k[3], hidden_size, embedding_size),
    }


def decoder_core(p, u_t_prev, feature, h_0, c_0, *, dropout_ratio,
                 deterministic, rng):
    """The sequential half of decoder_step: attended visual context +
    previous action embedding -> input dropout -> LSTMCell
    (model.py:377-385).  ``feature`` is the visual-attention output
    (B, F).  The h1 dropout that follows in decoder_step belongs to the
    TAIL (text attention onward) — its key is ``h1_dropout_key(rng)``."""
    concat_input = jnp.concatenate([u_t_prev, feature], axis=-1)
    if rng is not None:
        _, k = jax.random.split(rng)
        concat_input = dropout(k, concat_input, dropout_ratio, deterministic)
    return lstm_cell(p["lstm"], concat_input, h_0, c_0)


def h1_dropout_key(rng):
    """Key decoder_step uses for the post-cell h1 dropout, as a pure
    function of the step rng: the first split feeds the concat-input
    dropout (decoder_core), the second feeds h1.  Kept as a helper so the
    factored time-batched tail (agents/rollout.py) reproduces the exact
    same masks as the in-scan step."""
    a, _ = jax.random.split(rng)
    _, k = jax.random.split(a)
    return k


def decoder_tail_time_batched(
    p,
    h1_seq,  # (T, B, H) post-cell hidden states (pre-dropout)
    drop_keys,  # (T, 2) uint32 per-step rng (the rng decoder_step got) or None
    ctx,  # (B, L, H)
    ctx_mask,  # (B, L) True = masked, or None
    af,  # (T, B, MD, D) neighbor view features, or None with ``bank``
    sin_h, cos_h, sin_e, cos_e,  # (T, B, MD) per-action relative-angle trig
    *,
    dropout_ratio: float = 0.5,
    deterministic: bool = True,
    bank=None,  # (features (T, 40, D), gnode (T, B), nbr_view (T, B, MD)):
    #   score actions with the fused Pallas bank kernel instead of a
    #   materialized af (ops/bank_score.py) — XLA's two-axis row gather is
    #   the factored tail's bottleneck otherwise
    pallas_interpret: bool = False,
):
    """decoder_step's tail — h1 dropout -> text SoftDotAttention ->
    EltwiseProdScoring (split form) — for ALL T decoder steps at once.

    No gradient flows through action SELECTION (integers), so the tail can
    be computed time-batched outside the sequential scan: the MXU sees
    (T*B)-row matmuls instead of T sequential B-row ones, and the backward
    pass through ~60% of the per-step chain batches over time.  With
    ``drop_keys`` from the scan, the h1 dropout masks are bit-identical to
    the in-scan decoder_step's (h1_dropout_key), so the factored loss
    equals the unfactored one exactly.

    Returns (logits (T, B, A), alpha (T, B, L), h_tilde (T, B, H)).
    """
    t_dim, b, hdim = h1_seq.shape
    if drop_keys is not None:
        h_drop = jax.vmap(
            lambda k, x: dropout(
                h1_dropout_key(k), x, dropout_ratio, deterministic
            )
        )(drop_keys, h1_seq)
    else:
        h_drop = h1_seq
    pt = p["text_attention"]
    target = linear(pt["linear_in"], h_drop)  # (T, B, H)
    scores = jnp.einsum("blh,tbh->tbl", ctx, target)
    if ctx_mask is not None:
        scores = jnp.where(ctx_mask[None], attn.NEG_INF, scores)
    alpha = jax.nn.softmax(scores, axis=-1)
    weighted = jnp.einsum("tbl,blh->tbh", alpha, ctx)
    h_tilde = jnp.tanh(
        linear(pt["linear_out"], jnp.concatenate([weighted, h_drop], -1))
    )
    flat = lambda x: x.reshape((t_dim * b,) + x.shape[2:])  # noqa: E731
    if bank is not None:
        features, gnode, nbr_view = bank
        logits = attn.eltwise_prod_scoring_bank(
            p["decoder2action"], flat(h_tilde), features, flat(gnode),
            flat(nbr_view), flat(sin_h), flat(cos_h), flat(sin_e),
            flat(cos_e), interpret=pallas_interpret,
        )
    else:
        logits = attn.eltwise_prod_scoring_split(
            p["decoder2action"], flat(h_tilde), flat(af),
            flat(sin_h), flat(cos_h), flat(sin_e), flat(cos_e),
        )
    return logits.reshape(t_dim, b, -1), alpha, h_tilde


def decoder_step(
    p,
    u_t_prev,  # (B, E) previous action embedding
    all_u_t,  # (B, A, E) candidate action embeddings
    visual_context,  # (B, V, F) panorama features
    h_0,
    c_0,
    ctx,  # (B, L, H)
    ctx_mask=None,  # (B, L) True = masked
    *,
    dropout_ratio: float = 0.5,
    deterministic: bool = True,
    rng=None,
    fast: bool = True,
    precomputed_visual=None,
    precomputed_action=None,
):
    """One decoder step (model.py:377-397).

    Returns (h_1, c_1, text_alpha, logit, visual_alpha).  Invalid-action
    masking of the logits is the agent's job (follower.py:477).

    ``fast`` uses the algebraically reassociated attention/scoring (same
    function up to float rounding, ~4x fewer FLOPs; see attention.py).
    ``precomputed_visual``: optional (feature, alpha_v) from the Pallas
    fused pano-attention kernel — skips the in-graph visual attention
    (``visual_context`` may then be None).
    ``precomputed_action``: optional (af, sin_h, cos_h, sin_e, cos_e) —
    neighbor view features from the fused kernel plus per-action trig; the
    scoring runs split (eltwise_prod_scoring_split) and ``all_u_t`` may be
    None (the (B, A, D+128) embedding tensor is never materialized).
    """
    if precomputed_visual is not None:
        feature, alpha_v = precomputed_visual
        feature = feature.astype(h_0.dtype)
    else:
        vis_attn = attn.visual_soft_dot_fast if fast else attn.visual_soft_dot
        feature, alpha_v = vis_attn(
            p["visual_attention"], h_0, visual_context.astype(h_0.dtype)
        )
    h_1, c_1 = decoder_core(
        p, u_t_prev, feature, h_0, c_0,
        dropout_ratio=dropout_ratio, deterministic=deterministic, rng=rng,
    )
    h_1_drop = h_1
    if rng is not None:
        h_1_drop = dropout(
            h1_dropout_key(rng), h_1, dropout_ratio, deterministic
        )
    h_tilde, alpha = attn.soft_dot_attention(
        p["text_attention"], h_1_drop, ctx, ctx_mask
    )
    if precomputed_action is not None:
        af, sin_h, cos_h, sin_e, cos_e = precomputed_action
        logit = attn.eltwise_prod_scoring_split(
            p["decoder2action"], h_tilde, af, sin_h, cos_h, sin_e, cos_e
        )
    else:
        scoring = attn.eltwise_prod_scoring_fast if fast else attn.eltwise_prod_scoring
        logit = scoring(p["decoder2action"], h_tilde, all_u_t.astype(h_0.dtype))
    return h_1, c_1, alpha, logit, alpha_v


def init_follower(
    key,
    vocab_size: int,
    *,
    word_embedding_size: int = 300,
    hidden_size: int = 512,
    action_embedding_size: int = 2048 + 128,
    feature_size: int = 2048 + 128,
    bidirectional: bool = False,
    glove=None,
):
    """Full follower param pytree (encoder + decoder)."""
    k_enc, k_dec = jax.random.split(key)
    enc_hidden = hidden_size // 2 if bidirectional else hidden_size
    return {
        "encoder": encoder_init(
            k_enc,
            vocab_size,
            word_embedding_size,
            enc_hidden,
            bidirectional=bidirectional,
            glove=glove,
        ),
        "decoder": decoder_init_params(
            k_dec, action_embedding_size, hidden_size, feature_size
        ),
    }
