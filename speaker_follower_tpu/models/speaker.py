"""Speaker models: trajectory encoder + word decoder.

Reference: tasks/R2R/model.py:405-457 (SpeakerEncoderLSTM) and :460-519
(SpeakerDecoderLSTM).  Parity notes:
  * the trajectory encoder is a manually unrolled LSTMCell with per-step
    visual attention; the reference does NOT length-mask the unroll —
    padded steps feed zero embeddings and still update (h, c), and
    ``decoder_init`` comes from the final (post-padding) h.  The padded ctx
    positions are masked only inside the decoder's text attention.  We
    reproduce that exactly (with lax.scan);
  * the word decoder's BOS is vocab index 3 (which is "the" in the released
    vocab — see data/text.py);
  * ``use_input_att_feed`` selects the input-attention-feed variant
    (model.py:504-513).
"""

from __future__ import annotations

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
)


def speaker_encoder_init(
    key,
    action_embedding_size: int = 2048 + 128,
    world_embedding_size: int = 2048 + 128,
    hidden_size: int = 512,
    dtype=jnp.float32,
):
    k = jax.random.split(key, 3)
    return {
        "visual_attention": attn.visual_soft_dot_init(
            k[0], hidden_size, world_embedding_size
        ),
        "lstm": lstm_cell_init(
            k[1], action_embedding_size + world_embedding_size, hidden_size, dtype
        ),
        "encoder2decoder": linear_init(k[2], hidden_size, hidden_size),
    }


def speaker_encoder_apply(
    p,
    action_embeddings,  # (B, T, E) chosen-action embeddings per step
    world_features,  # (B, T, V, F) panorama features per step, or None
    *,
    dropout_ratio: float = 0.5,
    deterministic: bool = True,
    rng=None,
    valid_len=None,
    tables=None,
    gnode=None,  # (B, T) int32 — lazy mode (world_features None)
    view_index=None,  # (B, T) int32
    live=None,  # (B, T) bool — steps whose panorama is real (not padding)
    use_pallas: bool = False,
    pallas_interpret: bool = False,
):
    """Returns (ctx (B, T, H), decoder_h0 (B, H), c (B, H)).

    NOTE: no per-item length masking on the unroll, by design (see module
    docstring): the reference runs the LSTM through zero-padded steps up
    to the BATCH max path length (_batch_observations_and_actions sizes
    tensors to the batch max, speaker.py:68-121), so h_f depends on the
    batch composition.  ``valid_len`` (a traced scalar) reproduces that
    dynamic unroll under a static T: steps t >= valid_len leave (h, c)
    unchanged — exactly what a shorter unroll would compute.  None = the
    static T is the unroll (callers that already shrink-wrap T to the
    batch max on the host).

    Lazy mode (``world_features=None``): pass ``tables`` + per-step
    ``gnode``/``view_index``/``live`` instead; each step gathers its own
    (B, 36, D) panorama from the bank inside the scan, so the
    (B, T, 36, D) stack never exists in the program — value-exact vs the
    materialized path (agents/speaker.forced_rollout ``lazy_features``).
    """
    b, t, _ = action_embeddings.shape
    hidden = p["lstm"]["w_hh"].shape[-1]
    # carry dtype must match the cell OUTPUT dtype: f32 params over bf16
    # inputs promote to f32 (mixed precision casts params instead)
    carry_dtype = jnp.result_type(
        p["lstm"]["w_hh"].dtype, action_embeddings.dtype
    )
    h0 = jnp.zeros((b, hidden), carry_dtype)
    c0 = jnp.zeros((b, hidden), carry_dtype)

    if rng is not None:
        step_keys = jax.random.split(rng, t)
    else:
        step_keys = jnp.zeros((t, 2), jnp.uint32)

    lazy = world_features is None
    if lazy:
        assert tables is not None and gnode is not None
        feat_dtype = tables.features.dtype
        num_views = 36
    if use_pallas:
        assert lazy, "the fused attention kernel needs lazy (bank) features"
        assert tables.features.shape[1] == 40, (
            "use_pallas requires view-padded tables "
            "(make_env_tables(..., pad_views=True))"
        )

    def step(carry, inp):
        h, c = carry
        if use_pallas:
            # fused gather + visual attention (ops/pano_attention.py, the
            # follower decoder's kernel — same math: the speaker encoder's
            # per-step attention IS VisualSoftDotAttention over the
            # current panorama, model.py:437-457): the (B, 36, D) slice
            # never exists in HBM; one DMA pass per block feeds the
            # attention logits, softmax, and weighted sum in VMEM.
            from ..ops.pano_attention import pano_attention

            a_emb, g_t, v_t, live_t, k, t_ix = inp
            p_v = p["visual_attention"]
            t_proj = linear(p_v["linear_in_h"], h)  # (B, dot)
            w_v = p_v["linear_in_v"]["w"]
            d_feat = tables.features.shape[-1]
            weighted, _ = pano_attention(
                tables.features,
                tables.loc_embed,
                g_t,
                v_t,
                t_proj @ w_v[:, :d_feat],
                t_proj @ w_v[:, d_feat:],
                t_proj @ p_v["linear_in_v"]["b"],
                None,
                pallas_interpret,
            )
            # the materialized path zeroes the padded-step PANORAMA before
            # the attention; zeroing the weighted OUTPUT is value-equal
            # for the feature (softmax over zeros -> weighted sum of zeros)
            feature = jnp.where(
                live_t[:, None], weighted.astype(h.dtype), 0.0
            )
        else:
            if lazy:
                a_emb, g_t, v_t, live_t, k, t_ix = inp
                pano = tables.features[g_t][:, :num_views]  # (B, 36, D)
                loc = tables.loc_embed[v_t].astype(feat_dtype)
                w_feat = jnp.concatenate([pano, loc], axis=-1)
                w_feat = jnp.where(live_t[:, None, None], w_feat, 0.0)
            else:
                a_emb, w_feat, k, t_ix = inp
            feature, _ = attn.visual_soft_dot(p["visual_attention"], h, w_feat)
        concat_input = jnp.concatenate([a_emb, feature], axis=-1)
        if rng is not None:
            concat_input = dropout(k, concat_input, dropout_ratio, deterministic)
        h1, c1 = lstm_cell(p["lstm"], concat_input, h, c)
        if valid_len is not None:
            upd = t_ix < valid_len
            h1 = jnp.where(upd, h1, h)
            c1 = jnp.where(upd, c1, c)
        return (h1, c1), h1

    if lazy:
        xs = (
            jnp.swapaxes(action_embeddings, 0, 1),
            jnp.swapaxes(gnode, 0, 1),
            jnp.swapaxes(view_index, 0, 1),
            jnp.swapaxes(live, 0, 1),
            step_keys,
            jnp.arange(t),
        )
    else:
        xs = (
            jnp.swapaxes(action_embeddings, 0, 1),
            jnp.swapaxes(world_features, 0, 1),
            step_keys,
            jnp.arange(t),
        )
    (h_f, c_f), hs = jax.lax.scan(step, (h0, c0), xs)
    ctx = jnp.swapaxes(hs, 0, 1)  # (B, T, H)
    decoder_init = jnp.tanh(linear(p["encoder2decoder"], h_f))
    if rng is not None:
        rng, k = jax.random.split(rng)
        ctx = dropout(k, ctx, dropout_ratio, deterministic)
    return ctx, decoder_init, c_f


def speaker_decoder_init(
    key,
    vocab_size: int,
    vocab_embedding_size: int = 300,
    hidden_size: int = 512,
    glove=None,
    use_input_att_feed: bool = False,
    dtype=jnp.float32,
):
    k = jax.random.split(key, 5)
    p = {
        "embedding": embedding_init(k[0], vocab_size, vocab_embedding_size, dtype),
        "decoder2action": linear_init(k[3], hidden_size, vocab_size),
    }
    if glove is not None:
        p["embedding"]["w"] = jnp.asarray(glove, dtype)
    if use_input_att_feed:
        p["lstm"] = lstm_cell_init(
            k[1], vocab_embedding_size + hidden_size, hidden_size, dtype
        )
        p["attention"] = attn.context_only_soft_dot_init(k[2], hidden_size)
        p["output_l1"] = linear_init(k[4], hidden_size * 2, hidden_size)
    else:
        p["lstm"] = lstm_cell_init(k[1], vocab_embedding_size, hidden_size, dtype)
        p["attention"] = attn.soft_dot_attention_init(k[2], hidden_size)
    return p


def speaker_decoder_step(
    p,
    previous_word,  # (B,) int32
    h_0,
    c_0,
    ctx,  # (B, T, H)
    ctx_mask=None,  # (B, T) True = masked
    *,
    dropout_ratio: float = 0.5,
    use_glove: bool = True,
    use_input_att_feed: bool = False,
    deterministic: bool = True,
    rng=None,
):
    """One word-decoder step (model.py:487-519).

    Returns (h_1, c_1, alpha, logit (B, vocab)).
    """
    word_embeds = embedding(p["embedding"], previous_word)  # (B, E)
    if not use_glove and rng is not None:
        rng, k = jax.random.split(rng)
        word_embeds = dropout(k, word_embeds, dropout_ratio, deterministic)

    if use_input_att_feed:
        h_0_drop = h_0
        if rng is not None:
            rng, k = jax.random.split(rng)
            h_0_drop = dropout(k, h_0, dropout_ratio, deterministic)
        h_tilde, alpha = attn.context_only_soft_dot(
            p["attention"], h_0_drop, ctx, ctx_mask
        )
        h_tilde_drop = h_tilde
        if rng is not None:
            rng, k = jax.random.split(rng)
            h_tilde_drop = dropout(k, h_tilde, dropout_ratio, deterministic)
        concat_input = jnp.concatenate([word_embeds, h_tilde_drop], axis=-1)
        h_1, c_1 = lstm_cell(p["lstm"], concat_input, h_0, c_0)
        x = jnp.concatenate([h_1, h_tilde], axis=-1)
        if rng is not None:
            rng, k = jax.random.split(rng)
            x = dropout(k, x, dropout_ratio, deterministic)
        x = jnp.tanh(linear(p["output_l1"], x))
        logit = linear(p["decoder2action"], x)
    else:
        h_1, c_1 = lstm_cell(p["lstm"], word_embeds, h_0, c_0)
        h_1_drop = h_1
        if rng is not None:
            rng, k = jax.random.split(rng)
            h_1_drop = dropout(k, h_1, dropout_ratio, deterministic)
        h_tilde, alpha = attn.soft_dot_attention(
            p["attention"], h_1_drop, ctx, ctx_mask
        )
        logit = linear(p["decoder2action"], h_tilde)
    return h_1, c_1, alpha, logit


def init_speaker(
    key,
    vocab_size: int,
    *,
    action_embedding_size: int = 2048 + 128,
    feature_size: int = 2048 + 128,
    word_embedding_size: int = 300,
    hidden_size: int = 512,
    glove=None,
    use_input_att_feed: bool = False,
):
    k_enc, k_dec = jax.random.split(key)
    return {
        "encoder": speaker_encoder_init(
            k_enc, action_embedding_size, feature_size, hidden_size
        ),
        "decoder": speaker_decoder_init(
            k_dec,
            vocab_size,
            word_embedding_size,
            hidden_size,
            glove=glove,
            use_input_att_feed=use_input_att_feed,
        ),
    }
