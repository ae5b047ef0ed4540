"""Attention and scoring modules (reference tasks/R2R/model.py:107-352).

All are single-step batched ops; the fused Pallas decoder-step kernel in
ops/ composes them — these pure-XLA versions are the semantic reference and
the fallback path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .core import linear, linear_init

NEG_INF = -1e30  # finite stand-in for the reference's -inf masking


def soft_dot_attention_init(key, dim):
    """SoftDotAttention (model.py:107-143)."""
    k1, k2 = jax.random.split(key)
    return {
        "linear_in": linear_init(k1, dim, dim, bias=False),
        "linear_out": linear_init(k2, dim * 2, dim, bias=False),
    }


def soft_dot_attention(p, h, context, mask=None):
    """h: (B, D); context: (B, L, D); mask: (B, L) True = masked out.

    Returns (h_tilde (B, D), attn (B, L)).
    """
    target = linear(p["linear_in"], h)  # (B, D)
    attn = jnp.einsum("bld,bd->bl", context, target)
    if mask is not None:
        attn = jnp.where(mask, NEG_INF, attn)
    attn = jax.nn.softmax(attn, axis=1)
    weighted = jnp.einsum("bl,bld->bd", attn, context)
    h_tilde = jnp.tanh(linear(p["linear_out"], jnp.concatenate([weighted, h], -1)))
    return h_tilde, attn


def context_only_soft_dot_init(key, dim, context_dim=None):
    """ContextOnlySoftDotAttention (model.py:146-177)."""
    if context_dim is None:
        context_dim = dim
    return {"linear_in": linear_init(key, dim, context_dim, bias=False)}


def context_only_soft_dot(p, h, context, mask=None):
    target = linear(p["linear_in"], h)
    attn = jnp.einsum("bld,bd->bl", context, target)
    if mask is not None:
        attn = jnp.where(mask, NEG_INF, attn)
    attn = jax.nn.softmax(attn, axis=1)
    weighted = jnp.einsum("bl,bld->bd", attn, context)
    return weighted, attn


def visual_soft_dot_init(key, h_dim, v_dim, dot_dim=256):
    """VisualSoftDotAttention (model.py:300-326)."""
    k1, k2 = jax.random.split(key)
    return {
        "linear_in_h": linear_init(k1, h_dim, dot_dim, bias=True),
        "linear_in_v": linear_init(k2, v_dim, dot_dim, bias=True),
    }


def visual_soft_dot(p, h, visual_context, mask=None):
    """h: (B, H); visual_context: (B, V, Dv) -> (weighted (B, Dv), attn)."""
    target = linear(p["linear_in_h"], h)  # (B, dot)
    context = linear(p["linear_in_v"], visual_context)  # (B, V, dot)
    attn = jnp.einsum("bvd,bd->bv", context, target)
    if mask is not None:
        attn = jnp.where(mask, NEG_INF, attn)
    attn = jax.nn.softmax(attn, axis=1)
    weighted = jnp.einsum("bv,bvd->bd", attn, visual_context)
    return weighted, attn


def visual_soft_dot_fast(p, h, visual_context, mask=None):
    """Algebraically reassociated VisualSoftDotAttention.

    attn_logits = (vis @ W_v^T + b_v) @ (W_h h + b_h)
                = vis @ (W_v^T t) + b_v . t          with t = W_h h + b_h

    Identical function (up to float reassociation), but the per-view
    projection (B, V, dot) is never materialized: the dominant cost drops
    from V x Dv x dot to Dv x dot per element (~60x fewer FLOPs at
    V=36, Dv=2176, dot=256).  XLA cannot reassociate matmuls itself.
    """
    t = linear(p["linear_in_h"], h)  # (B, dot)
    v = t @ p["linear_in_v"]["w"]  # (B, Dv): W_v^T t
    bias_term = t @ p["linear_in_v"]["b"]  # (B,)
    attn = jnp.einsum("bvd,bd->bv", visual_context, v) + bias_term[:, None]
    if mask is not None:
        attn = jnp.where(mask, NEG_INF, attn)
    attn = jax.nn.softmax(attn, axis=1)
    weighted = jnp.einsum("bv,bvd->bd", attn, visual_context)
    return weighted, attn


def eltwise_prod_scoring_fast(p, h, all_u_t):
    """Algebraically reassociated EltwiseProdScoring.

    logit = w_out^T [(W_h h + b_h) o (W_a u + b_a)] + b_out
          = h^T M u + h . v1 + u . v2 + c
    with M = W_h^T diag(w_out) W_a (precomputed from params; hoisted out of
    the rollout scan as loop-invariant by XLA), v1 = W_h^T diag(w_out) b_a,
    v2 = W_a^T diag(w_out) b_h, c = b_h . diag(w_out) b_a + b_out.

    Cuts the per-step cost from A x Da x dot to H x Da per element (~16x
    fewer FLOPs at A=16, Da=2176, dot=256, H=512).
    """
    w_h = p["linear_in_h"]["w"]  # (dot, H)
    b_h = p["linear_in_h"]["b"]  # (dot,)
    w_a = p["linear_in_a"]["w"]  # (dot, Da)
    b_a = p["linear_in_a"]["b"]  # (dot,)
    w_o = p["linear_out"]["w"][0]  # (dot,)
    b_o = p["linear_out"]["b"][0]  # ()

    m = (w_h * w_o[:, None]).T @ w_a  # (H, Da)
    v1 = w_h.T @ (w_o * b_a)  # (H,)
    v2 = w_a.T @ (w_o * b_h)  # (Da,)
    c = jnp.dot(b_h * w_o, b_a) + b_o

    hm = h @ m  # (B, Da)
    logits = jnp.einsum("bd,bad->ba", hm, all_u_t)
    logits = logits + (h @ v1)[:, None]
    logits = logits + jnp.einsum("bad,d->ba", all_u_t, v2) + c
    return logits


def eltwise_prod_scoring_split(p, h, af, sin_h, cos_h, sin_e, cos_e):
    """EltwiseProdScoring over SPLIT action inputs — the fused-decoder
    path's scoring: same reassociated math as eltwise_prod_scoring_fast,
    but the action embedding u = [view_feature | 32x sin(rh), 32x cos(rh),
    32x sin(re), 32x cos(re)] (env.py:60-75) is never materialized.  The
    angle half contributes through 32-block sums (the 128-d block repeats
    each trig value 32x, so u_ang . x == sin_h * sum(x[0:32]) + ...).

    h: (B, H); af: (B, MD, D) neighbor view features (rows past the valid
    count are garbage — mask logits downstream); sin_h/...: (B, MD) trig
    of the per-action relative angles.  Returns (B, 1 + MD) logits with
    slot 0 = stop (u = 0 -> logit = h . v1 + c).
    """
    w_h = p["linear_in_h"]["w"]  # (dot, H)
    b_h = p["linear_in_h"]["b"]  # (dot,)
    w_a = p["linear_in_a"]["w"]  # (dot, Da)
    b_a = p["linear_in_a"]["b"]  # (dot,)
    w_o = p["linear_out"]["w"][0]  # (dot,)
    b_o = p["linear_out"]["b"][0]  # ()
    d = af.shape[-1]

    m = (w_h * w_o[:, None]).T @ w_a  # (H, Da)
    v1 = w_h.T @ (w_o * b_a)  # (H,)
    v2 = w_a.T @ (w_o * b_h)  # (Da,)
    c = jnp.dot(b_h * w_o, b_a) + b_o

    hm = h @ m[:, :d]  # (B, D)
    hm_ang = (h @ m[:, d:]).reshape(h.shape[0], 4, 32).sum(-1)  # (B, 4)
    v2_ang = v2[d:].reshape(4, 32).sum(-1)  # (4,)

    nbr = jnp.einsum("bd,bad->ba", hm, af.astype(h.dtype))
    nbr = nbr + jnp.einsum("bad,d->ba", af.astype(h.dtype), v2[:d])
    trig = (sin_h, cos_h, sin_e, cos_e)
    for j, t in enumerate(trig):
        t = t.astype(h.dtype)
        nbr = nbr + t * hm_ang[:, j][:, None] + t * v2_ang[j]
    hv1c = (h @ v1)[:, None] + c
    stop = jnp.broadcast_to(hv1c, (h.shape[0], 1))
    return jnp.concatenate([stop, nbr + hv1c], axis=1)


def eltwise_prod_scoring_bank(
    p, h, features, gnode, nbr_view, sin_h, cos_h, sin_e, cos_e,
    *, block_b: int = 8, interpret: bool = False,
):
    """eltwise_prod_scoring_split with the neighbor-feature term computed
    by the fused Pallas bank-score kernel (ops/bank_score.py): the
    af . (hm + v2) dot streams the node blocks HBM->VMEM instead of
    materializing the (N, A, D) gathered tensor XLA's two-axis gather
    would build (catastrophically slowly).  Needs a view-padded bank
    (features.shape[1] == 40).  Same math, same (N, 1 + A) output."""
    from ..ops.bank_score import bank_score

    w_h = p["linear_in_h"]["w"]
    b_h = p["linear_in_h"]["b"]
    w_a = p["linear_in_a"]["w"]
    b_a = p["linear_in_a"]["b"]
    w_o = p["linear_out"]["w"][0]
    b_o = p["linear_out"]["b"][0]
    d = features.shape[-1]

    m = (w_h * w_o[:, None]).T @ w_a  # (H, Da)
    v1 = w_h.T @ (w_o * b_a)
    v2 = w_a.T @ (w_o * b_h)
    c = jnp.dot(b_h * w_o, b_a) + b_o

    hm = h @ m[:, :d]  # (N, D)
    hm_ang = (h @ m[:, d:]).reshape(h.shape[0], 4, 32).sum(-1)  # (N, 4)
    v2_ang = v2[d:].reshape(4, 32).sum(-1)

    q = hm.astype(jnp.float32) + v2[:d].astype(jnp.float32)
    from ..ops.bank_score import A_ROWS

    md = nbr_view.shape[1]
    if md < A_ROWS:  # MAX_DEGREE=15 -> the kernel's padded 16 rows
        nbr_view = jnp.pad(nbr_view, ((0, 0), (0, A_ROWS - md)))
    nbr = bank_score(features, gnode, nbr_view, q, block_b, interpret)
    nbr = nbr[:, :md].astype(h.dtype)
    trig = (sin_h, cos_h, sin_e, cos_e)
    for j, t in enumerate(trig):
        t = t.astype(h.dtype)
        nbr = nbr + t * hm_ang[:, j][:, None] + t * v2_ang[j]
    hv1c = (h @ v1)[:, None] + c
    stop = jnp.broadcast_to(hv1c, (h.shape[0], 1))
    return jnp.concatenate([stop, nbr + hv1c], axis=1)


def feedforward_image_attention_init(key, context_size, hidden_size, image_feature_size=2048):
    """FeedforwardImageAttention (model.py:180-204).  The reference's 1x1
    Conv2d layers are plain channel-wise linears here (same math, MXU-
    friendly layout)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fc1_feature": linear_init(k1, image_feature_size, hidden_size, bias=False),
        "fc1_context": linear_init(k2, context_size, hidden_size, bias=True),
        "fc2": linear_init(k3, hidden_size, 1, bias=True),
    }


def feedforward_image_attention(p, feature, context):
    """feature: (B, C, H, W) conv feature map; context: (B, Dc).

    Returns (attended (B, C), attention (B, H*W)) — additive attention
    over spatial positions (model.py:192-204).
    """
    b, c = feature.shape[:2]
    flat = feature.reshape(b, c, -1).transpose(0, 2, 1)  # (B, HW, C)
    hidden = linear(p["fc1_feature"], flat) + linear(p["fc1_context"], context)[:, None, :]
    scores = linear(p["fc2"], jax.nn.relu(hidden))[..., 0]  # (B, HW)
    attention = jax.nn.softmax(scores, axis=1)
    attended = jnp.einsum("bpc,bp->bc", flat, attention)
    return attended, attention


def multiplicative_image_attention_init(key, context_size, hidden_size, image_feature_size=2048):
    """MultiplicativeImageAttention (model.py:207-236)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "fc1_feature": linear_init(k1, image_feature_size, hidden_size, bias=True),
        "fc1_context": linear_init(k2, context_size, hidden_size, bias=True),
        "fc2": linear_init(k3, hidden_size, 1, bias=True),
    }


def multiplicative_image_attention(p, feature, context):
    """feature: (B, C, H, W); context: (B, Dc) -> (attended (B, C),
    attention (B, H*W)) — bilinear (dot-product) attention over spatial
    positions (model.py:218-236).  Note: the reference's fc2 is unused in
    its forward; kept in params for checkpoint parity."""
    b, c = feature.shape[:2]
    flat = feature.reshape(b, c, -1).transpose(0, 2, 1)  # (B, HW, C)
    feature_hidden = linear(p["fc1_feature"], flat)  # (B, HW, Dh)
    context_hidden = linear(p["fc1_context"], context)  # (B, Dh)
    scores = jnp.einsum("bph,bh->bp", feature_hidden, context_hidden)
    attention = jax.nn.softmax(scores, axis=1)
    attended = jnp.einsum("bpc,bp->bc", flat, attention)
    return attended, attention


def bottom_up_image_attention_init(
    key,
    context_size,
    object_embedding_size,
    attribute_embedding_size,
    hidden_size,
    num_objects,
    num_attributes,
    image_feature_size=2048,
):
    """BottomUpImageAttention (model.py:239-297): attends over detection
    instances whose features concatenate [cls_prob | visual | attribute
    embedding | object embedding | 5-d spatial]."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    feature_size = image_feature_size + object_embedding_size + attribute_embedding_size + 1 + 5
    return {
        "object_embedding": jax.random.normal(k1, (num_objects, object_embedding_size)),
        "attribute_embedding": jax.random.normal(
            k2, (num_attributes, attribute_embedding_size)
        ),
        "fc1_context": linear_init(k3, context_size, hidden_size, bias=True),
        "fc1_feature": linear_init(k4, feature_size, hidden_size, bias=True),
        "fc2": linear_init(k5, hidden_size, 1, bias=True),
    }


def bottom_up_image_attention(p, bu, context):
    """bu: BottomUpViewpoint of batch arrays — cls_prob (B, d),
    image_features (B, d, 2048), attribute_indices / object_indices
    (B, d) int, spatial_features (B, d, 5), no_object_mask (B, d) bool;
    context: (B, Dc).

    Returns (attended_feats (B, F), attention (B, d)): gated multiplicative
    attention with L2-normalized interaction and pad masking
    (model.py:264-297).
    """
    attribute_embedding = p["attribute_embedding"][bu.attribute_indices]
    object_embedding = p["object_embedding"][bu.object_indices]
    feats = jnp.concatenate(
        [
            bu.cls_prob[..., None],
            bu.image_features,
            attribute_embedding,
            object_embedding,
            bu.spatial_features,
        ],
        axis=2,
    )  # (B, d, F)
    x_context = linear(p["fc1_context"], context)[:, None, :]  # (B, 1, Dh)
    x_feature = linear(p["fc1_feature"], feats)  # (B, d, Dh)
    x = x_context * x_feature
    x = x / jnp.linalg.norm(x, axis=2, keepdims=True)
    scores = linear(p["fc2"], x)[..., 0]  # (B, d)
    scores = jnp.where(bu.no_object_mask, NEG_INF, scores)
    attention = jax.nn.softmax(scores, axis=1)
    attended = jnp.einsum("bd,bdf->bf", attention, feats)
    return attended, attention


def eltwise_prod_scoring_init(key, h_dim, a_dim, dot_dim=256):
    """EltwiseProdScoring (model.py:329-352)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "linear_in_h": linear_init(k1, h_dim, dot_dim, bias=True),
        "linear_in_a": linear_init(k2, a_dim, dot_dim, bias=True),
        "linear_out": linear_init(k3, dot_dim, 1, bias=True),
    }


def eltwise_prod_scoring(p, h, all_u_t):
    """h: (B, H); all_u_t: (B, A, Da) -> logits (B, A)."""
    target = linear(p["linear_in_h"], h)[:, None, :]  # (B, 1, dot)
    context = linear(p["linear_in_a"], all_u_t)  # (B, A, dot)
    eltprod = target * context
    return linear(p["linear_out"], eltprod)[..., 0]  # (B, A)
