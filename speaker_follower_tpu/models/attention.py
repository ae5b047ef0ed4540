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
