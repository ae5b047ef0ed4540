"""Micro-timing of the factored decoder tail's pieces on the real chip.

The factored rollout (agents/rollout._factored_tail) adds ~22 ms of
forward at b2048 over the in-scan tail it removes; this isolates where:
the af bank gather, the time-batched text attention, the split scoring,
the dropout vmap.  Everything is jitted and scalarized (one float over
the tunnel per sync).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("PROBE_B", 2048))
T = 10
H = 512
D = 2048
L = 80
MD = 16


def timeit(name, fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.tree.map(np.asarray, out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    print(f"{name:46s} {(time.time() - t0) / iters * 1000:8.2f} ms",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from scripts.profile_train_step import build_world_and_batch
    from speaker_follower_tpu.models import follower as fmodels
    from speaker_follower_tpu.models import attention as fattn
    from speaker_follower_tpu.models.follower import init_follower

    bank, tables, batch = build_world_and_batch(B, pallas=True)
    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=992, word_embedding_size=300,
        hidden_size=H, action_embedding_size=D + 128, feature_size=D + 128,
    )
    dec = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params["decoder"],
    )

    k = jax.random.PRNGKey(0)
    total_nodes = tables.features.shape[0]
    gnode_seq = jax.random.randint(k, (T, B), 0, total_nodes)
    nbr_view_seq = jax.random.randint(k, (T, B, MD), 0, 36)
    rel = jax.random.normal(k, (T, B, MD), jnp.float32)
    h1_seq = jax.random.normal(k, (T, B, H), jnp.bfloat16)
    drop_keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(T, dtype=jnp.uint32))
    ctx = jax.random.normal(k, (B, L, H), jnp.bfloat16)
    seq_mask = jax.random.uniform(k, (B, L)) > 0.7
    feats = tables.features

    s = lambda x: jnp.sum(x.astype(jnp.float32))  # noqa: E731

    gather = jax.jit(lambda g, v: s(feats[g[..., None], v]))
    timeit("af bank gather (T, B, 16, D)", gather, gnode_seq, nbr_view_seq)

    af = jax.jit(lambda g, v: feats[g[..., None], v])(gnode_seq, nbr_view_seq)
    jax.tree.map(lambda x: x.block_until_ready(), af)

    tail = jax.jit(lambda h1, kk, a, r: jax.tree.map(s, tuple(
        fmodels.decoder_tail_time_batched(
            dec, h1, kk, ctx, seq_mask, a,
            jnp.sin(r), jnp.cos(r), jnp.sin(r), jnp.cos(r),
            dropout_ratio=0.5, deterministic=False,
        ))))
    timeit("decoder_tail_time_batched (af given)", tail, h1_seq, drop_keys,
           af, rel)

    full = jax.jit(lambda h1, kk, g, v, r: jax.tree.map(s, tuple(
        fmodels.decoder_tail_time_batched(
            dec, h1, kk, ctx, seq_mask, feats[g[..., None], v],
            jnp.sin(r), jnp.cos(r), jnp.sin(r), jnp.cos(r),
            dropout_ratio=0.5, deterministic=False,
        ))))
    timeit("gather + tail fused", full, h1_seq, drop_keys, gnode_seq,
           nbr_view_seq, rel)

    grad = jax.jit(lambda h1, kk, g, v, r: s(jax.grad(
        lambda hh: jnp.sum(fmodels.decoder_tail_time_batched(
            dec, hh, kk, ctx, seq_mask, feats[g[..., None], v],
            jnp.sin(r), jnp.cos(r), jnp.sin(r), jnp.cos(r),
            dropout_ratio=0.5, deterministic=False,
        )[0].astype(jnp.float32)))(h1)))
    timeit("gather + tail fwd+bwd (wrt h1)", grad, h1_seq, drop_keys,
           gnode_seq, nbr_view_seq, rel)

    # pieces
    drop = jax.jit(lambda kk, x: s(jax.vmap(
        lambda a, b: fmodels.dropout(fmodels.h1_dropout_key(a), b, 0.5, False)
    )(kk, x)))
    timeit("  h1 dropout vmap", drop, drop_keys, h1_seq)

    pt = dec["text_attention"]
    attn_fn = jax.jit(lambda h1: s(jnp.einsum(
        "blh,tbh->tbl", ctx, fmodels.linear(pt["linear_in"], h1))))
    timeit("  text-attn scores einsum", attn_fn, h1_seq)

    alpha = jax.random.uniform(k, (T, B, L), jnp.bfloat16)
    mix = jax.jit(lambda a: s(jnp.einsum("tbl,blh->tbh", a, ctx)))
    timeit("  text-attn mix einsum", mix, alpha)

    h_tilde = jax.random.normal(k, (T * B, H), jnp.bfloat16)
    rf = rel.reshape(T * B, MD)
    score = jax.jit(lambda ht, a: s(fattn.eltwise_prod_scoring_split(
        dec["decoder2action"], ht, a.reshape(T * B, MD, D),
        jnp.sin(rf), jnp.cos(rf), jnp.sin(rf), jnp.cos(rf))))
    timeit("  split scoring (flat)", score, h_tilde, af)


if __name__ == "__main__":
    main()
