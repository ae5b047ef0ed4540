"""Component-level timing of the follower train step on the real chip.

Times each piece of the b2048 train step separately (honest sync via
np.asarray) to locate the bottleneck: encoder scan, env scan, decoder
scan, full fwd, full fwd+bwd, optimizer.  Used to decide where Pallas
fusion pays (docs/ROUND2.md measured the encoder at 38 ms / env at 50 ms
@ b1024 from this kind of decomposition).

Usage: python scripts/profile_train_step.py [--batch 2048] [--pallas]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 2048
EPISODE_LEN = 10
FEAT_DIM = 2048
HIDDEN = 512
MAX_LEN = 80


def timeit(name, fn, *args, iters=10):
    """Times a jitted scalar-returning program.  ``fn`` must reduce its
    outputs to (near-)scalars INSIDE jit: np.asarray is the only honest
    sync over the axon tunnel, and syncing a large output would time the
    host transfer, not the compute (the adam-update artifact: returning
    the full param pytree costs ~1s of tunnel copy per call)."""
    import jax

    out = fn(*args)
    jax.tree.map(np.asarray, out)  # compile + honest sync
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


def _scalarize(tree):
    import jax
    import jax.numpy as jnp

    return sum(
        jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tree)
    )



def build_world_and_batch(batch_size, pallas, *, with_seq_mask=True):
    """Shared setup for both profiling modes: 90-scan graph bank, bf16
    synthetic feature bank, and a seeded random episode batch."""
    import jax
    import jax.numpy as jnp

    from speaker_follower_tpu.data.graph import load_graph_bank
    from speaker_follower_tpu.env import vecenv

    with open("/root/reference/connectivity/scans.txt") as f:
        scans = [line.strip() for line in f if line.strip()]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bank = load_graph_bank(
        scans, "/root/reference/connectivity",
        cache_dir=os.path.join(repo, ".cache"),
    )
    feats = jax.random.normal(
        jax.random.PRNGKey(0), (bank.total_nodes, 36, FEAT_DIM), jnp.bfloat16
    )
    tables = vecenv.make_env_tables(bank, feats, pad_views=pallas)

    rng = np.random.RandomState(0)
    scan_ix = rng.randint(len(scans), size=batch_size).astype(np.int32)
    node = np.zeros(batch_size, np.int32)
    goal = np.zeros(batch_size, np.int32)
    for i in range(batch_size):
        g = bank.graphs[scans[scan_ix[i]]]
        inc = np.nonzero(g.included & (g.adj_count > 0))[0]
        node[i], goal[i] = inc[rng.randint(len(inc), size=2)]
    lengths = rng.randint(10, MAX_LEN, size=batch_size).astype(np.int32)
    seq = rng.randint(4, 900, size=(batch_size, MAX_LEN)).astype(np.int32)
    for i, l in enumerate(lengths):
        seq[i, l - 1] = 2
        seq[i, l:] = 0
    batch = {
        "scan": jnp.asarray(scan_ix),
        "start_node": jnp.asarray(node),
        "goal_node": jnp.asarray(goal),
        "heading": jnp.asarray(rng.randint(12, size=batch_size).astype(np.int32)),
        "seq": jnp.asarray(seq),
    }
    if with_seq_mask:
        batch["seq_mask"] = jnp.asarray(seq == 0)
        batch["seq_length"] = jnp.asarray(lengths)
    return bank, tables, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--compute", default="bf16", choices=["f32", "bf16"])
    ap.add_argument("--feedback", default="sample",
                    choices=["sample", "teacher", "argmax"])
    ap.add_argument("--no_factored", action="store_true",
                    help="disable the time-batched decoder tail")
    ap.add_argument("--no_fused_tail", action="store_true",
                    help="disable the fused in-scan tail kernel "
                    "(ops/decoder_tail.py) for the A/B")
    ap.add_argument("--inference", action="store_true",
                    help="also profile the inference-mode rollout "
                    "(no loss bookkeeping, fused tail without factored)")
    ap.add_argument("--speaker", action="store_true",
                    help="profile the speaker train step instead")
    args = ap.parse_args()
    if args.speaker:
        return speaker_main(args)
    batch_size = args.batch

    import jax
    import jax.numpy as jnp

    from speaker_follower_tpu.agents.rollout import rollout
    from speaker_follower_tpu.env import vecenv
    from speaker_follower_tpu.models import follower as fmodels
    from speaker_follower_tpu.models.follower import init_follower
    from speaker_follower_tpu.training.optim import adam_with_torch_wd

    bank, tables, batch = build_world_and_batch(batch_size, args.pallas)
    # factored WITHOUT pallas reproduces a documented axon TPU worker
    # fault via the (T*B, MD)-row XLA gather in _factored_tail
    # (docs/ROUND3.md) and is slower anyway; mirror the trainer's
    # `cfg.factored_loss and cfg.use_pallas` guard: default factored to
    # the --pallas flag, honor an explicit --no_factored either way.
    factored = args.pallas and not args.no_factored
    fused_tail = not args.no_fused_tail
    print(f"device={jax.devices()[0]} batch={batch_size} pallas={args.pallas} "
          f"compute={args.compute} feedback={args.feedback} "
          f"factored={factored} fused_tail={fused_tail}")

    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=992, word_embedding_size=300,
        hidden_size=HIDDEN, action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
    )
    params = jax.tree.map(jnp.asarray, params)
    key = jax.random.PRNGKey(1)
    compute_dtype = {"f32": None, "bf16": "bfloat16"}[args.compute]
    use_pallas = args.pallas

    # ---- full rollout forward (train config: sample feedback, dropout)
    def loss_fn(p, t, b, k):
        return rollout(
            p, t, b, k, feedback=args.feedback, episode_len=EPISODE_LEN,
            deterministic=False, dropout_ratio=0.5,
            compute_dtype=compute_dtype, use_pallas=use_pallas,
            factored_loss=factored, fused_tail=fused_tail,
        ).loss

    fwd = jax.jit(loss_fn)
    timeit(f"rollout fwd ({args.feedback}, dropout)", fwd, params, tables,
           batch, key)

    # ---- inference-mode rollout (production decode: no loss bookkeeping,
    # fused tail without factored_loss, deterministic)
    if args.inference:
        for fb in ("argmax", "sample"):
            def inf_fn(p, t, b, k, fb=fb):
                out = rollout(
                    p, t, b, k, feedback=fb, episode_len=EPISODE_LEN,
                    deterministic=True, compute_dtype=compute_dtype,
                    use_pallas=use_pallas, fused_tail=fused_tail,
                    inference=True,
                )
                return (out.nodes.sum(), out.score.sum())

            timeit(f"inference rollout ({fb})", jax.jit(inf_fn), params,
                   tables, batch, key)

    # ---- full train grad (scalarized: ship one float, not 80 MB of grads)
    def vg_scalar(p, t, b, k):
        loss, grads = jax.value_and_grad(loss_fn)(p, t, b, k)
        return loss, _scalarize(grads)

    vg = jax.jit(vg_scalar)
    timeit("rollout fwd+bwd", vg, params, tables, batch, key)

    # ---- optimizer alone
    tx = adam_with_torch_wd(1e-4, 5e-4)
    opt_state = tx.init(params)
    grads = jax.jit(
        lambda p, t, b, k: jax.grad(loss_fn)(p, t, b, k)
    )(params, tables, batch, key)

    def opt_step(g, o, p):
        up, o2 = tx.update(g, o, p)
        p2 = jax.tree.map(lambda a, u: a + u, p, up)
        return _scalarize(p2)

    timeit("adam update", jax.jit(opt_step), grads, opt_state, params)

    # ---- encoder alone (fwd and fwd+bwd)
    cast = (
        (lambda p: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p))
        if compute_dtype else (lambda p: p)
    )

    def enc_loss(p, b, k):
        ctx, h, c = fmodels.encoder_apply(
            cast(p)["encoder"], b["seq"], b["seq_length"],
            dropout_ratio=0.5, use_glove=True, deterministic=False,
            rng=k, use_pallas_lstm=use_pallas,
        )
        return (
            jnp.sum(ctx.astype(jnp.float32))
            + jnp.sum(h.astype(jnp.float32))
            + jnp.sum(c.astype(jnp.float32))
        )

    timeit("encoder fwd", jax.jit(enc_loss), params, batch, key)
    timeit("encoder fwd+bwd",
           jax.jit(lambda p, b, k: _scalarize(jax.grad(enc_loss)(p, b, k))),
           params, batch, key)

    # ---- env scan alone (observe + teacher step, no model)
    def env_scan(t, b):
        state = vecenv.reset(b["scan"], b["start_node"], b["heading"])
        goal = b["goal_node"]

        def step_fn(state, _):
            obs = vecenv.observe(t, state, goal)
            state = vecenv.step(t, state, obs.teacher)
            return state, (obs.teacher, obs.pano_feature.sum())

        state, (acts, s) = jax.lax.scan(
            step_fn, state, jnp.arange(EPISODE_LEN)
        )
        return state.node.sum(), acts.sum(), s.sum()

    timeit("env scan (observe+teacher step) x10", jax.jit(env_scan),
           tables, batch)

    # ---- env scan without pano feature assembly
    def env_scan_nofeat(t, b):
        state = vecenv.reset(b["scan"], b["start_node"], b["heading"])
        goal = b["goal_node"]

        def step_fn(state, _):
            obs = vecenv.observe(t, state, goal, with_features=False)
            state = vecenv.step(t, state, obs.teacher)
            return state, obs.teacher

        state, acts = jax.lax.scan(step_fn, state, jnp.arange(EPISODE_LEN))
        return state.node.sum(), acts.sum()

    try:
        timeit("env scan (no pano features) x10", jax.jit(env_scan_nofeat),
               tables, batch)
    except TypeError:
        print("env scan (no pano features) x10: observe() has no "
              "with_features flag — skipped")

    # ---- lite env scan (the fused decoder path's env cost: integer and
    # angle planes only, zero feature materialization)
    def env_scan_lite(t, b):
        state = vecenv.reset(b["scan"], b["start_node"], b["heading"])
        goal = b["goal_node"]

        def step_fn(state, _):
            obs = vecenv.observe_lite(t, state, goal)
            state = vecenv.step(t, state, obs.teacher)
            return state, (obs.teacher, obs.rel_heading.sum())

        state, (acts, s) = jax.lax.scan(
            step_fn, state, jnp.arange(EPISODE_LEN)
        )
        return state.node.sum(), acts.sum(), s.sum()

    timeit("env scan lite (observe_lite+step) x10", jax.jit(env_scan_lite),
           tables, batch)


def speaker_main(args):
    """--speaker: times the speaker train step (gold rollout + teacher
    scoring + grads) with the fused-teacher batched decode vs the
    sequential step loop, and the Pallas word chain on top."""
    import jax

    from speaker_follower_tpu.agents import speaker as sa
    from speaker_follower_tpu.models.speaker import init_speaker

    bank, tables, batch = build_world_and_batch(
        args.batch, args.pallas, with_seq_mask=False
    )
    print(f"device={jax.devices()[0]} batch={args.batch} "
          f"pallas={args.pallas} (speaker)")
    import jax.numpy as jnp

    params = jax.tree.map(
        jnp.asarray, init_speaker(jax.random.PRNGKey(0), vocab_size=992)
    )
    key = jax.random.PRNGKey(1)

    compute_dtype = {"f32": None, "bf16": "bfloat16"}[args.compute]

    def make_loss(fused, pallas, lazy=False):
        def loss_fn(p, t, b, k):
            gold = sa.gold_rollout(
                t, b, episode_len=EPISODE_LEN, lazy_features=lazy
            )
            out = sa.score_instructions(
                p, gold, b["seq"], k, feedback="teacher",
                instruction_len=MAX_LEN, unroll_len=EPISODE_LEN,
                deterministic=False, dropout_ratio=0.5, use_glove=True,
                fused_teacher=fused, use_pallas=pallas,
                compute_dtype=compute_dtype,
                tables=t if lazy else None,
            )
            return out.loss
        return loss_fn

    # ---- phase decomposition (the roofline story): gold rollout alone,
    # then gold+encoder (encoder cost = difference), then the full chain
    # (decode cost = difference)
    from speaker_follower_tpu.models import speaker as smodels

    def gold_only(t, b):
        gold = sa.gold_rollout(t, b, episode_len=EPISODE_LEN)
        return (gold.action_embeddings.sum(), gold.path_len.sum())

    timeit("speaker gold_rollout (10 env steps)", jax.jit(gold_only),
           tables, batch)

    if args.pallas:
        def gold_only_lazy(t, b):
            gold = sa.gold_rollout(
                t, b, episode_len=EPISODE_LEN, lazy_features=True
            )
            return (gold.action_embeddings.sum(), gold.path_len.sum())

        timeit("speaker gold_rollout lazy (10 env steps)",
               jax.jit(gold_only_lazy), tables, batch)

    def cast_params(p):
        if compute_dtype is None:
            return p
        cd = jnp.dtype(compute_dtype)
        return jax.tree.map(
            lambda x: x.astype(cd) if x.dtype == jnp.float32 else x, p
        )

    def gold_plus_encoder(p, t, b, k):
        gold = sa.gold_rollout(t, b, episode_len=EPISODE_LEN)
        ctx, h, c = smodels.speaker_encoder_apply(
            cast_params(p)["encoder"],
            gold.action_embeddings[:, :EPISODE_LEN],
            gold.world_features[:, :EPISODE_LEN],
            dropout_ratio=0.5, deterministic=False, rng=k,
        )
        return (
            jnp.sum(ctx.astype(jnp.float32)),
            jnp.sum(h.astype(jnp.float32)),
        )

    timeit("speaker gold+encoder fwd", jax.jit(gold_plus_encoder),
           params, tables, batch, key)

    if args.pallas:
        def gold_plus_encoder_lazy(p, t, b, k):
            gold = sa.gold_rollout(
                t, b, episode_len=EPISODE_LEN, lazy_features=True
            )
            ctx, h, c = smodels.speaker_encoder_apply(
                cast_params(p)["encoder"],
                gold.action_embeddings[:, :EPISODE_LEN],
                None,
                dropout_ratio=0.5, deterministic=False, rng=k,
                tables=t,
                gnode=gold.gnode[:, :EPISODE_LEN],
                view_index=gold.view_index[:, :EPISODE_LEN],
                live=~gold.path_mask[:, :EPISODE_LEN],
                use_pallas=True,
            )
            return (
                jnp.sum(ctx.astype(jnp.float32)),
                jnp.sum(h.astype(jnp.float32)),
            )

        timeit("speaker gold+encoder fwd [lazy+kernel]",
               jax.jit(gold_plus_encoder_lazy), params, tables, batch, key)

    for name, fused, pallas, lazy in (
        ("loop", False, False, False),
        ("fused-teacher", True, False, False),
        ("fused-teacher+pallas", True, args.pallas, False),
        ("lazy-gold+kernel-enc+pallas", True, args.pallas, args.pallas),
    ):
        if (pallas or lazy) and not args.pallas:
            continue
        loss_fn = make_loss(fused, pallas, lazy)
        fwd = jax.jit(loss_fn)
        timeit(f"speaker fwd        [{name}]", fwd, params, tables, batch, key)
        vg = jax.jit(lambda p, t, b, k, f=loss_fn: _scalarize(
            jax.grad(f)(p, t, b, k)))
        timeit(f"speaker fwd+bwd    [{name}]", vg, params, tables, batch, key)


if __name__ == "__main__":
    main()
