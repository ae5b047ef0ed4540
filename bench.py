"""Benchmark: follower TRAINING throughput (episodes/sec) on one chip.

Headline workload (the apples-to-apples comparison): a full jitted train
step — sample-feedback rollout forward, backward, Adam+weight-decay
update — on the full-dim follower (hidden 512, ResNet features 2048 + 128
loc embedding, bfloat16 feature bank), 10-step episodes, over the real
90-scan Matterport navigation graphs with synthetic features (the released
feature TSV is download-only).  K train steps are chained inside one
jitted lax.scan so tunnel dispatch cost is amortized and the number is
device throughput.

Default configuration (measured sweep on v5e, 2026-08-17): batch 2048,
bf16 mixed precision (bf16 matmuls, f32 softmax/loss/Adam) — controlled
3000-iter quality runs show bf16 == f32 == pallas within run noise
(runs/README.md), so the TPU-native mode is also full-quality.  In pure
f32 the largest fitting batch is 1408 (1536 misses HBM by 48 MB).
Overridables:
BENCH_BATCH, BENCH_COMPUTE=f32|bf16, BENCH_REMAT=1 (activation
rematerialization: fits bigger batches but the recompute costs more than
the amortization buys), BENCH_SKIP_INFERENCE=1 (drops the greedy-rollout
side phase entirely), BENCH_INFERENCE_BATCH=N (overrides the inference
phase's batch; default = BENCH_BATCH — safe since round 5 because the
inference-mode program is much smaller than the old unfused one that
used to kill the remote worker at b2048+), BENCH_TRAIN_PALLAS=0 (plain
XLA pano path; since round 3 the fused custom-VJP kernel is the default:
b2048 fwd+bwd 132 ms vs 213 ms after the Mosaic backward-lowering fix).
Measured sweep (train eps/s): 1024/f32 6585, 1408/f32 7300, 2048/f32 OOM,
2048/f32+remat 5764, 1024/bf16 8443, 2048/bf16 9994, 4096/bf16 OOM,
4096/bf16+remat 8117; round 3 with the fixed pallas train path:
2048/bf16+pallas ~15000, 4096/bf16+pallas ~15600 (fits: the kernel never
materializes the (B, 36, 2176) pano gather in either direction).

Baseline: the reference publishes one wall-clock figure — 50k training
iterations at batch 100 in ~50 hours on a single GPU (README.md:101), i.e.
~27.8 episodes/sec through its C++-sim + PyTorch training pipeline.  That
is the vs_baseline denominator for the train-step metric (same workload
class: fwd+bwd+optimizer).

Also printed as [bench] stderr lines (not the JSON): train-step throughput
at the reference's own batch 100, estimated MFU from XLA's cost analysis,
the greedy-inference throughput (the round-1 metric, kept for continuity —
NOTE it compares inference against the training baseline and overstates
accordingly), and the speaker train-step throughput.  The side phases run
AFTER the JSON is printed so no side-phase failure can cost the headline.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_EPISODES_PER_SEC = 50000 * 100 / (50 * 3600)  # ~27.78
PEAK_FLOPS = 197e12  # TPU v5e bf16 peak (MXU); f32 ops run below this
PEAK_HBM_BW = 819e9  # TPU v5e HBM bandwidth

BATCH = int(os.environ.get("BENCH_BATCH", "2048"))
EPISODE_LEN = 10
N_WARMUP = 3
N_ITERS = int(os.environ.get("BENCH_ITERS", "50"))
FEAT_DIM = 2048
HIDDEN = 512
MAX_LEN = 80


def _await_tpu(max_wait_s: int = 1800) -> None:
    """Preflight: the axon tunnel goes down for stretches (observed >1 h,
    docs/ROUND3.md); a bench launched mid-outage would hang on its first
    dispatch with no JSON emitted.  Poll a tiny matmul in a subprocess
    (a hung in-process RPC is not interruptible) and wait up to
    ``max_wait_s`` for recovery before proceeding."""
    import subprocess

    probe = (
        "import jax, numpy as np, jax.numpy as jnp;"
        "print(np.asarray(jax.jit(lambda x: (x@x).sum())(jnp.ones((256,256)))))"
    )
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], timeout=150,
                capture_output=True,
            )
            if r.returncode == 0:
                if attempt > 1:
                    sys.stderr.write(f"[bench] TPU back (attempt {attempt})\n")
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            sys.stderr.write(
                "[bench] WARNING: TPU health probe failing after "
                f"{max_wait_s}s; proceeding anyway\n"
            )
            return
        sys.stderr.write(f"[bench] TPU unhealthy (attempt {attempt}); retry in 120s\n")
        time.sleep(120)


def main():
    if os.environ.get("BENCH_PREFLIGHT", "1") == "1":
        _await_tpu()
    import jax
    import jax.numpy as jnp

    # Persistent XLA cache: steady-state numbers are unaffected (compile
    # is excluded from the timed windows), but the reported compile+first
    # costs drop to cache-load time on repeat runs of the same programs.
    # After the preflight: enabling probes the backend, and a down tunnel
    # must hit _await_tpu's bounded subprocess poll, not hang here.
    from speaker_follower_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    cache_dir = enable_persistent_cache()

    from speaker_follower_tpu.agents.rollout import rollout
    from speaker_follower_tpu.data.graph import load_graph_bank
    from speaker_follower_tpu.env import vecenv
    from speaker_follower_tpu.models.follower import init_follower

    t0 = time.time()
    with open("/root/reference/connectivity/scans.txt") as f:
        scans = [line.strip() for line in f if line.strip()]
    bank = load_graph_bank(
        scans, "/root/reference/connectivity",
        cache_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache"),
    )
    # synthetic feature bank generated on device (3.2 GB equivalent would
    # take ~80 s to randn on the 1-core host)
    feats_bf16 = jax.random.normal(
        jax.random.PRNGKey(0), (bank.total_nodes, 36, FEAT_DIM), jnp.bfloat16
    )
    # default ON since round 3: the fused custom-VJP pano kernel beats the
    # XLA gather path end-to-end on chip (b2048 fwd+bwd 132 ms vs 213 ms,
    # runs/profile_b2048_{base,pallas}_r3.log); BENCH_TRAIN_PALLAS=0
    # benches the plain XLA path.
    train_pallas = os.environ.get("BENCH_TRAIN_PALLAS", "1") == "1"
    if jax.devices()[0].platform not in ("tpu", "axon"):
        # compiled (non-interpret) Pallas needs the TPU backend; CPU
        # smoke runs bench the XLA pano path instead
        train_pallas = False
    tables_train = vecenv.make_env_tables(bank, feats_bf16, pad_views=train_pallas)
    sys.stderr.write(
        f"[bench] {len(scans)} scans, {bank.total_nodes} nodes, "
        f"setup {time.time() - t0:.1f}s, device={jax.devices()[0]}, "
        f"xla_cache={cache_dir or 'off'}\n"
    )

    params = init_follower(
        jax.random.PRNGKey(0),
        vocab_size=992,
        word_embedding_size=300,
        hidden_size=HIDDEN,
        action_embedding_size=FEAT_DIM + 128,
        feature_size=FEAT_DIM + 128,
    )
    params = jax.tree.map(lambda x: jnp.asarray(x), params)

    rng = np.random.RandomState(0)
    scan_ix = rng.randint(len(scans), size=BATCH).astype(np.int32)
    node = np.zeros(BATCH, np.int32)
    goal = np.zeros(BATCH, np.int32)
    for i in range(BATCH):
        g = bank.graphs[scans[scan_ix[i]]]
        inc = np.nonzero(g.included & (g.adj_count > 0))[0]
        node[i], goal[i] = inc[rng.randint(len(inc), size=2)]
    lengths = rng.randint(10, MAX_LEN, size=BATCH).astype(np.int32)
    seq = rng.randint(4, 900, size=(BATCH, MAX_LEN)).astype(np.int32)
    for i, l in enumerate(lengths):
        seq[i, l - 1] = 2
        seq[i, l:] = 0
    batch = {
        "scan": jnp.asarray(scan_ix),
        "start_node": jnp.asarray(node),
        "goal_node": jnp.asarray(goal),
        "heading": jnp.asarray(rng.randint(12, size=BATCH).astype(np.int32)),
        "seq": jnp.asarray(seq),
        "seq_mask": jnp.asarray(seq == 0),
        "seq_length": jnp.asarray(lengths),
    }

    # ---------------- train-step benchmark (the headline) ----------------
    # fwd (sample-feedback rollout) + bwd + Adam/wd, K steps chained in one
    # lax.scan so host/tunnel dispatch is amortized out of the measurement.
    import jax.lax as lax

    from speaker_follower_tpu.training.optim import adam_with_torch_wd

    tx = adam_with_torch_wd(1e-4, 5e-4)
    opt_state = tx.init(params)
    k_steps = int(os.environ.get("BENCH_TRAIN_SCAN", "10"))

    # bf16 mixed precision by default: the controlled 3000-iter quality
    # runs (runs/README.md) show bf16 == f32 == pallas within noise, so
    # the TPU-native mode is also the full-quality mode.
    compute_dtype = {"f32": None, "bf16": "bfloat16"}[
        os.environ.get("BENCH_COMPUTE", "bf16")
    ]

    use_remat = os.environ.get("BENCH_REMAT", "0") == "1"

    def loss_fn(p, t, b, k):
        # EXACTLY the trainer's default configuration (trainer.py
        # _loss_fn: factored_loss=cfg.factored_loss and cfg.use_pallas,
        # fused_tail default-on — the round-5 on-chip A/B
        # runs/profile_fused_tail_r5.log measured fused 102.2 ms vs
        # unfused 105.9 ms fwd+bwd at b2048, so the winner ships as both
        # the trainer default and the benched config)
        return rollout(
            p, t, b, k,
            feedback="sample", episode_len=EPISODE_LEN,
            deterministic=False, dropout_ratio=0.5,
            compute_dtype=compute_dtype, use_pallas=train_pallas,
            remat=use_remat, factored_loss=train_pallas,
        ).loss

    # tables/batch are ARGUMENTS, never closures: closed-over device arrays
    # become baked-in executable constants (2.2 GB of feature bank)
    def k_train_steps(p, o, key, t, b):
        def one_step(carry, k):
            p_, o_ = carry
            loss, grads = jax.value_and_grad(loss_fn)(p_, t, b, k)
            updates, o_ = tx.update(grads, o_, p_)
            p_ = jax.tree.map(lambda a, u: a + u, p_, updates)
            return (p_, o_), loss

        return lax.scan(one_step, (p, o), jax.random.split(key, k_steps))

    key = jax.random.PRNGKey(1)
    results = {}
    for train_batch_size in (100, BATCH):
        train_batch = {
            k: v[:train_batch_size] if v.ndim >= 1 else v for k, v in batch.items()
        }
        stepk = jax.jit(k_train_steps)
        t0 = time.time()
        lowered = stepk.lower(params, opt_state, key, tables_train, train_batch)
        compiled = lowered.compile()
        try:
            ca = compiled.cost_analysis()
            flops_per_scan = float(ca.get("flops", 0.0))
            bytes_per_scan = float(ca.get("bytes accessed", 0.0))
        except Exception:
            flops_per_scan = 0.0
            bytes_per_scan = 0.0
        (p1, o1), losses = compiled(params, opt_state, key, tables_train, train_batch)
        np.asarray(losses)
        sys.stderr.write(
            f"[bench] train-step batch {train_batch_size}: compile+first "
            f"{time.time() - t0:.1f}s\n"
        )
        n_scans = max(1, N_ITERS // k_steps)
        t0 = time.time()
        outs = []
        for i in range(n_scans):
            (p1, o1), losses = compiled(
                p1, o1, jax.random.fold_in(key, i), tables_train, train_batch
            )
            outs.append(losses)
        for losses in outs:
            np.asarray(losses)
        dt = time.time() - t0
        steps = n_scans * k_steps
        train_eps = train_batch_size * steps / dt
        mfu = flops_per_scan * n_scans / dt / PEAK_FLOPS
        results[train_batch_size] = train_eps
        sys.stderr.write(
            f"[bench] {steps} {os.environ.get('BENCH_COMPUTE', 'bf16')} "
            f"train steps @ batch {train_batch_size} in "
            f"{dt:.2f}s -> {train_eps:.0f} eps/s, "
            f"~{flops_per_scan / k_steps / 1e9:.1f} GFLOP/step, "
            f"{flops_per_scan * n_scans / dt / 1e9:.0f} GFLOP/s device rate, "
            f"MFU {100 * mfu:.2f}% of {PEAK_FLOPS / 1e12:.0f} TF/s bf16 peak, "
            f"{bytes_per_scan * n_scans / dt / 1e9:.0f} GB/s HBM "
            f"({100 * bytes_per_scan * n_scans / dt / PEAK_HBM_BW:.0f}% of "
            f"{PEAK_HBM_BW / 1e9:.0f} GB/s peak)\n"
        )

    train_eps = results[BATCH]
    print(
        json.dumps(
            {
                "metric": "train_step_episodes_per_sec",
                "value": round(train_eps, 1),
                "unit": "episodes/s/chip (fwd+bwd+Adam, sample feedback, "
                "batch %d, 10-step, full-dim, %s compute; reference "
                "trained at batch 100 = %.0f eps/s on this chip)"
                % (BATCH, os.environ.get("BENCH_COMPUTE", "bf16"), results[100]),
                "vs_baseline": round(train_eps / REFERENCE_EPISODES_PER_SEC, 1),
            }
        )
    )
    sys.stdout.flush()

    # free the train-step state before the side phases
    p1 = o1 = compiled = lowered = stepk = outs = losses = None

    # ------------- greedy-rollout side metric (production decode) --------
    # Runs AFTER the JSON so a failure here can't cost the headline.
    # Since round 5 this is the INFERENCE-MODE rollout (no CE/loss
    # bookkeeping in the scan, fused in-scan tail without factored_loss —
    # agents/rollout.py inference=True) at the full BENCH_BATCH: the
    # round-2/3 worker-killing compile was the UNFUSED b2048+ inference
    # program; the inference-mode program is smaller and compiles in
    # seconds (runs/profile_fused_tail_r5.log: 42.6 ms @ b2048 = ~48k
    # eps/s, 2.3x the train step at the same batch).  K rollouts are
    # chained in one jitted scan, same amortization as the train phase.
    # BENCH_INFERENCE_BATCH overrides; BENCH_SKIP_INFERENCE=1 drops it.
    if os.environ.get("BENCH_SKIP_INFERENCE", "0") != "1":
        try:
            inf_batch_size = int(os.environ.get("BENCH_INFERENCE_BATCH", BATCH))
            inf_batch = {
                k: v[:inf_batch_size] if v.ndim >= 1 else v
                for k, v in batch.items()
            }

            def k_rollouts(p, t, b, k):
                def one(_, kk):
                    o = rollout(
                        p, t, b, kk,
                        feedback="argmax", episode_len=EPISODE_LEN,
                        deterministic=True, use_pallas=train_pallas,
                        compute_dtype=compute_dtype, inference=True,
                    )
                    return 0, (o.nodes[:, -1].sum(), o.score.sum())

                _, outs = lax.scan(one, 0, jax.random.split(k, k_steps))
                return outs

            run = jax.jit(k_rollouts)
            t0 = time.time()
            nodes, score = run(params, tables_train, inf_batch, key)
            np.asarray(nodes)  # block_until_ready returns early over the tunnel
            sys.stderr.write(
                f"[bench] inference rollout compile+first {time.time() - t0:.1f}s\n"
            )
            n_scans = max(1, N_ITERS // k_steps)
            t0 = time.time()
            outs = [
                run(params, tables_train, inf_batch, jax.random.fold_in(key, i))
                for i in range(n_scans)
            ]
            for nodes, score in outs:
                np.asarray(nodes)
                np.asarray(score)
            dt = time.time() - t0
            eps_per_sec = inf_batch_size * n_scans * k_steps / dt
            sys.stderr.write(
                f"[bench] {n_scans * k_steps} x {inf_batch_size} greedy episodes in "
                f"{dt:.2f}s -> {eps_per_sec:.0f} eps/s INFERENCE (batch "
                f"{inf_batch_size}{', pallas' if train_pallas else ''}, "
                f"inference-mode rollout; {eps_per_sec / train_eps:.2f}x the "
                f"train step at batch {BATCH})\n"
            )
            outs = nodes = score = run = None
        except Exception as e:
            sys.stderr.write(
                f"[bench] inference phase failed: {type(e).__name__}: {e}\n"
            )

    # ------------- speaker train-step side metric (BENCH_SPEAKER=0 skips)
    if os.environ.get("BENCH_SPEAKER", "1") != "1":
        return
    try:
        from speaker_follower_tpu.agents import speaker as sa
        from speaker_follower_tpu.models.speaker import init_speaker

        s_params = jax.tree.map(
            jnp.asarray,
            init_speaker(jax.random.PRNGKey(2), vocab_size=992),
        )
        s_opt = tx.init(s_params)

        def s_loss(p, t, b, k):
            # the SpeakerTrainer default config (trainer.py _loss_fn with
            # cfg.use_pallas): lazy gold rollout (no (B, T, 36, D) stack),
            # fused bank-gather encoder attention, pallas word chain
            gold = sa.gold_rollout(
                t, b, episode_len=EPISODE_LEN, lazy_features=train_pallas
            )
            return sa.score_instructions(
                p, gold, b["seq"], k, feedback="teacher",
                instruction_len=MAX_LEN, unroll_len=EPISODE_LEN,
                deterministic=False, dropout_ratio=0.5, use_glove=True,
                compute_dtype=compute_dtype, use_pallas=train_pallas,
                tables=t if train_pallas else None,
            ).loss

        def s_k_steps(p, o, key, t, b):
            def one(carry, k):
                p_, o_ = carry
                loss, grads = jax.value_and_grad(s_loss)(p_, t, b, k)
                up, o_ = tx.update(grads, o_, p_)
                return (jax.tree.map(lambda a, u: a + u, p_, up), o_), loss

            return lax.scan(one, (p, o), jax.random.split(key, k_steps))

        # since round 5 the speaker shares the padded bank: lazy gold +
        # the fused encoder-attention kernel read it directly (no second
        # unpadded bank, no (B, T, 36, D) stack)
        tables_s = tables_train
        sstep = jax.jit(s_k_steps)
        t0 = time.time()
        (sp, so), losses = sstep(s_params, s_opt, key, tables_s, batch)
        np.asarray(losses)
        sys.stderr.write(
            f"[bench] speaker train-step: compile+first {time.time()-t0:.1f}s\n"
        )
        n_scans = max(1, N_ITERS // k_steps)
        t0 = time.time()
        souts = []
        for i in range(n_scans):
            (sp, so), losses = sstep(
                sp, so, jax.random.fold_in(key, 1000 + i), tables_s, batch
            )
            souts.append(losses)
        for losses in souts:
            np.asarray(losses)
        dt = time.time() - t0
        sys.stderr.write(
            f"[bench] speaker fused-teacher train step @ batch {BATCH}: "
            f"{BATCH * n_scans * k_steps / dt:.0f} eps/s "
            f"(gold rollout + 80-word batched decode + Adam)\n"
        )
    except Exception as e:
        sys.stderr.write(f"[bench] speaker phase failed: {type(e).__name__}: {e}\n")


if __name__ == "__main__":
    main()
