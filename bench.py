"""Benchmark: batched greedy follower rollouts, episodes/sec on one chip.

Workload: the production inference path — full-dim follower (hidden 512,
ResNet features 2048 + 128 loc embedding, bfloat16 feature bank), argmax
decoding, 10-step episodes, over the real 90-scan Matterport navigation
graphs with synthetic features (the released feature TSV is download-only).

Baseline: the reference publishes one wall-clock figure — 50k training
iterations at batch 100 in ~50 hours on a single GPU (README.md:101), i.e.
~27.8 episodes/sec through its C++-sim + PyTorch pipeline.  That number is
the denominator for vs_baseline.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_EPISODES_PER_SEC = 50000 * 100 / (50 * 3600)  # ~27.78

BATCH = int(os.environ.get("BENCH_BATCH", "1024"))
EPISODE_LEN = 10
N_WARMUP = 3
N_ITERS = int(os.environ.get("BENCH_ITERS", "50"))
FEAT_DIM = 2048
HIDDEN = 512
MAX_LEN = 80


def main():
    import jax
    import jax.numpy as jnp

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
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    tables = vecenv.make_env_tables(bank, feats_bf16, pad_views=use_pallas)
    sys.stderr.write(
        f"[bench] {len(scans)} scans, {bank.total_nodes} nodes, "
        f"setup {time.time() - t0:.1f}s, device={jax.devices()[0]}\n"
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

    # outer jit with positional args: calling a partial-jitted fn with
    # static kwargs costs ~28 ms of host dispatch per call on this 1-core
    # host — 65x the device time
    run = jax.jit(
        lambda p, t, b, k: (
            lambda o=rollout(
                p, t, b, k,
                feedback="argmax", episode_len=EPISODE_LEN, deterministic=True,
                use_pallas=use_pallas,
            ): (o.nodes, o.score)
        )()
    )

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    try:
        nodes, score = run(params, tables, batch, key)
        np.asarray(nodes)  # block_until_ready returns early over the tunnel
    except Exception as e:  # pallas remote-compile hiccup: fall back to XLA
        if not use_pallas:
            raise
        sys.stderr.write(f"[bench] pallas path failed ({type(e).__name__}); "
                         "falling back to XLA\n")
        use_pallas = False
        tables = vecenv.make_env_tables(bank, feats_bf16)
        run = jax.jit(
            lambda p, t, b, k: (
                lambda o=rollout(
                    p, t, b, k,
                    feedback="argmax", episode_len=EPISODE_LEN,
                    deterministic=True,
                ): (o.nodes, o.score)
            )()
        )
        nodes, score = run(params, tables, batch, key)
        np.asarray(nodes)
    sys.stderr.write(f"[bench] compile+first run {time.time() - t0:.1f}s\n")

    for _ in range(N_WARMUP - 1):
        np.asarray(run(params, tables, batch, key)[0])

    # pipelined dispatch, then fetch EVERY result: the only honest timing
    # through the tunnel (block_until_ready under-reports)
    t0 = time.time()
    outs = [
        run(params, tables, batch, jax.random.fold_in(key, i))
        for i in range(N_ITERS)
    ]
    for nodes, score in outs:
        np.asarray(nodes)
        np.asarray(score)
    dt = time.time() - t0

    eps_per_sec = BATCH * N_ITERS / dt
    sys.stderr.write(
        f"[bench] {N_ITERS} x {BATCH} greedy episodes in {dt:.2f}s\n"
    )
    print(
        json.dumps(
            {
                "metric": "greedy_follower_episodes_per_sec",
                "value": round(eps_per_sec, 1),
                "unit": "episodes/s/chip (batch %d, 10-step, full-dim%s)"
                % (BATCH, ", pallas" if use_pallas else ""),
                "vs_baseline": round(eps_per_sec / REFERENCE_EPISODES_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
