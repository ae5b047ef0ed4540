"""Steady-state phase timing of the speaker-scoring dispatch.

The beam-40 pipeline's largest phase is speaker rescoring: ~2550
candidates per 64-instruction batch, chunked at 1024 by
_resolve_score_chunk -> 3 dispatch+sync pairs of 1.3-1.7 s each in
runs/sf_beam40_r5.log.  The speaker's TRAINING forward at b2048 runs in
~36 ms (runs/profile_speaker_b2048_r5.log), so either the scoring
program is ~40x off its own roofline or the cost is tunnel round-trips
— this probe decides which, per phase:

    h2d      jnp.asarray of the fresh per-chunk host arrays
    rollout  forced_rollout dispatch (async return)
    score    score_instructions dispatch (async return)
    sync     np.asarray(out.score) — the only honest tunnel sync

and at batches past the current 1024 ceiling (the lazy replay has no
(B, T, 36, D) stack, so 2048/4096 are HBM-plausible: the largest
transient is the per-step pano gather, ~1.3 GB f32 at 4096).

    python scripts/probe_score_phase.py --batches 1024 2048 4096 --iters 5
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1024, 2048, 4096])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--scans", type=int, default=0, help="0 = all 90")
    ap.add_argument("--episode_len", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from speaker_follower_tpu.agents import speaker as sa
    from speaker_follower_tpu.data.graph import load_graph_bank
    from speaker_follower_tpu.env import vecenv
    from speaker_follower_tpu.models.speaker import init_speaker
    from speaker_follower_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    with open("/root/reference/connectivity/scans.txt") as f:
        scans = [line.strip() for line in f if line.strip()]
    if args.scans:
        scans = scans[: args.scans]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bank = load_graph_bank(scans, "/root/reference/connectivity",
                           cache_dir=os.path.join(repo, ".cache"))
    feats = jnp.zeros((bank.total_nodes, 36, 2048), jnp.bfloat16)
    tables = vecenv.make_env_tables(bank, feats)
    print(f"world: {len(scans)} scans, {bank.total_nodes} nodes", flush=True)

    params = init_speaker(
        jax.random.PRNGKey(0), vocab_size=992,
        action_embedding_size=2048 + 128, feature_size=2048 + 128,
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    t = args.episode_len
    rng = np.random.RandomState(0)

    def make_host_batch(b, seed):
        r = np.random.RandomState(seed)
        scan_ix = r.randint(len(scans), size=b).astype(np.int32)
        node = np.zeros(b, np.int32)
        for i in range(b):
            g = bank.graphs[scans[scan_ix[i]]]
            inc = np.nonzero(g.included & (g.adj_count > 0))[0]
            node[i] = inc[r.randint(len(inc))]
        return {
            "scan": scan_ix,
            "start_node": node,
            "heading": r.randint(12, size=b).astype(np.int32),
            "forced_actions": r.randint(1, 4, size=(b, t)).astype(np.int32),
            "forced_len": np.full(b, t, np.int32),
            "instr": r.randint(4, 900, size=(b, 80)).astype(np.int32),
        }

    for b in args.batches:
        host_batches = [make_host_batch(b, 100 + it)
                        for it in range(args.iters + 1)]
        for it, hb in enumerate(host_batches):
            label = "warmup" if it == 0 else f"iter{it}"
            t0 = time.perf_counter()
            db = {k: jnp.asarray(v) for k, v in hb.items()}
            t1 = time.perf_counter()
            gold = sa.forced_rollout(
                tables, db, episode_len=t, lazy_features=True)
            t2 = time.perf_counter()
            out = sa.score_instructions(
                params, gold, db["instr"], jax.random.PRNGKey(1),
                feedback="teacher", instruction_len=80, unroll_len=t,
                deterministic=True, use_glove=False, tables=tables,
            )
            t3 = time.perf_counter()
            score = np.asarray(out.score)
            t4 = time.perf_counter()
            print(
                f"B={b} {label}: h2d {t1 - t0:.3f}s  rollout {t2 - t1:.3f}s"
                f"  score {t3 - t2:.3f}s  sync {t4 - t3:.3f}s"
                f"  total {t4 - t0:.3f}s  (score[0]={score[0]:.3f})",
                flush=True,
            )
        print("SURVIVED", b, flush=True)


if __name__ == "__main__":
    main()
