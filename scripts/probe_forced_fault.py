"""A/B the axon forced-rollout worker fault against the lazy-features path.

docs/ROUND3.md: `speaker.forced_rollout` at batch >= ~24 on the 61-scan
full val world killed the TPU worker at EXECUTION (>1 h outage); the
suspected trigger is the (B, T, 36, D) stacked-gather replay program.
The lazy path (forced_rollout lazy_features=True, now the scoring
default) never builds that program.  This probe runs the full
speaker-scoring pipeline UNCHUNKED at the fault batch sizes on the same
61-scan world:

    python scripts/probe_forced_fault.py --batch 32        # lazy (default)
    python scripts/probe_forced_fault.py --batch 32 --materialized  # fault repro

WARNING: --materialized at batch >= 24 is expected to kill the remote
worker for >1 h.  Run the lazy arm first; only run the materialized arm
when nothing else needs the chip.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--materialized", action="store_true",
                    help="use the stacked-gather replay (the fault trigger)")
    ap.add_argument("--scans", type=int, default=0,
                    help="limit world size (0 = all 90 scans; the fault "
                         "signature needs >= ~61)")
    ap.add_argument("--episode_len", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize latches the "
                         "axon platform; JAX_PLATFORMS=cpu alone is ignored)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from speaker_follower_tpu.agents import speaker as sa
    from speaker_follower_tpu.data.graph import load_graph_bank
    from speaker_follower_tpu.env import vecenv
    from speaker_follower_tpu.models.speaker import init_speaker

    with open("/root/reference/connectivity/scans.txt") as f:
        scans = [line.strip() for line in f if line.strip()]
    if args.scans:
        scans = scans[: args.scans]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bank = load_graph_bank(scans, "/root/reference/connectivity",
                           cache_dir=os.path.join(repo, ".cache"))
    feats = jnp.zeros((bank.total_nodes, 36, 2048), jnp.bfloat16)
    tables = vecenv.make_env_tables(bank, feats)
    print(f"world: {len(scans)} scans, {bank.total_nodes} nodes; "
          f"batch {args.batch}, lazy={not args.materialized}", flush=True)

    params = init_speaker(
        jax.random.PRNGKey(0), vocab_size=992,
        action_embedding_size=2048 + 128, feature_size=2048 + 128,
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    b = args.batch
    rng = np.random.RandomState(0)
    scan_ix = rng.randint(len(scans), size=b).astype(np.int32)
    node = np.zeros(b, np.int32)
    for i in range(b):
        g = bank.graphs[scans[scan_ix[i]]]
        inc = np.nonzero(g.included & (g.adj_count > 0))[0]
        node[i] = inc[rng.randint(len(inc))]
    t = args.episode_len
    batch = {
        "scan": jnp.asarray(scan_ix),
        "start_node": jnp.asarray(node),
        "heading": jnp.asarray(rng.randint(12, size=b).astype(np.int32)),
        "forced_actions": jnp.asarray(
            rng.randint(1, 4, size=(b, t)).astype(np.int32)),
        "forced_len": jnp.asarray(np.full(b, t, np.int32)),
        "instr": jnp.asarray(rng.randint(4, 900, size=(b, 80)).astype(np.int32)),
    }

    t0 = time.time()
    gold = sa.forced_rollout(
        tables, batch, episode_len=t, lazy_features=not args.materialized
    )
    jax.tree.map(lambda x: np.asarray(x) if x is not None else None,
                 gold._asdict())
    print(f"forced_rollout executed in {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    out = sa.score_instructions(
        params, gold, batch["instr"], jax.random.PRNGKey(1),
        feedback="teacher", instruction_len=80, unroll_len=args.episode_len,
        deterministic=True, use_glove=False,
        tables=None if args.materialized else tables,
    )
    print(f"score_instructions -> loss {float(out.loss):.4f} "
          f"in {time.time() - t0:.1f}s", flush=True)
    print("SURVIVED: no worker fault at this config", flush=True)


if __name__ == "__main__":
    main()
