"""Cold/warm A/B for the persistent XLA compilation cache.

Isolates what the cache can actually change — AOT ``.compile()`` time —
from what it cannot (tunnel dispatch variance, which runs/sf_beam40_
cache_*.log showed swamping end-to-end wall clocks: the warm run there
wrote ZERO new cache entries, i.e. every program hit, yet its first
dispatch stalled 197 s on the tunnel).  Protocol:

    python scripts/probe_compile_cache.py --dir /tmp/xlacache   # cold
    python scripts/probe_compile_cache.py --dir /tmp/xlacache   # warm

Each invocation is a fresh process; it compiles the production follower
rollout (inference mode, the bench's greedy program) AOT and reports
lower/compile seconds plus the cache-entry delta.  A warm process must
report new_entries=0 and a compile time well under the cold one.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="cache directory for the A/B")
    ap.add_argument("--platform", default=None, help="e.g. cpu to force CPU")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument(
        "--fused_search", action="store_true",
        help="A/B the fused state-factored search program at the "
        "production beam-40 shape (the 537 s cold-compile documented in "
        "runs/sf_beam40_r5.log) instead of the inference rollout",
    )
    ap.add_argument(
        "--no_execute", action="store_true",
        help="measure lower+compile only, skip the dispatch (the cache "
        "claim is about compile time; skipping execution also avoids "
        "exercising untrained-params search on the live worker)",
    )
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from speaker_follower_tpu.utils.compile_cache import enable_persistent_cache

    # the probe's purpose is measuring the cache — force it on even on
    # the (opt-in) CPU backend
    os.environ.setdefault("SFNAV_XLA_CACHE", "1")
    d = enable_persistent_cache(args.dir)
    assert d == args.dir, d
    before = set(os.listdir(d)) if os.path.isdir(d) else set()

    import jax.numpy as jnp
    import numpy as np

    from speaker_follower_tpu.agents.rollout import rollout
    from speaker_follower_tpu.data.dataset import R2RDataset, encode_batch
    from speaker_follower_tpu.data.features import random_feature_bank
    from speaker_follower_tpu.data.graph import load_graph_bank
    from speaker_follower_tpu.data.text import Tokenizer, read_vocab
    from speaker_follower_tpu.env import vecenv
    from speaker_follower_tpu.models.follower import init_follower
    from speaker_follower_tpu.paths import CONNECTIVITY_DIR, R2R_DATA_DIR

    vocab = read_vocab(os.path.join(R2R_DATA_DIR, "train_vocab.txt"))
    ds = R2RDataset(
        ["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab),
        batch_size=args.batch,
    )
    keep = sorted(ds.scans)[:3]
    ds.data = [dd for dd in ds.data if dd["scan"] in keep]
    bank = load_graph_bank(keep, CONNECTIVITY_DIR)
    feats = random_feature_bank(bank, dim=2048, seed=0)
    tables = vecenv.make_env_tables(bank, feats, pad_views=True)
    enc = encode_batch(ds.next_minibatch(), bank)
    batch = {
        k: jnp.asarray(enc[k])
        for k in ["scan", "start_node", "goal_node", "heading", "seq",
                  "seq_mask", "seq_length"]
    }
    # pad/tile the batch to the requested size for a production-shape program
    b0 = int(batch["scan"].shape[0])
    reps = -(-args.batch // b0)
    batch = {
        k: jnp.concatenate([v] * reps, axis=0)[: args.batch]
        for k, v in batch.items()
    }
    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab),
        action_embedding_size=2048 + 128, feature_size=2048 + 128,
    )
    rng = jax.random.PRNGKey(0)

    if args.fused_search:
        from speaker_follower_tpu.agents.state_factored_fused import (
            _search_program,
        )

        sb = {k: v[:64] for k, v in batch.items()}
        t0 = time.perf_counter()
        lowered = _search_program.lower(
            params, tables, sb["seq"], sb["seq_length"], sb["seq_mask"],
            sb["scan"], sb["start_node"], sb["heading"],
            completion_size=40, successor_size=10, episode_len=10,
            first_n_ws_key=4, max_rounds=320, table_capacity=1024,
            use_glove=False,
        )
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        t3 = t2
        if not args.no_execute:
            st = compiled(
                params, tables, sb["seq"], sb["seq_length"], sb["seq_mask"],
                sb["scan"], sb["start_node"], sb["heading"],
            )
            np.asarray(jax.tree_util.tree_leaves(st)[0])  # honest tunnel sync
            t3 = time.perf_counter()
    else:
        kw = dict(feedback="argmax", deterministic=True, use_glove=False,
                  use_pallas=jax.default_backend() != "cpu", inference=True)
        t0 = time.perf_counter()
        lowered = rollout.lower(params, tables, batch, rng, **kw)
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        t3 = t2
        if not args.no_execute:
            out = compiled(params, tables, batch, rng)
            np.asarray(out.actions)  # honest sync (block_until_ready lies)
            t3 = time.perf_counter()

    after = set(os.listdir(d))
    print(
        f"backend={jax.default_backend()} batch={args.batch} "
        f"lower={t1 - t0:.2f}s compile={t2 - t1:.2f}s "
        f"first_dispatch={t3 - t2:.2f}s new_entries={len(after - before)} "
        f"total_entries={len(after)}"
    )


if __name__ == "__main__":
    main()
