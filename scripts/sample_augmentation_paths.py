"""Sample R2R-style trajectories for speaker-driven data augmentation.

The reference's augmentation pipeline consumes a DOWNLOADED file of
sampled trajectories (`R2R_data_augmentation_paths.json`,
tasks/R2R/data/download_precomputed_augmentation.sh;
README.md:19-21 describes them as "new trajectories sampled from the
training environments").  This script is the generator that download
replaces: uniform random (start, goal) shortest paths of 4-6 edges on
the requested training scans, emitted in the R2R split format with one
empty instruction slot — exactly what `cli.augment` fills in with
speaker decodes (data_augmentation_from_speaker.py:35-83 semantics).

  python scripts/sample_augmentation_paths.py \
      --out runs/aug_data/R2R_sub_augpaths10k.json \
      --use_train_subset --n_paths 10000 --seed 7
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speaker_follower_tpu.data.dataset import R2RDataset  # noqa: E402
from speaker_follower_tpu.data.graph import load_graph_bank  # noqa: E402
from speaker_follower_tpu import paths as sfpaths  # noqa: E402


def reconstruct_path(g, i, j):
    """Node index list i -> j via the next-hop matrix."""
    path = [i]
    while path[-1] != j:
        nxt = int(g.next_hop[path[-1], j])
        if nxt < 0:
            return None
        path.append(nxt)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--use_train_subset", action="store_true",
        help="sample on the sub_train scans (else the full train split)",
    )
    ap.add_argument("--n_paths", type=int, default=10000)
    ap.add_argument("--min_edges", type=int, default=4)
    ap.add_argument("--max_edges", type=int, default=6)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--data_root", default=sfpaths.DATA_ROOT)
    args = ap.parse_args()

    split = "sub_train" if args.use_train_subset else "train"
    ds = R2RDataset([split], tokenizer=None, batch_size=1)
    scans = sorted(ds.scans)
    bank = load_graph_bank(
        scans, os.path.join(args.data_root, "connectivity")
    )

    rng = np.random.RandomState(args.seed)
    items = []
    seen_pairs = set()
    attempts = 0
    # path_id namespace far above real R2R ids (max ~7000)
    base_id = 1_000_000
    while len(items) < args.n_paths and attempts < args.n_paths * 200:
        attempts += 1
        s = rng.randint(len(scans))
        g = bank.graphs[scans[s]]
        inc = np.nonzero(g.included & (g.adj_count > 0))[0]
        i, j = inc[rng.randint(len(inc), size=2)]
        if i == j or (s, i, j) in seen_pairs:
            continue
        d = float(g.dist[i, j])
        if not np.isfinite(d):
            continue
        path = reconstruct_path(g, int(i), int(j))
        if path is None or not (args.min_edges <= len(path) - 1 <= args.max_edges):
            continue
        seen_pairs.add((s, i, j))
        items.append(
            {
                "distance": round(d, 4),
                "scan": scans[s],
                "path_id": base_id + len(items),
                "path": [g.node_ids[n] for n in path],
                "heading": float(rng.uniform(0, 2 * np.pi)),
                "instructions": [""],
            }
        )

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(items, f)
    lens = [len(it["path"]) - 1 for it in items]
    print(
        f"wrote {len(items)} paths ({attempts} attempts) over {len(scans)} "
        f"scans to {args.out}; edge counts min/mean/max = "
        f"{min(lens)}/{np.mean(lens):.2f}/{max(lens)}"
    )


if __name__ == "__main__":
    main()
