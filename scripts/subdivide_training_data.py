"""Re-partition the R2R train split into sub_train / sub_val_seen /
sub_val_unseen by scan, for fast experiments without the real val splits.

Replaces scripts/subdivide_training_data.py: 94% of scans (and 94% of the
routes within them) become sub_train, the held-out routes on seen scans
become sub_val_seen, routes on held-out scans become sub_val_unseen, and
the first 200 train routes form sub_train_subset.  Also rebuilds the
sub-split vocabulary.

  python scripts/subdivide_training_data.py --data_dir tasks/R2R/data
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speaker_follower_tpu.data.text import build_vocab, write_vocab


def partition(
    data,
    scan_train_percent=0.94,
    route_train_percent=0.94,
    seed=1,
    n_train_subset_routes=200,
):
    rng = random.Random(seed)
    scans = sorted({item["scan"] for item in data})
    rng.shuffle(scans)
    n_train_scans = int(len(scans) * scan_train_percent)
    seen_scans = set(scans[:n_train_scans])

    seen_routes, val_unseen = [], []
    for route in data:
        (seen_routes if route["scan"] in seen_scans else val_unseen).append(route)
    rng.shuffle(seen_routes)
    n_train = int(len(seen_routes) * route_train_percent)
    train = seen_routes[:n_train]
    val_seen = seen_routes[n_train:]
    train_subset = train[:n_train_subset_routes]

    assert len(train) + len(val_seen) + len(val_unseen) == len(data)
    train_scans = {r["scan"] for r in train}
    assert not (train_scans & {r["scan"] for r in val_unseen})
    return train_subset, train, val_seen, val_unseen


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", default="tasks/R2R/data")
    parser.add_argument("--out_dir", default=None)
    parser.add_argument("--seed", type=int, default=1)
    args = parser.parse_args()
    out_dir = args.out_dir or args.data_dir

    with open(os.path.join(args.data_dir, "R2R_train.json")) as f:
        data = json.load(f)

    subset, train, val_seen, val_unseen = partition(data, seed=args.seed)
    for name, routes in [
        ("sub_train_subset", subset),
        ("sub_train", train),
        ("sub_val_seen", val_seen),
        ("sub_val_unseen", val_unseen),
    ]:
        path = os.path.join(out_dir, f"R2R_{name}.json")
        with open(path, "w") as f:
            json.dump(routes, f)
        print(f"{name}: {len(routes)} routes -> {path}")

    vocab = build_vocab(train)
    write_vocab(vocab, os.path.join(out_dir, "sub_train_vocab.txt"))


if __name__ == "__main__":
    main()
