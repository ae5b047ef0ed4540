"""Aggregate per-viewpoint bottom-up detection stores into one cache pickle.

Equivalent of the reference's root-level cache_bottom_up.py (:1-24): it
enumerates every viewpoint key, pulls the top-``--detections`` detections
per view through the featurizer, and pickles a
``{(scan, viewpoint): [36 x view dict]}`` cache that
``BottomUpFeaturizer(precomputed_cache_path=...)`` can load directly.

Keys come from the connectivity graphs' included viewpoints (the
reference iterates its mean-pooled TSV's keys, which cover the same set):

    python scripts/cache_bottom_up.py --store_dir img_features/bottom_up \\
        --detections 20 --out img_features/bottom_up_10_100_d=20.pkl
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speaker_follower_tpu import paths
from speaker_follower_tpu.data.bottom_up import BottomUpFeaturizer, build_cache
from speaker_follower_tpu.data.graph import load_graph_bank


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--detections", type=int, default=20)
    ap.add_argument("--store_dir", required=True,
                    help="directory of per-view detection pickles")
    ap.add_argument("--out", default=None,
                    help="output cache path (default mirrors the reference's "
                    "img_features/bottom_up_10_100_d={detections}.pkl)")
    ap.add_argument("--object_vocab", default=paths.VG_OBJECT_VOCAB)
    ap.add_argument("--attribute_vocab", default=paths.VG_ATTRIBUTE_VOCAB)
    ap.add_argument("--connectivity", default=paths.CONNECTIVITY_DIR)
    ap.add_argument("--scans", nargs="*", default=None,
                    help="subset of scan ids (default: all in scans.txt)")
    args = ap.parse_args()

    if args.scans:
        scans = args.scans
    else:
        with open(os.path.join(args.connectivity, "scans.txt")) as f:
            scans = [line.strip() for line in f if line.strip()]
    bank = load_graph_bank(scans, args.connectivity)

    keys = []
    for scan_id in scans:
        g = bank.graphs[scan_id]
        for v, inc in enumerate(g.included):
            if inc:
                keys.append((scan_id, g.node_ids[v]))
    print(f"{len(keys)} viewpoints across {len(scans)} scans")

    featurizer = BottomUpFeaturizer(
        args.detections,
        object_vocab_path=args.object_vocab,
        attribute_vocab_path=args.attribute_vocab,
        store_dir=args.store_dir,
    )
    out = args.out or f"img_features/bottom_up_10_100_d={args.detections}.pkl"
    missing = build_cache(featurizer, keys, out)
    for key in sorted(missing):
        print("missing:", key)
    print(f"wrote {len(keys) - len(missing)}/{len(keys)} viewpoints -> {out}")


if __name__ == "__main__":
    main()
