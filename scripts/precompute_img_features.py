"""Precompute image features: skybox images -> 36 rendered views ->
ResNet -> mean-pooled TSV (or per-view conv .npy) stores.

Replaces scripts/precompute_img_features.py of the reference (which
drives the OpenGL simulator through 36 makeAction calls per viewpoint
and a Caffe ResNet-152): here the 36-view sweep is one batched JAX
cubemap render (env/render.py) and the backbone is the XLA ResNet
(pipeline/resnet.py), so the whole pipeline runs on TPU.

  python scripts/precompute_img_features.py \
      --dataset_path /path/to/matterport \
      --out img_features/ResNet-152-imagenet.tsv \
      [--torch_weights resnet152.pth]   # torchvision state_dict -> exact
      [--mode conv --out_dir img_features/conv]  # res5c .npy store
      [--scans 17DRP5sb8fy ...]          # default: all 90

Without --torch_weights the network is randomly initialized (the
released Caffe weights are download-only); the emitted stores are still
format-identical and exercise the full path.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", required=True,
                        help="Matterport root (v1/scans/... layout)")
    parser.add_argument("--connectivity", default="/root/reference/connectivity")
    parser.add_argument("--out", default="img_features/ResNet-152-imagenet.tsv")
    parser.add_argument("--out_dir", default="img_features/conv")
    parser.add_argument("--mode", choices=["mean_pooled", "conv"],
                        default="mean_pooled")
    parser.add_argument("--scans", nargs="+", default=None)
    parser.add_argument("--torch_weights", default=None,
                        help="torchvision-format ResNet state_dict (.pth); "
                        "loaded exactly with style=torchvision")
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--vfov", type=float, default=60.0)
    parser.add_argument("--batch_size", type=int, default=36)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax

    from speaker_follower_tpu.pipeline import precompute as pc
    from speaker_follower_tpu.pipeline.resnet import (
        RESNET152_STAGES,
        convert_torchvision_state_dict,
        resnet_init,
    )

    vids = pc.load_viewpoint_ids(args.connectivity)
    if args.scans:
        keep = set(args.scans)
        vids = [(s, v) for s, v in vids if s in keep]
    print(f"{len(vids)} viewpoints to featurize", file=sys.stderr)

    if args.torch_weights:
        import torch

        sd = torch.load(args.torch_weights, map_location="cpu")
        params = convert_torchvision_state_dict(sd, stages=RESNET152_STAGES)
        style = "torchvision"
    else:
        print("WARNING: no --torch_weights; using random ResNet weights "
              "(format-correct, semantically meaningless features)",
              file=sys.stderr)
        params = resnet_init(jax.random.PRNGKey(args.seed))
        style = "caffe"

    provider = pc.skybox_image_provider(
        args.dataset_path, args.connectivity,
        width=args.width, height=args.height, vfov_deg=args.vfov,
    )

    t0 = time.time()

    def progress(done, total):
        rate = done / (time.time() - t0)
        eta = (total - done) / rate / 3600 if rate else float("inf")
        print(f"{done}/{total} viewpoints, {rate:.2f}/s, eta {eta:.1f}h",
              file=sys.stderr)

    if args.mode == "mean_pooled":
        os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
        pc.precompute_mean_pooled_tsv(
            params, provider, vids, args.out,
            style=style, batch_size=args.batch_size,
            width=args.width, height=args.height, progress=progress,
        )
        print(f"wrote {args.out}", file=sys.stderr)
    else:
        pc.precompute_convolutional_npy(
            params, provider, vids, args.out_dir,
            style=style, batch_size=args.batch_size,
        )
        print(f"wrote {args.out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
