"""Feature-precompute pipeline: panorama images -> ResNet features -> the
store formats the task layer consumes.

Replaces scripts/precompute_img_features.py (+ split_img_features.py):
iterate all included viewpoints of every scan (the reference drives the
C++ simulator to render 36 views per viewpoint; here images come from an
``image_provider`` callable since the Matterport image dataset and its
renderer are external), run XLA ResNet inference, and emit either
  * the mean-pooled TSV store (36 x 2048 per viewpoint, base64 float32,
    identical schema: scanId/viewpointId/image_w/image_h/vfov/features), or
  * per-view convolutional .npy files (2048 x H/32 x W/32), matching the
    ConvolutionalImageFeatures layout (env.py:390-429).
"""

from __future__ import annotations

import base64
import csv
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .resnet import RESNET152_STAGES, preprocess_bgr, resnet_apply

TSV_FIELDNAMES = ["scanId", "viewpointId", "image_w", "image_h", "vfov", "features"]
VIEWPOINT_SIZE = 36
WIDTH, HEIGHT, VFOV = 640, 480, 60


def load_viewpoint_ids(connectivity_dir: str):
    """All (scan, viewpoint) pairs with included=True
    (precompute_img_features.py:57-68)."""
    out = []
    with open(os.path.join(connectivity_dir, "scans.txt")) as f:
        scans = [s.strip() for s in f if s.strip()]
    for scan in scans:
        with open(os.path.join(connectivity_dir, f"{scan}_connectivity.json")) as f:
            for item in json.load(f):
                if item["included"]:
                    out.append((scan, item["image_id"]))
    return out


def precompute_mean_pooled_tsv(
    params,
    image_provider,
    viewpoint_ids,
    out_path: str,
    *,
    stages=RESNET152_STAGES,
    style: str = "caffe",
    batch_size: int = VIEWPOINT_SIZE,
    width: int = WIDTH,
    height: int = HEIGHT,
    progress=None,
):
    """image_provider(scan, viewpoint) -> (36, H, W, 3) uint8 BGR views in
    viewIndex order.  Writes the TSV store row per viewpoint."""
    with open(out_path, "wt") as tsvfile:
        writer = csv.DictWriter(tsvfile, delimiter="\t", fieldnames=TSV_FIELDNAMES)
        for n, (scan, vp) in enumerate(viewpoint_ids):
            views = image_provider(scan, vp)
            assert views.shape[0] == VIEWPOINT_SIZE
            feats = []
            for i in range(0, VIEWPOINT_SIZE, batch_size):
                x = preprocess_bgr(views[i : i + batch_size])
                feats.append(
                    np.asarray(resnet_apply(params, x, stages=stages, output="pool5", style=style))
                )
            feats = np.concatenate(feats, axis=0).astype(np.float32)
            writer.writerow(
                {
                    "scanId": scan,
                    "viewpointId": vp,
                    "image_w": width,
                    "image_h": height,
                    "vfov": VFOV,
                    "features": base64.b64encode(
                        np.ascontiguousarray(feats).tobytes()
                    ).decode("utf-8"),
                }
            )
            if progress:
                progress(n + 1, len(viewpoint_ids))


def precompute_convolutional_npy(
    params,
    image_provider,
    viewpoint_ids,
    out_dir: str,
    *,
    stages=RESNET152_STAGES,
    style: str = "caffe",
    batch_size: int = 4,
    split: bool = True,
):
    """Per-view res5c conv features as .npy, matching the split layout the
    ConvolutionalImageFeatures store reads (env.py:404-419):
    {out_dir}/{scan}/{viewpoint}_{viewIndex}.npy, or one
    {out_dir}/{scan}/{viewpoint}.npy with all 36 views when not split."""
    for scan, vp in viewpoint_ids:
        views = image_provider(scan, vp)
        feats = []
        for i in range(0, VIEWPOINT_SIZE, batch_size):
            x = preprocess_bgr(views[i : i + batch_size])
            feats.append(
                np.asarray(resnet_apply(params, x, stages=stages, output="res5c", style=style))
            )
        feats = np.concatenate(feats, axis=0)
        d = os.path.join(out_dir, scan)
        os.makedirs(d, exist_ok=True)
        if split:
            for view_index in range(VIEWPOINT_SIZE):
                np.save(os.path.join(d, f"{vp}_{view_index}.npy"), feats[view_index])
        else:
            np.save(os.path.join(d, f"{vp}.npy"), feats)


def split_tsv(in_path: str, out_paths, num_splits: int):
    """Partition a feature TSV round-robin into shards
    (scripts/split_img_features.py equivalent)."""
    outs = [open(p, "wt") for p in out_paths]
    try:
        with open(in_path, "rt") as f:
            for i, line in enumerate(f):
                outs[i % num_splits].write(line)
    finally:
        for o in outs:
            o.close()


def skybox_image_provider(
    dataset_path: str,
    connectivity_dir: str,
    *,
    width: int = WIDTH,
    height: int = HEIGHT,
    vfov_deg: float = VFOV,
    skybox_loader=None,
):
    """image_provider rendering the 36 discretized views from Matterport
    skybox images with the JAX cubemap resampler — replaces driving the
    OpenGL simulator through 36 makeAction calls per viewpoint
    (precompute_img_features.py:100-118): the whole sweep is ONE batched
    render.  ``skybox_loader(scan, vp) -> (6, S, S, 3)`` overrides reading
    JPGs from ``dataset_path`` (env/render.load_skybox)."""
    import math

    from ..env import render as rd

    pose_cache = {}

    def provider(scan_id, viewpoint_id):
        faces = (
            skybox_loader(scan_id, viewpoint_id)
            if skybox_loader is not None
            else rd.load_skybox(dataset_path, scan_id, viewpoint_id)
        )
        if scan_id not in pose_cache:
            pose_cache[scan_id] = rd.load_pose_rotations(connectivity_dir, scan_id)
        rot = pose_cache[scan_id][viewpoint_id]
        return np.asarray(
            rd.render_pano_sweep(
                faces, rot, width=width, height=height,
                vfov=math.radians(vfov_deg),
            )
        )

    return provider
