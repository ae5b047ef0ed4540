"""Image-feature banks: precomputed per-viewpoint 36-view features.

TPU-native replacement for the reference ImageFeatures family
(tasks/R2R/env.py:284-388).  Instead of a python dict of (scan_viewpoint) ->
(36, 2048) arrays consulted per observation on the host, features are packed
once into a single (total_nodes, 36, D) bank indexed by global node index so
observation assembly is a device gather inside ``jit``.

The TSV format is byte-identical to the reference store
(scripts/precompute_img_features.py:31,160-168): columns
``scanId, viewpointId, image_w, image_h, vfov, features`` with features =
base64 float32 (36, 2048).  A C++ fast decoder (native/) accelerates the
2.9GB parse when built; numpy is the fallback.
"""

from __future__ import annotations

import base64
import csv
import sys

import numpy as np

from .graph import NUM_VIEWS, GraphBank

MEAN_POOLED_DIM = 2048
IMAGE_W = 640
IMAGE_H = 480
VFOV = 60
LOC_EMBED_DIM = 128
FEATURE_WITH_LOC_DIM = MEAN_POOLED_DIM + LOC_EMBED_DIM  # 2176

csv.field_size_limit(sys.maxsize)


def zero_feature_bank(graph_bank: GraphBank, dim: int = MEAN_POOLED_DIM, dtype=np.float32):
    """NoImageFeatures equivalent (tasks/R2R/env.py:337-348): all zeros."""
    return np.zeros((graph_bank.total_nodes, NUM_VIEWS, dim), dtype=dtype)


def random_feature_bank(
    graph_bank: GraphBank, dim: int = MEAN_POOLED_DIM, seed: int = 0, dtype=np.float32
):
    """Synthetic features for tests/benchmarks (no TSV download needed)."""
    rng = np.random.RandomState(seed)
    bank = rng.randn(graph_bank.total_nodes, NUM_VIEWS, dim).astype(np.float32)
    return bank.astype(dtype)


def load_tsv_feature_bank(
    tsv_paths,
    graph_bank: GraphBank,
    dtype=np.float32,
    strict: bool = False,
):
    """Parse mean-pooled feature TSV store(s) into a packed bank.

    Multiple stores are concatenated along the feature axis (the reference
    concatenates imagenet+places365 the same way, tasks/R2R/env.py:372-375).
    With ``strict`` every included node must be present; otherwise missing
    viewpoints keep zero features and a warning reports how many (a
    truncated TSV must never silently train on zeros).
    """
    if isinstance(tsv_paths, str):
        tsv_paths = [tsv_paths]
    dim = MEAN_POOLED_DIM * len(tsv_paths)
    bank = np.zeros((graph_bank.total_nodes, NUM_VIEWS, dim), dtype=np.float32)
    seen = np.zeros((graph_bank.total_nodes,), dtype=bool)
    fieldnames = ["scanId", "viewpointId", "image_w", "image_h", "vfov", "features"]
    for k, path in enumerate(tsv_paths):
        try:
            from . import native_io

            rows = native_io.read_feature_tsv(path)
        except Exception:
            rows = _read_feature_tsv_py(path, fieldnames)
        for scan_id, viewpoint_id, feats in rows:
            if scan_id not in graph_bank.graphs:
                continue
            g = graph_bank.global_index(scan_id, viewpoint_id)
            bank[g, :, k * MEAN_POOLED_DIM : (k + 1) * MEAN_POOLED_DIM] = feats
            seen[g] = True
    # Only *included* nodes are expected in the store (excluded viewpoints
    # are never visited and the precompute pipeline skips them).
    included = np.zeros((graph_bank.total_nodes,), dtype=bool)
    for si, sid in enumerate(graph_bank.scan_ids):
        g = graph_bank.graphs[sid]
        included[graph_bank.offsets[si] : graph_bank.offsets[si] + len(g.node_ids)] = (
            g.included
        )
    missing = int((included & ~seen).sum())
    if missing:
        msg = (
            f"{missing}/{int(included.sum())} included viewpoints missing from "
            f"feature store(s) {list(tsv_paths)}"
        )
        if strict:
            raise ValueError(msg)
        import warnings

        warnings.warn(msg + "; their features stay zero", stacklevel=2)
    return bank.astype(dtype)


def _read_feature_tsv_py(path, fieldnames):
    with open(path, "rt") as f:
        reader = csv.DictReader(f, delimiter="\t", fieldnames=fieldnames)
        for item in reader:
            assert int(item["image_h"]) == IMAGE_H
            assert int(item["image_w"]) == IMAGE_W
            assert int(item["vfov"]) == VFOV
            feats = np.frombuffer(
                base64.decodebytes(item["features"].encode("utf-8")),
                dtype=np.float32,
            ).reshape((NUM_VIEWS, MEAN_POOLED_DIM))
            yield item["scanId"], item["viewpointId"], feats


class ConvolutionalFeatureStore:
    """Per-view res5c convolutional features from .npy files.

    Mirrors ConvolutionalImageFeatures (tasks/R2R/env.py:390-429): split
    layout {dir}/{scan}/{viewpoint}_{viewIndex}[_downscaled].npy or
    combined {dir}/{scan}/{viewpoint}.npy (memmapped).  Like the
    reference, this store is NOT wired into the panorama environment
    (env.py:312 raises NotImplementedError there) — it serves the
    precompute/inspection tooling.
    """

    def __init__(self, store_dirs, split=True, downscaled=False):
        if isinstance(store_dirs, str):
            store_dirs = [store_dirs]
        self.store_dirs = store_dirs
        self.split = split
        self.downscaled = downscaled
        self._cache = {}

    def get_features(self, scan_id, viewpoint_id, view_index):
        import os

        key = (scan_id, viewpoint_id, view_index)
        if key in self._cache:
            return self._cache[key]
        feats = []
        for d in self.store_dirs:
            if self.split:
                suffix = "_downscaled" if self.downscaled else ""
                path = os.path.join(
                    d, scan_id, f"{viewpoint_id}_{view_index}{suffix}.npy"
                )
                feats.append(np.load(path))
            else:
                path = os.path.join(d, scan_id, f"{viewpoint_id}.npy")
                feats.append(np.load(path, mmap_mode="r")[view_index])
        out = np.concatenate(feats, axis=0) if len(feats) > 1 else feats[0]
        if len(self._cache) < 3000:
            self._cache[key] = out
        return out


def conv_feature_bank(
    store: "ConvolutionalFeatureStore", graph_bank: GraphBank,
    dtype=np.float32,
):
    """Pack a conv store into a panorama bank (total_nodes, 36, C) by
    spatially mean-pooling each view's res5c map (C, H, W) -> (C,).

    The reference's panorama env refuses convolutional features outright
    (tasks/R2R/env.py:306-312 NotImplementedError); pooling the conv map
    recovers exactly the mean-pooled pipeline's content (pool5 IS the
    global average of res5c), so the TPU env can train from conv stores
    without a separate TSV precompute pass.
    """
    n = graph_bank.total_nodes
    sample = None
    for scan_id in graph_bank.scan_ids:
        g = graph_bank.graphs[scan_id]
        for local_ix, vp in enumerate(g.node_ids):
            if not g.included[local_ix]:
                continue
            sample = store.get_features(scan_id, vp, 0)
            break
        if sample is not None:
            break
    if sample is None:
        raise ValueError("graph bank has no included viewpoints")
    c = sample.shape[0]
    bank = np.zeros((n, NUM_VIEWS, c), dtype)
    for scan_id in graph_bank.scan_ids:
        g = graph_bank.graphs[scan_id]
        for local_ix, vp in enumerate(g.node_ids):
            if not g.included[local_ix]:
                continue
            gi = graph_bank.global_index(scan_id, vp)
            for v in range(NUM_VIEWS):
                fm = store.get_features(scan_id, vp, v)
                bank[gi, v] = fm.reshape(fm.shape[0], -1).mean(axis=1)
    return bank


def bottom_up_features(*args, **kwargs):
    """Bottom-up (Faster-RCNN detection) features.

    The full featurizer lives in :mod:`.bottom_up` (BottomUpFeaturizer);
    this constructor exists for feature-registry symmetry.  Like the
    reference (tasks/R2R/env.py:299-305), the *panorama environment* does
    not consume it — the featurizer serves the BottomUpImageAttention
    model path and the precompute/caching tooling.
    """
    from .bottom_up import BottomUpFeaturizer

    return BottomUpFeaturizer(*args, **kwargs)


def write_tsv_feature_bank(path, graph_bank: GraphBank, bank: np.ndarray):
    """Emit the reference TSV schema from a packed bank (for the feature
    precompute pipeline; scripts/precompute_img_features.py:160-168)."""
    with open(path, "wt") as f:
        writer = csv.DictWriter(
            f,
            delimiter="\t",
            fieldnames=["scanId", "viewpointId", "image_w", "image_h", "vfov", "features"],
        )
        for sid in graph_bank.scan_ids:
            g = graph_bank.graphs[sid]
            for local, vid in enumerate(g.node_ids):
                if not g.included[local]:
                    continue
                row = bank[graph_bank.offsets[graph_bank.scan_row(sid)] + local]
                writer.writerow(
                    {
                        "scanId": sid,
                        "viewpointId": vid,
                        "image_w": IMAGE_W,
                        "image_h": IMAGE_H,
                        "vfov": VFOV,
                        "features": base64.b64encode(
                            np.ascontiguousarray(row, dtype=np.float32).tobytes()
                        ).decode("utf-8"),
                    }
                )
