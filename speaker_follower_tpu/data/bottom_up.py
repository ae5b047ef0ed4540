"""Bottom-up (Faster-RCNN detection) image features.

TPU-native rebuild of the reference BottomUpImageFeatures
(tasks/R2R/env.py:431-583) plus its helpers
(utils.py:164-174 k_best_indices, utils.py:209-231
spatial_feature_from_bbox).  The reference consults a python dict of
per-(scan, viewpoint) pickles on the host and assembles per-instance
namedtuples of torch tensors; here every viewpoint is parsed once into
fixed-shape numpy arrays (detections padded to ``number_of_detections``)
and, optionally, packed into a single bank indexed by (global node, view)
so batched observation assembly is a device gather inside ``jit``.

Store formats accepted (identical to the reference):
  * per-viewpoint pickles ``{store_dir}/{scan}/{viewpoint}.p`` holding a
    list of 36 dicts with keys ``cls_prob / features / boxes / captions``
    (scripts/precompute_bottom_up.py:146-155 emit format),
  * a single cache pickle mapping ``(scan, viewpoint) -> [36 x dict]``
    (cache_bottom_up.py output; env.py:479-485 load path),
  * a cache directory ``{cache_dir}/{scan}/d={k}.pkl`` mapping
    ``viewpoint -> [36 x dict]`` (env.py:470-478 load path).

NOTE: like the reference, the panorama environment does not consume
bottom-up features (env.py:299-305 raises NotImplementedError); this
featurizer serves the non-pano model path (BottomUpImageAttention) and
the precompute/caching tooling.
"""

from __future__ import annotations

import os
import pickle
from typing import NamedTuple

import numpy as np

NUM_VIEWS = 36
MEAN_POOLED_DIM = 2048
PAD_ITEM = ("<pad>",)


class BottomUpViewpoint(NamedTuple):
    """Fixed-shape detection set for one (viewpoint, view) — all arrays
    padded/truncated to ``number_of_detections`` rows (env.py:229)."""

    cls_prob: np.ndarray  # (d,) float32, descending
    image_features: np.ndarray  # (d, 2048) float32
    attribute_indices: np.ndarray  # (d,) int32 into the VG attribute vocab
    object_indices: np.ndarray  # (d,) int32 into the VG object vocab
    spatial_features: np.ndarray  # (d, 5) float32 normalized bbox + area
    no_object_mask: np.ndarray  # (d,) bool, True = padding row


def spatial_feature_from_bbox(bboxes, im_h, im_w):
    """5-d spatial features [x1, y1, x2, y2, S] normalized to [-1, 1]
    (reference utils.py:209-231; S = normalized box area)."""
    bboxes = np.asarray(bboxes, dtype=np.float64).reshape((-1, 4))
    if not (
        np.all(bboxes[:, 0:2] >= 0)
        and np.all(bboxes[:, 0] <= bboxes[:, 2])
        and np.all(bboxes[:, 1] <= bboxes[:, 3])
        and np.all(bboxes[:, 2] <= im_w)
        and np.all(bboxes[:, 3] <= im_h)
    ):
        raise ValueError("bboxes out of range for image size")
    feats = np.zeros((bboxes.shape[0], 5), dtype=np.float32)
    feats[:, 0] = bboxes[:, 0] * 2.0 / im_w - 1
    feats[:, 1] = bboxes[:, 1] * 2.0 / im_h - 1
    feats[:, 2] = bboxes[:, 2] * 2.0 / im_w - 1
    feats[:, 3] = bboxes[:, 3] * 2.0 / im_h - 1
    feats[:, 4] = (feats[:, 2] - feats[:, 0]) * (feats[:, 3] - feats[:, 1])
    return feats


def k_best_indices(arr, k, sort: bool = False):
    """Indices of the k largest entries, ascending by value when ``sort``
    (reference utils.py:164-174)."""
    arr = np.asarray(arr)
    if k >= len(arr):
        return np.argsort(arr) if sort else np.arange(len(arr))
    ind = np.argpartition(arr, -k)[-k:]
    if sort:
        ind = ind[np.argsort(arr[ind])]
    return ind


def read_visual_genome_vocab(fname, pad_name=PAD_ITEM, add_null=False):
    """Parse a Visual Genome objects/attributes vocab file.

    Each line holds comma-separated synonyms; every synonym (as a tuple of
    whitespace tokens) maps to the same index.  Index 0 is the pad item
    and, when ``add_null``, index 1 is the empty tuple (no attribute).
    Returns (index_to_items, item_to_index) — one-to-many / many-to-one
    (reference env.py:486-510).
    """
    index_to_items = []
    item_to_index = {}
    start_ix = 0
    items_to_add = [pad_name]
    if add_null:
        items_to_add.append(())
    for item in items_to_add:
        index_to_items.append(item)
        item_to_index[item] = start_ix
        start_ix += 1
    with open(fname) as f:
        for index, line in enumerate(f):
            this_items = []
            for synonym in line.split(","):
                item = tuple(synonym.split())
                this_items.append(item)
                item_to_index[item] = index + start_ix
            index_to_items.append(this_items)
    assert len(index_to_items) == max(item_to_index.values()) + 1
    return index_to_items, item_to_index


def parse_attribute_objects(tokens, attribute_to_index, object_to_index):
    """Split a detection caption into (attribute, object) vocab indices.

    Tries every split point; a blank attribute is allowed, a blank object
    is not; the earliest split (longest object span) wins — e.g.
    "electrical outlet" parses as the two-word object before
    "electrical" + "outlet" (reference env.py:528-539).
    """
    tokens = list(tokens)
    for split_point in range(len(tokens)):
        attr = tuple(tokens[:split_point])
        obj = tuple(tokens[split_point:])
        if attr in attribute_to_index and obj in object_to_index:
            return attribute_to_index[attr], object_to_index[obj]
    raise ValueError(f"no attribute/object parse for {tokens!r}")


class BottomUpFeaturizer:
    """Loads detection stores into fixed-shape BottomUpViewpoint arrays.

    Parity with reference BottomUpImageFeatures (env.py:431-583): same
    top-k-by-cls_prob selection, descending order, zero padding with a
    ``no_object_mask``, caption -> (attribute, object) vocab parse, and
    5-d spatial features.
    """

    feature_dim = MEAN_POOLED_DIM

    def __init__(
        self,
        number_of_detections,
        object_vocab_path,
        attribute_vocab_path,
        store_dir=None,
        precomputed_cache_path=None,
        precomputed_cache_dir=None,
        image_width=640,
        image_height=480,
    ):
        self.number_of_detections = number_of_detections
        self.index_to_attributes, self.attribute_to_index = read_visual_genome_vocab(
            attribute_vocab_path, PAD_ITEM, add_null=True
        )
        self.index_to_objects, self.object_to_index = read_visual_genome_vocab(
            object_vocab_path, PAD_ITEM, add_null=False
        )
        self.num_attributes = len(self.index_to_attributes)
        self.num_objects = len(self.index_to_objects)
        self.attribute_pad_index = self.attribute_to_index[PAD_ITEM]
        self.object_pad_index = self.object_to_index[PAD_ITEM]
        self.image_width = image_width
        self.image_height = image_height
        self.store_dir = store_dir

        self._cache = {}
        self.precomputed = {}
        if precomputed_cache_dir:
            import glob

            for scene_dir in sorted(glob.glob(os.path.join(precomputed_cache_dir, "*"))):
                scene_id = os.path.basename(scene_dir)
                pkl = os.path.join(scene_dir, f"d={number_of_detections}.pkl")
                with open(pkl, "rb") as f:
                    for viewpoint_id, views in pickle.load(f).items():
                        self._add_precomputed((scene_id, viewpoint_id), views)
        elif precomputed_cache_path:
            with open(precomputed_cache_path, "rb") as f:
                for key, views in pickle.load(f).items():
                    self._add_precomputed(tuple(key), views)

    def _add_precomputed(self, key, views):
        """Validate + truncate an already-top-k'd cache entry
        (env.py:450-466: cls_prob must arrive descending; 'boxes' entries
        are converted to spatial features for backward compatibility)."""
        assert len(views) == NUM_VIEWS, f"{key}: expected {NUM_VIEWS} views"
        d = self.number_of_detections
        out = []
        for view in views:
            params = {}
            for k, v in view.items():
                v = np.asarray(v)
                if k == "cls_prob":
                    assert np.all(v[:-1] >= v[1:]), "cls_prob must be descending"
                if k == "boxes":
                    k = "spatial_features"
                    v = spatial_feature_from_bbox(v, self.image_height, self.image_width)
                assert len(v) >= d, f"{key}: fewer than {d} detections cached"
                params[k] = v[:d]
            out.append(BottomUpViewpoint(**params))
        self.precomputed[key] = out

    def _parse_raw_views(self, raw_views):
        """Raw detector-output dicts -> 36 fixed-shape BottomUpViewpoint
        (env.py:541-576: top-k by cls_prob, descending, zero-padded)."""
        d = self.number_of_detections
        out = []
        for view in raw_views:
            top = k_best_indices(np.asarray(view["cls_prob"]), d, sort=True)[::-1]
            n = len(top)
            no_object = np.full(d, True)
            no_object[:n] = False
            cls_prob = np.zeros(d, np.float32)
            cls_prob[:n] = np.asarray(view["cls_prob"])[top]
            assert cls_prob[0] == cls_prob.max()
            image_features = np.zeros((d, MEAN_POOLED_DIM), np.float32)
            image_features[:n] = np.asarray(view["features"])[top]
            spatial = np.zeros((d, 5), np.float32)
            spatial[:n] = spatial_feature_from_bbox(
                np.asarray(view["boxes"])[top], self.image_height, self.image_width
            )
            object_indices = np.full(d, self.object_pad_index, np.int32)
            attribute_indices = np.full(d, self.attribute_pad_index, np.int32)
            for i, ix in enumerate(top):
                a, o = parse_attribute_objects(
                    view["captions"][ix].split(),
                    self.attribute_to_index,
                    self.object_to_index,
                )
                attribute_indices[i] = a
                object_indices[i] = o
            out.append(
                BottomUpViewpoint(
                    cls_prob, image_features, attribute_indices, object_indices,
                    spatial, no_object,
                )
            )
        return out

    def viewpoint_features(self, scan_id, viewpoint_id):
        """All 36 views' detection sets for one viewpoint."""
        key = (scan_id, viewpoint_id)
        if key in self.precomputed:
            return self.precomputed[key]
        if key in self._cache:
            return self._cache[key]
        fname = os.path.join(self.store_dir, scan_id, f"{viewpoint_id}.p")
        with open(fname, "rb") as f:
            raw = pickle.load(f, encoding="latin1")
        views = self._parse_raw_views(raw)
        if len(self._cache) < 20000:
            self._cache[key] = views
        return views

    def get_features(self, scan_id, viewpoint_id, view_index):
        return self.viewpoint_features(scan_id, viewpoint_id)[view_index]

    @staticmethod
    def batch_features(feature_list):
        """Stack per-instance detection sets into device-ready batch arrays
        (env.py:512-525)."""
        import jax.numpy as jnp

        return BottomUpViewpoint(
            *(
                jnp.asarray(np.stack([getattr(f, name) for f in feature_list]))
                for name in BottomUpViewpoint._fields
            )
        )

    def build_packed_bank(self, graph_bank, scan_viewpoints=None, dtype=np.float32):
        """Pack every included viewpoint's 36 views into one bank of
        arrays shaped (total_nodes, 36, d, ...), so batched lookup is a
        device gather (the TPU-side layout; the reference has no
        equivalent — it re-batches per step on the host).

        WARNING: at full scale (10,567 viewpoints x 36 views x d
        detections x 2048 features) the image_features slab alone is tens
        of GB; pass bf16 ``dtype`` and/or restrict ``scan_viewpoints``.
        Missing viewpoints keep all-pad rows.
        """
        d = self.number_of_detections
        n = graph_bank.total_nodes
        bank = BottomUpViewpoint(
            cls_prob=np.zeros((n, NUM_VIEWS, d), np.float32),
            image_features=np.zeros((n, NUM_VIEWS, d, MEAN_POOLED_DIM), dtype),
            attribute_indices=np.full(
                (n, NUM_VIEWS, d), self.attribute_pad_index, np.int32
            ),
            object_indices=np.full((n, NUM_VIEWS, d), self.object_pad_index, np.int32),
            spatial_features=np.zeros((n, NUM_VIEWS, d, 5), np.float32),
            no_object_mask=np.full((n, NUM_VIEWS, d), True),
        )
        if scan_viewpoints is None:
            scan_viewpoints = sorted(self.precomputed) + sorted(
                k for k in self._cache if k not in self.precomputed
            )
        for scan_id, viewpoint_id in scan_viewpoints:
            g = graph_bank.global_index(scan_id, viewpoint_id)
            views = self.viewpoint_features(scan_id, viewpoint_id)
            for v, vp in enumerate(views):
                bank.cls_prob[g, v] = vp.cls_prob
                bank.image_features[g, v] = vp.image_features.astype(dtype)
                bank.attribute_indices[g, v] = vp.attribute_indices
                bank.object_indices[g, v] = vp.object_indices
                bank.spatial_features[g, v] = vp.spatial_features
                bank.no_object_mask[g, v] = vp.no_object_mask
        return bank


def mean_pooled_from_bottom_up(bank: BottomUpViewpoint, dtype=np.float32):
    """Reduce a packed detection bank to a panorama feature bank
    (total_nodes, 36, 2048): cls_prob-weighted mean of each view's
    detection features (padded detections carry cls_prob 0, so they drop
    out; views with no detections stay zero).

    The reference's panorama env raises NotImplementedError for
    bottom_up features (tasks/R2R/env.py:299-305); this reduction makes
    detection stores usable as drop-in pano features on TPU.
    """
    w = np.where(bank.no_object_mask, 0.0, bank.cls_prob)  # (n, 36, d)
    denom = np.maximum(w.sum(axis=-1, keepdims=True), 1e-8)
    pooled = np.einsum(
        "nvd,nvdf->nvf", (w / denom).astype(np.float32),
        bank.image_features.astype(np.float32),
    )
    return pooled.astype(dtype)


def build_cache(featurizer, keys, out_path):
    """Aggregate per-viewpoint stores into one cache pickle mapping
    (scan, viewpoint) -> [36 x dict] (reference cache_bottom_up.py:1-24).
    Returns the set of keys that failed to load."""
    by_key = {}
    missing = set()
    for scan_id, viewpoint_id in keys:
        try:
            views = featurizer.viewpoint_features(scan_id, viewpoint_id)
            by_key[(scan_id, viewpoint_id)] = [v._asdict() for v in views]
        except Exception:
            missing.add((scan_id, viewpoint_id))
    with open(out_path, "wb") as f:
        pickle.dump(by_key, f)
    return missing
