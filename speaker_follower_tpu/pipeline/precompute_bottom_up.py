"""Bottom-up (Faster-RCNN) detection precompute pipeline.

Replaces scripts/precompute_bottom_up.py: for every included viewpoint,
take all 36 discretized views, run a detector, select the best boxes
(per-class NMS + confidence floor, bounded to [min_boxes, max_boxes]),
caption each kept box from the Visual Genome vocabs, and emit one pickle
per viewpoint — ``{out_dir}/{scan}/{viewpoint}.p`` holding a list of 36
dicts with keys image_id/image_h/image_w/num_boxes/boxes/features/
cls_prob/captions (precompute_bottom_up.py:146-155) — the exact store
format BottomUpFeaturizer consumes.

The reference's detector is a Caffe Faster-RCNN ResNet-101 driven on GPU
over rendered simulator frames (precompute_bottom_up.py:24-77); neither
Caffe, the detection weights, nor the Matterport images exist here, so
the detector is a ``detector_fn(image) -> dict`` hook (and images come
from an ``image_provider``), while the full selection/caption/emit logic
— the part with real algorithmic content — is implemented and tested.
Batches of views should be pushed through the detector together: 36
views per viewpoint is a natural XLA batch.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from ..data.bottom_up import read_visual_genome_vocab

VIEWPOINT_SIZE = 36
WIDTH, HEIGHT, VFOV = 640, 480, 60
MIN_BOXES = 10
MAX_BOXES = 100
CONF_THRESH = 0.2
ATTR_THRESH = 0.1
NMS_THRESH = 0.3
BGR_PIXEL_MEAN = np.array([103.1, 115.9, 123.2], np.float32)


def transform_img(im):
    """BGR mean-subtract + NCHW blob (precompute_bottom_up.py:174-181)."""
    blob = np.asarray(im, np.float32) - BGR_PIXEL_MEAN
    return blob[None].transpose(0, 3, 1, 2)


def nms(boxes, scores, thresh=NMS_THRESH):
    """Greedy non-maximum suppression; returns kept indices, best first.

    Standard Fast-RCNN semantics (the reference calls the py-faster-rcnn
    ``nms`` kernel): process boxes in descending score order, drop any box
    whose IoU with an already-kept box exceeds ``thresh``.
    """
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    scores = np.asarray(scores, np.float64)
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(scores)[::-1]
    keep = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][iou <= thresh]
    return np.asarray(keep, np.int64)


def select_detections(
    cls_boxes,
    cls_prob,
    min_boxes=MIN_BOXES,
    max_boxes=MAX_BOXES,
    conf_thresh=CONF_THRESH,
    nms_thresh=NMS_THRESH,
):
    """Pick which region proposals to keep (precompute_bottom_up.py:95-106).

    cls_boxes: (R, 4) proposal boxes; cls_prob: (R, C) class probabilities
    with column 0 = background.  For each foreground class, run NMS over
    all proposals scored by that class and record each surviving
    proposal's best class score; keep proposals whose best surviving score
    clears ``conf_thresh``, clamped to [min_boxes, max_boxes] by score
    rank.  Returns kept proposal indices.
    """
    cls_boxes = np.asarray(cls_boxes, np.float32)
    cls_prob = np.asarray(cls_prob, np.float32)
    n = cls_boxes.shape[0]
    max_conf = np.zeros(n, np.float32)
    for cls_ind in range(1, cls_prob.shape[1]):
        cls_scores = cls_prob[:, cls_ind]
        keep = nms(cls_boxes, cls_scores, nms_thresh)
        max_conf[keep] = np.maximum(max_conf[keep], cls_scores[keep])
    keep_boxes = np.where(max_conf >= conf_thresh)[0]
    if len(keep_boxes) < min_boxes:
        keep_boxes = np.argsort(max_conf)[::-1][:min_boxes]
    elif len(keep_boxes) > max_boxes:
        keep_boxes = np.argsort(max_conf)[::-1][:max_boxes]
    return keep_boxes


def caption_detections(boxes, cls_prob, attr_prob, classes, attributes,
                       attr_thresh=ATTR_THRESH):
    """Render "attribute object" captions for kept boxes
    (precompute_bottom_up.py:108-134): object = argmax foreground class;
    prepend the argmax attribute when its confidence clears attr_thresh.
    Zero box corners are nudged to 1 (reference backward-compat quirk)."""
    boxes = np.array(boxes, np.float32, copy=True)
    objects = np.argmax(cls_prob[:, 1:], axis=1)
    attr = np.argmax(attr_prob[:, 1:], axis=1)
    attr_conf = np.max(attr_prob[:, 1:], axis=1)
    captions = []
    for i in range(len(boxes)):
        boxes[i, 0] = max(boxes[i, 0], 1)
        boxes[i, 1] = max(boxes[i, 1], 1)
        cls = classes[objects[i] + 1]
        if attr_conf[i] > attr_thresh:
            cls = attributes[attr[i] + 1] + " " + cls
        captions.append(cls)
    return boxes, captions


def detections_from_view(raw, classes, attributes, image_id,
                         min_boxes=MIN_BOXES, max_boxes=MAX_BOXES,
                         conf_thresh=CONF_THRESH):
    """One view's raw detector output -> the per-view store dict.

    raw: dict with 'boxes' (R, 4), 'cls_prob' (R, C), 'attr_prob' (R, A),
    'features' (R, 2048) — what the reference reads off the Caffe blobs
    (precompute_bottom_up.py:82-94).
    """
    keep = select_detections(
        raw["boxes"], raw["cls_prob"], min_boxes, max_boxes, conf_thresh
    )
    boxes, captions = caption_detections(
        raw["boxes"][keep],
        raw["cls_prob"][keep],
        raw["attr_prob"][keep],
        classes,
        attributes,
    )
    return {
        "image_id": image_id,
        "image_h": HEIGHT,
        "image_w": WIDTH,
        "num_boxes": len(keep),
        "boxes": boxes,
        "features": np.asarray(raw["features"], np.float32)[keep],
        "cls_prob": np.max(np.asarray(raw["cls_prob"], np.float32)[keep][:, 1:], axis=1),
        "captions": captions,
    }


def load_vocab_names(object_vocab_path, attribute_vocab_path):
    """Class/attribute display names: first synonym of each vocab line,
    with background sentinels at index 0 (precompute_bottom_up.py:39-49)."""
    objs, _ = read_visual_genome_vocab(object_vocab_path, ("__background__",))
    attrs, _ = read_visual_genome_vocab(attribute_vocab_path, ("__no_attribute__",))

    def names(index_to_items):
        out = []
        for entry in index_to_items:
            first = entry[0] if entry and isinstance(entry[0], tuple) else entry
            out.append(" ".join(first))
        return out

    return names(objs), names(attrs)


def precompute_bottom_up(
    detector_fn,
    image_provider,
    viewpoint_ids,
    out_dir,
    object_vocab_path,
    attribute_vocab_path,
    min_boxes=MIN_BOXES,
    max_boxes=MAX_BOXES,
    conf_thresh=CONF_THRESH,
    skip_existing=True,
    progress=None,
):
    """Emit the per-viewpoint detection store (precompute_bottom_up.py:183-255).

    detector_fn(images (36, H, W, 3) uint8 BGR) -> list of 36 raw dicts
    (see detections_from_view); image_provider(scan, viewpoint) -> that
    stack of 36 view images.  Views are detected as one batch per
    viewpoint — on TPU the detector is jitted once and reused.
    """
    classes, attributes = load_vocab_names(object_vocab_path, attribute_vocab_path)
    count, dropped = 0, []
    for scan_id, viewpoint_id in viewpoint_ids:
        scan_path = os.path.join(out_dir, scan_id)
        os.makedirs(scan_path, exist_ok=True)
        out_path = os.path.join(scan_path, f"{viewpoint_id}.p")
        if skip_existing and os.path.exists(out_path):
            continue
        try:
            images = image_provider(scan_id, viewpoint_id)
        except Exception:
            dropped.append((scan_id, viewpoint_id))
            continue
        assert len(images) == VIEWPOINT_SIZE
        raws = detector_fn(images)
        outputs = [
            detections_from_view(
                raw, classes, attributes, ix, min_boxes, max_boxes, conf_thresh
            )
            for ix, raw in enumerate(raws)
        ]
        with open(out_path, "wb") as f:
            pickle.dump(outputs, f)
        count += 1
        if progress is not None and count % 100 == 0:
            progress(count, len(viewpoint_ids))
    if dropped:
        import warnings

        warnings.warn(f"dropped {len(dropped)} viewpoints (image load failed)")
    return count, dropped
