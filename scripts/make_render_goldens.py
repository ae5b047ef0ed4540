"""Generate the rendering-regression goldens (tests/data/render_goldens.npz).

Analog of the reference's RGB-image regression fixture (the WebGL golden
renders in webgl_imgs/ driven by src/test/rendertest_spec.json and checked
at per-pixel L2 < 0.15 in src/test/main.cpp:302-338).  The Matterport
skybox JPGs are not distributable, so each viewpoint gets a deterministic
procedural skybox (per-face gradients + a checker pattern, seeded by the
viewpoint id); camera poses are the REAL connectivity poses, and the
20 (scan, viewpoint, heading, elevation) cases are the reference spec's.

Run once to (re)generate after an intentional renderer change:

    python scripts/make_render_goldens.py
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from speaker_follower_tpu.env import render

SPEC_PATH = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                         "rendertest_spec.json")
GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                           "render_goldens.npz")
WIDTH, HEIGHT = 80, 60  # 640x480 aspect, small enough to check in
FACE_SIZE = 64
VFOV = np.radians(60)


def synthetic_skybox(scan_id, viewpoint_id, size=FACE_SIZE):
    """Deterministic (6, size, size, 3) uint8 skybox for a viewpoint:
    per-face color gradients + an 8x8 checker, seeded from the ids."""
    digest = hashlib.sha256(f"{scan_id}_{viewpoint_id}".encode()).digest()
    rng = np.random.RandomState(np.frombuffer(digest[:4], np.uint32))
    faces = np.zeros((6, size, size, 3), np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    checker = ((yy * 8).astype(int) + (xx * 8).astype(int)) % 2
    for f in range(6):
        base = rng.rand(3)
        gx, gy = rng.rand(3), rng.rand(3)
        img = base + xx[..., None] * gx + yy[..., None] * gy
        img = img / img.max() * 0.7 + 0.3 * checker[..., None] * rng.rand(3)
        faces[f] = np.clip(img, 0, 1)
    return (faces * 255).astype(np.uint8)


def main():
    with open(SPEC_PATH) as f:
        spec = json.load(f)
    goldens = {}
    for case in spec:
        rot = render.load_pose_rotations(
            "/root/reference/connectivity", case["scanId"]
        )[case["viewpointId"]]
        faces = synthetic_skybox(case["scanId"], case["viewpointId"])
        img = render.render_view(
            faces, rot, case["heading"], case["elevation"],
            width=WIDTH, height=HEIGHT, vfov=VFOV,
        )
        key = "%s_%s_%s_%s" % (
            case["scanId"], case["viewpointId"], case["heading"],
            case["elevation"],
        )
        goldens[key] = np.asarray(img)
    np.savez_compressed(GOLDEN_PATH, **goldens)
    print(f"wrote {len(goldens)} goldens -> {GOLDEN_PATH}")


if __name__ == "__main__":
    main()
