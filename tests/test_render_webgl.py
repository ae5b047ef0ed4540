"""Camera-geometry parity against the REAL WebGL golden render cases.

The reference ships its 20 rendering-regression goldens in-repo
(src/test/rendertest_spec.json + webgl_imgs/, consumed by
src/test/main.cpp:302-338).  The skybox *textures* those tests resample
need the Matterport download, but the camera specs themselves encode a
strong geometric invariant we can verify without any pixels: each spec's
(heading, elevation) is the orientation of the viewpoint's -z skybox
face — the WebGL goldens were generated looking straight down the
center of Matterport skybox image 3 (the GL -z face under MatterSim's
loading order, MatterSim.cpp:319-326).

So under OUR full projection chain (connectivity pose -> rotx(pi) model
correction -> View = RotX(-pi/2 - elev) . RotZ(heading) -> fragment
(-x, y, z) flip -> GL cube addressing) every golden's center pixel must
land on the EXACT center of cube face 5 (-z), and the whole 640x480,
VFOV-60 frame must stay inside that one face.  Measured: max center
deviation across all 20 cases is < 1e-6 in (u, v).  The classic
convention bugs all break it:

  heading sign flipped   -> lands on faces {0, 1, 4, 5}, dev up to 0.48
  elevation sign flipped -> center v off by 2*tan(elev)/2 (up to 0.08)
  pose rotx(pi) dropped  -> lands on face 4 (+z) instead of 5
  fragment flip dropped  -> invariant under this test (center is on the
                            flip axis); pinned instead by the synthetic
                            forward-projection oracle in test_render.py.
"""

import json
import os

import numpy as np
import pytest

from speaker_follower_tpu.env import render as rd

REF = "/root/reference"
SPEC = os.path.join(REF, "src", "test", "rendertest_spec.json")

needs_ref = pytest.mark.skipif(
    not os.path.exists(SPEC), reason="reference rendertest spec not present"
)

W, H = 640, 480
VFOV = np.radians(60)


def cube_lookup_np(d):
    """Spec GL cube addressing, pure numpy (mirrors render.cube_lookup)."""
    sx, sy, sz = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = np.abs(sx), np.abs(sy), np.abs(sz)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = np.where(
        is_x,
        np.where(sx >= 0, 0, 1),
        np.where(is_y, np.where(sy >= 0, 2, 3), np.where(sz >= 0, 4, 5)),
    )
    ma = np.where(is_x, ax, np.where(is_y, ay, az))
    sc = np.select([face == k for k in range(6)], [-sz, sz, sx, sx, sx, -sx])
    tc = np.select([face == k for k in range(6)], [-sy, -sy, sz, -sz, -sy, -sy])
    return face, 0.5 * (sc / ma + 1.0), 0.5 * (tc / ma + 1.0)


def pixel_coords_np(rot, heading, elevation, heading_sign=1, elev_sign=1,
                    pose_rotx=True):
    """Per-pixel (face, u, v), numpy, with injectable convention bugs."""
    rays = rd.camera_rays(W, H, VFOV)
    view = rd.rotx(-np.pi / 2 - elev_sign * elevation) @ rd.rotz(
        heading_sign * heading
    )
    d = np.einsum("ji,hwj->hwi", view @ rot, rays)
    d = d * np.array([-1.0, 1.0, 1.0])
    return cube_lookup_np(d)


def load_spec():
    with open(SPEC) as f:
        spec = json.load(f)
    assert len(spec) == 20
    out = []
    for case in spec:
        rot = rd.load_pose_rotations(
            os.path.join(REF, "connectivity"), case["scanId"]
        )[case["viewpointId"]]
        raw = None
        with open(
            os.path.join(
                REF, "connectivity", f"{case['scanId']}_connectivity.json"
            )
        ) as f:
            for item in json.load(f):
                if item["image_id"] == case["viewpointId"]:
                    raw = np.asarray(item["pose"], np.float64).reshape(4, 4)[
                        :3, :3
                    ]
        out.append((case, rot, raw))
    return out


@needs_ref
class TestWebGLGoldenGeometry:
    def test_goldens_center_on_neg_z_face(self):
        """Our production pixel_cube_coords maps every golden case's
        frame onto cube face 5 (-z), centered to float precision."""
        for case, rot, _ in load_spec():
            face, u, v = rd.pixel_cube_coords(
                rot, case["heading"], case["elevation"],
                width=W, height=H, vfov=VFOV,
            )
            assert (face == 5).all(), case["scanId"]
            # whole frame inside the face with real margin
            assert u.min() > 0.05 and u.max() < 0.95, case["scanId"]
            assert v.min() > 0.05 and v.max() < 0.95, case["scanId"]
            # center pixel: 640x480 is even, so the face center falls
            # between the two middle pixels — check their midpoint
            uc = 0.5 * (u[H // 2 - 1 : H // 2 + 1, W // 2 - 1 : W // 2 + 1])
            vc = 0.5 * (v[H // 2 - 1 : H // 2 + 1, W // 2 - 1 : W // 2 + 1])
            du = abs(uc.sum() / 2.0 - 0.5)
            dv = abs(vc.sum() / 2.0 - 0.5)
            # one pixel subtends ~1/830 in u; the spec cameras sit dead
            # on the face axis, so the midpoint lands at 1e-6 level
            assert du < 1e-4 and dv < 1e-4, (case["scanId"], du, dv)

    def test_convention_bugs_break_the_invariant(self):
        """The same invariant rejects each classic pose-chain bug, so
        the golden specs genuinely pin our conventions."""
        specs = load_spec()

        # heading sign flip: frames scatter across faces
        hit_other_face = 0
        for case, rot, _ in specs:
            face, u, v = pixel_coords_np(
                rot, case["heading"], case["elevation"], heading_sign=-1
            )
            cdev = max(
                abs(u[H // 2, W // 2] - 0.5), abs(v[H // 2, W // 2] - 0.5)
            )
            if not (face == 5).all() or cdev > 1e-3:
                hit_other_face += 1
        assert hit_other_face >= 18  # heading ~0 or ~pi cases may survive

        # elevation sign flip: center v drifts by ~tan(elev)/tan(45)
        broken = 0
        for case, rot, _ in specs:
            if abs(case["elevation"]) < 0.005:
                continue  # near-zero elevation genuinely can't tell
            _, _, v = pixel_coords_np(
                rot, case["heading"], case["elevation"], elev_sign=-1
            )
            if abs(v[H // 2, W // 2] - 0.5) > 5e-3:
                broken += 1
        assert broken >= 10

        # dropping the Matterport rotx(pi) model correction: +z, not -z
        for case, _, raw in specs:
            face, _, _ = pixel_coords_np(
                raw, case["heading"], case["elevation"]
            )
            assert face[H // 2, W // 2] == 4, case["scanId"]
