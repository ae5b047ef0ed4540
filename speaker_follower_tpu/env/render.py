"""Cubemap rendering: skybox faces -> perspective RGB views, in pure JAX.

TPU-native replacement for the reference's OpenGL/OSMesa render path
(src/lib/MatterSim.cpp:441-468 renderScene, :12-19 cube geometry,
src/lib/vertex.sh / fragment.sh shaders, :40-64 setupCubeMap).  Rendering
a skybox through a pinhole camera is an inverse-warp: every output pixel
maps to one ray direction, the ray picks a cube face and texel, and a
bilinear gather produces the pixel — no rasterizer needed, so the whole
render is a single jitted gather program that batches over views (the
36-view sweep of the feature-precompute pipeline is one call).

Replicated conventions (so outputs match the reference pipeline):
  * camera: OpenGL looking down -z; View = RotX(-pi/2 - elevation)
    . RotZ(heading) (positive heading turns right); Model = per-location
    pose rotation (row-major Matterport pose, translation dropped,
    rotated pi about x — MatterSim.cpp:262-266); projection
    glm::perspective(vfov, W/H, ...); output row 0 = top (the reference
    glReadPixels bottom-up then cv::flip).
  * fragment shader samples the cubemap at (-x, y, z) of the
    interpolated cube-vertex coordinate (fragment.sh:8).
  * cube-map addressing per the OpenGL spec table, GL_LINEAR filtering,
    GL_CLAMP_TO_EDGE.
  * faces arrive in GL order [+x, -x, +y, -y, +z, -z] = Matterport
    skybox files [2, 4, 0, 5, 1, 3] (MatterSim.cpp:319-326); channel
    order is passed through untouched (the reference keeps cv2's BGR).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Matterport skybox file index per GL face [+x, -x, +y, -y, +z, -z]
# (MatterSim.cpp:319-326: xpos=skybox2, xneg=skybox4, ypos=skybox0,
# yneg=skybox5, zpos=skybox1, zneg=skybox3)
SKYBOX_FILE_ORDER = (2, 4, 0, 5, 1, 3)


def rotx(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)


def rotz(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def pose_rotation(pose16):
    """Matterport pose (row-major 4x4) -> the Model rotation the reference
    renders with: translation dropped, then rotated pi about x (Matterport
    camera looks down +z, OpenGL down -z; MatterSim.cpp:262-266)."""
    m = np.asarray(pose16, np.float64).reshape(4, 4)
    r = m[:3, :3]
    return r @ rotx(np.pi)


def camera_rays(width, height, vfov):
    """Per-pixel ray directions in camera space, row 0 = top of image."""
    tan_v = np.tan(vfov / 2.0)
    aspect = width / height
    x = (2.0 * (np.arange(width) + 0.5) / width - 1.0) * tan_v * aspect
    y = (1.0 - 2.0 * (np.arange(height) + 0.5) / height) * tan_v
    xx, yy = np.meshgrid(x, y)
    return np.stack([xx, yy, -np.ones_like(xx)], axis=-1)  # (H, W, 3)


def cube_lookup(s):
    """OpenGL cube-map addressing: direction (..., 3) -> (face, u, v) with
    u/v in [0, 1] (t increases down the uploaded image, per spec)."""
    sx, sy, sz = s[..., 0], s[..., 1], s[..., 2]
    ax, ay, az = jnp.abs(sx), jnp.abs(sy), jnp.abs(sz)
    # face ids: 0 +x, 1 -x, 2 +y, 3 -y, 4 +z, 5 -z
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = jnp.where(
        is_x,
        jnp.where(sx >= 0, 0, 1),
        jnp.where(is_y, jnp.where(sy >= 0, 2, 3), jnp.where(sz >= 0, 4, 5)),
    )
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    sc = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-sz, sz, sx, sx, sx, -sx],
    )
    tc = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-sy, -sy, sz, -sz, -sy, -sy],
    )
    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)
    return face, u, v


def _bilinear_cube_sample(faces, face, u, v):
    """faces: (6, S, S, C) -> bilinear GL_LINEAR sample with clamp-to-edge.
    face/u/v: (...,)."""
    size = faces.shape[1]
    fu = u * size - 0.5
    fv = v * size - 0.5
    x0 = jnp.floor(fu)
    y0 = jnp.floor(fv)
    wx = fu - x0
    wy = fv - y0
    x0 = jnp.clip(x0.astype(jnp.int32), 0, size - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, size - 1)
    x1 = jnp.clip(x0 + 1, 0, size - 1)
    y1 = jnp.clip(y0 + 1, 0, size - 1)
    f = faces.astype(jnp.float32)
    p00 = f[face, y0, x0]
    p01 = f[face, y0, x1]
    p10 = f[face, y1, x0]
    p11 = f[face, y1, x1]
    wx = wx[..., None]
    wy = wy[..., None]
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    return top * (1 - wy) + bot * wy


@partial(jax.jit, static_argnames=("width", "height", "vfov_tuple"))
def _render_batch(faces, rot, headings, elevations, width, height, vfov_tuple):
    vfov = vfov_tuple[0]
    rays = jnp.asarray(camera_rays(width, height, vfov), jnp.float32)  # (H, W, 3)
    c, s = jnp.cos(headings), jnp.sin(headings)
    ce, se = jnp.cos(-jnp.pi / 2 - elevations), jnp.sin(-jnp.pi / 2 - elevations)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    rz = jnp.stack(
        [c, -s, zeros, s, c, zeros, zeros, zeros, ones], -1
    ).reshape(-1, 3, 3)
    rx = jnp.stack(
        [ones, zeros, zeros, zeros, ce, -se, zeros, se, ce], -1
    ).reshape(-1, 3, 3)
    view = jnp.einsum("bij,bjk->bik", rx, rz)  # View = RotX . RotZ
    vm = jnp.einsum("bij,jk->bik", view, jnp.asarray(rot, jnp.float32))
    # d_model = (View*Model)^-1 d_cam; rotations: inverse = transpose
    d = jnp.einsum("bji,hwj->bhwi", vm, rays)  # (B, H, W, 3)
    # fragment.sh flip: sample at (-x, y, z)
    d = d * jnp.asarray([-1.0, 1.0, 1.0], jnp.float32)
    face, u, v = cube_lookup(d)
    out = _bilinear_cube_sample(faces, face, u, v)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def render_views(faces, rot, headings, elevations, *, width=640, height=480,
                 vfov=np.radians(60)):
    """Render a batch of perspective views of one viewpoint's skybox.

    faces: (6, S, S, C) uint8 in GL order (see load order above);
    rot: (3, 3) Model rotation (pose_rotation of the viewpoint pose, or
    identity for pre-aligned synthetic skyboxes);
    headings / elevations: (B,) radians.
    Returns (B, height, width, C) uint8, row 0 = top, channels passed
    through (BGR in, BGR out — the reference's cv::Mat convention).
    """
    headings = jnp.atleast_1d(jnp.asarray(headings, jnp.float32))
    elevations = jnp.atleast_1d(jnp.asarray(elevations, jnp.float32))
    return _render_batch(
        jnp.asarray(faces), np.asarray(rot, np.float32), headings, elevations,
        width, height, (float(vfov),),
    )


def render_view(faces, rot, heading, elevation, **kw):
    """Single-view convenience wrapper -> (H, W, C) uint8."""
    return render_views(faces, rot, [heading], [elevation], **kw)[0]


def pixel_cube_coords(rot, heading, elevation, *, width=640, height=480,
                      vfov=np.radians(60)):
    """(face, u, v) cube-map coordinates of every output pixel of
    ``render_view`` — the sampling map without the gather, so a rendered
    image can be inverse-projected (scattered) back onto the cubemap.
    Used by the WebGL-golden seam-continuity regression (the reference's
    goldens, src/test/main.cpp:302-338, are real renders; scattering one
    through this map must produce a cubemap that is continuous across
    face seams iff the addressing chain matches the GL spec).  Returns
    numpy arrays of shape (height, width)."""
    rays = camera_rays(width, height, vfov)  # (H, W, 3) float64
    view = rotx(-np.pi / 2 - elevation) @ rotz(heading)
    vm = view @ np.asarray(rot, np.float64)
    d = np.einsum("ji,hwj->hwi", vm, rays)
    d = d * np.array([-1.0, 1.0, 1.0])  # fragment.sh flip
    face, u, v = cube_lookup(jnp.asarray(d))
    return np.asarray(face), np.asarray(u), np.asarray(v)


def load_skybox(dataset_path, scan_id, viewpoint_id, imread=None):
    """Read the six Matterport skybox JPGs for a viewpoint into GL face
    order (MatterSim.cpp:318-327).  ``imread(path) -> (S, S, 3) BGR``
    defaults to cv2.imread when cv2 is available."""
    import os

    if imread is None:
        import cv2

        imread = cv2.imread
    folder = os.path.join(
        dataset_path, "v1/scans", scan_id, "matterport_skybox_images"
    )
    faces = []
    for k in SKYBOX_FILE_ORDER:
        path = os.path.join(folder, f"{viewpoint_id}_skybox{k}_sami.jpg")
        img = imread(path)
        if img is None:
            raise FileNotFoundError(path)
        faces.append(img)
    return np.stack(faces)


def render_pano_sweep(faces, rot, *, width=640, height=480, vfov=np.radians(60)):
    """All 36 discretized views (viewIndex order: 3 elevation rings of 12
    headings, -30/0/+30 degrees, 30-degree heading steps — the sweep the
    feature-precompute pipeline drives, scripts/precompute_img_features.py
    and env.py:149-224) in ONE batched render call."""
    view_ix = np.arange(36)
    headings = (view_ix % 12) * (np.pi / 6)
    elevations = (view_ix // 12 - 1) * (np.pi / 6)
    return render_views(
        faces, rot, headings, elevations, width=width, height=height, vfov=vfov
    )


def load_pose_rotations(connectivity_dir, scan_id):
    """Per-viewpoint Model rotations from the connectivity poses
    (MatterSim.cpp:252-266): viewpoint_id -> (3, 3) float64."""
    import json
    import os

    path = os.path.join(connectivity_dir, f"{scan_id}_connectivity.json")
    with open(path) as f:
        data = json.load(f)
    return {item["image_id"]: pose_rotation(item["pose"]) for item in data}
