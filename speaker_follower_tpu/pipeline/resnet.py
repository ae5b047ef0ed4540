"""ResNet-152 inference in JAX for the feature-precompute pipeline.

Replaces the Caffe network of the reference pipeline
(scripts/precompute_img_features.py:38-41 with
models/ResNet-152-deploy{,-convolve}.prototxt).  Two bottleneck styles are
supported, selected by ``style``:

  * ``"caffe"``  — v1 blocks: stride-2 on the FIRST 1x1 conv of a
    downsampling block, stem maxpool 3x3/2 pad 0 with ceil rounding
    (matches the deploy prototxts; use with Caffe-trained weights),
  * ``"torchvision"`` — v1.5 blocks: stride-2 on the 3x3 conv, stem
    maxpool 3x3/2 pad 1 floor rounding (matches torchvision resnets, so
    ``convert_torchvision_state_dict`` is EXACT under this style).

All convolutions use explicit symmetric padding (7x7 -> 3, 3x3 -> 1) —
XLA's "SAME" pads asymmetrically at stride 2 and would misalign every
downsampling layer by one pixel relative to both Caffe and torch.

Batch norm is folded into per-channel scale/shift for inference; outputs
are either the mean-pooled pool5 vector (2048) or the res5c feature map
(2048 x H/32 x W/32 — 15 x 20 at 480 x 640).

Input convention matches transform_img (precompute_img_features.py:70-77):
NCHW float32, BGR channel order, mean (103.1, 115.9, 123.2) subtracted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BGR_MEAN = (103.1, 115.9, 123.2)

RESNET152_STAGES = (3, 8, 36, 3)
RESNET50_STAGES = (3, 4, 6, 3)

STYLES = ("caffe", "torchvision")


def preprocess_bgr(images_uint8):
    """(B, H, W, 3) uint8 BGR -> (B, 3, H, W) float32, mean-subtracted."""
    x = jnp.asarray(images_uint8, jnp.float32)
    x = x - jnp.asarray(BGR_MEAN, jnp.float32)
    return jnp.transpose(x, (0, 3, 1, 2))


def _conv_init(key, out_c, in_c, kh, kw):
    fan_in = in_c * kh * kw
    std = np.sqrt(2.0 / fan_in)
    return jax.random.normal(key, (out_c, in_c, kh, kw), jnp.float32) * std


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "shift": jnp.zeros((c,))}


def conv(x, w, stride=1):
    """Conv with explicit symmetric padding (k-1)//2 per side — the
    Caffe/torch convention, alignment-exact at stride 2."""
    pad = (w.shape[2] - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def bn(x, p):
    return x * p["scale"][None, :, None, None] + p["shift"][None, :, None, None]


def bottleneck_init(key, in_c, mid_c, out_c, downsample):
    k = jax.random.split(key, 4)
    p = {
        "conv1": _conv_init(k[0], mid_c, in_c, 1, 1),
        "bn1": _bn_init(mid_c),
        "conv2": _conv_init(k[1], mid_c, mid_c, 3, 3),
        "bn2": _bn_init(mid_c),
        "conv3": _conv_init(k[2], out_c, mid_c, 1, 1),
        "bn3": _bn_init(out_c),
    }
    if downsample or in_c != out_c:
        p["proj"] = _conv_init(k[3], out_c, in_c, 1, 1)
        p["bn_proj"] = _bn_init(out_c)
    return p


def bottleneck(x, p, stride, style="caffe"):
    # caffe v1 strides the first 1x1; torchvision v1.5 strides the 3x3
    s1, s2 = (stride, 1) if style == "caffe" else (1, stride)
    y = jax.nn.relu(bn(conv(x, p["conv1"], stride=s1), p["bn1"]))
    y = jax.nn.relu(bn(conv(y, p["conv2"], stride=s2), p["bn2"]))
    y = bn(conv(y, p["conv3"]), p["bn3"])
    if "proj" in p:
        x = bn(conv(x, p["proj"], stride=stride), p["bn_proj"])
    return jax.nn.relu(x + y)


def _stem_maxpool(y, style):
    """3x3/2 max pool: pad 1 + floor (torchvision) or pad 0 + ceil
    (Caffe; emulated by padding high only when the window overhangs)."""
    if style == "torchvision":
        pads = ((1, 1), (1, 1))
    else:
        pads = tuple((0, (d - 3) % 2) for d in y.shape[2:])
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max,
        (1, 1, 3, 3), (1, 1, 2, 2),
        ((0, 0), (0, 0)) + pads,
    )


def resnet_init(key, stages=RESNET152_STAGES, width=64):
    keys = jax.random.split(key, sum(stages) + 1)
    params = {
        "conv1": _conv_init(keys[0], width, 3, 7, 7),
        "bn1": _bn_init(width),
        "blocks": [],
    }
    in_c = width
    ki = 1
    for s, n_blocks in enumerate(stages):
        mid = width * (2**s)
        out_c = mid * 4
        for b in range(n_blocks):
            downsample = b == 0
            params["blocks"].append(
                bottleneck_init(keys[ki], in_c, mid, out_c, downsample)
            )
            in_c = out_c
            ki += 1
    return params


@partial(jax.jit, static_argnames=("stages", "output", "style"))
def resnet_apply(params, x, stages=RESNET152_STAGES, output="pool5", style="caffe"):
    """x: (B, 3, H, W) preprocessed. output: 'pool5' (B, C) mean-pooled or
    'res5c' (B, C, H/32, W/32)."""
    assert style in STYLES, style
    y = jax.nn.relu(bn(conv(x, params["conv1"], stride=2), params["bn1"]))
    y = _stem_maxpool(y, style)
    bi = 0
    for s, n_blocks in enumerate(stages):
        for b in range(n_blocks):
            stride = 2 if (b == 0 and s > 0) else 1
            y = bottleneck(y, params["blocks"][bi], stride, style)
            bi += 1
    if output == "res5c":
        return y
    return y.mean(axis=(2, 3))  # global average pool -> pool5


def convert_torchvision_state_dict(sd, stages=RESNET152_STAGES):
    """Map a torchvision resnet state_dict onto our pytree, folding BN into
    scale/shift (inference).  EXACT when applied with style="torchvision"
    (stride on the 3x3, pad-1 floor stem pool); pinned against a stock
    torch.nn oracle in tests/test_pipeline.py."""

    def fold(prefix):
        gamma = np.asarray(sd[prefix + ".weight"])
        beta = np.asarray(sd[prefix + ".bias"])
        mean = np.asarray(sd[prefix + ".running_mean"])
        var = np.asarray(sd[prefix + ".running_var"])
        scale = gamma / np.sqrt(var + 1e-5)
        return {"scale": jnp.asarray(scale), "shift": jnp.asarray(beta - scale * mean)}

    params = {
        "conv1": jnp.asarray(np.asarray(sd["conv1.weight"])),
        "bn1": fold("bn1"),
        "blocks": [],
    }
    for s, n_blocks in enumerate(stages):
        for b in range(n_blocks):
            pre = f"layer{s + 1}.{b}"
            blk = {
                "conv1": jnp.asarray(np.asarray(sd[pre + ".conv1.weight"])),
                "bn1": fold(pre + ".bn1"),
                "conv2": jnp.asarray(np.asarray(sd[pre + ".conv2.weight"])),
                "bn2": fold(pre + ".bn2"),
                "conv3": jnp.asarray(np.asarray(sd[pre + ".conv3.weight"])),
                "bn3": fold(pre + ".bn3"),
            }
            if pre + ".downsample.0.weight" in sd:
                blk["proj"] = jnp.asarray(np.asarray(sd[pre + ".downsample.0.weight"]))
                blk["bn_proj"] = fold(pre + ".downsample.1")
            params["blocks"].append(blk)
    return params
