"""Feature-precompute pipeline tests: ResNet structure, preprocessing, and
end-to-end TSV emit that the feature store loads back identically."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speaker_follower_tpu.pipeline.resnet import (
    BGR_MEAN,
    preprocess_bgr,
    resnet_apply,
    resnet_init,
)
from speaker_follower_tpu.pipeline.precompute import (
    load_viewpoint_ids,
    precompute_mean_pooled_tsv,
    split_tsv,
)

TINY_STAGES = (1, 1, 1, 1)


def test_preprocess_bgr():
    img = np.zeros((2, 8, 8, 3), np.uint8)
    img[..., 0] = 200  # B
    x = np.asarray(preprocess_bgr(img))
    assert x.shape == (2, 3, 8, 8)
    assert abs(x[0, 0, 0, 0] - (200 - BGR_MEAN[0])) < 1e-5
    assert abs(x[0, 1, 0, 0] - (0 - BGR_MEAN[1])) < 1e-5


def test_resnet_shapes():
    params = resnet_init(jax.random.PRNGKey(0), stages=TINY_STAGES, width=8)
    x = jnp.zeros((2, 3, 64, 96))
    pool5 = resnet_apply(params, x, stages=TINY_STAGES)
    assert pool5.shape == (2, 8 * 8 * 4)  # width * 2^3 * 4
    res5c = resnet_apply(params, x, stages=TINY_STAGES, output="res5c")
    assert res5c.shape == (2, 8 * 8 * 4, 64 // 32, 96 // 32)


def test_resnet152_downsampling_ratio():
    """The full-size geometry: 480x640 -> 15x20 res5c (the reference's
    CONV_D1/CONV_D2, precompute_img_features.py:33-34) — checked with the
    tiny-width variant for speed (spatial dims don't depend on width)."""
    params = resnet_init(jax.random.PRNGKey(0), stages=TINY_STAGES, width=4)
    x = jnp.zeros((1, 3, 480, 640))
    res5c = resnet_apply(params, x, stages=TINY_STAGES, output="res5c")
    assert res5c.shape[-2:] == (15, 20)


def test_load_viewpoint_ids():
    ids = load_viewpoint_ids("/root/reference/connectivity")
    assert len(ids) == 10567  # included viewpoints across the 90 scans
    assert all(isinstance(s, str) and isinstance(v, str) for s, v in ids[:5])


def test_tsv_pipeline_roundtrip(tmp_path):
    """Emit a TSV with the tiny net padded to 2048-d and load it back
    through the feature store: values must round-trip exactly."""
    from speaker_follower_tpu.data.features import load_tsv_feature_bank
    from speaker_follower_tpu.data.graph import load_graph_bank

    bank = load_graph_bank(["17DRP5sb8fy"], "/root/reference/connectivity")
    g = bank.graphs["17DRP5sb8fy"]
    vids = [
        ("17DRP5sb8fy", g.node_ids[i])
        for i in np.nonzero(g.included)[0][:3]
    ]

    params = resnet_init(jax.random.PRNGKey(0), stages=TINY_STAGES, width=8)
    rng = np.random.RandomState(0)
    images = {
        vp: rng.randint(0, 255, size=(36, 64, 96, 3), dtype=np.uint8)
        for _, vp in vids
    }

    feats_by_vp = {}

    def provider(scan, vp):
        return images[vp]

    # tiny net emits 256-d; wrap apply to pad to the store's 2048
    import speaker_follower_tpu.pipeline.precompute as pc

    orig_apply = pc.resnet_apply

    def padded_apply(params, x, stages=None, output="pool5"):
        out = orig_apply(params, x, stages=stages, output=output)
        pad = 2048 - out.shape[-1]
        return jnp.pad(out, ((0, 0), (0, pad)))

    pc.resnet_apply = padded_apply
    try:
        out_path = str(tmp_path / "tiny.tsv")
        precompute_mean_pooled_tsv(
            params, provider, vids, out_path, stages=TINY_STAGES, batch_size=12
        )
    finally:
        pc.resnet_apply = orig_apply

    loaded = load_tsv_feature_bank(out_path, bank)
    for scan, vp in vids:
        gix = bank.global_index(scan, vp)
        x = preprocess_bgr(images[vp])
        want = np.zeros((36, 2048), np.float32)
        want[:, :256] = np.asarray(
            resnet_apply(params, x, stages=TINY_STAGES)
        )
        np.testing.assert_array_equal(loaded[gix], want)

    # split round trip
    shards = [str(tmp_path / f"shard{i}.tsv") for i in range(2)]
    split_tsv(out_path, shards, 2)
    n_lines = sum(1 for _ in open(out_path))
    assert sum(1 for s in shards for _ in open(s)) == n_lines


def test_tsv_missing_viewpoints_warn_and_strict(tmp_path):
    """A truncated store must never be silent: non-strict loading warns
    with a count, strict loading raises (VERDICT r1 weak #8)."""
    import pytest

    from speaker_follower_tpu.data.features import (
        load_tsv_feature_bank,
        write_tsv_feature_bank,
    )
    from speaker_follower_tpu.data.graph import load_graph_bank

    bank = load_graph_bank(["17DRP5sb8fy"], "/root/reference/connectivity")
    full = np.arange(bank.total_nodes * 36 * 2048, dtype=np.float32).reshape(
        bank.total_nodes, 36, 2048
    ) % 7.0
    path = str(tmp_path / "full.tsv")
    write_tsv_feature_bank(path, bank, full)

    # complete store: no warning either way
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        loaded = load_tsv_feature_bank(path, bank, strict=True)
    included = bank.graphs["17DRP5sb8fy"].included
    np.testing.assert_array_equal(loaded[included], full[included])

    # drop the last line -> one included viewpoint missing
    lines = open(path).readlines()
    trunc = str(tmp_path / "trunc.tsv")
    with open(trunc, "w") as f:
        f.writelines(lines[:-1])
    with pytest.warns(UserWarning, match=r"1/\d+ included viewpoints missing"):
        load_tsv_feature_bank(trunc, bank)
    with pytest.raises(ValueError, match="missing"):
        load_tsv_feature_bank(trunc, bank, strict=True)
