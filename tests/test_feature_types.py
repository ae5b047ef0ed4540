"""End-to-end wiring of the convolutional / bottom-up feature types into
the panorama environment: synthetic detections -> packed features ->
pooled panorama bank -> a follower training step.

The reference exposes these feature types as flags
(tasks/R2R/env.py:318-325) but its pano env raises NotImplementedError on
both (env.py:299-312); here they are pooled into (total_nodes, 36, C)
banks the vectorized env consumes directly.
"""

import os
import pickle

import numpy as np
import pytest

import jax

from speaker_follower_tpu.data import bottom_up as bu
from speaker_follower_tpu.data.dataset import R2RDataset
from speaker_follower_tpu.data.features import (
    ConvolutionalFeatureStore,
    conv_feature_bank,
)
from speaker_follower_tpu.data.text import Tokenizer, read_vocab
from speaker_follower_tpu.env import vecenv
from speaker_follower_tpu.models.follower import init_follower
from speaker_follower_tpu.training.trainer import FollowerTrainer, TrainConfig

SCAN = "17DRP5sb8fy"

OBJECT_VOCAB = "wall\nchair,seat\ndoor\n"
ATTRIBUTE_VOCAB = "white\nwooden,wood\n"


def _make_raw_view(rng, n_det=6, n_feat=2048):
    order = np.sort(rng.rand(n_det).astype(np.float32))[::-1]
    x1 = rng.randint(1, 320, n_det)
    y1 = rng.randint(1, 240, n_det)
    boxes = np.stack(
        [x1, y1, x1 + rng.randint(1, 320, n_det),
         y1 + rng.randint(1, 240, n_det)], axis=1,
    ).astype(np.float32)
    captions = ["white wall", "wooden chair", "door", "wall", "chair",
                "wood door"][:n_det]
    return {
        "cls_prob": order,
        "features": rng.randn(n_det, n_feat).astype(np.float32),
        "boxes": boxes,
        "captions": captions,
    }


@pytest.mark.slow
def test_bottom_up_detections_to_training_step(tmp_path, graph_bank):
    """Synthetic detector outputs -> BottomUpFeaturizer -> packed bank ->
    cls_prob-weighted pooled pano bank -> env tables -> one finite
    follower train step."""
    obj = tmp_path / "objects_vocab.txt"
    attr = tmp_path / "attributes_vocab.txt"
    obj.write_text(OBJECT_VOCAB)
    attr.write_text(ATTRIBUTE_VOCAB)
    store = tmp_path / "store"
    (store / SCAN).mkdir(parents=True)

    g = graph_bank.graphs[SCAN]
    covered = [g.node_ids[i] for i in np.nonzero(g.included)[0][:3]]
    rng = np.random.RandomState(0)
    for vp in covered:
        views = [_make_raw_view(rng) for _ in range(36)]
        with open(store / SCAN / f"{vp}.p", "wb") as f:
            pickle.dump(views, f)

    feat = bu.BottomUpFeaturizer(4, str(obj), str(attr), store_dir=str(store))
    packed = feat.build_packed_bank(
        graph_bank, [(SCAN, vp) for vp in covered]
    )
    pooled = bu.mean_pooled_from_bottom_up(packed)
    assert pooled.shape == (graph_bank.total_nodes, 36, 2048)

    # pooled row == manual cls_prob-weighted mean of that view's detections
    gi = graph_bank.global_index(SCAN, covered[0])
    v = feat.viewpoint_features(SCAN, covered[0])[5]
    w = np.where(v.no_object_mask, 0.0, v.cls_prob)
    expect = (w / w.sum()) @ v.image_features
    # atol covers reduction-order jitter near zero (observed 3e-8)
    np.testing.assert_allclose(pooled[gi, 5], expect, rtol=1e-5, atol=1e-7)
    # uncovered nodes pool to zero (all-pad detections)
    other = g.node_ids[int(np.nonzero(g.included)[0][5])]
    assert (pooled[graph_bank.global_index(SCAN, other)] == 0).all()

    # one training step on the pooled bank
    vocab = read_vocab("/root/reference/tasks/R2R/data/sub_train_vocab.txt")
    ds = R2RDataset(["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab),
                    batch_size=4, seed=10)
    ds.data = [d for d in ds.data if d["scan"] == SCAN]
    assert ds.data, "sub_val_seen must contain the test scan"
    tables = vecenv.make_env_tables(graph_bank, pooled)
    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=2048 + 128,
        feature_size=2048 + 128,
    )
    cfg = TrainConfig(feedback="teacher", use_glove=False, no_save=True)
    tr = FollowerTrainer(params, tables, ds, graph_bank, cfg)
    losses = tr.train_interval(1)
    assert np.isfinite(losses).all()


def test_conv_store_to_pano_bank(tmp_path, graph_bank):
    """Synthetic per-view conv maps -> ConvolutionalFeatureStore ->
    spatially pooled pano bank matching the manual mean."""
    store_dir = tmp_path / "conv"
    g = graph_bank.graphs[SCAN]
    rng = np.random.RandomState(1)
    maps = {}
    c, h, w = 8, 3, 4
    for scan_id in graph_bank.scan_ids:
        gg = graph_bank.graphs[scan_id]
        (store_dir / scan_id).mkdir(parents=True)
        for i in np.nonzero(gg.included)[0]:
            vp = gg.node_ids[int(i)]
            for v in range(36):
                m = rng.randn(c, h, w).astype(np.float32)
                maps[(scan_id, vp, v)] = m
                np.save(store_dir / scan_id / f"{vp}_{v}.npy", m)

    store = ConvolutionalFeatureStore([str(store_dir)], split=True)
    bank = conv_feature_bank(store, graph_bank)
    assert bank.shape == (graph_bank.total_nodes, 36, c)
    vp0 = g.node_ids[int(np.nonzero(g.included)[0][0])]
    gi = graph_bank.global_index(SCAN, vp0)
    np.testing.assert_allclose(
        bank[gi, 7], maps[(SCAN, vp0, 7)].reshape(c, -1).mean(axis=1),
        rtol=1e-6,
    )


def test_cli_feature_type_flags():
    """Flag parity with reference ImageFeatures.add_args (env.py:318-325)
    and get_name strings (env.py:424-428, 582-583)."""
    import argparse

    from speaker_follower_tpu.cli.common import add_common_args, feature_name

    p = add_common_args(argparse.ArgumentParser())
    args = p.parse_args(
        ["--image_feature_type", "bottom_up_attention",
         "--bottom_up_detections", "10"]
    )
    assert feature_name(args) == "bottom_up_attention_d=10"
    args = p.parse_args(
        ["--image_feature_type", "convolutional_attention",
         "--image_feature_datasets", "imagenet", "places365",
         "--downscale_convolutional_features"]
    )
    assert feature_name(args) == (
        "imagenet+places365_convolutional_attention_downscale"
    )
    args = p.parse_args([])
    assert args.bottom_up_detections == 20
    assert args.bottom_up_detection_embedding_size == 20
