"""Bottom-up feature subsystem: vocab parsing, spatial features, the
featurizer's top-k/padding semantics (vs tasks/R2R/env.py:431-583), the
precompute pipeline's NMS/selection/caption logic (vs
scripts/precompute_bottom_up.py:82-134), and torch-parity of the
Feedforward/Multiplicative/BottomUp attention modules
(vs tasks/R2R/model.py:180-297)."""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speaker_follower_tpu.data import bottom_up as bu
from speaker_follower_tpu.pipeline import precompute_bottom_up as pbu

torch = pytest.importorskip("torch")


def t2n(t):
    return t.detach().numpy()


# --------------------------------------------------------------- fixtures

OBJECT_VOCAB = "wall\nchair,seat\nelectrical outlet\noutlet\ndoor\n"
ATTRIBUTE_VOCAB = "white\nwooden,wood\nelectrical\n"


@pytest.fixture()
def vg_vocab_files(tmp_path):
    obj = tmp_path / "objects_vocab.txt"
    attr = tmp_path / "attributes_vocab.txt"
    obj.write_text(OBJECT_VOCAB)
    attr.write_text(ATTRIBUTE_VOCAB)
    return str(obj), str(attr)


def make_raw_view(rng, n_det=7, n_feat=2048, im_w=640, im_h=480):
    """A synthetic detector-output dict in the store pickle format."""
    order = np.sort(rng.rand(n_det).astype(np.float32))[::-1]
    x1 = rng.randint(1, im_w // 2, n_det)
    y1 = rng.randint(1, im_h // 2, n_det)
    boxes = np.stack(
        [x1, y1, x1 + rng.randint(1, im_w // 2, n_det), y1 + rng.randint(1, im_h // 2, n_det)],
        axis=1,
    ).astype(np.float32)
    captions = ["white wall", "wooden chair", "electrical outlet", "outlet",
                "door", "wall", "wood seat"][:n_det]
    return {
        "cls_prob": order,
        "features": rng.randn(n_det, n_feat).astype(np.float32),
        "boxes": boxes,
        "captions": captions,
    }


@pytest.fixture()
def raw_store(tmp_path, vg_vocab_files):
    """Per-viewpoint pickle store covering 2 viewpoints of one scan."""
    rng = np.random.RandomState(0)
    store = tmp_path / "store"
    scan = "17DRP5sb8fy"
    (store / scan).mkdir(parents=True)
    viewpoints = {}
    for vp in ["vpA", "vpB"]:
        views = [make_raw_view(rng) for _ in range(36)]
        with open(store / scan / f"{vp}.p", "wb") as f:
            pickle.dump(views, f)
        viewpoints[vp] = views
    return str(store), scan, viewpoints


# ------------------------------------------------------- vocab + spatial


class TestVocabAndSpatial:
    def test_visual_genome_vocab(self, vg_vocab_files):
        obj_path, attr_path = vg_vocab_files
        idx2obj, obj2idx = bu.read_visual_genome_vocab(obj_path, bu.PAD_ITEM)
        assert idx2obj[0] == bu.PAD_ITEM and obj2idx[bu.PAD_ITEM] == 0
        # synonyms share an index
        assert obj2idx[("chair",)] == obj2idx[("seat",)] == 2
        assert obj2idx[("electrical", "outlet")] == 3
        assert obj2idx[("outlet",)] == 4

        idx2attr, attr2idx = bu.read_visual_genome_vocab(
            attr_path, bu.PAD_ITEM, add_null=True
        )
        # null (empty attribute) occupies index 1 when add_null
        assert attr2idx[()] == 1
        assert attr2idx[("wooden",)] == attr2idx[("wood",)] == 3

    def test_parse_attribute_objects_prefers_long_object(self, vg_vocab_files):
        obj_path, attr_path = vg_vocab_files
        _, obj2idx = bu.read_visual_genome_vocab(obj_path, bu.PAD_ITEM)
        _, attr2idx = bu.read_visual_genome_vocab(attr_path, bu.PAD_ITEM, add_null=True)
        # "electrical outlet" parses as (no attribute, 2-word object), not
        # ("electrical", "outlet") — earliest split point wins
        a, o = bu.parse_attribute_objects(["electrical", "outlet"], attr2idx, obj2idx)
        assert (a, o) == (attr2idx[()], obj2idx[("electrical", "outlet")])
        a, o = bu.parse_attribute_objects(["white", "wall"], attr2idx, obj2idx)
        assert (a, o) == (attr2idx[("white",)], obj2idx[("wall",)])
        with pytest.raises(ValueError):
            bu.parse_attribute_objects(["xyzzy"], attr2idx, obj2idx)

    def test_spatial_feature_from_bbox(self):
        feats = bu.spatial_feature_from_bbox(
            np.array([[0, 0, 640, 480], [320, 240, 640, 480]]), 480, 640
        )
        np.testing.assert_allclose(feats[0], [-1, -1, 1, 1, 4], atol=1e-6)
        np.testing.assert_allclose(feats[1], [0, 0, 1, 1, 1], atol=1e-6)
        with pytest.raises(ValueError):
            bu.spatial_feature_from_bbox(np.array([[10, 10, 5, 20]]), 480, 640)

    def test_k_best_indices(self):
        arr = np.array([0.1, 0.9, 0.5, 0.7])
        np.testing.assert_array_equal(bu.k_best_indices(arr, 2, sort=True), [3, 1])
        assert set(bu.k_best_indices(arr, 10)) == {0, 1, 2, 3}


# ------------------------------------------------------------ featurizer


class TestBottomUpFeaturizer:
    def make(self, vg_vocab_files, store_dir, d=4, **kw):
        obj_path, attr_path = vg_vocab_files
        return bu.BottomUpFeaturizer(
            d, obj_path, attr_path, store_dir=store_dir, **kw
        )

    def test_topk_padding_and_captions(self, vg_vocab_files, raw_store):
        store, scan, raw = raw_store
        feat = self.make(vg_vocab_files, store, d=4)
        views = feat.viewpoint_features(scan, "vpA")
        assert len(views) == 36
        v = views[0]
        r = raw["vpA"][0]
        # top-4 by cls_prob, descending (cls_prob arrives sorted descending)
        np.testing.assert_allclose(v.cls_prob, r["cls_prob"][:4])
        np.testing.assert_allclose(v.image_features, r["features"][:4])
        assert not v.no_object_mask.any()
        # captions parsed into vocab indices
        assert v.attribute_indices[0] == feat.attribute_to_index[("white",)]
        assert v.object_indices[0] == feat.object_to_index[("wall",)]
        assert v.object_indices[2] == feat.object_to_index[("electrical", "outlet")]
        assert v.attribute_indices[2] == feat.attribute_to_index[()]

    def test_padding_when_fewer_detections(self, vg_vocab_files, raw_store):
        store, scan, raw = raw_store
        feat = self.make(vg_vocab_files, store, d=10)
        v = feat.viewpoint_features(scan, "vpB")[5]
        assert v.no_object_mask.tolist() == [False] * 7 + [True] * 3
        np.testing.assert_allclose(v.cls_prob[7:], 0)
        np.testing.assert_allclose(v.image_features[7:], 0)
        assert (v.object_indices[7:] == feat.object_pad_index).all()
        assert (v.attribute_indices[7:] == feat.attribute_pad_index).all()

    def test_cache_roundtrip(self, tmp_path, vg_vocab_files, raw_store):
        store, scan, _ = raw_store
        feat = self.make(vg_vocab_files, store, d=4)
        cache_path = tmp_path / "cache.pkl"
        missing = bu.build_cache(
            feat, [(scan, "vpA"), (scan, "vpB"), (scan, "nope")], str(cache_path)
        )
        assert missing == {(scan, "nope")}
        feat2 = self.make(
            vg_vocab_files, None, d=4, precomputed_cache_path=str(cache_path)
        )
        for vp in ["vpA", "vpB"]:
            a = feat.viewpoint_features(scan, vp)
            b = feat2.viewpoint_features(scan, vp)
            for va, vb in zip(a, b):
                for fa, fb in zip(va, vb):
                    np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))

    def test_cache_dir_layout(self, tmp_path, vg_vocab_files, raw_store):
        store, scan, _ = raw_store
        feat = self.make(vg_vocab_files, store, d=4)
        cache_dir = tmp_path / "cache_dir"
        (cache_dir / scan).mkdir(parents=True)
        data = {
            vp: [v._asdict() for v in feat.viewpoint_features(scan, vp)]
            for vp in ["vpA", "vpB"]
        }
        with open(cache_dir / scan / "d=4.pkl", "wb") as f:
            pickle.dump(data, f)
        feat3 = self.make(
            vg_vocab_files, None, d=4, precomputed_cache_dir=str(cache_dir)
        )
        v = feat3.viewpoint_features(scan, "vpA")[3]
        np.testing.assert_array_equal(
            v.cls_prob, feat.viewpoint_features(scan, "vpA")[3].cls_prob
        )

    def test_batch_features(self, vg_vocab_files, raw_store):
        store, scan, _ = raw_store
        feat = self.make(vg_vocab_files, store, d=4)
        batch = bu.BottomUpFeaturizer.batch_features(
            [feat.get_features(scan, "vpA", 0), feat.get_features(scan, "vpB", 1)]
        )
        assert batch.image_features.shape == (2, 4, 2048)
        assert batch.no_object_mask.shape == (2, 4)

    def test_packed_bank(self, vg_vocab_files, raw_store, graph_bank):
        store, scan, _ = raw_store
        # re-key the store under real node ids so global_index works
        real = graph_bank.graphs[scan].node_ids[:2]
        for vp, node in zip(["vpA", "vpB"], real):
            os.rename(
                os.path.join(store, scan, f"{vp}.p"),
                os.path.join(store, scan, f"{node}.p"),
            )
        feat = self.make(vg_vocab_files, store, d=4)
        bank = feat.build_packed_bank(
            graph_bank, [(scan, n) for n in real], dtype=np.float32
        )
        g = graph_bank.global_index(scan, real[0])
        direct = feat.viewpoint_features(scan, real[0])[7]
        np.testing.assert_allclose(bank.image_features[g, 7], direct.image_features)
        # untouched nodes stay all-pad
        g_other = graph_bank.global_index(scan, graph_bank.graphs[scan].node_ids[3])
        assert bank.no_object_mask[g_other].all()


# ----------------------------------------------------- precompute pipeline


class TestPrecomputePipeline:
    def test_nms_drops_overlaps(self):
        boxes = np.array(
            [[0, 0, 100, 100], [5, 5, 105, 105], [200, 200, 300, 300]], np.float32
        )
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        keep = pbu.nms(boxes, scores, thresh=0.3)
        assert keep.tolist() == [0, 2]
        # everything kept when disjoint
        assert pbu.nms(boxes[[0, 2]], scores[[0, 2]], 0.3).tolist() == [0, 1]

    def test_select_detections_bounds(self):
        rng = np.random.RandomState(1)
        n = 30
        x1 = rng.randint(0, 300, n)
        y1 = rng.randint(0, 200, n)
        boxes = np.stack([x1, y1, x1 + 50, y1 + 50], 1).astype(np.float32)
        cls_prob = rng.dirichlet(np.ones(6), n).astype(np.float32)
        # min_boxes floor applies with an impossible threshold
        keep = pbu.select_detections(boxes, cls_prob, min_boxes=5, conf_thresh=2.0)
        assert len(keep) == 5
        # max_boxes cap applies with a zero threshold
        keep = pbu.select_detections(
            boxes, cls_prob, min_boxes=1, max_boxes=8, conf_thresh=0.0
        )
        assert len(keep) == 8

    def test_caption_and_emit_roundtrip(self, tmp_path, vg_vocab_files):
        obj_path, attr_path = vg_vocab_files
        rng = np.random.RandomState(2)
        n = 12

        def detector_fn(images):
            out = []
            for _ in range(len(images)):
                x1 = rng.randint(1, 300, n)
                y1 = rng.randint(1, 200, n)
                raw = {
                    "boxes": np.stack([x1, y1, x1 + 60, y1 + 60], 1).astype(np.float32),
                    "cls_prob": rng.dirichlet(np.ones(6), n).astype(np.float32),
                    "attr_prob": rng.dirichlet(np.ones(4), n).astype(np.float32),
                    "features": rng.randn(n, 2048).astype(np.float32),
                }
                out.append(raw)
            return out

        def image_provider(scan, vp):
            if vp == "bad":
                raise IOError("no image")
            return np.zeros((36, 480, 640, 3), np.uint8)

        out_dir = tmp_path / "out"
        with pytest.warns(UserWarning, match="dropped 1"):
            count, dropped = pbu.precompute_bottom_up(
                detector_fn,
                image_provider,
                [("scanX", "vp1"), ("scanX", "bad")],
                str(out_dir),
                obj_path,
                attr_path,
                min_boxes=4,
                max_boxes=8,
            )
        assert count == 1 and dropped == [("scanX", "bad")]
        # store is consumable by the featurizer
        feat = bu.BottomUpFeaturizer(4, obj_path, attr_path, store_dir=str(out_dir))
        views = feat.viewpoint_features("scanX", "vp1")
        assert len(views) == 36
        assert not views[0].no_object_mask[:4].any()
        # emitted dict schema matches the reference store format
        with open(out_dir / "scanX" / "vp1.p", "rb") as f:
            stored = pickle.load(f)
        assert set(stored[0]) == {
            "image_id", "image_h", "image_w", "num_boxes", "boxes",
            "features", "cls_prob", "captions",
        }
        assert stored[0]["image_w"] == 640 and stored[0]["image_h"] == 480
        # cls_prob stored descending? not guaranteed by reference ordering;
        # but featurizer re-sorts via top-k — checked above.

    def test_caption_attr_threshold(self, vg_vocab_files):
        obj_path, attr_path = vg_vocab_files
        classes, attributes = pbu.load_vocab_names(obj_path, attr_path)
        assert classes[0] == "__background__" and classes[1] == "wall"
        assert attributes[0] == "__no_attribute__" and attributes[1] == "white"
        boxes = np.array([[0, 0, 10, 10], [0, 1, 10, 10]], np.float32)
        cls_prob = np.array([[0.1, 0.9, 0, 0, 0, 0], [0.1, 0, 0.9, 0, 0, 0]], np.float32)
        attr_prob = np.array([[0.5, 0.5, 0, 0], [0.95, 0.05, 0, 0]], np.float32)
        out_boxes, captions = pbu.caption_detections(
            boxes, cls_prob, attr_prob, classes, attributes
        )
        assert captions == ["white wall", "chair"]
        # zero corners nudged to 1
        assert out_boxes[0, 0] == 1 and out_boxes[0, 1] == 1 and out_boxes[1, 0] == 1


# ----------------------------------------------- attention modules (torch)


class TorchFeedforwardImageAttention(torch.nn.Module):
    """Oracle rebuilt with stock torch modules per model.py:180-204."""

    def __init__(self, context_size, hidden_size, image_feature_size=2048):
        super().__init__()
        self.fc1_feature = torch.nn.Conv2d(image_feature_size, hidden_size, 1, bias=False)
        self.fc1_context = torch.nn.Linear(context_size, hidden_size, bias=True)
        self.fc2 = torch.nn.Conv2d(hidden_size, 1, 1, bias=True)
        self.feature_size = image_feature_size

    def forward(self, feature, context):
        b = feature.shape[0]
        x = self.fc1_feature(feature) + self.fc1_context(context)[:, :, None, None]
        x = self.fc2(torch.relu(x))
        attention = torch.softmax(x.view(b, -1), 1).unsqueeze(-1)
        reshaped = feature.view(b, self.feature_size, -1)
        return torch.bmm(reshaped, attention).squeeze(-1), attention.squeeze(-1)


class TorchMultiplicativeImageAttention(torch.nn.Module):
    def __init__(self, context_size, hidden_size, image_feature_size=2048):
        super().__init__()
        self.hidden_size = hidden_size
        self.feature_size = image_feature_size
        self.fc1_feature = torch.nn.Conv2d(image_feature_size, hidden_size, 1, bias=True)
        self.fc1_context = torch.nn.Linear(context_size, hidden_size, bias=True)
        self.fc2 = torch.nn.Conv2d(hidden_size, 1, 1, bias=True)

    def forward(self, feature, context):
        b = feature.shape[0]
        fh = self.fc1_feature(feature).view(b, self.hidden_size, -1)
        ch = self.fc1_context(context).unsqueeze(-2)
        x = torch.bmm(ch, fh)
        attention = torch.softmax(x.view(b, -1), 1).unsqueeze(-1)
        reshaped = feature.view(b, self.feature_size, -1)
        return torch.bmm(reshaped, attention).squeeze(-1), attention.squeeze(-1)


class TorchBottomUpImageAttention(torch.nn.Module):
    def __init__(self, context_size, obj_emb, attr_emb, hidden, n_obj, n_attr, feat=2048):
        super().__init__()
        self.object_embedding = torch.nn.Embedding(n_obj, obj_emb)
        self.attribute_embedding = torch.nn.Embedding(n_attr, attr_emb)
        self.fc1_context = torch.nn.Linear(context_size, hidden)
        self.fc1_feature = torch.nn.Linear(feat + obj_emb + attr_emb + 1 + 5, hidden)
        self.fc2 = torch.nn.Linear(hidden, 1)

    def forward(self, bu_batch, context):
        attr = self.attribute_embedding(bu_batch["attribute_indices"])
        obj = self.object_embedding(bu_batch["object_indices"])
        feats = torch.cat(
            (bu_batch["cls_prob"].unsqueeze(2), bu_batch["image_features"], attr, obj,
             bu_batch["spatial_features"]), dim=2)
        x = self.fc1_context(context).unsqueeze(1) * self.fc1_feature(feats)
        x = x / torch.norm(x, p=2, dim=2, keepdim=True)
        x = self.fc2(x).squeeze(-1)
        x = x.masked_fill(bu_batch["no_object_mask"], -float("inf"))
        attention = torch.softmax(x, 1).unsqueeze(1)
        return torch.bmm(attention, feats).squeeze(1), attention


def copy_linear(tm, bias=True):
    p = {"w": jnp.asarray(t2n(tm.weight).reshape(tm.weight.shape[0], -1))}
    if bias:
        p["b"] = jnp.asarray(t2n(tm.bias).reshape(-1))
    return p


class TestImageAttentionParity:
    def test_feedforward(self):
        from speaker_follower_tpu.models import attention as attn

        torch.manual_seed(3)
        b, c, h, w, dc, dh = 3, 16, 4, 5, 7, 11
        tm = TorchFeedforwardImageAttention(dc, dh, c)
        p = {
            "fc1_feature": copy_linear(tm.fc1_feature, bias=False),
            "fc1_context": copy_linear(tm.fc1_context),
            "fc2": copy_linear(tm.fc2),
        }
        feature = torch.randn(b, c, h, w)
        context = torch.randn(b, dc)
        t_out, t_attn = tm(feature, context)
        j_out, j_attn = attn.feedforward_image_attention(
            p, jnp.asarray(t2n(feature)), jnp.asarray(t2n(context))
        )
        np.testing.assert_allclose(np.asarray(j_out), t2n(t_out), atol=1e-5)
        np.testing.assert_allclose(np.asarray(j_attn), t2n(t_attn), atol=1e-5)

    def test_multiplicative(self):
        from speaker_follower_tpu.models import attention as attn

        torch.manual_seed(4)
        b, c, h, w, dc, dh = 2, 12, 3, 6, 5, 9
        tm = TorchMultiplicativeImageAttention(dc, dh, c)
        p = {
            "fc1_feature": copy_linear(tm.fc1_feature),
            "fc1_context": copy_linear(tm.fc1_context),
            "fc2": copy_linear(tm.fc2),
        }
        feature = torch.randn(b, c, h, w)
        context = torch.randn(b, dc)
        t_out, t_attn = tm(feature, context)
        j_out, j_attn = attn.multiplicative_image_attention(
            p, jnp.asarray(t2n(feature)), jnp.asarray(t2n(context))
        )
        np.testing.assert_allclose(np.asarray(j_out), t2n(t_out), atol=1e-5)
        np.testing.assert_allclose(np.asarray(j_attn), t2n(t_attn), atol=1e-5)

    def test_bottom_up(self):
        from speaker_follower_tpu.models import attention as attn

        torch.manual_seed(5)
        b, d, dc, dh, oe, ae, n_obj, n_attr, feat = 3, 6, 7, 10, 4, 3, 20, 15, 32
        tm = TorchBottomUpImageAttention(dc, oe, ae, dh, n_obj, n_attr, feat)
        p = {
            "object_embedding": jnp.asarray(t2n(tm.object_embedding.weight)),
            "attribute_embedding": jnp.asarray(t2n(tm.attribute_embedding.weight)),
            "fc1_context": copy_linear(tm.fc1_context),
            "fc1_feature": copy_linear(tm.fc1_feature),
            "fc2": copy_linear(tm.fc2),
        }
        rng = np.random.RandomState(6)
        mask = np.zeros((b, d), bool)
        mask[:, 4:] = True
        batch_np = {
            "cls_prob": rng.rand(b, d).astype(np.float32),
            "image_features": rng.randn(b, d, feat).astype(np.float32),
            "attribute_indices": rng.randint(0, n_attr, (b, d)),
            "object_indices": rng.randint(0, n_obj, (b, d)),
            "spatial_features": rng.randn(b, d, 5).astype(np.float32),
            "no_object_mask": mask,
        }
        context = torch.randn(b, dc)
        t_batch = {
            k: torch.as_tensor(v) for k, v in batch_np.items()
        }
        t_out, t_attn = tm(t_batch, context)
        j_bu = bu.BottomUpViewpoint(**{k: jnp.asarray(v) for k, v in batch_np.items()})
        j_out, j_attn = attn.bottom_up_image_attention(
            p, j_bu, jnp.asarray(t2n(context))
        )
        np.testing.assert_allclose(np.asarray(j_out), t2n(t_out), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(j_attn), t2n(t_attn.squeeze(1)), atol=1e-5
        )
        # masked rows get exactly zero attention
        assert np.asarray(j_attn)[mask].max() == 0.0


# ------------------------------------------------------------ CLI scripts


def test_cache_bottom_up_script(tmp_path, vg_vocab_files, monkeypatch):
    """scripts/cache_bottom_up.py sweeps a scan's included viewpoints and
    writes a loadable cache, reporting store-less viewpoints as missing
    (reference cache_bottom_up.py:10-24)."""
    import json
    import runpy
    import sys

    obj_vocab, attr_vocab = vg_vocab_files
    scan = "17DRP5sb8fy"
    with open(f"/root/reference/connectivity/{scan}_connectivity.json") as f:
        conn = json.load(f)
    included = [it["image_id"] for it in conn if it["included"]]

    rng = np.random.RandomState(1)
    store = tmp_path / "store"
    (store / scan).mkdir(parents=True)
    for vp in included[:2]:
        with open(store / scan / f"{vp}.p", "wb") as f:
            pickle.dump([make_raw_view(rng) for _ in range(36)], f)

    out = tmp_path / "cache.pkl"
    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "cache_bottom_up.py",
    )
    monkeypatch.setattr(sys, "argv", [
        script, "--detections", "4", "--store_dir", str(store),
        "--out", str(out), "--object_vocab", obj_vocab,
        "--attribute_vocab", attr_vocab, "--scans", scan,
    ])
    runpy.run_path(script, run_name="__main__")

    with open(out, "rb") as f:
        cache = pickle.load(f)
    assert set(cache.keys()) == {(scan, vp) for vp in included[:2]}
    feat = bu.BottomUpFeaturizer(
        4, object_vocab_path=obj_vocab, attribute_vocab_path=attr_vocab,
        precomputed_cache_path=str(out),
    )
    views = feat.viewpoint_features(scan, included[0])
    assert len(views) == 36 and views[0].image_features.shape == (4, 2048)


def test_attention_sandbox_script():
    """scripts/attention_sandbox.py runs all three mechanisms."""
    import runpy

    script = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "attention_sandbox.py",
    )
    mod = runpy.run_path(script)
    mod["main"]()
