"""Checkpointing: full train state (params + optimizer + step + rng), an
improvement over the reference's weights-only snapshots
(follower.py:1025-1035 "Loads parameters (but not training state)"), plus a
weights-only import/export path for released-checkpoint parity.

Format: a DATA-ONLY npz archive — arrays stored as plain npz entries,
the pytree structure and non-array leaves (ints, strings, RNG tuples) as
a JSON manifest entry; loading uses ``allow_pickle=False`` end to end, so
untrusted checkpoints cannot execute code.  NamedTuple nodes (optax
states) are stored as plain tuples; callers that need the original
container types rebuild them with :func:`restructure_like` against a
freshly-initialized skeleton.

Legacy pickle checkpoints (round-1 format, e.g. the demo snapshots under
runs/snap/) are still read via a magic-byte sniff — pickle.load runs
arbitrary code, so ONLY open legacy files from trusted sources.
"""

from __future__ import annotations

import json
import os
import pickle

import jax
import numpy as np

_ARR = "__arr__"


def _encode(obj, arrays):
    """Recursively encode a pytree into (JSON-safe manifest, array list)."""
    if isinstance(obj, (jax.Array, np.ndarray, np.generic)):
        arrays.append(np.asarray(obj))
        return {_ARR: len(arrays) - 1}
    if isinstance(obj, dict):
        return {
            "__dict__": [[_encode(k, arrays), _encode(v, arrays)] for k, v in obj.items()]
        }
    if isinstance(obj, tuple):  # incl. NamedTuples -> plain tuples
        return {"__tuple__": [_encode(v, arrays) for v in obj]}
    if isinstance(obj, list):
        return {"__list__": [_encode(v, arrays) for v in obj]}
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return {"__leaf__": obj}
    raise TypeError(f"cannot checkpoint object of type {type(obj).__name__}")


def _decode(node, arrays):
    if _ARR in node:
        return arrays[node[_ARR]]
    if "__dict__" in node:
        return {
            _hashable(_decode(k, arrays)): _decode(v, arrays)
            for k, v in node["__dict__"]
        }
    if "__tuple__" in node:
        return tuple(_decode(v, arrays) for v in node["__tuple__"])
    if "__list__" in node:
        return [_decode(v, arrays) for v in node["__list__"]]
    return node["__leaf__"]


def _hashable(key):
    # dict keys decoded from arrays (rare) must be hashable
    if isinstance(key, np.ndarray):
        return key.item() if key.ndim == 0 else tuple(key.tolist())
    return key


def save_state(path: str, state) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = []
    manifest = _encode(state, arrays)
    # pass an open file object: np.savez appends '.npz' to bare string
    # paths, and checkpoints here are named by metric with no extension
    with open(path, "wb") as f:
        np.savez(
            f,
            manifest=np.frombuffer(json.dumps(manifest).encode(), np.uint8),
            **{f"a{i}": a for i, a in enumerate(arrays)},
        )


def load_state(path: str):
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic[:2] == b"PK":  # npz (zip) — the data-only format
        with np.load(path, allow_pickle=False) as z:
            manifest = json.loads(bytes(z["manifest"]).decode())
            return _decode(manifest, {int(k[1:]): z[k] for k in z if k != "manifest"})
    # legacy round-1 pickle: arbitrary code execution on load — trusted
    # sources only (see module docstring)
    with open(path, "rb") as f:
        return pickle.load(f)


def restructure_like(skeleton, tree):
    """Re-containerize ``tree`` (plain dicts/tuples from load_state) into
    ``skeleton``'s pytree structure (e.g. optax NamedTuple states): leaf
    order is identical because NamedTuples flatten like tuples."""
    leaves = jax.tree_util.tree_leaves(tree)
    treedef = jax.tree_util.tree_structure(skeleton)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_params(path: str, params) -> None:
    """Weights-only snapshot (the reference's save(), follower.py:1025-1029
    writes two files; we write one pytree — see export_reference_style for
    the two-file form)."""
    save_state(path, params)


def load_params(path: str):
    return load_state(path)


def export_reference_style(prefix: str, params) -> None:
    """Write ``{prefix}_enc`` / ``{prefix}_dec`` pytrees, mirroring the
    reference's two-file checkpoint layout."""
    save_state(prefix + "_enc", params["encoder"])
    save_state(prefix + "_dec", params["decoder"])


def import_reference_style(prefix: str):
    return {
        "encoder": load_state(prefix + "_enc"),
        "decoder": load_state(prefix + "_dec"),
    }


# ---------------------------------------------------------------------------
# Conversion from released PyTorch checkpoints (torch state_dicts saved by
# the reference's save()) into our param pytrees, for parity evaluation of
# the released models.  Requires torch to deserialize.
# ---------------------------------------------------------------------------

def _t(sd, name):
    return np.asarray(sd[name].cpu().numpy())


def convert_torch_follower(enc_path: str, dec_path: str):
    """Map the reference EncoderLSTM/AttnDecoderLSTM state_dicts
    (model.py:43-104, 355-397) onto our pytree layout."""
    import torch

    enc = torch.load(enc_path, map_location="cpu")
    dec = torch.load(dec_path, map_location="cpu")

    encoder = {
        "embedding": {"w": _t(enc, "embedding.weight")},
        "lstm_fwd": {
            "w_ih": _t(enc, "lstm.weight_ih_l0"),
            "w_hh": _t(enc, "lstm.weight_hh_l0"),
            "b_ih": _t(enc, "lstm.bias_ih_l0"),
            "b_hh": _t(enc, "lstm.bias_hh_l0"),
        },
        "encoder2decoder": {
            "w": _t(enc, "encoder2decoder.weight"),
            "b": _t(enc, "encoder2decoder.bias"),
        },
    }
    if "lstm.weight_ih_l0_reverse" in enc:
        encoder["lstm_bwd"] = {
            "w_ih": _t(enc, "lstm.weight_ih_l0_reverse"),
            "w_hh": _t(enc, "lstm.weight_hh_l0_reverse"),
            "b_ih": _t(enc, "lstm.bias_ih_l0_reverse"),
            "b_hh": _t(enc, "lstm.bias_hh_l0_reverse"),
        }

    decoder = {
        "lstm": {
            "w_ih": _t(dec, "lstm.weight_ih"),
            "w_hh": _t(dec, "lstm.weight_hh"),
            "b_ih": _t(dec, "lstm.bias_ih"),
            "b_hh": _t(dec, "lstm.bias_hh"),
        },
        "visual_attention": {
            "linear_in_h": {
                "w": _t(dec, "visual_attention_layer.linear_in_h.weight"),
                "b": _t(dec, "visual_attention_layer.linear_in_h.bias"),
            },
            "linear_in_v": {
                "w": _t(dec, "visual_attention_layer.linear_in_v.weight"),
                "b": _t(dec, "visual_attention_layer.linear_in_v.bias"),
            },
        },
        "text_attention": {
            "linear_in": {"w": _t(dec, "text_attention_layer.linear_in.weight")},
            "linear_out": {"w": _t(dec, "text_attention_layer.linear_out.weight")},
        },
        "decoder2action": {
            "linear_in_h": {
                "w": _t(dec, "decoder2action.linear_in_h.weight"),
                "b": _t(dec, "decoder2action.linear_in_h.bias"),
            },
            "linear_in_a": {
                "w": _t(dec, "decoder2action.linear_in_a.weight"),
                "b": _t(dec, "decoder2action.linear_in_a.bias"),
            },
            "linear_out": {
                "w": _t(dec, "decoder2action.linear_out.weight"),
                "b": _t(dec, "decoder2action.linear_out.bias"),
            },
        },
    }
    return {"encoder": encoder, "decoder": decoder}


def convert_torch_speaker(enc_path: str, dec_path: str, use_input_att_feed=False):
    """Map the reference SpeakerEncoderLSTM/SpeakerDecoderLSTM state_dicts
    (model.py:405-519) onto our pytree layout."""
    import torch

    enc = torch.load(enc_path, map_location="cpu")
    dec = torch.load(dec_path, map_location="cpu")

    encoder = {
        "visual_attention": {
            "linear_in_h": {
                "w": _t(enc, "visual_attention_layer.linear_in_h.weight"),
                "b": _t(enc, "visual_attention_layer.linear_in_h.bias"),
            },
            "linear_in_v": {
                "w": _t(enc, "visual_attention_layer.linear_in_v.weight"),
                "b": _t(enc, "visual_attention_layer.linear_in_v.bias"),
            },
        },
        "lstm": {
            "w_ih": _t(enc, "lstm.weight_ih"),
            "w_hh": _t(enc, "lstm.weight_hh"),
            "b_ih": _t(enc, "lstm.bias_ih"),
            "b_hh": _t(enc, "lstm.bias_hh"),
        },
        "encoder2decoder": {
            "w": _t(enc, "encoder2decoder.weight"),
            "b": _t(enc, "encoder2decoder.bias"),
        },
    }
    decoder = {
        "embedding": {"w": _t(dec, "embedding.weight")},
        "lstm": {
            "w_ih": _t(dec, "lstm.weight_ih"),
            "w_hh": _t(dec, "lstm.weight_hh"),
            "b_ih": _t(dec, "lstm.bias_ih"),
            "b_hh": _t(dec, "lstm.bias_hh"),
        },
        "decoder2action": {
            "w": _t(dec, "decoder2action.weight"),
            "b": _t(dec, "decoder2action.bias"),
        },
    }
    if use_input_att_feed:
        decoder["attention"] = {
            "linear_in": {"w": _t(dec, "attention_layer.linear_in.weight")}
        }
        decoder["output_l1"] = {
            "w": _t(dec, "output_l1.weight"),
            "b": _t(dec, "output_l1.bias"),
        }
    else:
        decoder["attention"] = {
            "linear_in": {"w": _t(dec, "attention_layer.linear_in.weight")},
            "linear_out": {"w": _t(dec, "attention_layer.linear_out.weight")},
        }
    return {"encoder": encoder, "decoder": decoder}

# ---------------------------------------------------------------------------
# Conversion TO released-PyTorch format (exact inverses of convert_torch_*):
# lets reference users consume models trained here with the reference's
# follower.load()/speaker.load() (follower.py:1030-1035, speaker.py:405-410),
# and lets scripts/parity_eval.py dry-run the release-checkpoint path by
# synthesizing torch checkpoints with the reference's key names/shapes.
# ---------------------------------------------------------------------------


def _tt(arr):
    import torch

    return torch.from_numpy(np.array(arr, dtype=np.float32))  # copy: torch warns on read-only views


def export_torch_follower(params, enc_path: str, dec_path: str) -> None:
    """Write torch state_dicts named exactly like the reference's
    EncoderLSTM/AttnDecoderLSTM (model.py:43-104, 355-397)."""
    import torch

    e, d = params["encoder"], params["decoder"]
    enc = {
        "embedding.weight": _tt(e["embedding"]["w"]),
        "lstm.weight_ih_l0": _tt(e["lstm_fwd"]["w_ih"]),
        "lstm.weight_hh_l0": _tt(e["lstm_fwd"]["w_hh"]),
        "lstm.bias_ih_l0": _tt(e["lstm_fwd"]["b_ih"]),
        "lstm.bias_hh_l0": _tt(e["lstm_fwd"]["b_hh"]),
        "encoder2decoder.weight": _tt(e["encoder2decoder"]["w"]),
        "encoder2decoder.bias": _tt(e["encoder2decoder"]["b"]),
    }
    if "lstm_bwd" in e:
        enc.update({
            "lstm.weight_ih_l0_reverse": _tt(e["lstm_bwd"]["w_ih"]),
            "lstm.weight_hh_l0_reverse": _tt(e["lstm_bwd"]["w_hh"]),
            "lstm.bias_ih_l0_reverse": _tt(e["lstm_bwd"]["b_ih"]),
            "lstm.bias_hh_l0_reverse": _tt(e["lstm_bwd"]["b_hh"]),
        })
    dec = {
        "lstm.weight_ih": _tt(d["lstm"]["w_ih"]),
        "lstm.weight_hh": _tt(d["lstm"]["w_hh"]),
        "lstm.bias_ih": _tt(d["lstm"]["b_ih"]),
        "lstm.bias_hh": _tt(d["lstm"]["b_hh"]),
        "visual_attention_layer.linear_in_h.weight": _tt(
            d["visual_attention"]["linear_in_h"]["w"]),
        "visual_attention_layer.linear_in_h.bias": _tt(
            d["visual_attention"]["linear_in_h"]["b"]),
        "visual_attention_layer.linear_in_v.weight": _tt(
            d["visual_attention"]["linear_in_v"]["w"]),
        "visual_attention_layer.linear_in_v.bias": _tt(
            d["visual_attention"]["linear_in_v"]["b"]),
        "text_attention_layer.linear_in.weight": _tt(
            d["text_attention"]["linear_in"]["w"]),
        "text_attention_layer.linear_out.weight": _tt(
            d["text_attention"]["linear_out"]["w"]),
        "decoder2action.linear_in_h.weight": _tt(
            d["decoder2action"]["linear_in_h"]["w"]),
        "decoder2action.linear_in_h.bias": _tt(
            d["decoder2action"]["linear_in_h"]["b"]),
        "decoder2action.linear_in_a.weight": _tt(
            d["decoder2action"]["linear_in_a"]["w"]),
        "decoder2action.linear_in_a.bias": _tt(
            d["decoder2action"]["linear_in_a"]["b"]),
        "decoder2action.linear_out.weight": _tt(
            d["decoder2action"]["linear_out"]["w"]),
        "decoder2action.linear_out.bias": _tt(
            d["decoder2action"]["linear_out"]["b"]),
    }
    torch.save(enc, enc_path)
    torch.save(dec, dec_path)


def export_torch_speaker(params, enc_path: str, dec_path: str,
                         use_input_att_feed: bool = False) -> None:
    """Write torch state_dicts named exactly like the reference's
    SpeakerEncoderLSTM/SpeakerDecoderLSTM (model.py:405-519)."""
    import torch

    e, d = params["encoder"], params["decoder"]
    enc = {
        "visual_attention_layer.linear_in_h.weight": _tt(
            e["visual_attention"]["linear_in_h"]["w"]),
        "visual_attention_layer.linear_in_h.bias": _tt(
            e["visual_attention"]["linear_in_h"]["b"]),
        "visual_attention_layer.linear_in_v.weight": _tt(
            e["visual_attention"]["linear_in_v"]["w"]),
        "visual_attention_layer.linear_in_v.bias": _tt(
            e["visual_attention"]["linear_in_v"]["b"]),
        "lstm.weight_ih": _tt(e["lstm"]["w_ih"]),
        "lstm.weight_hh": _tt(e["lstm"]["w_hh"]),
        "lstm.bias_ih": _tt(e["lstm"]["b_ih"]),
        "lstm.bias_hh": _tt(e["lstm"]["b_hh"]),
        "encoder2decoder.weight": _tt(e["encoder2decoder"]["w"]),
        "encoder2decoder.bias": _tt(e["encoder2decoder"]["b"]),
    }
    dec = {
        "embedding.weight": _tt(d["embedding"]["w"]),
        "lstm.weight_ih": _tt(d["lstm"]["w_ih"]),
        "lstm.weight_hh": _tt(d["lstm"]["w_hh"]),
        "lstm.bias_ih": _tt(d["lstm"]["b_ih"]),
        "lstm.bias_hh": _tt(d["lstm"]["b_hh"]),
        "decoder2action.weight": _tt(d["decoder2action"]["w"]),
        "decoder2action.bias": _tt(d["decoder2action"]["b"]),
    }
    if use_input_att_feed:
        dec["attention_layer.linear_in.weight"] = _tt(
            d["attention"]["linear_in"]["w"])
        dec["output_l1.weight"] = _tt(d["output_l1"]["w"])
        dec["output_l1.bias"] = _tt(d["output_l1"]["b"])
    else:
        dec["attention_layer.linear_in.weight"] = _tt(
            d["attention"]["linear_in"]["w"])
        dec["attention_layer.linear_out.weight"] = _tt(
            d["attention"]["linear_out"]["w"])
    torch.save(dec, dec_path)
    torch.save(enc, enc_path)
