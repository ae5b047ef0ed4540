"""ctypes bindings for the native data-plane library (native/sfnav.cpp).

Auto-builds libsfnav.so on first use when a compiler is available;
callers fall back to the pure-python paths if unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libsfnav.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    lib = ctypes.CDLL(_SO_PATH)
    lib.sfnav_read_feature_tsv.restype = ctypes.c_int64
    lib.sfnav_read_feature_tsv.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
    ]
    lib.sfnav_all_pairs_shortest.restype = None
    lib.sfnav_all_pairs_shortest.argtypes = [
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.sfnav_base64_decode.restype = ctypes.c_int64
    lib.sfnav_base64_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


ID_CAP = 96
NUM_VIEWS = 36
MEAN_POOLED_DIM = 2048


def read_feature_tsv(path: str, max_rows: int = 12000):
    """Yields (scan_id, viewpoint_id, (36, 2048) float32) per TSV row."""
    lib = _load()
    feat_len = NUM_VIEWS * MEAN_POOLED_DIM
    ids = np.zeros((max_rows, ID_CAP), dtype=np.uint8)
    feats = np.zeros((max_rows, feat_len), dtype=np.float32)
    n = lib.sfnav_read_feature_tsv(
        path.encode(),
        max_rows,
        feat_len,
        ids.ctypes.data_as(ctypes.c_char_p),
        ID_CAP,
        feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if n < 0:
        raise IOError(f"sfnav_read_feature_tsv failed with code {n} on {path}")
    for r in range(n):
        long_id = bytes(ids[r]).split(b"\0", 1)[0].decode()
        scan_id, viewpoint_id = long_id.split("_", 1)
        yield scan_id, viewpoint_id, feats[r].reshape(NUM_VIEWS, MEAN_POOLED_DIM)


def all_pairs_shortest(edges: np.ndarray, weights: np.ndarray):
    """(dist, next_hop) via native per-source Dijkstra."""
    lib = _load()
    n = edges.shape[0]
    edges_u8 = np.ascontiguousarray(edges, dtype=np.uint8)
    w = np.ascontiguousarray(weights, dtype=np.float32)
    dist = np.zeros((n, n), dtype=np.float32)
    next_hop = np.zeros((n, n), dtype=np.int32)
    lib.sfnav_all_pairs_shortest(
        n,
        edges_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        next_hop.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return dist, next_hop


def base64_decode(data: bytes, out_len: int) -> np.ndarray:
    lib = _load()
    out = np.zeros(out_len, dtype=np.uint8)
    n = lib.sfnav_base64_decode(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_len
    )
    if n != out_len:
        raise ValueError(f"base64 decode produced {n} bytes, expected {out_len}")
    return out
