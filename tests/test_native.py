"""Native (C++) data-plane tests: base64/TSV decode parity with the python
path, and all-pairs Dijkstra parity with scipy."""

import base64
import os
import shutil

import numpy as np
import pytest

from speaker_follower_tpu.data import native_io

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ compiler"
)


@pytest.fixture(scope="module")
def lib_ok():
    assert native_io.available(), "libsfnav.so failed to build"
    return True


def test_base64_decode(lib_ok):
    rng = np.random.RandomState(0)
    for n in [1, 7, 36 * 2048 * 4]:
        raw = rng.bytes(n)
        enc = base64.encodebytes(raw)  # includes newlines like the TSV store
        out = native_io.base64_decode(enc, n)
        assert bytes(out) == raw


def test_feature_tsv_roundtrip(lib_ok, tmp_path):
    from speaker_follower_tpu.data.features import (
        _read_feature_tsv_py,
        write_tsv_feature_bank,
    )
    from speaker_follower_tpu.data.graph import load_graph_bank

    bank = load_graph_bank(["17DRP5sb8fy"], "/root/reference/connectivity")
    rng = np.random.RandomState(1)
    feats = rng.randn(bank.total_nodes, 36, 2048).astype(np.float32)
    path = str(tmp_path / "feats.tsv")
    write_tsv_feature_bank(path, bank, feats)

    fieldnames = ["scanId", "viewpointId", "image_w", "image_h", "vfov", "features"]
    py_rows = {
        (s, v): f for s, v, f in _read_feature_tsv_py(path, fieldnames)
    }
    native_rows = {
        (s, v): f for s, v, f in native_io.read_feature_tsv(path)
    }
    assert py_rows.keys() == native_rows.keys()
    for k in py_rows:
        np.testing.assert_array_equal(py_rows[k], native_rows[k])


def test_all_pairs_shortest_matches_scipy(lib_ok):
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import dijkstra

    rng = np.random.RandomState(2)
    n = 60
    edges = np.zeros((n, n), bool)
    for _ in range(150):
        i, j = rng.randint(n, size=2)
        if i != j:
            edges[i, j] = edges[j, i] = True
    w = rng.uniform(0.5, 3.0, size=(n, n)).astype(np.float32)
    w = np.maximum(w, w.T)
    w = np.where(edges, w, 0.0)

    dist, next_hop = native_io.all_pairs_shortest(edges, w)
    ref = dijkstra(csr_matrix(w), directed=False)
    np.testing.assert_allclose(dist, ref, rtol=1e-5, atol=1e-5)

    # next-hop consistency: one hop reduces the distance by the edge weight
    for i in range(n):
        for j in range(n):
            nh = next_hop[i, j]
            if i == j or not np.isfinite(dist[i, j]):
                assert nh == -1
            else:
                assert edges[i, nh]
                assert abs(dist[i, j] - (w[i, nh] + dist[nh, j])) < 1e-4


def test_graph_bank_uses_native_and_matches(lib_ok):
    """The graph layer's dist/next_hop must be identical whether computed
    natively or via scipy (same scan, both code paths)."""
    import speaker_follower_tpu.data.graph as graph_mod

    g_native = graph_mod.load_scan_graph("17DRP5sb8fy", "/root/reference/connectivity")

    # force the scipy fallback by monkeypatching availability
    orig = native_io.available
    try:
        native_io.available = lambda: False
        g_scipy = graph_mod.load_scan_graph(
            "17DRP5sb8fy", "/root/reference/connectivity"
        )
    finally:
        native_io.available = orig

    np.testing.assert_allclose(g_native.dist, g_scipy.dist, rtol=1e-5, atol=1e-5)
    # next hops may differ on exact ties; verify both are consistent instead
    for g in (g_native, g_scipy):
        ok = g.next_hop >= 0
        assert (g.next_hop[ok] < g.num_nodes).all()
