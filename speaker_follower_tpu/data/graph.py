"""Navigation-graph compilation: connectivity JSONs -> packed dense arrays.

This is the TPU-native replacement for both the C++ simulator's graph layer
(reference: src/lib/MatterSim.cpp:239-311) and the networkx layer
(reference: tasks/R2R/utils.py:26-51, tasks/R2R/env.py:712-721): each scan's
connectivity JSON is compiled once into dense adjacency / position /
all-pairs-shortest-path tensors, and the per-viewpoint panorama scan that the
reference performs with ~36 simulator actions per observation
(reference: tasks/R2R/env.py:149-224, ``_get_panorama_states``) is
precomputed offline into fixed-shape per-node action tables, so that at
runtime ``reset/observe/step`` are pure batched gathers under ``jit``.

Angle conventions (identical to the simulator):
  * heading is measured clockwise from the world +Y axis
    (src/lib/MatterSim.cpp:282-283: camera_horizon_dir =
    (cos(pi/2 - heading), sin(pi/2 - heading), 0)), so the absolute bearing
    of a neighbor at displacement (dx, dy) is ``atan2(dx, dy)``;
  * discretized views: 12 headings x 3 elevation rows of 30 degrees
    (include/MatterSim.hpp:195-196), viewIndex = heading_step + 12 * row,
    row 0 = down (-30deg), 1 = level, 2 = up (+30deg);
  * a neighbor's recorded ``rel_elevation`` in the panorama action space is
    its absolute elevation angle atan2(dz, |dxy|) (the elevation-relative
    terms cancel across the sweep, see tasks/R2R/env.py:187-201), and its
    ``rel_heading`` is canonical(bearing - current_heading);
  * the representative view (``absViewIndex``) of a neighbor is the one of
    the 36 views minimizing sqrt(rel_heading^2 + rel_elevation^2), which
    decouples into independently snapping heading and elevation
    (tasks/R2R/env.py:193-207 dedup rule).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field

import numpy as np

ANGLE_INC = math.pi / 6.0  # 30 degrees (include/MatterSim.hpp:195-196)
NUM_HEADINGS = 12
NUM_ELEVATIONS = 3
NUM_VIEWS = NUM_HEADINGS * NUM_ELEVATIONS  # 36

# max navigable degree over the 90 Matterport scans is 13; pad so the action
# table (stop + neighbors) is 16 wide, a TPU-friendly size
MAX_DEGREE = 15
NUM_ACTIONS = MAX_DEGREE + 1  # slot 0 = stop


def canonical_angle(x):
    """Map angle into (-pi, +pi] the same way the reference does.

    Reference tasks/R2R/env.py:108-110 uses ``x - 2pi * round(x / 2pi)``
    with python banker's rounding; reproduced here via np.round (which is
    also round-half-to-even).
    """
    return x - 2.0 * np.pi * np.round(x / (2.0 * np.pi))


def snap_heading(heading):
    """Snap a continuous heading (radians) to a discrete step in [0, 12).

    Reference src/lib/MatterSim.cpp:339-350: normalize into [0, 2pi), then
    lround to the nearest multiple of 30 degrees (half-up rounding).
    """
    h = np.mod(np.mod(heading, 2 * np.pi) + 2 * np.pi, 2 * np.pi)
    step = np.floor(h / ANGLE_INC + 0.5).astype(np.int32)  # lround for h>=0
    return np.mod(step, NUM_HEADINGS)


def snap_elevation_row(elevation):
    """Snap continuous elevation to a row index 0 (down) / 1 (level) / 2 (up).

    Reference src/lib/MatterSim.cpp:351-362.
    """
    e = np.asarray(elevation, dtype=np.float64)
    row = np.where(e < -ANGLE_INC / 2.0, 0, np.where(e > ANGLE_INC / 2.0, 2, 1))
    return row.astype(np.int32)


@dataclass
class ScanGraph:
    """One scan's compiled navigation graph (local node indices)."""

    scan_id: str
    node_ids: list  # viewpointId strings, in connectivity-file order
    included: np.ndarray  # (N,) bool
    positions: np.ndarray  # (N, 3) float64, pose translation (idx 3, 7, 11)
    edges: np.ndarray  # (N, N) bool: included & mutually unobstructed
    dist: np.ndarray  # (N, N) float32 geodesic distance, +inf if unreachable
    next_hop: np.ndarray  # (N, N) int32 first hop from i toward j, -1 none
    # panorama action table, per node (heading-independent parts):
    adj_next: np.ndarray  # (N, MAX_DEGREE) int32 neighbor local index, -1 pad
    adj_bearing: np.ndarray  # (N, MAX_DEGREE) float32 absolute bearing
    adj_elevation: np.ndarray  # (N, MAX_DEGREE) float32 absolute elevation
    adj_view: np.ndarray  # (N, MAX_DEGREE) int32 absViewIndex of the neighbor
    adj_count: np.ndarray  # (N,) int32 number of neighbors
    # per-heading sorted ordering: for current heading step h, the action
    # a in [1, count] refers to neighbor slot adj_perm[node, h, a-1]
    adj_perm: np.ndarray  # (N, 12, MAX_DEGREE) int32, -1 pad
    node_index: dict = field(default_factory=dict)  # viewpointId -> local ix

    @property
    def num_nodes(self) -> int:
        return len(self.node_ids)


def _parse_connectivity(path: str):
    with open(path) as f:
        data = json.load(f)
    n = len(data)
    node_ids = [item["image_id"] for item in data]
    included = np.array([bool(item["included"]) for item in data])
    positions = np.array(
        [[item["pose"][3], item["pose"][7], item["pose"][11]] for item in data],
        dtype=np.float64,
    )
    unobstructed = np.zeros((n, n), dtype=bool)
    for i, item in enumerate(data):
        unobstructed[i] = item["unobstructed"]
    return node_ids, included, positions, unobstructed


def _all_pairs_shortest_paths(edges: np.ndarray, positions: np.ndarray):
    """All-pairs geodesic distances + next-hop matrix.

    Replaces the reference's per-scan ``nx.all_pairs_dijkstra_path`` /
    ``..._path_length`` (tasks/R2R/env.py:712-721, tasks/R2R/eval.py:41-44).
    Prefers the native C++ Dijkstra (native/sfnav.cpp) which extracts next
    hops directly; falls back to scipy's C Dijkstra + a predecessor-matrix
    walk in increasing-distance order.
    """
    n = edges.shape[0]
    diff = positions[:, None, :] - positions[None, :, :]
    w = np.sqrt((diff**2).sum(-1))
    w = np.where(edges, w, 0.0)

    try:
        from . import native_io

        if native_io.available():
            return native_io.all_pairs_shortest(edges, w.astype(np.float32))
    except Exception:
        pass

    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import dijkstra
    # build the CSR from explicit edge indices: a dense masked matrix would
    # silently drop a genuine zero-length edge between coincident
    # viewpoints (non-edge and zero-weight would both read as 0)
    rows, cols = np.nonzero(edges)
    graph = csr_matrix((w[rows, cols], (rows, cols)), shape=(n, n))
    dist, pred = dijkstra(graph, directed=False, return_predecessors=True)

    next_hop = np.full((n, n), -1, dtype=np.int32)
    order = np.argsort(dist, axis=1)  # per-row increasing distance
    rows = np.arange(n)
    for col in range(n):
        j = order[:, col]
        p = pred[rows, j]
        reachable = p >= 0
        first_hop = p == rows  # predecessor is the source -> j is first hop
        nh = np.where(
            first_hop, j, next_hop[rows, np.where(reachable, p, 0)]
        )
        valid = reachable & (j != rows)
        next_hop[rows[valid], j[valid]] = nh[valid]
    return dist.astype(np.float32), next_hop


def _build_pano_tables(edges, positions, included):
    """Precompute the panorama action space for every node.

    For each node, each navigable neighbor gets: absolute bearing
    atan2(dx, dy), absolute elevation atan2(dz, |dxy|), and the
    absViewIndex of the closest view (independent heading/elevation snap;
    tasks/R2R/env.py:193-207).  Then for each of the 12 possible current
    headings, neighbors are ordered by |canonical(bearing - heading)|
    ascending (the reference's ``sorted(..., key=abs(rel_heading))``,
    tasks/R2R/env.py:221-222) with a stable tie-break on slot order.
    """
    n = edges.shape[0]
    adj_next = np.full((n, MAX_DEGREE), -1, dtype=np.int32)
    adj_bearing = np.zeros((n, MAX_DEGREE), dtype=np.float32)
    adj_elevation = np.zeros((n, MAX_DEGREE), dtype=np.float32)
    adj_view = np.zeros((n, MAX_DEGREE), dtype=np.int32)
    adj_count = np.zeros((n,), dtype=np.int32)
    adj_perm = np.full((n, NUM_HEADINGS, MAX_DEGREE), -1, dtype=np.int32)

    for i in range(n):
        if not included[i]:
            continue
        nbrs = np.nonzero(edges[i])[0]
        k = len(nbrs)
        if k > MAX_DEGREE:
            raise ValueError(
                f"node degree {k} exceeds MAX_DEGREE={MAX_DEGREE}"
            )
        adj_count[i] = k
        if k == 0:
            continue
        d = positions[nbrs] - positions[i]
        bearing = np.arctan2(d[:, 0], d[:, 1])
        elevation = np.arctan2(d[:, 2], np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2))
        # heading snap: argmin_k |canonical(bearing - 30 deg * k)|
        hsteps = np.arange(NUM_HEADINGS)
        rel_h = np.abs(canonical_angle(bearing[:, None] - hsteps[None, :] * ANGLE_INC))
        kstar = np.argmin(rel_h, axis=1)
        # elevation snap: argmin_row |elevation - (row - 1) * 30 deg|
        rows3 = np.arange(NUM_ELEVATIONS)
        rel_e = np.abs(elevation[:, None] - (rows3[None, :] - 1) * ANGLE_INC)
        lstar = np.argmin(rel_e, axis=1)
        view = kstar + NUM_HEADINGS * lstar

        adj_next[i, :k] = nbrs
        adj_bearing[i, :k] = bearing
        adj_elevation[i, :k] = elevation
        adj_view[i, :k] = view

        for h in range(NUM_HEADINGS):
            relh = np.abs(canonical_angle(bearing - h * ANGLE_INC))
            adj_perm[i, h, :k] = np.argsort(relh, kind="stable")
    return adj_next, adj_bearing, adj_elevation, adj_view, adj_count, adj_perm


def load_scan_graph(scan_id: str, connectivity_dir: str) -> ScanGraph:
    path = os.path.join(connectivity_dir, f"{scan_id}_connectivity.json")
    node_ids, included, positions, unobstructed = _parse_connectivity(path)
    # an edge requires both endpoints included and the hop unobstructed;
    # the data is symmetric (utils.py:47 asserts it) but we symmetrize anyway
    edges = unobstructed & unobstructed.T & included[:, None] & included[None, :]
    np.fill_diagonal(edges, False)
    dist, next_hop = _all_pairs_shortest_paths(edges, positions)
    tables = _build_pano_tables(edges, positions, included)
    g = ScanGraph(
        scan_id=scan_id,
        node_ids=node_ids,
        included=included,
        positions=positions,
        edges=edges,
        dist=dist,
        next_hop=next_hop,
        adj_next=tables[0],
        adj_bearing=tables[1],
        adj_elevation=tables[2],
        adj_view=tables[3],
        adj_count=tables[4],
        adj_perm=tables[5],
    )
    g.node_index = {vid: i for i, vid in enumerate(node_ids)}
    return g


@dataclass
class GraphBank:
    """All scans packed into global arrays for on-device batched stepping.

    Nodes get a global index ``offset[scan] + local``; per-scan matrices
    (distances / next hops) are padded to the max node count.
    """

    scan_ids: list
    graphs: dict  # scan_id -> ScanGraph
    offsets: np.ndarray  # (S,) int32 global index of each scan's node 0
    num_nodes: np.ndarray  # (S,) int32
    total_nodes: int
    max_nodes: int
    # global per-node tables (indexed by global node index)
    positions: np.ndarray  # (T, 3) float32
    adj_next: np.ndarray  # (T, MAX_DEGREE) int32 LOCAL neighbor index
    adj_bearing: np.ndarray  # (T, MAX_DEGREE) float32
    adj_elevation: np.ndarray  # (T, MAX_DEGREE) float32
    adj_view: np.ndarray  # (T, MAX_DEGREE) int32
    adj_count: np.ndarray  # (T,) int32
    adj_perm: np.ndarray  # (T, 12, MAX_DEGREE) int32
    # per-scan padded matrices (indexed by [scan, local_i, local_j])
    dist: np.ndarray  # (S, Nmax, Nmax) float32, +inf pad
    next_hop: np.ndarray  # (S, Nmax, Nmax) int32, -1 pad

    def scan_row(self, scan_id: str) -> int:
        """O(1) scan -> row index (scan_ids.index is O(S) and these lookups
        run per minibatch element in encode_batch)."""
        try:
            rows = self._scan_rows
        except AttributeError:
            rows = {s: i for i, s in enumerate(self.scan_ids)}
            object.__setattr__(self, "_scan_rows", rows)
        return rows[scan_id]

    def global_index(self, scan_id: str, viewpoint_id: str) -> int:
        s = self.scan_row(scan_id)
        return int(self.offsets[s]) + self.graphs[scan_id].node_index[viewpoint_id]

    def local_index(self, scan_id: str, viewpoint_id: str) -> int:
        return self.graphs[scan_id].node_index[viewpoint_id]


def load_graph_bank(
    scan_ids, connectivity_dir: str, cache_dir: str | None = None
) -> GraphBank:
    """Compile (or load from cache) the packed graph bank.

    With ``cache_dir``, the compiled per-scan graphs are pickled keyed by
    scan id; a 90-scan cold compile (~90 s of Dijkstra + pano tables) drops
    to ~2 s warm.
    """
    scan_ids = sorted(scan_ids)
    graphs = {}
    if cache_dir:
        import os
        import pickle

        os.makedirs(cache_dir, exist_ok=True)
        for s in scan_ids:
            p = os.path.join(cache_dir, f"graph_{s}.pkl")
            if os.path.exists(p):
                with open(p, "rb") as f:
                    graphs[s] = pickle.load(f)
            else:
                graphs[s] = load_scan_graph(s, connectivity_dir)
                with open(p, "wb") as f:
                    pickle.dump(graphs[s], f, protocol=pickle.HIGHEST_PROTOCOL)
    else:
        graphs = {s: load_scan_graph(s, connectivity_dir) for s in scan_ids}
    nums = np.array([graphs[s].num_nodes for s in scan_ids], dtype=np.int32)
    offsets = np.concatenate([[0], np.cumsum(nums)[:-1]]).astype(np.int32)
    total = int(nums.sum())
    nmax = int(nums.max())

    positions = np.zeros((total, 3), dtype=np.float32)
    adj_next = np.full((total, MAX_DEGREE), -1, dtype=np.int32)
    adj_bearing = np.zeros((total, MAX_DEGREE), dtype=np.float32)
    adj_elevation = np.zeros((total, MAX_DEGREE), dtype=np.float32)
    adj_view = np.zeros((total, MAX_DEGREE), dtype=np.int32)
    adj_count = np.zeros((total,), dtype=np.int32)
    adj_perm = np.full((total, NUM_HEADINGS, MAX_DEGREE), -1, dtype=np.int32)
    dist = np.full((len(scan_ids), nmax, nmax), np.inf, dtype=np.float32)
    next_hop = np.full((len(scan_ids), nmax, nmax), -1, dtype=np.int32)

    for s, sid in enumerate(scan_ids):
        g = graphs[sid]
        o, n = offsets[s], g.num_nodes
        positions[o : o + n] = g.positions
        adj_next[o : o + n] = g.adj_next
        adj_bearing[o : o + n] = g.adj_bearing
        adj_elevation[o : o + n] = g.adj_elevation
        adj_view[o : o + n] = g.adj_view
        adj_count[o : o + n] = g.adj_count
        adj_perm[o : o + n] = g.adj_perm
        dist[s, :n, :n] = g.dist
        next_hop[s, :n, :n] = g.next_hop

    return GraphBank(
        scan_ids=scan_ids,
        graphs=graphs,
        offsets=offsets,
        num_nodes=nums,
        total_nodes=total,
        max_nodes=nmax,
        positions=positions,
        adj_next=adj_next,
        adj_bearing=adj_bearing,
        adj_elevation=adj_elevation,
        adj_view=adj_view,
        adj_count=adj_count,
        adj_perm=adj_perm,
        dist=dist,
        next_hop=next_hop,
    )
