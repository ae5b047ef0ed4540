"""Single-simulator API facade: the MatterSim ``Simulator`` interface as a
pure-python navigation-graph state machine, with optional rendering via
the JAX cubemap resampler (env/render.py).

This mirrors the C++ simulator's non-rendering semantics exactly
(src/lib/MatterSim.cpp:66-508, include/MatterSim.hpp:28-96): episode state
(scanId, viewpoint, heading, elevation, step, viewIndex), discretized or
continuous viewing angles, HFOV-visibility navigable-neighbor computation,
and the same action interface.  The C++ test suite's kinematics/graph
semantics (src/test/main.cpp:42-299) are replicated against this class; the
batched TPU environment (env/vecenv.py) is property-tested against the
panorama sweep built on it (env/pano.py).

It is intentionally NOT the production data path — training/eval use the
vectorized env — but it gives reference-API users a drop-in ``Simulator``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..data.graph import _parse_connectivity

ANGLE_INC = math.pi / 6.0
HEADING_COUNT = 12  # include/MatterSim.hpp:195
ELEVATION_INC = math.pi / 6.0  # include/MatterSim.hpp:196


@dataclass
class _LightGraph:
    """Just what the facade needs: nodes, positions, edges (no shortest
    paths / pano tables — those belong to the vectorized env)."""

    node_ids: list
    included: object
    positions: object
    edges: object
    node_index: dict

    @property
    def num_nodes(self):
        return len(self.node_ids)


_GRAPH_CACHE: dict = {}


def _load_light_graph(scan_id: str, connectivity_dir: str) -> _LightGraph:
    import os

    import numpy as np

    key = (os.path.abspath(connectivity_dir), scan_id)
    if key not in _GRAPH_CACHE:
        path = os.path.join(connectivity_dir, f"{scan_id}_connectivity.json")
        node_ids, included, positions, unobstructed = _parse_connectivity(path)
        edges = (
            unobstructed
            & unobstructed.T
            & included[:, None]
            & included[None, :]
        )
        np.fill_diagonal(edges, False)
        _GRAPH_CACHE[key] = _LightGraph(
            node_ids=node_ids,
            included=included,
            positions=positions,
            edges=edges,
            node_index={v: i for i, v in enumerate(node_ids)},
        )
    return _GRAPH_CACHE[key]


@dataclass
class ViewPoint:
    """Navigable location relative to the agent (include/MatterSim.hpp:28-41)."""

    viewpointId: str
    ix: int
    x: float
    y: float
    z: float
    rel_heading: float
    rel_elevation: float
    rel_distance: float

    @property
    def point(self):
        return (self.x, self.y, self.z)


@dataclass
class SimState:
    """Simulator state (include/MatterSim.hpp:54-96).

    ``rgb`` follows the reference's cv::Mat convention: (height, width, 3)
    uint8, BGR channel order, all-zeros when rendering is disabled
    (MatterSim.cpp:224-226)."""

    scanId: str = ""
    step: int = 0
    heading: float = 0.0
    elevation: float = 0.0
    viewIndex: int = 0
    location: ViewPoint | None = None
    navigableLocations: list = field(default_factory=list)
    rgb: object = None


class Simulator:
    """MatterSim.Simulator equivalent.

    Interface parity with the pybind11 module
    (src/lib_python/MatterSimPython.cpp:132-164): ``setCameraResolution``,
    ``setCameraVFOV``, ``setElevationLimits``, ``setDiscretizedViewingAngles``,
    ``setRenderingEnabled`` (JAX cubemap resampling instead of OpenGL; needs
    skybox images via ``setDatasetPath`` or an injected ``skybox_provider``),
    ``setNavGraphPath``, ``setDatasetPath``, ``init``, ``newEpisode``,
    ``getState``, ``makeAction``, ``close``.
    """

    def __init__(self):
        self.width = 320
        self.height = 240
        self.vfov = 0.8
        self.min_elevation = -0.94
        self.max_elevation = 0.94
        self.nav_graph_path = "./connectivity"
        self.initialized = False
        self.discretize_views = False
        self.rendering_enabled = False
        self.dataset_path = None
        self.skybox_provider = None  # (scan, vp) -> (6, S, S, 3) uint8
        self.state = SimState()
        self._graphs = {}
        self._pose_rots = {}
        self._skybox_cache = {}

    # ---- configuration (src/lib/MatterSim.cpp:88-115) ----
    def setCameraResolution(self, width: int, height: int):
        self.width = width
        self.height = height

    def setCameraVFOV(self, vfov: float):
        self.vfov = vfov

    def setRenderingEnabled(self, value: bool):
        """Rendering uses the JAX cubemap resampler (env/render.py) in
        place of the reference's OpenGL path.  Requires skybox images: set
        ``setDatasetPath`` to a Matterport download (v1/scans layout), or
        inject ``skybox_provider(scan_id, viewpoint_id) -> (6, S, S, 3)``
        uint8 faces in GL order."""
        if not self.initialized:
            self.rendering_enabled = bool(value)

    def setDiscretizedViewingAngles(self, value: bool):
        if not self.initialized:
            self.discretize_views = value

    def setElevationLimits(self, min_e: float, max_e: float) -> bool:
        if -math.pi / 2 < min_e < 0.0 and 0.0 < max_e < math.pi / 2:
            self.min_elevation = min_e
            self.max_elevation = max_e
            return True
        return False

    def setNavGraphPath(self, path: str):
        self.nav_graph_path = path

    def setDatasetPath(self, path: str):
        self.dataset_path = path

    def init(self):
        self.initialized = True
        if self.rendering_enabled and self.skybox_provider is None:
            if self.dataset_path is None:
                raise RuntimeError(
                    "rendering enabled but no dataset path or skybox_provider set"
                )
            from . import render as _render

            self.skybox_provider = lambda scan, vp: _render.load_skybox(
                self.dataset_path, scan, vp
            )

    def close(self):
        self.initialized = False

    # ---- internals ----
    def _graph(self, scan_id: str):
        if scan_id not in self._graphs:
            self._graphs[scan_id] = _load_light_graph(scan_id, self.nav_graph_path)
        return self._graphs[scan_id]

    def _set_heading_elevation(self, heading: float, elevation: float):
        """src/lib/MatterSim.cpp:339-367."""
        s = self.state
        s.heading = math.fmod(heading, 2 * math.pi)
        while s.heading < 0.0:
            s.heading += 2 * math.pi
        if self.discretize_views:
            inc = 2 * math.pi / HEADING_COUNT
            heading_step = int(round(s.heading / inc))  # lround, arg >= 0
            if heading_step == HEADING_COUNT:
                heading_step = 0
            s.heading = heading_step * inc
            s.elevation = elevation
            if s.elevation < -ELEVATION_INC / 2.0:
                s.elevation = -ELEVATION_INC
                s.viewIndex = heading_step
            elif s.elevation > ELEVATION_INC / 2.0:
                s.elevation = ELEVATION_INC
                s.viewIndex = heading_step + 2 * HEADING_COUNT
            else:
                s.elevation = 0.0
                s.viewIndex = heading_step + HEADING_COUNT
        else:
            s.elevation = max(min(elevation, self.max_elevation), self.min_elevation)

    def _populate_navigable(self):
        """src/lib/MatterSim.cpp:276-311: current location first, then all
        included+unobstructed neighbors within the camera HFOV, sorted by
        angular distance sqrt(rel_heading^2 + rel_elevation^2)."""
        import numpy as np

        g = self._graph(self.state.scanId)
        s = self.state
        cur = s.location
        idx = cur.ix
        adjusted = math.pi / 2.0 - s.heading
        cam = (math.cos(adjusted), math.sin(adjusted))
        cos_half_hfov = math.cos(self.vfov * self.width / self.height / 2.0)
        out = [cur]
        nbrs = np.nonzero(g.edges[idx])[0]
        if len(nbrs):
            d = g.positions[nbrs] - g.positions[idx]
            dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
            rel_distance = np.sqrt(dx * dx + dy * dy + dz * dz)
            xy = np.sqrt(dx * dx + dy * dy)
            rel_elevation = np.arctan2(dz, xy) - s.elevation
            with np.errstate(invalid="ignore"):
                nxv = np.where(xy > 0, dx / np.where(xy > 0, xy, 1.0), 0.0)
                nyv = np.where(xy > 0, dy / np.where(xy > 0, xy, 1.0), 0.0)
            cos_angle = nxv * cam[0] + nyv * cam[1]
            visible = cos_angle >= cos_half_hfov
            rel_heading = np.arctan2(
                dx * cam[1] - dy * cam[0], dx * cam[0] + dy * cam[1]
            )
            for k in np.nonzero(visible)[0]:
                i = int(nbrs[k])
                out.append(
                    ViewPoint(
                        viewpointId=g.node_ids[i],
                        ix=i,
                        x=g.positions[i, 0],
                        y=g.positions[i, 1],
                        z=g.positions[i, 2],
                        rel_heading=float(rel_heading[k]),
                        rel_elevation=float(rel_elevation[k]),
                        rel_distance=float(rel_distance[k]),
                    )
                )
        out[1:] = sorted(
            out[1:],
            key=lambda v: math.sqrt(v.rel_heading**2 + v.rel_elevation**2),
        )
        s.navigableLocations = out

    def _render(self):
        """Fill state.rgb via the JAX cubemap resampler (renderScene
        equivalent, MatterSim.cpp:441-468)."""
        import numpy as np

        s = self.state
        if not self.rendering_enabled:
            s.rgb = np.zeros((self.height, self.width, 3), np.uint8)
            return
        from . import render as _render

        key = (s.scanId, s.location.viewpointId)
        if key not in self._skybox_cache:
            if len(self._skybox_cache) > 64:
                self._skybox_cache.clear()
            self._skybox_cache[key] = np.asarray(
                self.skybox_provider(s.scanId, s.location.viewpointId)
            )
        if s.scanId not in self._pose_rots:
            self._pose_rots[s.scanId] = _render.load_pose_rotations(
                self.nav_graph_path, s.scanId
            )
        rot = self._pose_rots[s.scanId][s.location.viewpointId]
        s.rgb = np.asarray(
            _render.render_view(
                self._skybox_cache[key], rot, s.heading, s.elevation,
                width=self.width, height=self.height, vfov=self.vfov,
            )
        )

    # ---- episode control ----
    def newEpisode(self, scanId: str, viewpointId: str, heading: float, elevation: float):
        """src/lib/MatterSim.cpp:379-435 (no random-start support needed:
        every reference call site passes an explicit viewpoint)."""
        if not self.initialized:
            self.init()
        s = self.state
        s.step = 0
        self._set_heading_elevation(heading, elevation)
        s.scanId = scanId
        g = self._graph(scanId)
        if viewpointId not in g.node_index:
            raise ValueError(f"unknown viewpointId {viewpointId}")
        ix = g.node_index[viewpointId]
        if not g.included[ix]:
            raise ValueError(f"viewpointId {viewpointId} is excluded")
        s.location = ViewPoint(
            viewpointId=viewpointId,
            ix=ix,
            x=g.positions[ix, 0],
            y=g.positions[ix, 1],
            z=g.positions[ix, 2],
            rel_heading=0.0,
            rel_elevation=0.0,
            rel_distance=0.0,
        )
        self._populate_navigable()
        self._render()

    def getState(self) -> SimState:
        return self.state

    def makeAction(self, index: int, heading: float, elevation: float):
        """src/lib/MatterSim.cpp:470-508."""
        s = self.state
        if not self.initialized or index < 0 or index >= len(s.navigableLocations):
            raise ValueError(f"invalid action index: {index}")
        s.location = s.navigableLocations[index]
        s.location.rel_heading = 0.0
        s.location.rel_elevation = 0.0
        s.location.rel_distance = 0.0
        s.step += 1
        if self.discretize_views:
            if heading > 0.0:
                heading = 2 * math.pi / HEADING_COUNT
            if heading < 0.0:
                heading = -2 * math.pi / HEADING_COUNT
            if elevation > 0.0:
                elevation = ELEVATION_INC
            if elevation < 0.0:
                elevation = -ELEVATION_INC
        self._set_heading_elevation(s.heading + heading, s.elevation + elevation)
        self._populate_navigable()
        self._render()
