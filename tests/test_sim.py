"""Simulator-facade kinematics tests, replicating the C++ test suite
(src/test/main.cpp:42-299) against env/sim.Simulator:

  * Continuous Motion: golden heading/elevation tables with elevation
    limits and heading wrap-around;
  * Discrete Motion: golden snapped heading/elevation/viewIndex tables;
  * Robot Relative Coords: rel_heading/rel_elevation/rel_distance
    reconstruct neighbor positions and are sorted by angular distance;
  * Navigable Locations: property check over sampled scans against an
    independent re-parse of the connectivity JSON (self first,
    excluded/obstructed filtered, HFOV visibility math).
"""

import json
import math

import numpy as np
import pytest

from speaker_follower_tpu.env.sim import Simulator

CONN = "/root/reference/connectivity"
SCAN_CASES = [
    ("2t7WUuJeko7", "cc34e9176bfe47ebb23c58c165203134"),
    ("17DRP5sb8fy", "5b9b2794954e4694a45fc424a8643081"),
]

# golden kinematics tables (degrees), identical to main.cpp:34-40
HEADING = [10, 350, 350, 1, 90, 180, 90, 270, 90, 270]
HEADING_CHG = [-20, -360, 371, 89, 90, -90, -180, -180, -180, 0]
DISCRETE_HEADING = [0, 330, 300, 330, 0, 30, 0, 330, 300, 270]
ELEVATION = [10, 10, -26, -40, -40, -40, 50, 50, 40, 0]
ELEVATION_CHG = [0, -36, -30, -10, 0, 90, 5, -10, -40, 0]
DISCRETE_ELEVATION = [0, 0, -30, -30, -30, -30, 0, 30, 0, -30]
VIEW_INDEX = [12, 23, 10, 11, 0, 1, 12, 35, 22, 9]

r = math.radians


def _make_sim(discrete=False, elevation_limits=None):
    sim = Simulator()
    sim.setNavGraphPath(CONN)
    sim.setCameraResolution(200, 100)  # 45deg vfov -> 90deg hfov
    sim.setCameraVFOV(r(45))
    if discrete:
        sim.setDiscretizedViewingAngles(True)
    if elevation_limits:
        assert sim.setElevationLimits(*elevation_limits)
    sim.init()
    return sim


def test_continuous_motion():
    sim = _make_sim(elevation_limits=(r(-40), r(50)))
    for scan_id, viewpoint_id in SCAN_CASES:
        vp = viewpoint_id
        sim.newEpisode(scan_id, vp, r(HEADING[0]), r(ELEVATION[0]))
        for t in range(10):
            state = sim.getState()
            assert state.scanId == scan_id
            assert state.step == t
            assert abs(state.heading - r(HEADING[t])) < 1e-6, t
            assert abs(state.elevation - r(ELEVATION[t])) < 1e-6, t
            assert state.location.viewpointId == vp
            assert state.viewIndex == 0  # not active in continuous mode
            actions = state.navigableLocations
            ix = t % len(actions)
            vp = actions[ix].viewpointId
            sim.makeAction(ix, r(HEADING_CHG[t]), r(ELEVATION_CHG[t]))


def test_discrete_motion():
    sim = _make_sim(discrete=True, elevation_limits=(r(-10), r(10)))
    for scan_id, viewpoint_id in SCAN_CASES:
        vp = viewpoint_id
        sim.newEpisode(scan_id, vp, r(HEADING[0]), r(ELEVATION[0]))
        for t in range(10):
            state = sim.getState()
            assert state.step == t
            assert abs(state.heading - r(DISCRETE_HEADING[t])) < 1e-6, t
            assert abs(state.elevation - r(DISCRETE_ELEVATION[t])) < 1e-6, t
            assert state.location.viewpointId == vp
            assert state.viewIndex == VIEW_INDEX[t], t
            actions = state.navigableLocations
            ix = t % len(actions)
            vp = actions[ix].viewpointId
            sim.makeAction(ix, r(HEADING_CHG[t]), r(ELEVATION_CHG[t]))


def test_robot_relative_coords():
    sim = _make_sim(elevation_limits=(r(-40), r(50)))
    for scan_id, viewpoint_id in SCAN_CASES:
        sim.newEpisode(scan_id, viewpoint_id, r(HEADING[0]), r(ELEVATION[0]))
        for t in range(10):
            state = sim.getState()
            curr = np.array(state.location.point)
            last_angle = 0.0
            for k, loc in enumerate(state.navigableLocations):
                if k == 0:
                    assert loc.rel_heading == 0 and loc.rel_elevation == 0
                    assert loc.rel_distance == 0
                    continue
                angle = math.sqrt(loc.rel_heading**2 + loc.rel_elevation**2)
                assert angle >= last_angle - 1e-9  # sorted by angular distance
                last_angle = angle
                h = state.heading + loc.rel_heading
                e = state.elevation + loc.rel_elevation
                offset = np.array(
                    [
                        math.sin(h) * math.cos(e) * loc.rel_distance,
                        math.cos(h) * math.cos(e) * loc.rel_distance,
                        math.sin(e) * loc.rel_distance,
                    ]
                )
                np.testing.assert_allclose(
                    np.array(loc.point), curr + offset, atol=1e-4
                )
            actions = state.navigableLocations
            ix = t % len(actions)
            sim.makeAction(ix, r(HEADING_CHG[t]), r(ELEVATION_CHG[t]))


def test_navigable_locations_property():
    """Cross-check navigableLocations against an independent re-parse of the
    connectivity JSON (main.cpp:169-299), on sampled scans (all 90 with
    SFT_FULL_PANO_TEST=1)."""
    import os

    with open(f"{CONN}/scans.txt") as f:
        scans = [s.strip() for s in f if s.strip()]
    rng = np.random.RandomState(0)
    if not os.environ.get("SFT_FULL_PANO_TEST"):
        scans = list(rng.choice(scans, size=5, replace=False))

    sim = _make_sim()
    hfov_half = r(45) * 2 / 2.0  # vfov * (w/h) / 2

    for scan in scans:
        with open(f"{CONN}/{scan}_connectivity.json") as f:
            data = json.load(f)
        included = [i for i, it in enumerate(data) if it["included"]]
        for i in rng.choice(included, size=min(8, len(included)), replace=False):
            item = data[i]
            heading = float(rng.uniform(0, 2 * math.pi))
            sim.newEpisode(scan, item["image_id"], heading, 0.0)
            state = sim.getState()
            navigable = {v.viewpointId for v in state.navigableLocations}
            # self is always first
            assert state.navigableLocations[0].viewpointId == item["image_id"]
            # independent visibility recomputation
            pos_i = np.array([item["pose"][3], item["pose"][7], item["pose"][11]])
            cam = np.array(
                [math.cos(math.pi / 2 - heading), math.sin(math.pi / 2 - heading)]
            )
            expected = {item["image_id"]}
            for j, unob in enumerate(item["unobstructed"]):
                if j == i or not unob or not data[j]["included"]:
                    continue
                pose = data[j]["pose"]
                d = np.array([pose[3], pose[7], pose[11]]) - pos_i
                xy = d[:2]
                norm = np.linalg.norm(xy)
                if norm == 0:
                    continue
                if float(np.dot(xy / norm, cam)) >= math.cos(hfov_half):
                    expected.add(data[j]["image_id"])
            assert navigable == expected, (scan, item["image_id"])
