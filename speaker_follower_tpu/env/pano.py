"""Panorama sweep on the single-sim facade — the oracle for the vectorized
env's precomputed action tables.

Re-implements the reference's runtime panorama scan
(tasks/R2R/env.py:113-224: _adjust_heading/_adjust_elevation/
_navigate_to_location/_get_panorama_states) on top of env/sim.Simulator.
The vectorized environment precomputes all of this offline; property tests
check slot-for-slot equality between the two.
"""

from __future__ import annotations

import math

import numpy as np

from .sim import Simulator

ANGLE_INC = math.pi / 6.0


def canonical_angle(x: float) -> float:
    """Make angle in (-pi, +pi) (tasks/R2R/env.py:108-110)."""
    return x - 2 * math.pi * round(x / (2 * math.pi))


def _loc_distance(loc) -> float:
    return math.sqrt(loc.rel_heading**2 + loc.rel_elevation**2)


def adjust_heading(sim: Simulator, heading: int):
    heading = (heading + 6) % 12 - 6  # minimum turns (tasks/R2R/env.py:114)
    for _ in range(int(abs(heading))):
        sim.makeAction(0, np.sign(heading), 0)


def adjust_elevation(sim: Simulator, elevation: int):
    for _ in range(int(abs(elevation))):
        sim.makeAction(0, 0, np.sign(elevation))


def navigate_to_location(sim: Simulator, next_viewpoint_id: str, abs_view_index: int):
    """tasks/R2R/env.py:126-146."""
    state = sim.getState()
    if state.location.viewpointId == next_viewpoint_id:
        return
    adjust_heading(sim, abs_view_index % 12 - state.viewIndex % 12)
    adjust_elevation(sim, abs_view_index // 12 - state.viewIndex // 12)
    state = sim.getState()
    assert state.viewIndex == abs_view_index
    a = None
    for n_loc, loc in enumerate(state.navigableLocations):
        if loc.viewpointId == next_viewpoint_id:
            a = n_loc
            break
    assert a is not None
    sim.makeAction(a, 0, 0)


def get_panorama_states(sim: Simulator):
    """tasks/R2R/env.py:149-224: sweep all 36 views, recording each navigable
    neighbor under its angularly-closest view; return (state, adj_loc_list)
    with slot 0 = stop and neighbors sorted by |rel_heading|."""
    state = sim.getState()
    init_view_index = state.viewIndex
    elevation_delta = -(state.viewIndex // 12)
    adjust_elevation(sim, elevation_delta)

    adj_dict = {}
    for rel_view_index in range(36):
        base_rel_heading = (rel_view_index % 12) * ANGLE_INC
        base_rel_elevation = (rel_view_index // 12 - 1) * ANGLE_INC

        state = sim.getState()
        abs_view_index = state.viewIndex
        for loc in state.navigableLocations[1:]:
            distance = _loc_distance(loc)
            if (
                loc.viewpointId not in adj_dict
                or distance < adj_dict[loc.viewpointId]["distance"]
            ):
                adj_dict[loc.viewpointId] = {
                    "absViewIndex": abs_view_index,
                    "nextViewpointId": loc.viewpointId,
                    "rel_heading": canonical_angle(
                        base_rel_heading + loc.rel_heading
                    ),
                    "rel_elevation": base_rel_elevation + loc.rel_elevation,
                    "distance": distance,
                }
        if (rel_view_index + 1) % 12 == 0:
            sim.makeAction(0, 1, 1)  # turn right and look up
        else:
            sim.makeAction(0, 1, 0)  # turn right
    adjust_elevation(sim, -2 - elevation_delta)
    state = sim.getState()
    assert state.viewIndex == init_view_index

    stop = {"absViewIndex": -1, "nextViewpointId": state.location.viewpointId}
    adj_loc_list = [stop] + sorted(
        adj_dict.values(), key=lambda x: abs(x["rel_heading"])
    )
    return state, adj_loc_list
