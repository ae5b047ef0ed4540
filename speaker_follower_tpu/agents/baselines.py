"""Baseline agents: Stop / Random / Shortest (reference
tasks/R2R/follower.py:197-259) on the vectorized env."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import ANGLE_INC
from ..data.dataset import encode_batch
from ..env import vecenv

# jitted once at module level; tables passed as args (never closed over)
_observe = jax.jit(vecenv.observe)
_step = jax.jit(vecenv.step)


def _start_elements(enc, graph_bank):
    out = []
    for i in range(len(enc["instr_id"])):
        g = graph_bank.graphs[enc["scan_id"][i]]
        out.append(
            (
                g.node_ids[int(enc["start_node"][i])],
                float(enc["heading"][i]) * ANGLE_INC,
                0.0,
            )
        )
    return out


def _run_over_dataset(dataset, graph_bank, fn):
    dataset.reset_epoch()
    results = {}
    looped = False
    while not looped:
        enc = encode_batch(dataset.next_minibatch(), graph_bank)
        for traj in fn(enc):
            if traj["instr_id"] in results:
                looped = True
            else:
                results[traj["instr_id"]] = traj
    return results


def stop_agent(dataset, graph_bank, tables=None):
    """Never moves (follower.py:197-207)."""

    def fn(enc):
        starts = _start_elements(enc, graph_bank)
        return [
            {"instr_id": iid, "trajectory": [s]}
            for iid, s in zip(enc["instr_id"], starts)
        ]

    return _run_over_dataset(dataset, graph_bank, fn)


def random_agent(dataset, graph_bank, tables, seed=1):
    """Random direction, then straight for up to 5 hops (follower.py:210-243).
    'Straight' = action 1, the angularly-closest neighbor to the current
    heading, matching the reference's ordered action list."""
    rng = np.random.RandomState(seed)

    def fn(enc):
        b = len(enc["instr_id"])
        state = vecenv.reset(enc["scan"], enc["start_node"], enc["heading"])
        goal = jnp.asarray(enc["goal_node"])
        starts = _start_elements(enc, graph_bank)
        trajs = [
            {"instr_id": iid, "trajectory": [s]}
            for iid, s in zip(enc["instr_id"], starts)
        ]
        steps = np.zeros(b, np.int32)
        ended = np.zeros(b, bool)
        for t in range(6):
            obs = _observe(tables, state, goal)
            valid = np.asarray(obs.action_valid)
            actions = np.zeros(b, np.int32)
            for i in range(b):
                count = int(valid[i].sum()) - 1
                if steps[i] >= 5 or count == 0:
                    actions[i] = 0
                    ended[i] = True
                elif steps[i] == 0:
                    actions[i] = rng.randint(count) + 1
                    steps[i] += 1
                else:
                    actions[i] = 1  # go (approximately) straight
                    steps[i] += 1
            state = _step(tables, state, jnp.asarray(actions))
            nodes = np.asarray(state.node)
            headings = np.asarray(state.heading)
            elevs = np.asarray(state.elev)
            for i in range(b):
                if not ended[i]:
                    g = graph_bank.graphs[enc["scan_id"][i]]
                    trajs[i]["trajectory"].append(
                        (
                            g.node_ids[int(nodes[i])],
                            float(headings[i]) * ANGLE_INC,
                            (float(elevs[i]) - 1.0) * ANGLE_INC,
                        )
                    )
        return trajs

    return _run_over_dataset(dataset, graph_bank, fn)


def shortest_agent(dataset, graph_bank, tables):
    """Always follows the teacher to the goal (follower.py:245-259)."""

    def fn(enc):
        b = len(enc["instr_id"])
        state = vecenv.reset(enc["scan"], enc["start_node"], enc["heading"])
        goal = jnp.asarray(enc["goal_node"])
        starts = _start_elements(enc, graph_bank)
        trajs = [
            {"instr_id": iid, "trajectory": [s]}
            for iid, s in zip(enc["instr_id"], starts)
        ]
        for t in range(20):
            obs = _observe(tables, state, goal)
            prev_done = np.asarray(state.done)
            actions = np.asarray(obs.teacher)
            state = _step(tables, state, obs.teacher)
            nodes = np.asarray(state.node)
            headings = np.asarray(state.heading)
            elevs = np.asarray(state.elev)
            for i in range(b):
                # the reference excludes the duplicated stop state
                # (follower.py:255-257 uses obs[:-1])
                if not prev_done[i] and actions[i] != 0:
                    g = graph_bank.graphs[enc["scan_id"][i]]
                    trajs[i]["trajectory"].append(
                        (
                            g.node_ids[int(nodes[i])],
                            float(headings[i]) * ANGLE_INC,
                            (float(elevs[i]) - 1.0) * ANGLE_INC,
                        )
                    )
            if bool(np.asarray(state.done).all()):
                break
        return trajs

    return _run_over_dataset(dataset, graph_bank, fn)


BASELINE_AGENTS = {
    "Stop": stop_agent,
    "Random": random_agent,
    "Shortest": shortest_agent,
}
