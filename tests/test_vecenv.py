"""Vectorized env vs the single-sim facade: batched observe/step must match
the reference's per-sim panorama pipeline (sweep oracle) step for step."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_follower_tpu.data.graph import ANGLE_INC, NUM_ACTIONS, load_graph_bank
from speaker_follower_tpu.data.features import random_feature_bank
from speaker_follower_tpu.env import vecenv
from speaker_follower_tpu.env.pano import get_panorama_states, navigate_to_location
from speaker_follower_tpu.env.sim import Simulator

CONN = "/root/reference/connectivity"
SCANS = ["17DRP5sb8fy", "2azQ1b91cZZ"]


@pytest.fixture(scope="module")
def bank():
    return load_graph_bank(SCANS, CONN)


@pytest.fixture(scope="module")
def features(bank):
    return random_feature_bank(bank, dim=64, seed=1)


@pytest.fixture(scope="module")
def tables(bank, features):
    return vecenv.make_env_tables(bank, features)


def _make_sim():
    sim = Simulator()
    sim.setNavGraphPath(CONN)
    sim.setDiscretizedViewingAngles(True)
    sim.setCameraResolution(640, 480)
    sim.setCameraVFOV(math.radians(60))
    sim.init()
    return sim


def _ref_action_embedding(adj_loc_list, features_36xD):
    """Reference _build_action_embedding (tasks/R2R/env.py:60-75)."""
    d = features_36xD.shape[-1]
    emb = np.zeros((len(adj_loc_list), d + 128), np.float32)
    for a, adj in enumerate(adj_loc_list):
        if a == 0:
            continue
        emb[a, :d] = features_36xD[adj["absViewIndex"]]
        emb[a, d : d + 32] = np.sin(adj["rel_heading"])
        emb[a, d + 32 : d + 64] = np.cos(adj["rel_heading"])
        emb[a, d + 64 : d + 96] = np.sin(adj["rel_elevation"])
        emb[a, d + 96 :] = np.cos(adj["rel_elevation"])
    return emb


def test_rollout_matches_facade(bank, features, tables):
    rng = np.random.RandomState(7)
    batch = 6
    episodes = []
    for _ in range(batch):
        s = rng.randint(len(SCANS))
        g = bank.graphs[bank.scan_ids[s]]
        included = np.nonzero(g.included & (g.adj_count > 0))[0]
        node = included[rng.randint(len(included))]
        heading = rng.randint(12)
        episodes.append((s, node, heading))

    scan = np.array([e[0] for e in episodes], np.int32)
    node = np.array([e[1] for e in episodes], np.int32)
    heading = np.array([e[2] for e in episodes], np.int32)
    goal = node.copy()  # teacher not under test here

    state = vecenv.reset(scan, node, heading)
    sims = [_make_sim() for _ in range(batch)]
    for i, (s, n, h) in enumerate(episodes):
        sims[i].newEpisode(
            bank.scan_ids[s], bank.graphs[bank.scan_ids[s]].node_ids[n], h * ANGLE_INC, 0.0
        )

    observe_j = jax.jit(vecenv.observe)
    step_j = jax.jit(vecenv.step)
    goal_j = jnp.asarray(goal)
    observe = lambda st: observe_j(tables, st, goal_j)
    step = lambda st, a: step_j(tables, st, a)
    loc_table = vecenv.build_loc_embedding_table()

    for t in range(5):
        obs = observe(state)
        actions = np.zeros((batch,), np.int32)
        for i in range(batch):
            if bool(state.done[i]):
                continue  # stopped episodes are frozen; leave the sim alone
            sim_state, adj_loc_list = get_panorama_states(sims[i])
            sid = bank.scan_ids[episodes[i][0]]
            gnode = bank.global_index(sid, sim_state.location.viewpointId)

            # facade and vec env agree on the current node & view
            assert int(tables.offsets[state.scan[i]] + state.node[i]) == gnode
            assert int(obs.view_index[i]) == sim_state.viewIndex

            # action set: count, validity, embeddings
            count = len(adj_loc_list) - 1
            valid = np.asarray(obs.action_valid[i])
            assert valid[: count + 1].all()
            assert not valid[count + 1 :].any()

            ref_emb = _ref_action_embedding(adj_loc_list, features[gnode])
            got = np.asarray(obs.action_embedding[i][: count + 1])
            np.testing.assert_allclose(got, ref_emb, atol=1e-5)

            # pano feature = feature | loc embedding at current viewIndex
            ref_pano = np.concatenate(
                [features[gnode], loc_table[sim_state.viewIndex]], axis=-1
            )
            np.testing.assert_allclose(
                np.asarray(obs.pano_feature[i]), ref_pano, atol=1e-5
            )

            # choose a random valid action and mirror it on the facade
            a = rng.randint(count + 1)
            actions[i] = a
            if a > 0:
                loc_attr = adj_loc_list[a]
                navigate_to_location(
                    sims[i], loc_attr["nextViewpointId"], loc_attr["absViewIndex"]
                )
        state = step(state, jnp.asarray(actions))
        for i in range(batch):
            if actions[i] > 0 and not bool(state.done[i]):
                sim_state = sims[i].getState()
                sid = bank.scan_ids[episodes[i][0]]
                assert (
                    bank.graphs[sid].node_ids[int(state.node[i])]
                    == sim_state.location.viewpointId
                )
                assert (
                    int(state.heading[i] + 12 * state.elev[i]) == sim_state.viewIndex
                )


def test_teacher_reaches_goal(bank, tables):
    """Following the teacher reaches the goal and then emits stop, and the
    number of moves equals the shortest-path hop count."""
    rng = np.random.RandomState(3)
    batch = 16
    scan = rng.randint(len(SCANS), size=batch).astype(np.int32)
    node = np.zeros((batch,), np.int32)
    goal = np.zeros((batch,), np.int32)
    for i in range(batch):
        g = bank.graphs[bank.scan_ids[scan[i]]]
        included = np.nonzero(g.included & (g.adj_count > 0))[0]
        node[i], goal[i] = included[rng.choice(len(included), 2, replace=True)]
        # ensure reachable
        while not np.isfinite(g.dist[node[i], goal[i]]):
            goal[i] = included[rng.randint(len(included))]
    heading = rng.randint(12, size=batch).astype(np.int32)

    state = vecenv.reset(scan, node, heading)
    goal_j = jnp.asarray(goal)
    observe_j = jax.jit(vecenv.observe)
    step_j = jax.jit(vecenv.step)
    observe = lambda st: observe_j(tables, st, goal_j)
    step = lambda st, a: step_j(tables, st, a)

    moves = np.zeros((batch,), np.int32)
    for t in range(40):
        obs = observe(state)
        teacher = np.asarray(obs.teacher)
        for i in range(batch):
            if not bool(state.done[i]):
                if int(state.node[i]) == goal[i]:
                    assert teacher[i] == 0
                else:
                    assert teacher[i] >= 1
                    moves[i] += 1
        state = step(state, obs.teacher)
        if bool(np.asarray(state.done).all()):
            break
    assert bool(np.asarray(state.done).all())
    np.testing.assert_array_equal(np.asarray(state.node), goal)
    # moves = hop count of the shortest path
    for i in range(batch):
        g = bank.graphs[bank.scan_ids[scan[i]]]
        hops = 0
        cur = node[i]
        while cur != goal[i]:
            cur = g.next_hop[cur, goal[i]]
            hops += 1
        assert moves[i] == hops


def test_done_freezes_state(bank, tables):
    scan = np.zeros((2,), np.int32)
    g = bank.graphs[bank.scan_ids[0]]
    included = np.nonzero(g.included & (g.adj_count > 0))[0]
    node = included[:2].astype(np.int32)
    state = vecenv.reset(scan, node, np.zeros((2,), np.int32))
    step_j = jax.jit(vecenv.step)
    step = lambda st, a: step_j(tables, st, a)
    state = step(state, jnp.array([0, 1]))
    assert bool(state.done[0]) and not bool(state.done[1])
    frozen = step(state, jnp.array([1, 0]))
    assert int(frozen.node[0]) == int(state.node[0])
    assert bool(frozen.done[1])


def test_observe_lite_reassembles_observe(bank, features, tables):
    """LiteObservation (integer/angle planes only) + the feature bank must
    reassemble observe()'s action embeddings, validity, and teacher exactly
    — the contract the fused Pallas decoder path builds on."""
    rng = np.random.RandomState(7)
    b = 16
    scan = rng.randint(len(SCANS), size=b).astype(np.int32)
    node = np.zeros(b, np.int32)
    goal = np.zeros(b, np.int32)
    for i in range(b):
        g = bank.graphs[bank.scan_ids[scan[i]]]
        inc = np.nonzero(g.included & (g.adj_count > 0))[0]
        node[i], goal[i] = inc[rng.randint(len(inc), size=2)]
    state = vecenv.reset(scan, node, rng.randint(12, size=b).astype(np.int32))

    for _ in range(3):
        obs = vecenv.observe(tables, state, goal)
        lite = vecenv.observe_lite(tables, state, goal)
        np.testing.assert_array_equal(
            np.asarray(lite.action_valid), np.asarray(obs.action_valid)
        )
        np.testing.assert_array_equal(
            np.asarray(lite.teacher), np.asarray(obs.teacher)
        )
        np.testing.assert_array_equal(
            np.asarray(lite.view_index), np.asarray(obs.view_index)
        )
        # reassemble: [bank row | 32x4 angle blocks], zero invalid, stop=0
        gnode = np.asarray(tables.offsets)[scan] + np.asarray(state.node)
        feat = np.asarray(tables.features)[
            gnode[:, None], np.maximum(np.asarray(lite.nbr_view), 0)
        ]
        ang = np.concatenate(
            [
                np.repeat(np.sin(np.asarray(lite.rel_heading))[..., None], 32, -1),
                np.repeat(np.cos(np.asarray(lite.rel_heading))[..., None], 32, -1),
                np.repeat(np.sin(np.asarray(lite.rel_elevation))[..., None], 32, -1),
                np.repeat(np.cos(np.asarray(lite.rel_elevation))[..., None], 32, -1),
            ],
            axis=-1,
        ).astype(np.float32)
        u = np.concatenate([feat, ang], axis=-1)
        slot_valid = np.asarray(lite.action_valid)[:, 1:]
        u = np.where(slot_valid[..., None], u, 0.0)
        u = np.concatenate([np.zeros_like(u[:, :1]), u], axis=1)
        np.testing.assert_allclose(
            u, np.asarray(obs.action_embedding), atol=1e-6
        )
        state = vecenv.step(tables, state, obs.teacher)


def test_packed_actions_match_legacy_chain(bank, tables):
    """adj_packed row (gnode*12+heading) == the legacy observe chain
    (adj_perm gather -> take_along over adj_* -> canonical rotation), for
    EVERY node and heading."""
    packed = np.asarray(tables.adj_packed)
    t = bank.total_nodes
    perm_safe = np.maximum(bank.adj_perm, 0)  # (T, 12, MD)
    for h in range(12):
        idx = perm_safe[:, h, :]
        nxt = np.take_along_axis(bank.adj_next, idx, axis=1)
        view = np.take_along_axis(bank.adj_view, idx, axis=1)
        bearing = np.take_along_axis(bank.adj_bearing, idx, axis=1)
        elev = np.take_along_axis(bank.adj_elevation, idx, axis=1)
        relh = bearing.astype(np.float32) - np.float32(h * ANGLE_INC)
        relh = (relh - 2 * np.pi * np.round(relh / (2 * np.pi))).astype(
            np.float32
        )
        rows = packed[np.arange(t) * 12 + h]
        np.testing.assert_array_equal(rows[..., 0], nxt)
        np.testing.assert_array_equal(rows[..., 1], view)
        np.testing.assert_allclose(
            rows[..., 2].view(np.float32), relh, atol=1e-6
        )
        np.testing.assert_allclose(
            rows[..., 3].view(np.float32), elev.astype(np.float32), atol=1e-6
        )
