"""Vectorized navigation-graph environment (the MatterSim/EnvBatch/R2RBatch
replacement).

Where the reference steps B python-level C++ simulator objects — ~36
``makeAction`` host calls per observation per episode
(tasks/R2R/env.py:149-224, 585-641) — here the entire environment is a set
of packed device arrays and ``reset/observe/step`` are batched gathers that
trace into a single XLA program; a whole episode rollout runs under
``lax.scan`` with zero host round-trips.

Semantics parity (all cited against the reference):
  * panorama action space (``adj_loc_list``): slot 0 = stop; neighbors
    ordered by |rel_heading| ascending (tasks/R2R/env.py:218-222), realized
    via the precomputed per-heading permutation in GraphBank;
  * action embeddings: [view feature | 32*sin(rel_h) 32*cos(rel_h)
    32*sin(rel_e) 32*cos(rel_e)], stop = zeros (tasks/R2R/env.py:60-75);
  * panorama features: per-view feature | 128-d viewIndex-relative location
    embedding (tasks/R2R/env.py:78-101, 771-774);
  * teacher action: next hop on the all-pairs shortest path mapped into the
    action list, 0 at the goal (tasks/R2R/env.py:742-761);
  * stepping: moving to a neighbor leaves the agent looking at the
    neighbor's absViewIndex — heading = view % 12, elevation row =
    view // 12 (tasks/R2R/env.py:126-146 ``_navigate_to_location`` turns to
    that view before moving, and MatterSim keeps heading/elevation across
    the hop, src/lib/MatterSim.cpp:470-508).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import (
    ANGLE_INC,
    MAX_DEGREE,
    NUM_ACTIONS,
    NUM_HEADINGS,
    NUM_VIEWS,
    GraphBank,
)

LOC_EMBED_DIM = 128


def build_loc_embedding_table() -> np.ndarray:
    """(36, 36, 128) table: row [viewIndex, absViewIndex] is the location
    embedding of pano patch absViewIndex when the agent looks at viewIndex.

    Reference tasks/R2R/env.py:78-101 (build_viewpoint_loc_embedding +
    _static_loc_embeddings).
    """
    table = np.zeros((NUM_VIEWS, NUM_VIEWS, LOC_EMBED_DIM), dtype=np.float32)
    for view_index in range(NUM_VIEWS):
        for abs_view in range(NUM_VIEWS):
            rel_view = (abs_view - view_index) % 12 + (abs_view // 12) * 12
            rel_heading = (rel_view % 12) * ANGLE_INC
            rel_elevation = (rel_view // 12 - 1) * ANGLE_INC
            table[view_index, abs_view, 0:32] = np.sin(rel_heading)
            table[view_index, abs_view, 32:64] = np.cos(rel_heading)
            table[view_index, abs_view, 64:96] = np.sin(rel_elevation)
            table[view_index, abs_view, 96:] = np.cos(rel_elevation)
    return table


class EnvTables(NamedTuple):
    """Device-resident environment tables (closed over by jitted fns)."""

    offsets: jnp.ndarray  # (S,) int32 global node offset per scan
    adj_next: jnp.ndarray  # (T, MAX_DEGREE) int32 local neighbor index
    adj_bearing: jnp.ndarray  # (T, MAX_DEGREE) float32
    adj_elevation: jnp.ndarray  # (T, MAX_DEGREE) float32
    adj_view: jnp.ndarray  # (T, MAX_DEGREE) int32
    adj_count: jnp.ndarray  # (T,) int32
    adj_perm: jnp.ndarray  # (T, 12, MAX_DEGREE) int32
    next_hop: jnp.ndarray  # (S, Nmax, Nmax) int32
    dist: jnp.ndarray  # (S, Nmax, Nmax) float32
    features: jnp.ndarray  # (T, 36, D) feature bank
    loc_embed: jnp.ndarray  # (36, 36, 128) float32
    # Heading-permuted packed action table: row (gnode * 12 + heading) holds
    # the ordered action list for that (node, heading) as (MAX_DEGREE, 4)
    # int32 = [next_node, abs_view, bitcast_f32(rel_heading),
    # bitcast_f32(rel_elevation)].  One contiguous-row gather replaces the
    # observe-time chain of adj_perm gather -> take_along over 4 tables ->
    # canonical-angle trig: TPU gathers of 64-byte rows are latency-bound,
    # so fewer/wider gathers dominate the env-scan cost (the round-4
    # factored-tail profiling measured the same effect on the action
    # planes, runs/profile_b2048_factored_r4.log).
    adj_packed: jnp.ndarray  # (T * 12, MAX_DEGREE, 4) int32


class EnvState(NamedTuple):
    """Batched episode state — a pytree of (B,) arrays."""

    scan: jnp.ndarray  # int32 scan index
    node: jnp.ndarray  # int32 LOCAL node index
    heading: jnp.ndarray  # int32 heading step in [0, 12)
    elev: jnp.ndarray  # int32 elevation row in {0, 1, 2} (1 = level)
    step: jnp.ndarray  # int32 steps taken
    done: jnp.ndarray  # bool

    @property
    def view_index(self):
        return self.heading + NUM_HEADINGS * self.elev


class Observation(NamedTuple):
    """Batched observation — fixed-shape arrays."""

    pano_feature: jnp.ndarray  # (B, 36, D + 128)
    action_embedding: jnp.ndarray  # (B, NUM_ACTIONS, D + 128)
    action_valid: jnp.ndarray  # (B, NUM_ACTIONS) bool
    teacher: jnp.ndarray  # (B,) int32 teacher action (0 at goal)
    view_index: jnp.ndarray  # (B,) int32


def make_env_tables(
    graph_bank: GraphBank, feature_bank, pad_views: bool = False
) -> EnvTables:
    """``pad_views`` stores the bank with the view dim padded 36 -> 40 so
    the Pallas fused pano-attention kernel can DMA per-node slices
    (Mosaic sublane alignment); the XLA paths slice back to 36."""
    if pad_views and feature_bank.shape[1] == NUM_VIEWS:
        import jax.numpy as _jnp

        feature_bank = _jnp.pad(
            _jnp.asarray(feature_bank), ((0, 0), (0, 40 - NUM_VIEWS), (0, 0))
        )
    return EnvTables(
        offsets=jnp.asarray(graph_bank.offsets),
        adj_next=jnp.asarray(graph_bank.adj_next),
        adj_bearing=jnp.asarray(graph_bank.adj_bearing),
        adj_elevation=jnp.asarray(graph_bank.adj_elevation),
        adj_view=jnp.asarray(graph_bank.adj_view),
        adj_count=jnp.asarray(graph_bank.adj_count),
        adj_perm=jnp.asarray(graph_bank.adj_perm),
        next_hop=jnp.asarray(graph_bank.next_hop),
        dist=jnp.asarray(graph_bank.dist),
        features=jnp.asarray(feature_bank),
        loc_embed=jnp.asarray(build_loc_embedding_table()),
        adj_packed=jnp.asarray(_build_packed_actions(graph_bank)),
    )


def _build_packed_actions(graph_bank: GraphBank) -> np.ndarray:
    """(T * 12, MAX_DEGREE, 4) int32: per (node, heading), the
    heading-sorted action list [next, view, relh bits, rele bits] —
    adj_perm pre-applied and the canonical relative heading pre-rotated,
    so observe()/observe_lite()/step() need ONE row gather instead of a
    perm gather + four take_along_axis + trig per step.  Pad slots
    (perm == -1) duplicate slot 0's values; adj_count masks them exactly
    as before."""
    perm_safe = np.maximum(graph_bank.adj_perm, 0)  # (T, 12, MD)
    take = lambda a: np.take_along_axis(  # noqa: E731
        a[:, None, :], perm_safe, axis=2
    )
    nxt = take(graph_bank.adj_next).astype(np.int32)
    view = take(graph_bank.adj_view).astype(np.int32)
    bearing = take(graph_bank.adj_bearing).astype(np.float32)
    elev = take(graph_bank.adj_elevation).astype(np.float32)
    h = (np.arange(NUM_HEADINGS, dtype=np.float32) * ANGLE_INC)[None, :, None]
    relh = bearing - h
    relh = (relh - 2.0 * np.pi * np.round(relh / (2.0 * np.pi))).astype(
        np.float32
    )  # _canonical, f32 like the runtime path
    packed = np.stack(
        [nxt, view, relh.view(np.int32), elev.view(np.int32)], axis=-1
    )  # (T, 12, MD, 4)
    t, nh, md, _ = packed.shape
    return np.ascontiguousarray(packed.reshape(t * nh, md, 4))


def reset(scan, node, heading_step) -> EnvState:
    """Start episodes at (scan, node) looking at heading_step, elevation 0.

    Mirrors newEpisode with discretized angles (src/lib/MatterSim.cpp:379-435
    via tasks/R2R/env.py:606-619; initial elevation is always 0 ->
    elevation row 1).
    """
    scan = jnp.asarray(scan, jnp.int32)
    b = scan.shape[0]
    return EnvState(
        scan=scan,
        node=jnp.asarray(node, jnp.int32),
        heading=jnp.asarray(heading_step, jnp.int32),
        elev=jnp.ones((b,), jnp.int32),
        step=jnp.zeros((b,), jnp.int32),
        done=jnp.zeros((b,), bool),
    )


def _canonical(x):
    return x - 2.0 * jnp.pi * jnp.round(x / (2.0 * jnp.pi))


def _angle_embedding(rel_heading, rel_elevation):
    """(..., 128): 32x sin(rh), 32x cos(rh), 32x sin(re), 32x cos(re)
    (tasks/R2R/env.py:68-74)."""
    parts = [
        jnp.sin(rel_heading),
        jnp.cos(rel_heading),
        jnp.sin(rel_elevation),
        jnp.cos(rel_elevation),
    ]
    return jnp.concatenate(
        [jnp.repeat(p[..., None], 32, axis=-1) for p in parts], axis=-1
    )


def observe(tables: EnvTables, state: EnvState, goal) -> Observation:
    """Assemble the batched panorama observation: pure gathers, jit-able."""
    gnode = tables.offsets[state.scan] + state.node
    feat_dtype = tables.features.dtype

    # panorama features + viewIndex-relative location embedding
    # (the bank may be view-padded to 40 for the Pallas kernel)
    pano = tables.features[gnode][:, :NUM_VIEWS]  # (B, 36, D)
    view_index = state.heading + NUM_HEADINGS * state.elev
    loc = tables.loc_embed[view_index].astype(feat_dtype)  # (B, 36, 128)
    pano_feature = jnp.concatenate([pano, loc], axis=-1)

    # action list: per-heading sorted neighbor ordering — one packed-row
    # gather (see _build_packed_actions)
    row = tables.adj_packed[gnode * NUM_HEADINGS + state.heading]  # (B, MD, 4)
    nbr_next = row[..., 0]
    nbr_view = row[..., 1]
    rel_heading = jax.lax.bitcast_convert_type(row[..., 2], jnp.float32)
    nbr_elev = jax.lax.bitcast_convert_type(row[..., 3], jnp.float32)
    count = tables.adj_count[gnode]  # (B,)
    slot_valid = jnp.arange(MAX_DEGREE)[None, :] < count[:, None]
    # neighbor view feature (B, MAX_DEGREE, D) — gathered directly from the
    # bank (not sliced from `pano`) so the full panorama materialization is
    # dead-code-eliminated when pano_feature is unused (Pallas fused path)
    nbr_feat = tables.features[gnode[:, None], nbr_view]
    angle_embed = _angle_embedding(rel_heading, nbr_elev).astype(feat_dtype)
    nbr_action = jnp.concatenate([nbr_feat, angle_embed], axis=-1)
    nbr_action = jnp.where(slot_valid[..., None], nbr_action, 0.0)
    # slot 0 = stop (zeros), then the ordered neighbors
    stop = jnp.zeros_like(nbr_action[:, :1])
    action_embedding = jnp.concatenate([stop, nbr_action], axis=1)

    action_valid = jnp.concatenate(
        [jnp.ones_like(slot_valid[:, :1]), slot_valid], axis=1
    )

    # teacher: next hop toward goal mapped into the ordered action list
    goal = jnp.asarray(goal, jnp.int32)
    nh = tables.next_hop[state.scan, state.node, goal]  # (B,)
    match = (nbr_next == nh[:, None]) & slot_valid
    teacher_move = 1 + jnp.argmax(match, axis=1).astype(jnp.int32)
    at_goal = state.node == goal
    teacher = jnp.where(at_goal, 0, teacher_move)

    return Observation(
        pano_feature=pano_feature,
        action_embedding=action_embedding,
        action_valid=action_valid,
        teacher=teacher,
        view_index=view_index,
    )


class LiteObservation(NamedTuple):
    """Observation without any feature materialization: the integer/angle
    planes the fused Pallas decoder path needs (ops/pano_attention.
    pano_action_attention gathers the feature rows itself from its
    VMEM-resident block; models/attention.eltwise_prod_scoring_split folds
    the 128-d angle embedding into per-action scalars)."""

    nbr_view: jnp.ndarray  # (B, MAX_DEGREE) int32 permuted absViewIndex (-1 pad -> 0-clipped by the kernel)
    rel_heading: jnp.ndarray  # (B, MAX_DEGREE) f32 canonical
    rel_elevation: jnp.ndarray  # (B, MAX_DEGREE) f32
    action_valid: jnp.ndarray  # (B, NUM_ACTIONS) bool
    teacher: jnp.ndarray  # (B,) int32
    view_index: jnp.ndarray  # (B,) int32


def observe_lite(tables: EnvTables, state: EnvState, goal) -> LiteObservation:
    """observe() minus the (B, 36, D) panorama and (B, A, D+128) action
    embeddings: same action ordering / validity / teacher semantics
    (property: assembling embeddings from LiteObservation + the bank
    reproduces observe().action_embedding — tests/test_vecenv.py)."""
    gnode = tables.offsets[state.scan] + state.node
    view_index = state.heading + NUM_HEADINGS * state.elev

    # one contiguous-row gather for the whole heading-sorted action list
    # (next, view, rel_heading, rel_elevation pre-permuted/pre-rotated —
    # see _build_packed_actions)
    row = tables.adj_packed[gnode * NUM_HEADINGS + state.heading]  # (B, MD, 4)
    nbr_next = row[..., 0]
    nbr_view = row[..., 1]
    rel_heading = jax.lax.bitcast_convert_type(row[..., 2], jnp.float32)
    nbr_elev = jax.lax.bitcast_convert_type(row[..., 3], jnp.float32)
    count = tables.adj_count[gnode]
    slot_valid = jnp.arange(MAX_DEGREE)[None, :] < count[:, None]
    action_valid = jnp.concatenate(
        [jnp.ones_like(slot_valid[:, :1]), slot_valid], axis=1
    )

    goal = jnp.asarray(goal, jnp.int32)
    nh = tables.next_hop[state.scan, state.node, goal]
    match = (nbr_next == nh[:, None]) & slot_valid
    teacher_move = 1 + jnp.argmax(match, axis=1).astype(jnp.int32)
    teacher = jnp.where(state.node == goal, 0, teacher_move)

    return LiteObservation(
        nbr_view=nbr_view,
        rel_heading=rel_heading,
        rel_elevation=nbr_elev,
        action_valid=action_valid,
        teacher=teacher,
        view_index=view_index,
    )


def step(tables: EnvTables, state: EnvState, action) -> EnvState:
    """Execute one batched action. action 0 = stop (-> done); action a >= 1
    moves to the a-th ordered neighbor and snaps the camera to its view."""
    action = jnp.asarray(action, jnp.int32)
    gnode = tables.offsets[state.scan] + state.node

    move = (action > 0) & ~state.done
    slot_ix = jnp.clip(action - 1, 0, MAX_DEGREE - 1)
    row = tables.adj_packed[gnode * NUM_HEADINGS + state.heading]  # (B, MD, 4)
    sel = jnp.take_along_axis(row[..., :2], slot_ix[:, None, None], axis=1)[:, 0]
    nxt, view = sel[:, 0], sel[:, 1]

    new_node = jnp.where(move, nxt, state.node)
    new_heading = jnp.where(move, view % NUM_HEADINGS, state.heading)
    new_elev = jnp.where(move, view // NUM_HEADINGS, state.elev)
    stopped = (action == 0) & ~state.done
    return EnvState(
        scan=state.scan,
        node=new_node,
        heading=new_heading,
        elev=new_elev,
        step=state.step + jnp.where(state.done, 0, 1),
        done=state.done | stopped,
    )


def heading_elevation_rad(state: EnvState):
    """Continuous heading/elevation (radians) of the discretized state, as
    written into trajectory JSON (tasks/R2R/follower.py:194-195)."""
    return (
        state.heading.astype(jnp.float32) * ANGLE_INC,
        (state.elev.astype(jnp.float32) - 1.0) * ANGLE_INC,
    )
