"""State-factored search as ONE device program (fixed-capacity tables).

The host-orchestrated implementation (agents/state_factored.py) keeps the
reference's dict/heap bookkeeping on the host around a jitted decoder
step; over a high-latency (tunneled) backend those per-round dispatches
dominate wall-clock.  This module moves the ENTIRE search — dedup cache,
best-first selection, completion accounting, trajectory bookkeeping —
into a single ``lax.while_loop`` program, so an arbitrary number of
search rounds costs one dispatch.

Semantics mirror tasks/R2R/follower.py:720-980 (state_factored_search)
exactly, phase-shifted: each device round does
  select top-``successor_size`` unexpanded entries per instance
    (score-descending, drawn from BOTH the continue cache and the
    finished-hypothesis holding set, like the reference's
    ``to_consider``/heapq.nlargest)
  -> move selected finished entries into the completion table
     (key-deduplicated keeping the best score)
  -> batched decoder step on selected continue entries
  -> expand ALL valid actions; a successor is finished when it stops
     (action 0) or exhausts the episode length
  -> dedup successors by world-state key (best score wins), then insert:
     matching table entries are replaced when strictly beaten (re-opening
     expanded states, like the reference cache), new keys claim free
     slots.
The reference's while loop interleaves the same operations one phase
apart (it decodes the PREVIOUS round's selection), producing the same
sequence of (selection, expansion) pairs; parity is asserted against the
host implementation in tests/test_state_factored.py.

Fixed shapes: the dedup cache holds ``table_capacity`` world states per
instance.  The reference's dict grows without bound; here, if a round
needs more slots than are free, the weakest successors are dropped and
the per-instance ``overflow`` flag is raised (the wrapper warns — raise
``table_capacity`` for exact semantics).  Hypothesis trees are stored as
full per-slot trajectories (episodes are <= ``episode_len`` steps, so a
trajectory is at most ``episode_len + 1`` states — copying beats pointer
chasing on a vector machine).

The physically-traversable exploration order needs the selection
*history*; the program logs each round's continue-selections (their
selection-time trajectories) into a ``(max_rounds, B, S, ...)`` buffer,
and the host wrapper replays the reference's
``least_common_viewpoint_path`` walk over the log.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import ANGLE_INC, NUM_ACTIONS, NUM_HEADINGS
from ..env import vecenv
from ..models import follower as fmodels
from ..models.attention import NEG_INF
from .state_factored import Hyp, least_common_viewpoint_path, backchain

BAD = jnp.float32(NEG_INF)


class _SFState(NamedTuple):
    """while_loop carry: all (B, ...) device arrays."""

    # dedup cache + finished-holding set (namespace split by is_comp)
    node: jnp.ndarray  # (B, K) int32, world-state viewpoint
    heading: jnp.ndarray  # (B, K) int32
    elev: jnp.ndarray  # (B, K) int32
    in_use: jnp.ndarray  # (B, K) bool
    score: jnp.ndarray  # (B, K) f32
    expanded: jnp.ndarray  # (B, K) bool
    is_comp: jnp.ndarray  # (B, K) bool: finished hyp awaiting selection
    steps: jnp.ndarray  # (B, K) int32 action_count
    # trajectory (node, heading, elev) packed as (n*12 + h)*3 + e in ONE
    # int32 plane: one scatter per round instead of three, and ~3x less
    # tunnel transfer when the logs are fetched (unpacked on host)
    tpos: jnp.ndarray  # (B, K, T1) int32 packed trajectory states
    tact: jnp.ndarray  # (B, K, T1) int32 action leading to entry t (-1 root)
    hptr: jnp.ndarray  # (B, K) int32 flat index into the decode history:
    #   entry's decoder state = hist_h/c[:, ptr // S, ptr % S].  Successors
    #   of one parent share its post-decode (h1, c1), so states are stored
    #   once per (round, selection-slot) APPEND-ONLY instead of per table
    #   entry — (B, R+1, S, H) history vs (B, K, H) tables: 3x smaller at
    #   the production successor_size=1 config, and the per-round update is
    #   a dynamic_update_slice append instead of a (B, K, H) scatter.
    #   Slot 0 holds the encoder's (h0, c0) (the root entry's pointer).
    hist_h: jnp.ndarray  # (B, R+1, S, H) f32
    hist_c: jnp.ndarray  # (B, R+1, S, H) f32
    tascore: jnp.ndarray  # (B, K, T1) f32 log-prob of that action
    # completion table (key-deduplicated)
    comp_in_use: jnp.ndarray  # (B, CK) bool
    comp_score: jnp.ndarray  # (B, CK) f32
    comp_node: jnp.ndarray  # (B, CK) int32
    comp_heading: jnp.ndarray  # (B, CK) int32
    comp_elev: jnp.ndarray  # (B, CK) int32
    comp_steps: jnp.ndarray  # (B, CK) int32
    comp_tpos: jnp.ndarray  # (B, CK, T1) int32 packed trajectory states
    comp_tact: jnp.ndarray  # (B, CK, T1) int32
    comp_tascore: jnp.ndarray  # (B, CK, T1) f32
    # continue-selection log for traversal reconstruction
    sel_valid: jnp.ndarray  # (R, B, S) bool
    sel_steps: jnp.ndarray  # (R, B, S) int32
    sel_pos: jnp.ndarray  # (R, B, S, T1) int32 packed trajectory states
    round: jnp.ndarray  # () int32
    lane_rounds: jnp.ndarray  # (B,) int32: rounds in which this lane
    #   selected anything (its personal search length; stops growing once
    #   the lane is done while stragglers keep the chunk alive)
    overflow: jnp.ndarray  # (B,) bool
    peak_in_use: jnp.ndarray  # (B,) int32 running max of dedup-table
    #   occupancy — the data that sizes ``table_capacity`` (see
    #   scripts/probe_sf_capacity.py and the capacity note in
    #   state_factored_search_fused)
    # did the previous round select any continue-entry anywhere?  The
    # reference breaks its loop when all beams are empty even if some
    # instances are below completion_size (follower.py: `if not any
    # (beams): break`) — an instance whose every selection is a finished
    # hypothesis stops making progress once every OTHER instance stops.
    prev_cont: jnp.ndarray  # () bool


def _pack_pos(n, h, e):
    """(node, heading, elev) -> one int32 (works on jnp and np)."""
    return (n * NUM_HEADINGS + h) * 3 + e


def _unpack_pos(p):
    """Inverse of _pack_pos."""
    return p // (3 * NUM_HEADINGS), (p // 3) % NUM_HEADINGS, p % 3


def _masked_set(arr, bi, idx, values, valid):
    """Scatter rows with a validity mask: invalid rows write out of bounds
    and are dropped."""
    safe = jnp.where(valid, idx, arr.shape[1])
    return arr.at[bi, safe].set(values, mode="drop")


@partial(
    jax.jit,
    static_argnames=(
        "completion_size", "successor_size", "episode_len", "first_n_ws_key",
        "max_rounds", "table_capacity", "use_glove",
    ),
)
def _search_program(
    params,
    tables: vecenv.EnvTables,
    seq,
    seq_length,
    seq_mask,
    scan,
    start_node,
    start_heading,
    *,
    completion_size: int,
    successor_size: int,
    episode_len: int,
    first_n_ws_key: int,
    max_rounds: int,
    table_capacity: int,
    use_glove: bool,
):
    ctx, h0, c0 = fmodels.encoder_apply(
        params["encoder"], seq, seq_length, deterministic=True,
        use_glove=use_glove,
    )
    b = ctx.shape[0]
    hdim = h0.shape[-1]
    K = table_capacity
    S = successor_size
    A = NUM_ACTIONS
    T1 = episode_len + 1
    CK = completion_size + successor_size
    R = max_rounds
    bi = jnp.arange(b)[:, None]

    def pack_key(n, h, e, is_comp):
        """World-state key under first_n_ws_key (4 = full state, 3 = drop
        elevation, 2 = viewpoint only; reference follower.py:893) packed
        with the is_comp namespace bit into ONE int32, so the O(B*SA*K)
        dedup matrices are a single integer compare instead of 3-4 ANDed
        equality planes.  Range: node < Nmax(~345) x 12 x 3 x 2 << 2^31."""
        k = n
        if first_n_ws_key >= 3:
            k = k * NUM_HEADINGS + h
        if first_n_ws_key >= 4:
            k = k * 3 + e
        return k * 2 + is_comp.astype(k.dtype)

    zK = lambda dt: jnp.zeros((b, K), dt)
    zKT = lambda dt: jnp.zeros((b, K, T1), dt)
    zC = lambda dt: jnp.zeros((b, CK), dt)
    zCT = lambda dt: jnp.zeros((b, CK, T1), dt)

    st = _SFState(
        node=zK(jnp.int32).at[:, 0].set(start_node),
        heading=zK(jnp.int32).at[:, 0].set(start_heading),
        elev=zK(jnp.int32).at[:, 0].set(1),
        in_use=zK(bool).at[:, 0].set(True),
        score=jnp.full((b, K), BAD).at[:, 0].set(0.0),
        expanded=zK(bool),
        is_comp=zK(bool),
        steps=zK(jnp.int32),
        tpos=zKT(jnp.int32).at[:, 0, 0].set(
            _pack_pos(start_node, start_heading, 1)
        ),
        tact=zKT(jnp.int32).at[:, 0, 0].set(-1),
        tascore=zKT(jnp.float32),
        hptr=zK(jnp.int32),
        hist_h=jnp.zeros((b, R + 1, S, hdim)).at[:, 0].set(
            h0[:, None, :].astype(jnp.float32)
        ),
        hist_c=jnp.zeros((b, R + 1, S, hdim)).at[:, 0].set(
            c0[:, None, :].astype(jnp.float32)
        ),
        comp_in_use=zC(bool),
        comp_score=jnp.full((b, CK), BAD),
        comp_node=zC(jnp.int32),
        comp_heading=zC(jnp.int32),
        comp_elev=zC(jnp.int32),
        comp_steps=zC(jnp.int32),
        comp_tpos=zCT(jnp.int32),
        comp_tact=zCT(jnp.int32),
        comp_tascore=zCT(jnp.float32),
        sel_valid=jnp.zeros((R, b, S), bool),
        sel_steps=jnp.zeros((R, b, S), jnp.int32),
        sel_pos=jnp.zeros((R, b, S, T1), jnp.int32),
        round=jnp.int32(0),
        lane_rounds=jnp.zeros((b,), jnp.int32),
        overflow=jnp.zeros((b,), bool),
        peak_in_use=jnp.ones((b,), jnp.int32),
        prev_cont=jnp.bool_(True),
    )

    def done_mask(st):
        return st.comp_in_use.sum(axis=1) >= completion_size

    def cond(st):
        eligible = st.in_use & ~st.expanded & ~done_mask(st)[:, None]
        return (
            (st.round < max_rounds)
            & (~done_mask(st)).any()
            & eligible.any()
            & st.prev_cont
        )

    def body(st):
        done = done_mask(st)
        # ---- selection: top-S unexpanded per instance, score-descending
        eligible = st.in_use & ~st.expanded & ~done[:, None]
        esc = jnp.where(eligible, st.score, BAD)
        sel_score, sel_idx = jax.lax.top_k(esc, S)  # (B, S)
        sel_ok = sel_score > BAD / 2
        sel_iscomp = st.is_comp[bi, sel_idx] & sel_ok
        sel_cont = sel_ok & ~sel_iscomp

        expanded = _masked_set(
            st.expanded, bi, sel_idx, jnp.ones((b, S), bool), sel_ok
        )

        # ---- move selected finished entries into the completion table
        cn = st.node[bi, sel_idx]
        ch = st.heading[bi, sel_idx]
        ce = st.elev[bi, sel_idx]
        sel_key = pack_key(cn, ch, ce, jnp.ones((), jnp.int32))
        comp_key = pack_key(
            st.comp_node, st.comp_heading, st.comp_elev,
            jnp.ones((), jnp.int32),
        )
        match_c = (
            (sel_key[:, :, None] == comp_key[:, None, :])
            & st.comp_in_use[:, None, :]
        )  # (B, S, CK)
        has_match = match_c.any(axis=2) & sel_iscomp
        match_idx = jnp.argmax(match_c, axis=2)  # (B, S)
        beats = sel_score > st.comp_score[bi, match_idx]
        upd = has_match & beats
        need_alloc = sel_iscomp & ~has_match
        free_order = jnp.argsort(st.comp_in_use, axis=1, stable=True)  # free first
        rank = jnp.cumsum(need_alloc, axis=1) - 1
        free_count = (~st.comp_in_use).sum(axis=1, keepdims=True)
        alloc_ok = need_alloc & (rank < free_count)
        alloc_idx = free_order[bi, jnp.clip(rank, 0, CK - 1)]
        # one scatter for updates, one for allocations
        tgt = jnp.where(upd, match_idx, alloc_idx)
        write = upd | alloc_ok
        comp_in_use = _masked_set(st.comp_in_use, bi, tgt, jnp.ones((b, S), bool), write)
        comp_score = _masked_set(st.comp_score, bi, tgt, sel_score, write)
        comp_node = _masked_set(st.comp_node, bi, tgt, cn, write)
        comp_heading = _masked_set(st.comp_heading, bi, tgt, ch, write)
        comp_elev = _masked_set(st.comp_elev, bi, tgt, ce, write)
        comp_steps = _masked_set(st.comp_steps, bi, tgt, st.steps[bi, sel_idx], write)
        comp_tpos = _masked_set(st.comp_tpos, bi, tgt, st.tpos[bi, sel_idx], write)
        comp_tact = _masked_set(st.comp_tact, bi, tgt, st.tact[bi, sel_idx], write)
        comp_tascore = _masked_set(
            st.comp_tascore, bi, tgt, st.tascore[bi, sel_idx], write
        )

        # ---- log continue-selections (selection-time trajectories)
        r = st.round
        sel_valid = st.sel_valid.at[r].set(sel_cont)
        sel_steps_log = st.sel_steps.at[r].set(st.steps[bi, sel_idx])
        sel_pos = st.sel_pos.at[r].set(st.tpos[bi, sel_idx])

        # ---- decoder step on the continue-selections
        sn = st.node[bi, sel_idx]
        sh = st.heading[bi, sel_idx]
        se = st.elev[bi, sel_idx]
        ssteps = st.steps[bi, sel_idx]
        flat = lambda x: x.reshape((b * S,) + x.shape[2:])
        scan_f = jnp.broadcast_to(scan[:, None], (b, S)).reshape(-1)
        state = vecenv.EnvState(
            scan=scan_f, node=flat(sn), heading=flat(sh), elev=flat(se),
            step=jnp.zeros((b * S,), jnp.int32), done=jnp.zeros((b * S,), bool),
        )
        obs = vecenv.observe(tables, state, flat(sn))  # goal unused
        # previous-action embedding from the parent state + taken action
        p_t = jnp.maximum(ssteps - 1, 0)
        ppos = jnp.take_along_axis(
            st.tpos[bi, sel_idx], p_t[..., None], axis=2
        )[..., 0]
        pn, ph, pe = _unpack_pos(ppos)
        act = jnp.take_along_axis(st.tact[bi, sel_idx], ssteps[..., None], axis=2)[..., 0]
        parent_state = vecenv.EnvState(
            scan=scan_f, node=flat(pn), heading=flat(ph), elev=flat(pe),
            step=jnp.zeros((b * S,), jnp.int32), done=jnp.zeros((b * S,), bool),
        )
        parent_obs = vecenv.observe(tables, parent_state, flat(pn))
        act_f = flat(act)
        u = jnp.take_along_axis(
            parent_obs.action_embedding,
            jnp.maximum(act_f, 0)[:, None, None],
            axis=1,
        )[:, 0]
        u = jnp.where((act_f >= 0)[:, None], u, 0.0)
        ptr = st.hptr[bi, sel_idx]  # (B, S) flat history index
        hist_flat_h = st.hist_h.reshape(b, (R + 1) * S, hdim)
        hist_flat_c = st.hist_c.reshape(b, (R + 1) * S, hdim)
        hh = flat(hist_flat_h[bi, ptr]).astype(ctx.dtype)
        cc = flat(hist_flat_c[bi, ptr]).astype(ctx.dtype)
        ctx_f = ctx[jnp.broadcast_to(jnp.arange(b)[:, None], (b, S)).reshape(-1)]
        mask_f = seq_mask[jnp.broadcast_to(jnp.arange(b)[:, None], (b, S)).reshape(-1)]
        h1, c1, _, logit, _ = fmodels.decoder_step(
            params["decoder"], u, obs.action_embedding, obs.pano_feature,
            hh, cc, ctx_f, mask_f, deterministic=True,
        )
        logit = jnp.where(obs.action_valid, logit, BAD)
        log_probs = jax.nn.log_softmax(logit, axis=-1)  # (B*S, A)

        # ---- successors: every valid action of every continue-selection
        lp = log_probs.reshape(b, S, A)
        av = obs.action_valid.reshape(b, S, A) & sel_cont[..., None]
        gnode = tables.offsets[scan][:, None] + sn  # (B, S) global
        a_ix = jnp.arange(A)[None, None, :]
        slot = jnp.take_along_axis(
            tables.adj_perm[gnode], sh[..., None, None], axis=2
        )[:, :, 0, :]  # (B, S, MAX_DEGREE) per-heading ordering
        slot_a = jnp.take_along_axis(
            slot, jnp.clip(a_ix - 1, 0, A - 2), axis=2
        )  # (B, S, A)
        slot_a = jnp.maximum(slot_a, 0)
        view_a = jnp.take_along_axis(tables.adj_view[gnode], slot_a, axis=2)
        next_a = jnp.take_along_axis(tables.adj_next[gnode], slot_a, axis=2)
        is_stop = a_ix == 0
        s_node = jnp.where(is_stop, sn[..., None], next_a)
        s_head = jnp.where(is_stop, sh[..., None], view_a % NUM_HEADINGS)
        s_elev = jnp.where(is_stop, se[..., None], view_a // NUM_HEADINGS)
        s_steps = jnp.broadcast_to(ssteps[..., None] + 1, (b, S, A))
        s_score = jnp.where(av, sel_score[..., None] + lp, BAD)
        s_iscomp = is_stop | (s_steps >= episode_len)
        SA = S * A
        fl = lambda x: x.reshape(b, SA)
        s_node, s_head, s_elev = fl(s_node), fl(s_head), fl(s_elev)
        s_steps, s_score = fl(s_steps), fl(s_score)
        s_iscomp = jnp.broadcast_to(s_iscomp, (b, S, A)).reshape(b, SA)
        s_act = jnp.broadcast_to(a_ix, (b, S, A)).reshape(b, SA).astype(jnp.int32)
        s_lp = fl(jnp.where(av, lp, 0.0))
        s_alive = fl(av) & (s_score > BAD / 2)
        parent_s = jnp.arange(SA) // A  # selection row of each successor

        # trajectories: parent trajectory + one appended state
        pt_pos = st.tpos[bi, sel_idx][:, parent_s]  # (B, SA, T1)
        pt_a = st.tact[bi, sel_idx][:, parent_s]
        pt_as = st.tascore[bi, sel_idx][:, parent_s]
        t_ix = jnp.arange(T1)[None, None, :]
        at_t = t_ix == jnp.clip(s_steps, 0, T1 - 1)[..., None]
        s_pos_packed = _pack_pos(s_node, s_head, s_elev)
        s_tpos = jnp.where(at_t, s_pos_packed[..., None], pt_pos)
        s_tact = jnp.where(at_t, s_act[..., None], pt_a)
        s_tascore = jnp.where(at_t, s_lp[..., None], pt_as)
        # append this round's decode states once; successors point at them
        hist_h = jax.lax.dynamic_update_slice(
            st.hist_h,
            h1.reshape(b, 1, S, hdim).astype(jnp.float32),
            (0, st.round + 1, 0, 0),
        )
        hist_c = jax.lax.dynamic_update_slice(
            st.hist_c,
            c1.reshape(b, 1, S, hdim).astype(jnp.float32),
            (0, st.round + 1, 0, 0),
        )
        s_ptr = jnp.broadcast_to(
            (st.round + 1) * S + (jnp.arange(SA) // A) % S, (b, SA)
        ).astype(jnp.int32)

        # ---- dedup successors among themselves (same key+namespace):
        # keep the best score; ties keep the lowest index (the reference
        # iterates successors score-descending and keeps the first)
        s_key = pack_key(s_node, s_head, s_elev, s_iscomp)  # (B, SA)
        eqm = s_key[:, :, None] == s_key[:, None, :]
        j_ix = jnp.arange(SA)
        better = (s_score[:, None, :] > s_score[:, :, None]) | (
            (s_score[:, None, :] == s_score[:, :, None])
            & (j_ix[None, None, :] < j_ix[None, :, None])
        )
        dominated = (eqm & better & s_alive[:, None, :]).any(axis=2)
        s_alive = s_alive & ~dominated

        # ---- match against the table (same key+namespace)
        t_key = pack_key(st.node, st.heading, st.elev, st.is_comp)
        m = (
            (s_key[:, :, None] == t_key[:, None, :])
            & st.in_use[:, None, :]
        )  # (B, SA, K)
        has_m = m.any(axis=2) & s_alive
        m_idx = jnp.argmax(m, axis=2)
        replace = has_m & (s_score > st.score[bi, m_idx])  # strict (:452)
        need_alloc = s_alive & ~has_m
        free_order_k = jnp.argsort(st.in_use, axis=1, stable=True)
        rank_k = jnp.cumsum(need_alloc, axis=1) - 1
        free_count_k = (~st.in_use).sum(axis=1, keepdims=True)
        alloc_ok_k = need_alloc & (rank_k < free_count_k)
        overflow = st.overflow | (need_alloc & ~alloc_ok_k).any(axis=1)
        alloc_idx_k = free_order_k[bi, jnp.clip(rank_k, 0, K - 1)]
        tgt_k = jnp.where(replace, m_idx, alloc_idx_k)
        write_k = replace | alloc_ok_k

        one = jnp.ones((b, SA), bool)
        in_use = _masked_set(st.in_use, bi, tgt_k, one, write_k)
        node = _masked_set(st.node, bi, tgt_k, s_node, write_k)
        heading = _masked_set(st.heading, bi, tgt_k, s_head, write_k)
        elev = _masked_set(st.elev, bi, tgt_k, s_elev, write_k)
        score = _masked_set(st.score, bi, tgt_k, s_score, write_k)
        expanded = _masked_set(expanded, bi, tgt_k, jnp.zeros((b, SA), bool), write_k)
        is_comp = _masked_set(st.is_comp, bi, tgt_k, s_iscomp, write_k)
        steps = _masked_set(st.steps, bi, tgt_k, s_steps, write_k)
        tpos = _masked_set(st.tpos, bi, tgt_k, s_tpos, write_k)
        tact = _masked_set(st.tact, bi, tgt_k, s_tact, write_k)
        tascore = _masked_set(st.tascore, bi, tgt_k, s_tascore, write_k)
        hptr = _masked_set(st.hptr, bi, tgt_k, s_ptr, write_k)

        return _SFState(
            node=node, heading=heading, elev=elev, in_use=in_use, score=score,
            expanded=expanded, is_comp=is_comp, steps=steps,
            tpos=tpos, tact=tact, tascore=tascore,
            hptr=hptr, hist_h=hist_h, hist_c=hist_c,
            comp_in_use=comp_in_use, comp_score=comp_score,
            comp_node=comp_node, comp_heading=comp_heading,
            comp_elev=comp_elev, comp_steps=comp_steps,
            comp_tpos=comp_tpos, comp_tact=comp_tact,
            comp_tascore=comp_tascore,
            sel_valid=sel_valid, sel_steps=sel_steps_log,
            sel_pos=sel_pos,
            round=st.round + 1,
            lane_rounds=st.lane_rounds + sel_ok.any(axis=1),
            overflow=overflow,
            peak_in_use=jnp.maximum(
                st.peak_in_use, in_use.sum(axis=1).astype(jnp.int32)
            ),
            prev_cont=sel_cont.any(),
        )

    return jax.lax.while_loop(cond, body, st)


def _hyp_chain(tn, th, te, ta, tas, steps, total_score=None):
    """Rebuild a root-to-leaf Hyp linked list from trajectory arrays."""
    hyp = None
    score = 0.0
    for t in range(steps + 1):
        score += float(tas[t])
        hyp = Hyp(
            parent=hyp,
            node=int(tn[t]), heading=int(th[t]), elev=int(te[t]),
            action=int(ta[t]), action_count=t,
            score=score if total_score is None or t < steps else float(total_score),
            slot=-1, action_score=float(tas[t]),
        )
    return hyp


_ARRAY_KEYS = (
    "scan", "start_node", "goal_node", "heading",
    "seq", "seq_mask", "seq_length",
)


def _index_batch(batch, idx):
    """Take rows ``idx`` (list of ints) from a host batch dict."""
    out = {}
    for k, v in batch.items():
        if k in _ARRAY_KEYS:
            out[k] = np.asarray(v)[np.asarray(idx)]
        elif isinstance(v, (list, tuple)):
            out[k] = [v[i] for i in idx]
        else:
            out[k] = v
    return out


def state_factored_search_fused(
    params,
    tables: vecenv.EnvTables,
    batch,
    graph_bank,
    *,
    completion_size: int = 10,
    successor_size: int = 10,
    episode_len: int = 10,
    first_n_ws_key: int = 4,
    max_rounds: int | None = None,
    table_capacity: int = 1024,
    use_glove: bool = True,
    max_device_batch: int | None = 64,
    first_pass_rounds: int | str | None = 0,
    mesh=None,
):
    """Drop-in for state_factored.state_factored_search, one device call.

    Returns (candidates, completed_lists, traversed) in the host format
    (Hyp objects rebuilt from the device trajectory tables, so
    ``physical_trajectory`` works unchanged).

    ``max_rounds`` None scales with the completion target:
    max(100, 8 * completion_size) — with successor_size=1 each round
    yields at most one completion per instance, so beam 40 needs well
    over 100 rounds (the reference loops uncapped; the cap only sizes
    the fixed selection-log buffer and the loop exits early when done).

    ``table_capacity`` (default 1024) is sized from measurement: the
    per-lane peak dedup-table occupancy over 128 sub_val_unseen
    instructions at the production configs is beam 10: mean 130 / p90
    211 / max 339, beam 40: mean 203 / p90 328 / max 415
    (runs/probe_sf_capacity_r4.log, scripts/probe_sf_capacity.py —
    deterministic, platform-independent), so 1024 carries ~2.5x headroom over
    the observed beam-40 maximum.  If a run ever exceeds it, the
    ``overflow`` flag warns (tested: tests/test_state_factored.py::
    test_fused_overflow_and_truncation_warn) and every [fused_search]
    stats line reports ``table peak ... /capacity`` so undersizing is
    visible before it bites.

    ``max_device_batch``: bounds the per-dispatch instance count.  The
    round-2 layout (h/c carried per table entry) made XLA compile time
    blow up superlinearly on TPU v5e (10 s at B=16, 130 s at B=24,
    backend-killing at B=32); with the packed int32 world-state keys and
    the append-only decoder-state history the compile is flat again
    (measured v5e, cap=1024: 3.3 s at B=8, 3.9 s at B=16, 5.3 s at
    B=24, 6.1 s at B=32, 18.0 s at B=64 — runs/probe_sf_compile_r3*.log),
    so the default chunk is 64.  Batches larger than this are dispatched
    as fixed-shape chunks — every chunk padded to exactly
    ``max_device_batch`` (repeating row 0), so the program compiles ONCE
    and is reused; padded rows are dropped on the host.  None disables
    chunking.

    ``first_pass_rounds``: straggler repacking for chunked batches.  A
    single SIMD dispatch runs EVERY lane for the chunk's max round count,
    so one slow instruction taxes the whole chunk with extra rounds.
    With repacking, every chunk first runs with this smaller round
    budget; lanes still unfinished at the budget are collected ACROSS
    chunks, repacked densely, and re-run from scratch with the full
    ``max_rounds`` budget.  Each lane's search is independent of its
    chunk-mates (all per-lane ops are masked), so results are identical
    — only the global all-beams-empty early-stop (see ``prev_cont``) is
    chunk-composition-dependent, exactly as the reference's is
    minibatch-dependent.  "auto" scales the budget with the completion
    target (see ``_resolve_first_pass``); 0/None (the default) disables
    repacking.

    Default OFF because measured v5e numbers say extra rounds are nearly
    free on-device while repacking pays extra dispatches: beam-40
    lane-rounds are tight (mean 111, chunk-64 max ~160), a 163-round
    B=64 dispatch EXECUTES in 0.2 s (vs ~1-3 s tunnel fetch and 6-18 s
    one-time compile), and the 128-instr A/B is 90 ms/instr one-pass vs
    157 ms/instr repacked (runs/probe_sf_repack_r3.log).  Repacking is
    for exec-bound backends (e.g. CPU, where per-round cost dominates)
    or heavily truncation-bound configs where chunk-max rounds >>
    lane-median.

    ``mesh``: a jax.sharding.Mesh with a "data" axis — every dispatch's
    per-lane arrays are placed sharded over it, so the search runs
    data-parallel across chips (lanes are independent; the only global
    reductions — the while cond and ``prev_cont`` — psum over the mesh,
    placed by GSPMD).  The caller should pass params/tables replicated
    on the same mesh (parallel.mesh.replicate); sharded-vs-single parity
    is tested on the 8-device virtual mesh (tests/test_state_factored.py
    ::test_fused_search_data_parallel_mesh).  Batches indivisible by the
    mesh size are padded (repeating lane 0) and sliced back.
    """
    if max_rounds is None:
        max_rounds = max(100, 8 * completion_size)
    b_total = len(np.asarray(batch["scan"]))
    if mesh is not None:
        n_mesh = int(mesh.devices.size)
        if max_device_batch is not None:
            assert max_device_batch % n_mesh == 0, (
                f"max_device_batch={max_device_batch} must divide over the "
                f"{n_mesh}-device mesh"
            )
        if b_total % n_mesh and (
            max_device_batch is None or b_total <= max_device_batch
        ):
            # pad the single dispatch up to the mesh size (repeating lane
            # 0; lanes are independent, padded results dropped)
            idx = list(range(b_total)) + [0] * ((-b_total) % n_mesh)
            c, comp, trav = state_factored_search_fused(
                params, tables, _index_batch(batch, idx), graph_bank,
                completion_size=completion_size,
                successor_size=successor_size, episode_len=episode_len,
                first_n_ws_key=first_n_ws_key, max_rounds=max_rounds,
                table_capacity=table_capacity, use_glove=use_glove,
                max_device_batch=max_device_batch,
                first_pass_rounds=first_pass_rounds, mesh=mesh,
            )
            return c[:b_total], comp[:b_total], trav[:b_total]
    if max_device_batch is not None and b_total > max_device_batch:
        r1 = _resolve_first_pass(
            first_pass_rounds, completion_size, episode_len, max_rounds
        )
        all_c = [None] * b_total
        all_comp = [None] * b_total
        all_trav = [None] * b_total
        rerun_idx = []
        for c0 in range(0, b_total, max_device_batch):
            c1 = min(c0 + max_device_batch, b_total)
            pad = max_device_batch - (c1 - c0)
            chunk = {}
            for k, v in batch.items():
                if k in _ARRAY_KEYS:
                    v = np.asarray(v)
                    part = v[c0:c1]
                    if pad:
                        part = np.concatenate(
                            [part, np.repeat(part[:1], pad, axis=0)], axis=0
                        )
                    chunk[k] = part
                elif isinstance(v, (list, tuple)):
                    part = list(v[c0:c1])
                    chunk[k] = part + [part[0]] * pad
                else:
                    chunk[k] = v
            cands, comps, travs, lane_rounds, comp_counts, rounds_used, _ = (
                _run_single(
                    params, tables, chunk, graph_bank,
                    completion_size=completion_size,
                    successor_size=successor_size,
                    episode_len=episode_len, first_n_ws_key=first_n_ws_key,
                    max_rounds=r1, table_capacity=table_capacity,
                    use_glove=use_glove,
                    warn_truncation=(r1 >= max_rounds), mesh=mesh,
                )
            )
            for j in range(c1 - c0):
                gi = c0 + j
                unfinished = (
                    r1 < max_rounds
                    and rounds_used >= r1
                    and lane_rounds[j] >= r1
                    and comp_counts[j] < completion_size
                )
                if unfinished:
                    rerun_idx.append(gi)
                else:
                    all_c[gi] = cands[j]
                    all_comp[gi] = comps[j]
                    all_trav[gi] = travs[j]
        if rerun_idx:
            sys.stderr.write(
                f"[fused_search] repacking {len(rerun_idx)}/{b_total} "
                f"stragglers past the {r1}-round first pass\n"
            )
            # pad the rerun to a multiple of max_device_batch (repeating
            # lane 0) so the full-budget program compiles for exactly one
            # shape and is reused — an unpadded straggler batch would
            # compile a fresh XLA program per distinct straggler count
            # (6-18 s each on v5e)
            pad_n = (-len(rerun_idx)) % max_device_batch
            sub = _index_batch(batch, rerun_idx + [rerun_idx[0]] * pad_n)
            sc, scomp, strav = state_factored_search_fused(
                params, tables, sub, graph_bank,
                completion_size=completion_size,
                successor_size=successor_size,
                episode_len=episode_len, first_n_ws_key=first_n_ws_key,
                max_rounds=max_rounds, table_capacity=table_capacity,
                use_glove=use_glove, max_device_batch=max_device_batch,
                first_pass_rounds=0, mesh=mesh,
            )
            for j, gi in enumerate(rerun_idx):
                all_c[gi] = sc[j]
                all_comp[gi] = scomp[j]
                all_trav[gi] = strav[j]
        return all_c, all_comp, all_trav

    cands, comps, travs, _, _, _, _ = _run_single(
        params, tables, batch, graph_bank,
        completion_size=completion_size, successor_size=successor_size,
        episode_len=episode_len, first_n_ws_key=first_n_ws_key,
        max_rounds=max_rounds, table_capacity=table_capacity,
        use_glove=use_glove, mesh=mesh,
    )
    return cands, comps, travs


def _resolve_first_pass(first_pass_rounds, completion_size, episode_len, max_rounds):
    """Resolve the pass-1 round budget; <= 0 / None disables repacking
    (pass 1 then runs the full budget and nothing is ever re-run)."""
    if first_pass_rounds == "auto":
        # with successor_size=1 a lane needs >= completion_size selecting
        # rounds just to fill its completion table; measured lane-round
        # distributions (sub_val_unseen, zero features, trained follower
        # — runs/README.md round-3 repack notes) put p85-p93 near
        # 3.5*completion + episode slack: beam 10 mean 46 p90 66 max 100,
        # beam 40 mean 111 p90 143 max 172
        return min(
            max_rounds,
            max(64, (7 * completion_size) // 2 + episode_len),
        )
    if not first_pass_rounds or int(first_pass_rounds) <= 0:
        return max_rounds
    return min(max_rounds, int(first_pass_rounds))


@partial(jax.jit, static_argnums=(1,))
def _pack_outputs(st, r_pad):
    """Flatten every host-bound output table into ONE int32 buffer.

    The tunneled backend charges a round-trip per fetched buffer (3 ms
    floor, hundreds of ms when the tunnel is loaded), and the result
    assembly needs ~12 arrays — measured 2.7x slower fetched separately
    than as one packed transfer of the same bytes.  f32 planes travel
    bitcast to int32 (exact), bools widen to int32 (the packed buffer is
    ~3 MB at beam-40/B=64; bit-packing the two bool planes would save
    <5% for extra unpack cost).  Host side: `_unpack_outputs`.
    """
    def as_i32(x):
        if x.dtype == jnp.float32:
            return jax.lax.bitcast_convert_type(x, jnp.int32).ravel()
        return x.astype(jnp.int32).ravel()

    parts = [
        st.comp_in_use, st.comp_score, st.comp_steps,
        st.comp_tpos, st.comp_tact, st.comp_tascore,
        st.sel_valid[:r_pad], st.sel_steps[:r_pad], st.sel_pos[:r_pad],
        st.overflow, st.lane_rounds, st.peak_in_use,
    ]
    return jnp.concatenate([as_i32(p) for p in parts])


def _unpack_outputs(buf, b, ck, t1, s, r_pad):
    """Invert `_pack_outputs` on host: np views, no copies beyond split."""
    shapes = [
        ((b, ck), bool), ((b, ck), np.float32), ((b, ck), np.int32),
        ((b, ck, t1), np.int32), ((b, ck, t1), np.int32),
        ((b, ck, t1), np.float32),
        ((r_pad, b, s), bool), ((r_pad, b, s), np.int32),
        ((r_pad, b, s, t1), np.int32),
        ((b,), bool), ((b,), np.int32), ((b,), np.int32),
    ]
    out, off = [], 0
    for shape, dt in shapes:
        n = int(np.prod(shape))
        chunk = buf[off:off + n]
        off += n
        if dt is bool:
            out.append((chunk != 0).reshape(shape))
        elif dt is np.float32:
            out.append(chunk.view(np.float32).reshape(shape))
        else:
            out.append(chunk.reshape(shape))
    assert off == buf.size
    return out


def _run_single(
    params,
    tables: vecenv.EnvTables,
    batch,
    graph_bank,
    *,
    completion_size: int,
    successor_size: int,
    episode_len: int,
    first_n_ws_key: int,
    max_rounds: int,
    table_capacity: int,
    use_glove: bool,
    warn_truncation: bool = True,
    mesh=None,
):
    """One device dispatch + host result assembly for one (padded) chunk.

    Returns (candidates, completed_lists, traversed, lane_rounds,
    comp_counts, rounds_used, peak_in_use); lane_rounds/comp_counts/
    rounds_used drive straggler repacking, peak_in_use is the measured
    per-lane dedup-table occupancy maximum (sizes table_capacity).

    ``mesh``: place the per-lane inputs sharded over the mesh's "data"
    axis so the dispatch runs data-parallel (GSPMD propagates the
    shardings through the while_loop; see state_factored_search_fused).
    """
    if mesh is None:
        place = jnp.asarray
    else:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        from ..parallel.mesh import DATA_AXIS

        _sh = NamedSharding(mesh, _P(DATA_AXIS))
        place = lambda x: jax.device_put(np.asarray(x), _sh)  # noqa: E731
    _t0 = time.perf_counter()
    st = _search_program(
        params, tables,
        place(batch["seq"]), place(batch["seq_length"]),
        place(batch["seq_mask"]),
        place(batch["scan"]), place(batch["start_node"]),
        place(batch["heading"]),
        completion_size=completion_size, successor_size=successor_size,
        episode_len=episode_len, first_n_ws_key=first_n_ws_key,
        max_rounds=max_rounds, table_capacity=table_capacity,
        use_glove=use_glove,
    )
    _t1 = time.perf_counter()
    # bulk host transfer of the small output tables.  Trajectories travel
    # packed (one int32 plane instead of three), the selection log is
    # sliced to the rounds actually used, padded to a multiple of 64 so at
    # most 5 pack programs ever compile, and EVERYTHING crosses the wire
    # as ONE int32 buffer (_pack_outputs) — transfer round-trips are the
    # dominant per-dispatch cost over the tunneled backend (measured 2.7x
    # vs per-array fetches, runs/README.md round 5).
    rounds = int(st.round)
    r_pad = min(max_rounds, -(-max(rounds, 1) // 64) * 64)
    buf = np.asarray(_pack_outputs(st, r_pad))
    b, ck, t1 = st.comp_tpos.shape
    (comp_in_use, comp_score, comp_steps, comp_tpos, comp_ta, comp_tas,
     sel_valid, sel_steps, sel_pos, overflow, lane_rounds, peak_in_use,
     ) = _unpack_outputs(buf, b, ck, t1, st.sel_valid.shape[2], r_pad)
    comp_tn, comp_th, comp_te = _unpack_pos(comp_tpos)
    sel_tn, sel_th, sel_te = _unpack_pos(sel_pos)
    sys.stderr.write(
        f"[fused_search]   B={b} dispatch {_t1 - _t0:.1f}s  fetch "
        f"{time.perf_counter() - _t1:.1f}s  rounds {rounds}/{max_rounds}  "
        f"lane-rounds mean {lane_rounds.mean():.0f} max {lane_rounds.max()}  "
        f"table peak mean {peak_in_use.mean():.0f} max {peak_in_use.max()}"
        f"/{table_capacity}\n"
    )
    sys.stderr.flush()

    if overflow.any():
        import warnings

        warnings.warn(
            f"state_factored_search_fused: dedup table overflow on "
            f"{int(overflow.sum())}/{b} instances (capacity "
            f"{table_capacity}); weakest successors were dropped — raise "
            f"table_capacity for exact reference semantics",
            stacklevel=2,
        )
    comp_counts = comp_in_use.sum(axis=1)
    n_short = int((comp_counts < completion_size).sum())
    if warn_truncation and rounds >= max_rounds and n_short:
        import warnings

        warnings.warn(
            f"state_factored_search_fused truncated at max_rounds="
            f"{max_rounds}: {n_short}/{b} instances below completion_size",
            stacklevel=2,
        )

    scan_np = np.asarray(batch["scan"])
    graphs = [graph_bank.graphs[graph_bank.scan_ids[s]] for s in scan_np]

    completed_lists = []
    for i in range(b):
        hyps = [
            _hyp_chain(
                comp_tn[i, k], comp_th[i, k], comp_te[i, k],
                comp_ta[i, k], comp_tas[i, k], int(comp_steps[i, k]),
                total_score=comp_score[i, k],
            )
            for k in range(comp_in_use.shape[1])
            if comp_in_use[i, k]
        ]
        hyps.sort(key=lambda t: t.score, reverse=True)
        completed_lists.append(hyps[:completion_size])

    # replay the reference's physical-traversal walk over the selection log
    traversed = []
    for i in range(b):
        root = _hyp_chain(
            sel_tn[0, i, 0], sel_th[0, i, 0], sel_te[0, i, 0],
            np.full(sel_tn.shape[-1], -1), np.zeros(sel_tn.shape[-1]), 0,
        ) if rounds > 0 and sel_valid[0, i, 0] else Hyp(
            parent=None, node=int(batch["start_node"][i]),
            heading=int(batch["heading"][i]), elev=1, action=-1,
            action_count=0, score=0.0, slot=-1,
        )
        last = root
        trav = [root]
        for r in range(rounds):
            for s in range(sel_valid.shape[2]):
                if not sel_valid[r, i, s]:
                    continue
                if r == 0 and s == 0:
                    continue  # the root itself
                hyp = _hyp_chain(
                    sel_tn[r, i, s], sel_th[r, i, s], sel_te[r, i, s],
                    np.full(sel_tn.shape[-1], 0), np.zeros(sel_tn.shape[-1]),
                    int(sel_steps[r, i, s]),
                )
                path = least_common_viewpoint_path(last, hyp)
                trav.extend(path[1:])
                last = hyp
        for hyp in completed_lists[i]:
            path = least_common_viewpoint_path(last, hyp)
            trav.extend(path[1:])
            last = hyp
        traversed.append(trav)

    candidates = []
    for i in range(b):
        g = graphs[i]
        cands = []
        for hyp in completed_lists[i]:
            chain = backchain(hyp)
            traj = [
                (
                    g.node_ids[hh.node],
                    float(hh.heading) * ANGLE_INC,
                    (float(hh.elev) - 1.0) * ANGLE_INC,
                )
                for hh in chain
            ]
            cands.append(
                {
                    "instr_id": batch["instr_id"][i],
                    "trajectory": traj,
                    "actions": [hh.action for hh in chain[1:]],
                    "scores": [hh.action_score for hh in chain[1:]],
                    "score": float(hyp.score),
                    "instr_encoding": batch["item"][i].get("instr_encoding"),
                }
            )
        candidates.append(cands)
    return (candidates, completed_lists, traversed, lane_rounds,
            comp_counts, rounds, peak_in_use)
