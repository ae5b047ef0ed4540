"""State-factored search for the follower.

Replaces tasks/R2R/follower.py:720-980 (state_factored_search): a best-first
search over *world states* rather than action sequences — hypotheses landing
on the same (viewpoint, heading, elevation) are deduplicated keeping the
best score, the best ``successor_size`` unexpanded states are expanded each
round, and the search runs until ``completion_size`` finished hypotheses
exist per instance.  It also maintains the physically-traversable
exploration order (the robot walking the search tree), used by
``--physical_traversal`` (rational_follower.py:83-102).

Architecture: the search bookkeeping (caches, heaps, linked-list hypotheses)
is tiny and stays on the host; the model evaluation is a jitted batched
decoder step over all states expanded this round (padded to a fixed bucket
size so recompiles stay bounded).  Successor world states come from the
host-side graph tables — no simulator stepping at all.

Per-round device traffic is minimized for flaky/tunneled backends:
  * decoder h/c live in a device-resident slot table, functionally
    scatter-updated inside the jitted step (donated buffers) — hidden
    states are NEVER round-tripped to the host; hypotheses hold a slot
    index.  Slots are host-refcounted and recycled once no unexpanded
    hypothesis references them.
  * all per-row host inputs travel as ONE packed (cap, 11) int32 array;
    the only downloads are the (cap, A) log-probs + validity masks.
At batch 32, beam 40 this cuts per-round transfer volume ~50x and device
dispatches ~5x vs re-sending h/c rows each round (the round-1 design that
died with INTERNAL tunnel errors at production batch sizes).
"""

from __future__ import annotations

import heapq
import itertools
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import ANGLE_INC, NUM_ACTIONS
from ..env import vecenv
from ..models import follower as fmodels
from ..models.attention import NEG_INF


@dataclass
class Hyp:
    """One hypothesis: a linked-list node (reference InferenceState).

    Neither the last-action embedding nor the decoder state is stored:
    the embedding is recomputed on device from (parent state, action) at
    expansion time, and h/c live in the device slot table at ``slot``.
    """

    parent: Optional["Hyp"]
    node: int  # local node index (world state after arriving here)
    heading: int
    elev: int
    action: int  # action taken from parent (-1 for the root)
    action_count: int
    score: float
    slot: int  # row in the device h/c slot table
    action_score: float = 0.0  # log-prob of .action


def _ws_key(hyp: Hyp, first_n: int):
    # world state = (scanId, viewpointId, heading, elevation); scan is fixed
    # per instance, so first_n=4 -> (node, heading, elev), first_n=2 -> node
    if first_n >= 4:
        return (hyp.node, hyp.heading, hyp.elev)
    if first_n == 3:
        return (hyp.node, hyp.heading)
    return (hyp.node,)


def least_common_viewpoint_path(a: Hyp, b: Hyp):
    """Hypotheses from a back to X, then Y forward to b, where X/Y are the
    nearest ancestors of a/b sharing a viewpoint (follower.py:52-73)."""
    suffix_by_vp = {}
    chain = []
    cur = b
    while cur is not None:
        chain.append(cur)
        cur = cur.parent
    # path_to_b (in forward order) starting at each ancestor's viewpoint
    for i, hyp in enumerate(chain):
        suffix_by_vp.setdefault(hyp.node, list(reversed(chain[: i + 1])))
    path_from_a = []
    cur = a
    while cur is not None:
        path_from_a.append(cur)
        if cur.node in suffix_by_vp:
            path_to_b = suffix_by_vp[cur.node]
            assert path_from_a[-1].node == path_to_b[0].node
            return path_from_a + path_to_b[1:]
        cur = cur.parent
    raise AssertionError("no common ancestor found")


def backchain(hyp: Hyp):
    """Root-to-hyp list of hypotheses."""
    out = []
    cur = hyp
    while cur is not None:
        out.append(cur)
        cur = cur.parent
    return list(reversed(out))


@partial(jax.jit, static_argnames=("use_glove",))
def _encode(params, seq, seq_length, use_glove=True):
    return fmodels.encoder_apply(
        params["encoder"], seq, seq_length, deterministic=True, use_glove=use_glove
    )


# packed int columns for _decode_step
_COLS = (
    "scan", "node", "heading", "elev",
    "parent_node", "parent_heading", "parent_elev", "action",
    "instance_ix", "src_slot", "dst_slot",
)


@jax.jit
def _decode_step(params, tables, ctx, seq_mask, hc_h, hc_c, ints):
    """Batched decoder step on arbitrary world states (padded bucket).

    ints: (cap, 11) int32, columns per _COLS.  h/c are gathered from and
    scattered back into the device slot tables — only log-probs and
    validity go back to the host.  The previous-action embedding is
    recomputed from the PARENT state + taken action (zeros for roots,
    action < 0).  Padded rows read/write the scratch slot 0.

    NOT donated on purpose: donating the slot tables faults the TPU
    worker at some batch sizes on this backend (kernel crash at cap=32,
    reproduced 2026-08-16), the un-donated scatter copy is a cheap
    on-device ~4 MB, and retrying a donated call after a transient
    tunnel error would read consumed buffers.
    """
    (scan, node, heading, elev, parent_node, parent_heading, parent_elev,
     action, instance_ix, src, dst) = (ints[:, k] for k in range(len(_COLS)))
    m = node.shape[0]
    h = hc_h[src]
    c = hc_c[src]

    state = vecenv.EnvState(
        scan=scan, node=node, heading=heading, elev=elev,
        step=jnp.zeros((m,), jnp.int32), done=jnp.zeros((m,), bool),
    )
    obs = vecenv.observe(tables, state, node)  # goal unused (teacher ignored)

    parent_state = vecenv.EnvState(
        scan=scan, node=jnp.maximum(parent_node, 0),
        heading=parent_heading, elev=parent_elev,
        step=jnp.zeros((m,), jnp.int32), done=jnp.zeros((m,), bool),
    )
    parent_obs = vecenv.observe(tables, parent_state, node)
    u = jnp.take_along_axis(
        parent_obs.action_embedding,
        jnp.maximum(action, 0)[:, None, None],
        axis=1,
    )[:, 0]
    u = jnp.where((action >= 0)[:, None], u, 0.0)

    h1, c1, alpha, logit, _ = fmodels.decoder_step(
        params["decoder"], u, obs.action_embedding, obs.pano_feature,
        h, c, ctx[instance_ix], seq_mask[instance_ix], deterministic=True,
    )
    logit = jnp.where(obs.action_valid, logit, NEG_INF)
    log_probs = jax.nn.log_softmax(logit, axis=-1)
    hc_h = hc_h.at[dst].set(h1)
    hc_c = hc_c.at[dst].set(c1)
    return log_probs, obs.action_valid, hc_h, hc_c


def _bucket(m: int) -> int:
    size = 8
    while size < m:
        size *= 2
    return size


# Largest per-dispatch row count for the decode step (see the chunking
# comment in state_factored_search).  Override via env for stable backends.
import os as _os

_SF_MAX_DEVICE_BATCH = int(_os.environ.get("SF_MAX_DEVICE_BATCH", "8"))


class _SlotTable:
    """Host-refcounted allocator over the device h/c slot tables.

    Slot 0 is scratch (padded rows).  A slot is referenced while some
    *unexpanded* cached hypothesis holds it; once expanded (its h/c were
    consumed by a decode) or evicted, the slot recycles.  Reuse is safe
    even within the round that still reads it: gathers and scatters live
    in one XLA program, so reads see the input buffers.
    """

    def __init__(self, capacity, hdim, dtype=jnp.float32):
        self.capacity = capacity
        self.hdim = hdim
        self.h = jnp.zeros((capacity, hdim), dtype)
        self.c = jnp.zeros((capacity, hdim), dtype)
        self._free = list(range(capacity - 1, 0, -1))  # 0 is scratch
        self._in_free = set(self._free)
        self._refs = {}

    def alloc(self):
        if not self._free:
            old = self.capacity
            self.capacity *= 2
            pad = jnp.zeros((old, self.hdim), self.h.dtype)
            self.h = jnp.concatenate([self.h, pad])
            self.c = jnp.concatenate([self.c, pad])
            self._free = list(range(self.capacity - 1, old - 1, -1))
            self._in_free = set(self._free)
        s = self._free.pop()
        self._in_free.discard(s)
        return s

    def _push_free(self, slot):
        if slot not in self._in_free:
            self._free.append(slot)
            self._in_free.add(slot)

    def incref(self, slot):
        self._refs[slot] = self._refs.get(slot, 0) + 1

    def decref(self, slot):
        n = self._refs.get(slot, 0) - 1
        if n <= 0:
            self._refs.pop(slot, None)
            self._push_free(slot)
        else:
            self._refs[slot] = n

    def release_unreferenced(self, slots):
        """Recycle freshly-allocated slots that picked up no references."""
        for s in set(slots):
            if s not in self._refs:
                self._push_free(s)


# Error-code substrings treated as transient backend/tunnel failures.
# Anything else (compile errors, OOM=RESOURCE_EXHAUSTED, shape errors)
# surfaces immediately.
_TRANSIENT_MARKERS = ("INTERNAL", "UNAVAILABLE", "DEADLINE_EXCEEDED", "DATA_LOSS")


def _retry_transient(fn, attempts: int = 4, base_delay: float = 2.0):
    """Retry transient backend errors.  Every device call in this search is
    stateless from the host's perspective within a round (inputs re-sent),
    so a lost dispatch over a flaky tunneled backend is safely retryable.
    Only XLA transport error codes are retried; genuine program errors
    (compile failures, OOM, ValueError) propagate on the first attempt.
    """
    import time as _time

    for attempt in range(attempts):
        try:
            return fn()
        except Exception as e:
            msg = str(e)
            transient = any(marker in msg for marker in _TRANSIENT_MARKERS)
            if not transient or attempt == attempts - 1:
                raise
            import sys as _sys

            _sys.stderr.write(
                f"[state_factored] transient backend error "
                f"({type(e).__name__}), retry {attempt + 1}/{attempts - 1}\n"
            )
            _time.sleep(base_delay * (attempt + 1))
    raise RuntimeError("unreachable")


def state_factored_search(
    params,
    tables: vecenv.EnvTables,
    batch,
    graph_bank,
    *,
    completion_size: int = 10,
    successor_size: int = 10,
    episode_len: int = 10,
    first_n_ws_key: int = 4,
    max_rounds: int = 400,
    use_glove: bool = True,
    max_device_batch: int | None = None,
):
    """Returns (candidate_lists, completed_hyps, traversed_lists) mirroring
    the reference's (trajs, completed_list, traversed_lists)."""
    ctx, h0, c0 = _encode(
        params, jnp.asarray(batch["seq"]), jnp.asarray(batch["seq_length"]),
        use_glove=use_glove,
    )
    seq_mask = jnp.asarray(batch["seq_mask"])
    b = ctx.shape[0]
    hdim = h0.shape[-1]

    scan_np = np.asarray(batch["scan"])

    # device-resident decoder-state slots; roots' h0/c0 are written once
    # here and their slots recycle like any other once the roots expand
    slots = _SlotTable(max(1024, _bucket(4 * b)), hdim)
    root_slots = [slots.alloc() for _ in range(b)]
    assert root_slots == list(range(1, b + 1))
    slots.h = slots.h.at[1 : b + 1].set(h0)
    slots.c = slots.c.at[1 : b + 1].set(c0)
    for s in root_slots:
        slots.incref(s)

    # per-instance host-side graph views
    graphs = [graph_bank.graphs[graph_bank.scan_ids[s]] for s in scan_np]

    roots = []
    for i in range(b):
        roots.append(
            Hyp(
                parent=None,
                node=int(batch["start_node"][i]),
                heading=int(batch["heading"][i]),
                elev=1,
                action=-1,
                action_count=0,
                score=0.0,
                slot=root_slots[i],
            )
        )

    state_cache = [dict() for _ in range(b)]  # key -> (hyp, expanded)
    completed_holding = [dict() for _ in range(b)]  # key -> (hyp, expanded)
    completed = [dict() for _ in range(b)]  # key -> hyp
    beams = [[roots[i]] for i in range(b)]
    for i in range(b):
        state_cache[i][_ws_key(roots[i], first_n_ws_key)] = (roots[i], True)

    last_expanded = [roots[i] for i in range(b)]
    traversed = [[roots[i]] for i in range(b)]

    def update_traversed(new_states_per_instance):
        for i, hyps in enumerate(new_states_per_instance):
            last = last_expanded[i]
            for hyp in hyps:
                path = least_common_viewpoint_path(last, hyp)
                assert path[0].node == last.node and path[-1].node == hyp.node
                traversed[i].extend(path[1:])
                last = hyp
            last_expanded[i] = last

    rounds = 0
    truncated = False
    while any(len(completed[i]) < completion_size for i in range(b)):
        rounds += 1
        if rounds > max_rounds:
            truncated = True
            break
        flat = [(i, hyp) for i in range(b) for hyp in beams[i]]
        if not flat:
            break
        m = len(flat)

        # Device batches above _SF_MAX_DEVICE_BATCH rows are split into
        # chunks: this tunneled backend's worker faults nondeterministically
        # (~15%/call) executing the decode program at cap>=32, across two
        # independent implementations (2026-08-16), while the cap<=8
        # program has run for hundreds of consecutive rounds without
        # incident.  Chunking trades a few extra dispatches for using only
        # the proven-stable compiled program.
        chunk = max_device_batch or _SF_MAX_DEVICE_BATCH
        log_probs = np.zeros((m, NUM_ACTIONS), np.float32)
        valid = np.zeros((m, NUM_ACTIONS), bool)
        dst = []
        for c0_ix in range(0, m, chunk):
            part = flat[c0_ix : c0_ix + chunk]
            cap = _bucket(len(part))
            ints = np.zeros((cap, len(_COLS)), np.int32)
            for j, (i, hyp) in enumerate(part):
                p = hyp.parent
                d = slots.alloc()
                dst.append(d)
                ints[j] = (
                    scan_np[i], hyp.node, hyp.heading, hyp.elev,
                    p.node if p else -1, p.heading if p else 0, p.elev if p else 1,
                    hyp.action, i, hyp.slot, d,
                )

            def run_chunk():
                lp, v_, h_, c_ = _decode_step(
                    params, tables, ctx, seq_mask, slots.h, slots.c,
                    jnp.asarray(ints),
                )
                return np.asarray(lp), np.asarray(v_), h_, c_

            lp_c, valid_c, slots.h, slots.c = _retry_transient(run_chunk)
            log_probs[c0_ix : c0_ix + len(part)] = lp_c[: len(part)]
            valid[c0_ix : c0_ix + len(part)] = valid_c[: len(part)]
        for _, hyp in flat:
            slots.decref(hyp.slot)

        # expand: all valid actions of every beam hypothesis
        all_successors = [[] for _ in range(b)]
        for j, (i, hyp) in enumerate(flat):
            g = graphs[i]
            count = int(g.adj_count[hyp.node])
            for a in range(count + 1):
                if not valid[j, a]:
                    continue
                lp = float(log_probs[j, a])
                if a == 0:
                    nxt, nh, ne = hyp.node, hyp.heading, hyp.elev
                else:
                    slot = int(g.adj_perm[hyp.node, hyp.heading, a - 1])
                    view = int(g.adj_view[hyp.node, slot])
                    nxt = int(g.adj_next[hyp.node, slot])
                    nh, ne = view % 12, view // 12
                all_successors[i].append(
                    Hyp(
                        parent=hyp,
                        node=nxt,
                        heading=nh,
                        elev=ne,
                        action=a,
                        action_count=hyp.action_count + 1,
                        score=hyp.score + lp,
                        slot=dst[j],
                        action_score=lp,
                    )
                )

        new_beams = []
        newly_expanded = []
        for i in range(b):
            cache = state_cache[i]
            holding = completed_holding[i]
            if len(completed[i]) >= completion_size:
                new_beams.append([])
                newly_expanded.append([])
                continue
            for s in sorted(all_successors[i], key=lambda t: t.score, reverse=True):
                key = _ws_key(s, first_n_ws_key)
                if s.action == 0 or s.action_count == episode_len:
                    # finished hypotheses never re-expand: no slot ref
                    if key not in holding or holding[key][0].score < s.score:
                        holding[key] = (s, False)
                else:
                    if key not in cache or cache[key][0].score < s.score:
                        if key in cache and not cache[key][1]:
                            slots.decref(cache[key][0].slot)
                        cache[key] = (s, False)
                        slots.incref(s.slot)

            to_consider = itertools.chain(
                ((k, hyp, False) for k, (hyp, exp) in cache.items() if not exp),
                ((k, hyp, True) for k, (hyp, exp) in holding.items() if not exp),
            )
            best = heapq.nlargest(successor_size, to_consider, key=lambda t: t[1].score)

            new_beam = []
            for key, hyp, is_completed in best:
                if is_completed:
                    assert holding[key] == (hyp, False)
                    holding[key] = (hyp, True)
                    if key not in completed[i] or completed[i][key].score < hyp.score:
                        completed[i][key] = hyp
                else:
                    cache[key] = (hyp, True)
                    new_beam.append(hyp)
            if len(completed[i]) >= completion_size:
                new_beams.append([])
            else:
                new_beams.append(new_beam)
            newly_expanded.append(new_beam)

        slots.release_unreferenced(dst)
        beams = new_beams
        update_traversed(newly_expanded)
        if not any(beams):
            break

    if truncated:
        import warnings

        short = [i for i in range(b) if len(completed[i]) < completion_size]
        warnings.warn(
            f"state_factored_search truncated at max_rounds={max_rounds}: "
            f"{len(short)}/{b} instances below completion_size "
            f"(counts: {[len(completed[i]) for i in short]})",
            stacklevel=2,
        )

    completed_lists = [
        sorted(completed[i].values(), key=lambda t: t.score, reverse=True)[
            :completion_size
        ]
        for i in range(b)
    ]
    update_traversed(completed_lists)

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
    return candidates, completed_lists, traversed


def physical_trajectory(traversed_list, candidate_hyp, graph):
    """The robot's physically-traversable path ending at the candidate
    (rational_follower.py:83-102)."""
    last = traversed_list[-1]
    path = least_common_viewpoint_path(last, candidate_hyp)
    assert path[0].node == last.node and path[-1].node == candidate_hyp.node
    full = traversed_list + path[1:]
    return [
        (
            graph.node_ids[h.node],
            float(h.heading) * ANGLE_INC,
            (float(h.elev) - 1.0) * ANGLE_INC,
        )
        for h in full
    ]


def physical_trajectories(traversed_list, hyps, graph):
    """Batched ``physical_trajectory`` over one instance's candidates.

    All of an instance's candidates share the exploration prefix
    (``traversed_list``, ~110 states at beam 40), so it is converted to
    output tuples ONCE instead of once per candidate — the per-candidate
    reconversion dominated the pragmatic pipeline's host traversal phase
    (2.1 s median per 64-instruction batch on this 1-core host).
    Element-for-element equal to per-candidate ``physical_trajectory``
    (tests/test_state_factored.py)."""
    def conv(h):
        return (
            graph.node_ids[h.node],
            float(h.heading) * ANGLE_INC,
            (float(h.elev) - 1.0) * ANGLE_INC,
        )

    prefix = [conv(h) for h in traversed_list]
    last = traversed_list[-1]
    out = []
    for hyp in hyps:
        path = least_common_viewpoint_path(last, hyp)
        assert path[0].node == last.node and path[-1].node == hyp.node
        out.append(prefix + [conv(h) for h in path[1:]])
    return out
