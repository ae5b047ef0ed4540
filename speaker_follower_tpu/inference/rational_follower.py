"""Pragmatic (rational) follower inference.

Replaces tasks/R2R/rational_follower.py: generate candidate trajectories
with follower beam search or state-factored search, re-score each candidate
with the speaker's teacher-forced instruction likelihood, and pick the
argmax of the std-normalized mixture
  speaker_weight * speaker/std_s + (1 - speaker_weight) * follower/std_f
with weights {0, 0.95} (rational_follower.py:125-148).

Candidate speaker-scoring runs as batched on-device replay: each
candidate's action sequence is replayed through the vectorized env to
build the speaker's input tensors (forced_rollout), then scored
teacher-forced in one call — no per-candidate loops on device.
"""

from __future__ import annotations

import time
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

from ..agents import beam as ba
from ..agents import speaker as sa
from ..agents import state_factored as sf
from ..data.dataset import encode_batch
from ..data.text import batch_instructions
from ..utils.misc import pretty_json_dump

EPISODE_LEN = 10


def _pad_pow2(m, lo=8):
    size = lo
    while size < m:
        size *= 2
    return size


def _resolve_score_chunk(
    n_scans: int, n_nodes: int, m: int, lazy_features: bool = True,
) -> int | None:
    """Resolve max_device_batch="auto" for speaker_score_candidates.

    Two competing costs, both measured on the axon tunnel (2026-08-18,
    runs/probe_sf_phases_c16.log):

    * Every dispatch+sync pair costs SECONDS over the tunnel regardless
      of size (a 16-candidate scoring chunk measures 2.5-7.6 s), so the
      right chunk is the LARGEST safe one — chunking a 2560-candidate
      batch at 16 turns a ~10 s scoring phase into ~11 minutes.
    * The MATERIALIZED replay (lazy_features=False) stacks
      (B, unroll, 36, D) features, and that program's execution faults
      the axon TPU worker at batch >= ~24 on worlds >= ~61 scans
      (data-independent, docs/ROUND3.md); the boundary is empirical and
      tight (55-scan/7,418-node world ran 1280-candidate dispatches
      clean; 61-scan/7,829-node faults at >= ~24).  16 is its known-safe
      chunk on fault-signature worlds.
    * The LAZY replay (the default since round 4) never builds the
      stacked-gather program — the encoder gathers each step's pano rows
      inside its scan — and runs clean far past the fault point on the
      FULL 90-scan/10,800-node world: measured B=32/64/256/1024 all
      survive (runs/probe_forced_fault_r4.log), and the round-5 phase
      probe extends that to B=2048/4096 with steady-state device time of
      0.10/0.18 s per dispatch (runs/probe_score_phase_r5.log,
      scripts/probe_score_phase.py — the 1.3-1.7 s per 1024-chunk in
      runs/sf_beam40_r5.log was that session's tunnel round-trip cost,
      not device time).  Ceiling 4096: one dispatch covers a full
      beam-40 batch (64 x 40 = 2560 candidates), and per-dispatch HBM
      stays bounded (largest transient is the per-step pano gather,
      ~650 MB bf16 at 4096).

    Override per run with --speaker_score_batch.
    """
    if not lazy_features and (n_scans >= 58 or n_nodes >= 7600):
        return 16
    return None if m <= 4096 else 4096


def speaker_score_candidates(
    speaker_params,
    tables,
    candidates_flat,
    *,
    max_instruction_length: int = 80,
    episode_len: int = EPISODE_LEN,
    use_glove: bool = True,
    max_device_batch: int | None | str = "auto",
    mesh=None,
    lazy_features: bool = True,
    _forced_unroll: int | None = None,
):
    """Teacher-forced speaker log-likelihood of each candidate's own
    instruction given its trajectory (rational_follower.py:67-69).

    ``mesh``: place each dispatch's candidate arrays sharded over the
    mesh's "data" axis (replay + scoring run data-parallel; candidates
    are independent, so sharded == single-device — tested on the virtual
    8-device mesh).  Pass speaker params/tables replicated on the same
    mesh.

    ``max_device_batch``: dispatch the replay+scoring programs in
    fixed-shape chunks of this many candidates (compiled once, reused).
    "auto" (default) picks the largest safe dispatch via
    _resolve_score_chunk: with the lazy replay (default) one dispatch up
    to 4096 candidates (a full beam-40 batch is 2560) and 4096-chunks
    beyond, on ANY world — measured clean at B=4096 on the full 90-scan
    world (runs/probe_score_phase_r5.log); with the materialized replay, 16
    on worlds matching the round-3 fault signature (its stacked-gather
    program faulted the axon worker at batch >= ~24 on >= ~61 scans,
    docs/ROUND3.md).  None = always one dispatch (the materialized
    replay stacks (B, unroll, 36, D) f32 features — 4096 padded
    candidates is ~13 GB and OOMs a 16 GB chip; the lazy replay has no
    such stack).

    All chunks share one batch-global unroll length, so chunking is
    value-exact vs a single dispatch (the speaker encoder follows the
    reference's no-length-masking unroll — model.py:437-457 — so scores
    depend on the unroll length; see models/speaker.py).

    ``lazy_features`` (default ON): replay with world_features held as
    per-step (gnode, view_index) identity and gathered one step at a
    time inside the encoder scan — value-exact (tested), and the
    (B, T, 36, D) stacked-gather program whose execution faulted the
    axon worker (docs/ROUND3.md) is never built.  OFF reproduces the
    round-3 materialized program for A/B.
    """
    m = len(candidates_flat)

    def unroll_of(cands):
        # path_len after replay == min(len(actions), episode_len); computed
        # host-side so no device sync sits between the (large) search
        # program and the retry-wrapped scoring dispatch
        u = max((min(len(c["actions"]), episode_len) for c in cands),
                default=1)
        return min(u + (u % 2), episode_len)  # even buckets: <=5 variants

    if max_device_batch == "auto":
        max_device_batch = _resolve_score_chunk(
            int(tables.offsets.shape[0]), int(tables.adj_count.shape[0]), m,
            lazy_features=lazy_features,
        )
    if max_device_batch is not None and m > max_device_batch:
        unroll = unroll_of(candidates_flat)
        out = []
        for lo in range(0, m, max_device_batch):
            chunk = candidates_flat[lo : lo + max_device_batch]
            # pad the tail chunk by repeating its first candidate so every
            # dispatch reuses the one compiled shape
            padded = chunk + [chunk[0]] * (max_device_batch - len(chunk))
            scores = speaker_score_candidates(
                speaker_params, tables, padded,
                max_instruction_length=max_instruction_length,
                episode_len=episode_len, use_glove=use_glove,
                max_device_batch=None,  # chunk IS the requested dispatch
                mesh=mesh, lazy_features=lazy_features,
                _forced_unroll=unroll,
            )
            out.extend(scores[: len(chunk)])
        return np.asarray(out)
    if mesh is None:
        cap = _pad_pow2(m)
    else:
        # cap must split over the mesh: doubling preserves divisibility,
        # so a divisible starting point suffices
        n_mesh = int(mesh.devices.size)
        cap = _pad_pow2(m, lo=8 if 8 % n_mesh == 0 else n_mesh)
    scan = np.zeros(cap, np.int32)
    start = np.zeros(cap, np.int32)
    heading = np.zeros(cap, np.int32)
    actions = np.zeros((cap, episode_len), np.int32)
    lens = np.zeros(cap, np.int32)
    encodings = []
    for j, cand in enumerate(candidates_flat):
        scan[j] = cand["_scan_ix"]
        start[j] = cand["_start_node"]
        heading[j] = cand["_heading"]
        a = cand["actions"][:episode_len]
        actions[j, : len(a)] = a
        lens[j] = len(a)
        encodings.append(cand["instr_encoding"])
    encodings += [np.zeros((0,), np.int32)] * (cap - m)

    if mesh is None:
        place = jnp.asarray
    else:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        from ..parallel.mesh import DATA_AXIS

        _sh = NamedSharding(mesh, _P(DATA_AXIS))
        place = lambda x: jax.device_put(np.asarray(x), _sh)  # noqa: E731
    batch = {
        "scan": place(scan),
        "start_node": place(start),
        "heading": place(heading),
        "forced_actions": place(actions),
        "forced_len": place(lens),
    }
    seq, _, _ = batch_instructions(
        encodings, max_instruction_length, reverse=False
    )
    seq = place(seq)
    from ..agents.state_factored import _retry_transient

    unroll = _forced_unroll if _forced_unroll is not None else (
        unroll_of(candidates_flat) if m else 1
    )

    def run_scoring():
        t0 = time.perf_counter()
        gold = sa.forced_rollout(
            tables, batch, episode_len=episode_len,
            lazy_features=lazy_features,
        )
        out = sa.score_instructions(
            speaker_params, gold, seq, jax.random.PRNGKey(0),
            feedback="teacher", instruction_len=max_instruction_length,
            unroll_len=max(unroll, 1), deterministic=True, use_glove=use_glove,
            tables=tables if lazy_features else None,
        )
        scores = np.asarray(out.score)[:m]
        import sys as _sys

        _sys.stderr.write(
            f"[speaker_score]   B={cap} unroll={max(unroll, 1)} "
            f"{time.perf_counter() - t0:.1f}s\n"
        )
        _sys.stderr.flush()
        return scores

    return _retry_transient(run_scoring)


def generate_candidates(
    follower_params,
    tables,
    enc,
    graph_bank,
    *,
    beam_size: int,
    state_factored: bool = False,
    state_first_n_ws_key: int = 4,
    episode_len: int = EPISODE_LEN,
    use_glove: bool = True,
    fused: bool = False,
    fused_chunk: int | None = None,
    fused_first_pass: int | str | None = None,
    mesh=None,
):
    """Per-instance candidate lists (+ traversal lists for state-factored).

    ``fused`` runs the whole state-factored search as one device program
    (agents/state_factored_fused.py) instead of the host-orchestrated
    loop — same results, one dispatch for all rounds.  ``fused_chunk``
    overrides the per-dispatch instance cap (None = module default);
    ``fused_first_pass`` the straggler-repack first-pass round budget:
    an int, or "auto" for the measured-distribution budget (None = module
    default, which is repacking OFF; 0/negative also disable it)."""
    db = {
        k: jnp.asarray(enc[k])
        for k in ["scan", "start_node", "goal_node", "heading", "seq", "seq_mask", "seq_length"]
    }
    if state_factored:
        if fused:
            from ..agents.state_factored import _retry_transient
            from ..agents.state_factored_fused import state_factored_search_fused

            # the fused search is ONE stateless dispatch: on a transient
            # backend error the whole program safely reruns.  Backend
            # worker restarts take minutes, so back off patiently
            # (observed 2026-08-16: worker up again ~5 min after a crash).
            chunk_kw = (
                {} if fused_chunk is None
                else {"max_device_batch": fused_chunk}
            )
            if fused_first_pass is not None:
                chunk_kw["first_pass_rounds"] = fused_first_pass
            return _retry_transient(attempts=6, base_delay=45.0, fn=lambda: state_factored_search_fused(
                follower_params, tables, enc, graph_bank,
                completion_size=beam_size, successor_size=1,
                episode_len=episode_len, first_n_ws_key=state_first_n_ws_key,
                use_glove=use_glove, mesh=mesh, **chunk_kw,
            ))
        candidates, completed, traversed = sf.state_factored_search(
            follower_params, tables, enc, graph_bank,
            completion_size=beam_size, successor_size=1,
            episode_len=episode_len, first_n_ws_key=state_first_n_ws_key,
            use_glove=use_glove,
        )
        return candidates, completed, traversed
    result = ba.beam_search(
        follower_params, tables, db,
        beam_size=beam_size, episode_len=episode_len, use_glove=use_glove,
    )
    candidates = ba.beam_trajectories(result, enc, graph_bank)
    return candidates, None, None


def run_rational_follower(
    dataset,
    evaluator,
    follower_params,
    speaker_params,
    tables,
    graph_bank,
    *,
    beam_size: int = 10,
    state_factored_search: bool = False,
    state_first_n_ws_key: int = 4,
    physical_traversal: bool = False,
    speaker_weights=(0.0, 0.95),
    max_instruction_length: int = 80,
    use_glove: bool = True,
    fused_search: bool = False,
    fused_search_chunk: int | None = None,
    fused_first_pass: int | str | None = None,
    output_file=None,
    eval_file=None,
    speaker_score_batch: int | None | str = "auto",
    mesh=None,
    include_gold: bool = False,
    compute_oracle: bool = False,
):
    """Returns accuracies_by_weight, index_counts_by_weight
    (rational_follower.py:11-195).

    ``speaker_score_batch``: chunk the speaker replay+scoring dispatches
    (see speaker_score_candidates; needed on many-scan worlds where the
    axon backend faults on large replay batches).

    ``mesh``: run the whole pipeline data-parallel over a
    jax.sharding.Mesh with a "data" axis — params and env tables are
    replicated here, and every search/scoring dispatch's per-instance
    arrays shard over the mesh (requires ``fused_search``: the
    host-orchestrated search loop has per-round host logic that a mesh
    cannot help).  On a v5e-8 the per-dispatch search/scoring device
    time divides ~8x; the host-side traversal replay is unchanged.

    ``include_gold`` (rational_follower.py:35-56): prepend each
    instance's TEACHER-forced trajectory as candidate index 0, scored by
    both models like any other candidate — the diagnostic for "is the
    gold path even in the candidate pool".  ``compute_oracle``
    (rational_follower.py:103-106,158-174): score every candidate's
    trajectory with the evaluator and report the oracle pick (min
    nav_error per instance) — the candidate-pool quality ceiling."""
    # speaker_params: one param tree, or a list/tuple of trees for an
    # ENSEMBLE rescorer (beyond reference parity): each member scores
    # every candidate independently (one extra set of scoring dispatches
    # per member — the trajectory replay is identical, only the scoring
    # matmuls differ) and the per-candidate log-likelihoods are averaged,
    # i.e. a geometric-mean product-of-experts. Averaging in log space
    # keeps the downstream std-normalized mixture semantics unchanged.
    speaker_ensemble = (
        list(speaker_params)
        if isinstance(speaker_params, (list, tuple))
        else [speaker_params]
    )
    if physical_traversal and not state_factored_search:
        raise ValueError("physical_traversal requires state_factored_search")
    if include_gold and physical_traversal:
        # The reference indexes candidate_inf_states[instance][i] with i
        # counting the INSERTED gold candidate at 0
        # (rational_follower.py:53-56 vs :84-92), so the traversal
        # backchain reads the wrong hypothesis for every beam candidate
        # and overruns on the last — the combination was never runnable.
        # Refuse it loudly rather than reproduce the misalignment.
        raise ValueError(
            "include_gold + physical_traversal is not supported (the "
            "reference's own pairing misaligns candidate_inf_states, "
            "rational_follower.py:84-92)"
        )
    if mesh is not None:
        if state_factored_search and not fused_search:
            raise ValueError("mesh requires --fused_search (the host-"
                             "orchestrated search does not shard)")
        from ..parallel import mesh as pm

        follower_params = pm.replicate(mesh, follower_params)
        speaker_ensemble = [pm.replicate(mesh, sp) for sp in speaker_ensemble]
        tables = type(tables)(
            *[jax.device_put(x, pm.replicated(mesh)) for x in tables]
        )
    dataset.reset_epoch()
    candidate_lists_by_instr_id = {}
    looped = False
    batch_idx = 0
    while not looped:
        import sys as _sys

        _sys.stderr.write(f"[rational_follower] batch {batch_idx}\n")
        _sys.stderr.flush()
        batch_idx += 1
        _t0 = time.perf_counter()
        batch = dataset.next_minibatch()
        enc = encode_batch(
            batch, graph_bank, max_instruction_length=max_instruction_length
        )
        candidates, completed, traversed = generate_candidates(
            follower_params, tables, enc, graph_bank,
            beam_size=beam_size, state_factored=state_factored_search,
            fused=fused_search, fused_chunk=fused_search_chunk,
            fused_first_pass=fused_first_pass,
            state_first_n_ws_key=state_first_n_ws_key, use_glove=use_glove,
            mesh=mesh,
        )
        if include_gold:
            # teacher-forced gold rollout, one batched dispatch; its score
            # is the follower log-likelihood of the gold path (the same
            # quantity follower._rollout_with_loss records per candidate)
            from ..agents import rollout as ro

            db = {
                k: jnp.asarray(enc[k])
                for k in ["scan", "start_node", "goal_node", "heading",
                          "seq", "seq_mask", "seq_length"]
            }
            gout = ro.rollout(
                follower_params, tables, db, jax.random.PRNGKey(0),
                feedback="teacher", deterministic=True, use_glove=use_glove,
            )
            gold_cands = ro.trajectories_from_rollout(gout, enc, graph_bank)
            for i, g in enumerate(gold_cands):
                g["instr_encoding"] = enc["item"][i].get("instr_encoding")
                candidates[i].insert(0, g)
        _t1 = time.perf_counter()
        # annotate candidates with replay coordinates for speaker scoring
        flat = []
        for i, cands in enumerate(candidates):
            for cand in cands:
                cand["_scan_ix"] = int(enc["scan"][i])
                cand["_start_node"] = int(enc["start_node"][i])
                cand["_heading"] = int(enc["heading"][i])
                flat.append(cand)
        member_scores = [
            speaker_score_candidates(
                sp, tables, flat,
                max_instruction_length=max_instruction_length,
                use_glove=use_glove,
                max_device_batch=speaker_score_batch, mesh=mesh,
            )
            for sp in speaker_ensemble
        ]
        speaker_scores = np.mean(np.asarray(member_scores), axis=0)
        for cand, s in zip(flat, speaker_scores):
            cand["follower_score"] = cand["score"]
            cand["speaker_score"] = float(s)
        _t2 = time.perf_counter()

        for i, cands in enumerate(candidates):
            if physical_traversal:
                g = graph_bank.graphs[enc["scan_id"][i]]
                phys_list = sf.physical_trajectories(
                    traversed[i], completed[i], g
                )
                for phys, cand in zip(phys_list, cands):
                    assert phys[-1][0] == cand["trajectory"][-1][0]
                    cand["trajectory"] = phys
            instr_id = enc["instr_id"][i]
            if instr_id in candidate_lists_by_instr_id:
                looped = True
            else:
                candidate_lists_by_instr_id[instr_id] = cands
        _sys.stderr.write(
            f"[rational_follower]   search {_t1 - _t0:.1f}s  "
            f"score {_t2 - _t1:.1f}s ({len(flat)} cands)  "
            f"traverse {time.perf_counter() - _t2:.1f}s\n"
        )
        _sys.stderr.flush()

    follower_scores = [
        c["follower_score"]
        for lst in candidate_lists_by_instr_id.values()
        for c in lst
    ]
    speaker_scores = [
        c["speaker_score"]
        for lst in candidate_lists_by_instr_id.values()
        for c in lst
    ]
    speaker_std = float(np.std(speaker_scores))
    follower_std = float(np.std(follower_scores))

    accuracies_by_weight = {}
    index_counts_by_weight = {}
    for w in speaker_weights:
        results = {}
        index_count = Counter()
        sw = w / speaker_std
        fw = (1 - w) / follower_std
        eval_results = []
        for instr_id, cands in candidate_lists_by_instr_id.items():
            best_ix, best = max(
                enumerate(cands),
                key=lambda t: t[1]["speaker_score"] * sw
                + t[1]["follower_score"] * fw,
            )
            results[instr_id] = best
            index_count[best_ix] += 1
            eval_results.append(
                {"instr_id": instr_id, "trajectory": best["trajectory"]}
            )
        summary, _ = evaluator.score_results(results)
        accuracies_by_weight[w] = summary
        index_counts_by_weight[w] = index_count
        if eval_file:
            with open(eval_file % w, "w") as f:
                pretty_json_dump(eval_results, f)

    if compute_oracle:
        # candidate-pool ceiling: pick each instance's min-nav_error
        # candidate and score that selection (rational_follower.py:158-174)
        import pprint as _pprint

        oracle_results = {}
        oracle_index_count = Counter()
        for instr_id, cands in candidate_lists_by_instr_id.items():
            for c in cands:
                if "eval_result" not in c:
                    c["eval_result"] = evaluator._score_item(
                        instr_id, c["trajectory"]
                    )._asdict()
            best_ix, best = min(
                enumerate(cands),
                key=lambda t: t[1]["eval_result"]["nav_error"],
            )
            oracle_results[instr_id] = best
            oracle_index_count[best_ix] += 1
        oracle_summary, _ = evaluator.score_results(oracle_results)
        print("oracle results:")
        _pprint.pprint(oracle_summary)
        _pprint.pprint(sorted(oracle_index_count.items()))
        # under the string key so numeric-weight consumers can skip it
        accuracies_by_weight["oracle"] = oracle_summary
        index_counts_by_weight["oracle"] = oracle_index_count

    if output_file:
        dump = {}
        for instr_id, cands in candidate_lists_by_instr_id.items():
            dump[instr_id] = [
                {
                    k: v
                    for k, v in c.items()
                    if not k.startswith("_") and k != "instr_encoding"
                }
                | {"rank": r, "gold": bool(include_gold and r == 0)}
                for r, c in enumerate(cands)
            ]
        with open(output_file, "w") as f:
            pretty_json_dump(dump, f)
    return accuracies_by_weight, index_counts_by_weight
