"""Pragmatic (rational) speaker inference.

Replaces tasks/R2R/rational_speaker.py: generate n candidate instructions
per gold trajectory with the speaker's word beam search, re-score each with
the follower's teacher-forced trajectory likelihood (given that candidate
instruction), and sweep speaker weights 0..1 step .05 over the
std-normalized mixture (rational_speaker.py:107-137).
"""

from __future__ import annotations

from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

from ..agents import rollout as ra
from ..agents import speaker as sa
from ..data.dataset import encode_batch
from ..data.text import EOS_IDX, batch_instructions
from ..utils.misc import pretty_json_dump

EPISODE_LEN = 10


def _pad_pow2(m, lo=8):
    size = lo
    while size < m:
        size *= 2
    return size


def follower_score_candidates(
    follower_params,
    tables,
    flat,
    *,
    max_instruction_length: int = 80,
    episode_len: int = EPISODE_LEN,
    use_glove: bool = True,
):
    """Follower log-likelihood of each candidate's gold trajectory given the
    candidate instruction (rational_speaker.py:68-70).  ``flat`` items carry
    _scan_ix/_start_node/_heading/_gold_actions/word_indices."""
    m = len(flat)
    cap = _pad_pow2(m)
    scan = np.zeros(cap, np.int32)
    start = np.zeros(cap, np.int32)
    heading = np.zeros(cap, np.int32)
    actions = np.zeros((cap, episode_len), np.int32)
    lens = np.zeros(cap, np.int32)
    encodings = []
    for j, cand in enumerate(flat):
        scan[j] = cand["_scan_ix"]
        start[j] = cand["_start_node"]
        heading[j] = cand["_heading"]
        a = cand["_gold_actions"][:episode_len]
        actions[j, : len(a)] = a
        lens[j] = len(a)
        # the reference strips a trailing EOS before re-encoding
        # (rational_speaker.py:63-66); batching re-appends it
        idxs = cand["word_indices"]
        if idxs and idxs[-1] == EOS_IDX:
            idxs = idxs[:-1]
        encodings.append(np.asarray(idxs, np.int32))
    encodings += [np.zeros((0,), np.int32)] * (cap - m)

    seq, seq_mask, seq_length = batch_instructions(
        encodings, max_instruction_length, reverse=True
    )
    batch = {
        "scan": jnp.asarray(scan),
        "start_node": jnp.asarray(start),
        "goal_node": jnp.asarray(start),  # unused in forced mode
        "heading": jnp.asarray(heading),
        "seq": jnp.asarray(seq),
        "seq_mask": jnp.asarray(seq_mask),
        "seq_length": jnp.asarray(np.maximum(seq_length, 1)),
        "forced_actions": jnp.asarray(actions),
        "forced_len": jnp.asarray(lens),
    }
    out = ra.rollout(
        follower_params, tables, batch, jax.random.PRNGKey(0),
        feedback="teacher", episode_len=episode_len,
        deterministic=True, use_glove=use_glove, forced=True,
    )
    return np.asarray(out.score)[:m]


def generate_and_score_candidates(
    dataset,
    speaker_params,
    follower_params,
    tables,
    graph_bank,
    tokenizer,
    *,
    n_candidates: int = 10,
    max_instruction_length: int = 80,
    episode_len: int = EPISODE_LEN,
    use_glove: bool = True,
    include_gold: bool = False,
):
    """candidate_lists_by_instr_id with speaker_score + follower_score
    (rational_speaker.py:9-104).

    ``include_gold`` (rational_speaker.py:36-51): prepend the GOLD
    instruction, teacher-force-scored by the speaker, as candidate 0 of
    every instance; it is follower-rescored along with the beam
    candidates.  NOTE: the reference registers this flag but its
    entry point drops it when calling generate_and_score_candidates
    (rational_speaker.py:142-144 passes positionally without it), so
    released behavior never actually includes gold — implemented as
    documented/intended here."""
    dataset.reset_epoch()
    candidate_lists_by_instr_id = {}
    looped = False
    while not looped:
        batch = dataset.next_minibatch()
        enc = encode_batch(
            batch, graph_bank, max_instruction_length=max_instruction_length
        )
        db = {
            k: jnp.asarray(enc[k])
            for k in ["scan", "start_node", "goal_node", "heading"]
        }
        gold = sa.gold_rollout(tables, db, episode_len=episode_len)
        unroll = int(np.asarray(gold.path_len).max())
        result = sa.beam_search(
            speaker_params, gold,
            beam_size=n_candidates,
            instruction_len=max_instruction_length,
            unroll_len=unroll, use_glove=use_glove,
        )
        cands_per_instance = sa.beam_results(result, enc["instr_id"], tokenizer)
        if include_gold:
            # speaker teacher-forced score of the gold instruction; the
            # speaker consumes UNREVERSED encodings (encode_batch reverses
            # for the follower), so rebatch from the raw items
            from ..data.text import batch_instructions

            encodings = [
                np.asarray(it["instr_encoding"], np.int32)
                for it in enc["item"]
            ]
            gseq, _, _ = batch_instructions(
                encodings, max_instruction_length, reverse=False
            )
            gout = sa.score_instructions(
                speaker_params, gold, jnp.asarray(gseq),
                jax.random.PRNGKey(0), feedback="teacher",
                instruction_len=max_instruction_length, unroll_len=unroll,
                deterministic=True, use_glove=use_glove,
            )
            gold_results = sa.speaker_results_from_output(
                gout, enc["instr_id"], tokenizer
            )
            for i, iid in enumerate(enc["instr_id"]):
                cands_per_instance[i].insert(0, dict(gold_results[iid]))

        gold_actions = np.asarray(gold.actions)
        gold_len = np.asarray(gold.path_len)
        flat = []
        for i, cands in enumerate(cands_per_instance):
            for cand in cands:
                cand["_scan_ix"] = int(enc["scan"][i])
                cand["_start_node"] = int(enc["start_node"][i])
                cand["_heading"] = int(enc["heading"][i])
                cand["_gold_actions"] = [
                    int(a) for a in gold_actions[i, : gold_len[i]]
                ]
                flat.append(cand)
        f_scores = follower_score_candidates(
            follower_params, tables, flat,
            max_instruction_length=max_instruction_length,
            episode_len=episode_len, use_glove=use_glove,
        )
        for cand, fs in zip(flat, f_scores):
            cand["speaker_score"] = cand["score"]
            cand["follower_score"] = float(fs)

        for i, cands in enumerate(cands_per_instance):
            instr_id = enc["instr_id"][i]
            if instr_id in candidate_lists_by_instr_id:
                looped = True
            else:
                candidate_lists_by_instr_id[instr_id] = cands
    return candidate_lists_by_instr_id


def predict_from_candidates(candidate_lists_by_instr_id, speaker_weights=None):
    """results_by_weight over the std-normalized mixture
    (rational_speaker.py:107-137)."""
    if speaker_weights is None:
        speaker_weights = np.arange(0, 21) / 20.0
    speaker_scores = [
        c["speaker_score"] for lst in candidate_lists_by_instr_id.values() for c in lst
    ]
    follower_scores = [
        c["follower_score"] for lst in candidate_lists_by_instr_id.values() for c in lst
    ]
    s_std = float(np.std(speaker_scores))
    f_std = float(np.std(follower_scores))
    results_by_weight = {}
    for w in speaker_weights:
        results = {}
        index_count = Counter()
        sw, fw = w / s_std, (1 - w) / f_std
        for instr_id, cands in candidate_lists_by_instr_id.items():
            best_ix, best = max(
                enumerate(cands),
                key=lambda t: t[1]["speaker_score"] * sw
                + t[1]["follower_score"] * fw,
            )
            results[instr_id] = best
            index_count[best_ix] += 1
        results_by_weight[float(w)] = results
    return results_by_weight


def run_rational_speaker(
    dataset, speaker_evaluator, speaker_params, follower_params, tables,
    graph_bank, tokenizer, *, n_candidates=10, output_file=None,
    include_gold=False, **kw
):
    candidate_lists = generate_and_score_candidates(
        dataset, speaker_params, follower_params, tables, graph_bank,
        tokenizer, n_candidates=n_candidates, include_gold=include_gold, **kw
    )
    results_by_weight = predict_from_candidates(candidate_lists)
    scores_by_weight = {
        w: speaker_evaluator.score_results(results)[0]
        for w, results in results_by_weight.items()
    }
    if output_file:
        with open(output_file, "w") as f:
            dump = {
                iid: [
                    {k: v for k, v in c.items() if not k.startswith("_")}
                    | {"rank": r, "gold": bool(include_gold and r == 0)}
                    for r, c in enumerate(cands)
                ]
                for iid, cands in candidate_lists.items()
            }
            pretty_json_dump(dump, f)
    return scores_by_weight, results_by_weight
