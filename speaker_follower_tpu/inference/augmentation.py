"""Speaker-driven data augmentation.

Replaces tasks/R2R/data_augmentation_from_speaker.py: decode one synthetic
instruction per sampled trajectory (argmax, or rational with a follower)
over the given splits and emit R2R-format JSON
("{prefix}_literal_speaker_{split}.json" /
 "{prefix}_rational_speaker_{w}_{split}.json",
data_augmentation_from_speaker.py:72-83).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..agents import speaker as sa
from ..data.dataset import R2RDataset, encode_batch
from ..evaluation.speaker_eval import SpeakerEvaluation
from ..utils.misc import pretty_json_dump
from .rational_speaker import generate_and_score_candidates, predict_from_candidates

EPISODE_LEN = 10


def literal_speaker_decode(
    dataset, speaker_params, tables, graph_bank, tokenizer, *,
    max_instruction_length=80, episode_len=EPISODE_LEN, use_glove=True,
):
    """Argmax-decode one instruction per item (speaker.test with
    feedback='argmax')."""
    dataset.reset_epoch()
    results = {}
    looped = False
    while not looped:
        batch = dataset.next_minibatch()
        enc = encode_batch(
            batch, graph_bank, max_instruction_length=max_instruction_length,
            reverse_instructions=False,
        )
        db = {
            k: jnp.asarray(enc[k])
            for k in ["scan", "start_node", "goal_node", "heading"]
        }
        gold = sa.gold_rollout(tables, db, episode_len=episode_len)
        unroll = int(np.asarray(gold.path_len).max())
        out = sa.score_instructions(
            speaker_params, gold, jnp.asarray(enc["seq"]), jax.random.PRNGKey(0),
            feedback="argmax", instruction_len=max_instruction_length,
            unroll_len=unroll, deterministic=True, use_glove=use_glove,
        )
        batch_results = sa.speaker_results_from_output(
            out, enc["instr_id"], tokenizer
        )
        for instr_id, r in batch_results.items():
            if instr_id in results:
                looped = True
            else:
                results[instr_id] = r
    return results


def augment_from_speaker(
    speaker_params,
    tables,
    graph_bank,
    tokenizer,
    pred_splits,
    output_prefix: str,
    *,
    follower_params=None,
    rational_speaker_weights=None,
    n_candidates: int = 40,
    data_dir=None,
    max_instruction_length: int = 80,
    use_glove: bool = True,
):
    """For each pred split, decode instructions and write the R2R-format
    augmentation JSON; returns {output_name: (score_summary, path)}."""
    assert (rational_speaker_weights is None) == (follower_params is None), (
        "pass both rational_speaker_weights and follower_params, or neither"
    )
    outputs = {}
    for split in pred_splits:
        dataset = R2RDataset(
            [split], tokenizer=tokenizer, batch_size=64,
            instruction_limit=1, data_dir=data_dir,
        )
        evaluator = SpeakerEvaluation(
            [split], instructions_per_path=1, data_dir=data_dir
        )
        if follower_params is not None:
            candidate_lists = generate_and_score_candidates(
                dataset, speaker_params, follower_params, tables, graph_bank,
                tokenizer, n_candidates=n_candidates,
                max_instruction_length=max_instruction_length,
                use_glove=use_glove,
            )
            results_by_weight = predict_from_candidates(
                candidate_lists, rational_speaker_weights
            )
            results_by_name = {
                f"rational_speaker_{w}": res for w, res in results_by_weight.items()
            }
        else:
            results_by_name = {
                "literal_speaker": literal_speaker_decode(
                    dataset, speaker_params, tables, graph_bank, tokenizer,
                    max_instruction_length=max_instruction_length,
                    use_glove=use_glove,
                )
            }
        for name, results in results_by_name.items():
            summary, replaced_gt = evaluator.score_results(results)
            path = f"{output_prefix}_{name}_{split}.json"
            with open(path, "w") as f:
                pretty_json_dump(replaced_gt, f)
            outputs[f"{name}_{split}"] = (summary, path)
    return outputs
