"""Speaker evaluation: multi-reference BLEU over generated instructions
(reference tasks/R2R/eval_speaker.py:11-122).

Also produces ``instruction_replaced_gt`` — the gt items with instructions
swapped for predictions — which is the data-augmentation output format
(eval_speaker.py:83-85, data_augmentation_from_speaker.py:72-82).
"""

from __future__ import annotations

import json

import numpy as np

from ..data.dataset import load_datasets
from ..data.text import split_sentence
from .bleu import multi_bleu


class SpeakerEvaluation:
    def __init__(self, splits, instructions_per_path=None, data_dir=None):
        self.splits = list(splits)
        self.gt = {}
        self.instr_ids = set()
        self.scans = set()
        if instructions_per_path is None:
            instructions_per_path = 3
        self.instructions_per_path = instructions_per_path
        for item in load_datasets(splits, data_dir=data_dir):
            item = dict(item)
            item["instructions"] = item["instructions"][:instructions_per_path]
            self.gt[item["path_id"]] = item
            self.scans.add(item["scan"])
            for i in range(len(item["instructions"])):
                self.instr_ids.add("%d_%d" % (item["path_id"], i))

    def score_results(self, results, verbose=False):
        """``results``: {instr_id: {'words': [tokens], 'score': float}}."""
        remaining = set(self.instr_ids)
        results_by_base_id = {}
        mismatches = []
        for instr_id, result in results.items():
            if instr_id in remaining:
                remaining.remove(instr_id)
                base_id = int(instr_id.split("_")[0])
                if base_id in results_by_base_id:
                    if results_by_base_id[base_id]["words"] != result["words"]:
                        mismatches.append(
                            (results_by_base_id[base_id]["words"], result["words"])
                        )
                else:
                    results_by_base_id[base_id] = result
        if mismatches:
            print("mismatching outputs for %d sentences" % len(mismatches))
        assert not remaining, "Missing %d of %d instruction ids from %s" % (
            len(remaining),
            len(self.instr_ids),
            ",".join(self.splits),
        )

        all_refs, all_hyps, model_scores = [], [], []
        instruction_replaced_gt = []
        skip_count = 0
        for base_id, result in sorted(results_by_base_id.items()):
            gt = self.gt[base_id]
            tokenized_refs = [split_sentence(r) for r in gt["instructions"]]
            tokenized_hyp = result["words"]

            replaced_gt = dict(gt)
            replaced_gt["instructions"] = [" ".join(tokenized_hyp)]
            instruction_replaced_gt.append(replaced_gt)

            if "score" in result:
                model_scores.append(result["score"])
            if len(tokenized_refs) != self.instructions_per_path:
                skip_count += 1
                continue
            all_refs.append(tokenized_refs)
            all_hyps.append(tokenized_hyp)

        if skip_count:
            print(
                "skipped %d instructions without %d refs"
                % (skip_count, self.instructions_per_path)
            )
        bleu, unpenalized_bleu = multi_bleu(all_refs, all_hyps)
        summary = {
            "model_score": float(np.mean(model_scores)) if model_scores else float("nan"),
            "bleu": bleu,
            "unpenalized_bleu": unpenalized_bleu,
        }
        return summary, instruction_replaced_gt

    def score_file(self, output_file, verbose=False):
        with open(output_file) as f:
            return self.score_results(json.load(f), verbose=verbose)
