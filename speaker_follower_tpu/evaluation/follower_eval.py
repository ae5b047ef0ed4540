"""R2R evaluation protocol (reference tasks/R2R/eval.py:23-146).

Same metrics and semantics: nav_error (geodesic distance from the final
trajectory position to the goal), oracle_error (closest position on the
trajectory), trajectory steps/length, success = nav_error < 3.0 m, oracle
success; aggregation asserts every expected instr_id is present.  Distances
come from the precompiled GraphBank instead of networkx Dijkstra.
"""

from __future__ import annotations

import json
from collections import defaultdict, namedtuple

import numpy as np

from ..data.dataset import load_datasets
from ..data.graph import GraphBank

EvalResult = namedtuple(
    "EvalResult",
    "nav_error, oracle_error, trajectory_steps, trajectory_length, success, oracle_success",
)

ERROR_MARGIN = 3.0  # meters (eval.py:29)


class Evaluation:
    """Scores result dicts of the submission format
    [{'instr_id': str, 'trajectory': [(viewpointId, heading, elevation)]}].
    """

    def __init__(self, splits, graph_bank: GraphBank, data_dir=None):
        self.splits = list(splits)
        self.graph_bank = graph_bank
        self.gt = {}
        self.instr_ids = set()
        self.scans = set()
        for item in load_datasets(splits, data_dir=data_dir):
            self.gt[item["path_id"]] = item
            self.scans.add(item["scan"])
            for i in range(len(item["instructions"])):
                self.instr_ids.add("%d_%d" % (item["path_id"], i))

    def _dist(self, scan, vp_a, vp_b):
        # scan_row is O(1): _dist runs per trajectory element x instruction
        bank = self.graph_bank
        s = bank.scan_row(scan)
        g = bank.graphs[scan]
        return float(bank.dist[s, g.node_index[vp_a], g.node_index[vp_b]])

    def _score_item(self, instr_id, path):
        gt = self.gt[int(instr_id.split("_")[0])]
        scan = gt["scan"]
        start, goal = gt["path"][0], gt["path"][-1]
        assert start == path[0][0], "result trajectories must include the start position"
        nav_error = self._dist(scan, path[-1][0], goal)
        oracle_error = min(self._dist(scan, p[0], goal) for p in path)
        trajectory_steps = len(path) - 1
        trajectory_length = sum(
            self._dist(scan, a[0], b[0]) for a, b in zip(path[:-1], path[1:])
        )
        return EvalResult(
            nav_error=nav_error,
            oracle_error=oracle_error,
            trajectory_steps=trajectory_steps,
            trajectory_length=trajectory_length,
            success=nav_error < ERROR_MARGIN,
            oracle_success=oracle_error < ERROR_MARGIN,
        )

    def score_results(self, results):
        scores = defaultdict(list)
        model_scores = []
        remaining = set(self.instr_ids)
        count = 0
        for instr_id, result in results.items():
            if instr_id in remaining:
                count += 1
                remaining.remove(instr_id)
                r = self._score_item(instr_id, result["trajectory"])
                scores["nav_errors"].append(r.nav_error)
                scores["oracle_errors"].append(r.oracle_error)
                scores["trajectory_steps"].append(r.trajectory_steps)
                scores["trajectory_lengths"].append(r.trajectory_length)
                scores["success"].append(r.success)
                scores["oracle_success"].append(r.oracle_success)
                if "score" in result:
                    model_scores.append(result["score"])
        assert not remaining, "Missing %d of %d instruction ids from %s" % (
            len(remaining),
            len(self.instr_ids),
            ",".join(self.splits),
        )
        summary = {
            "nav_error": float(np.average(scores["nav_errors"])),
            "oracle_error": float(np.average(scores["oracle_errors"])),
            "steps": float(np.average(scores["trajectory_steps"])),
            "lengths": float(np.average(scores["trajectory_lengths"])),
            "success_rate": float(sum(scores["success"]) / len(scores["success"])),
            "oracle_rate": float(
                sum(scores["oracle_success"]) / len(scores["oracle_success"])
            ),
        }
        if model_scores:
            assert len(model_scores) == count
            summary["model_score"] = float(np.average(model_scores))
        return summary, scores

    def score_file(self, output_file):
        with open(output_file) as f:
            return self.score_results(json.load(f))
