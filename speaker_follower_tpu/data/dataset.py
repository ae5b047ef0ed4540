"""R2R dataset loading and fixed-shape batch assembly.

Replaces the data half of the reference R2RBatch (tasks/R2R/env.py:664-735):
split JSONs are loaded, each path's instructions are expanded into separate
items (``instr_id = "{path_id}_{j}"``), instructions are tokenized, and
minibatches are drawn round-robin with seeded shuffling.  Unlike the
reference, a minibatch is materialized as a dict of fixed-shape numpy arrays
ready to be fed to the jitted rollout (episode state indices + padded
instruction encodings), not per-item python dicts.
"""

from __future__ import annotations

import json
import random

import numpy as np

from .. import paths
from .graph import GraphBank, snap_heading
from .text import PAD_IDX, Tokenizer, batch_instructions


def load_datasets(splits, data_dir: str | None = None):
    """Load R2R split JSONs (reference tasks/R2R/utils.py:54-59)."""
    data = []
    for split in splits:
        p = (
            paths.split_path(split)
            if data_dir is None
            else f"{data_dir}/R2R_{split}.json"
        )
        with open(p) as f:
            data += json.load(f)
    return data


class R2RDataset:
    """Instruction-expanded R2R items + seeded round-robin minibatcher.

    Mirrors R2RBatch's data behavior (tasks/R2R/env.py:667-735): one item
    per (path, instruction) pair, python ``random`` shuffling with the given
    seed, wrap-around minibatches that reshuffle at epoch end.
    """

    def __init__(
        self,
        splits,
        tokenizer: Tokenizer | None = None,
        batch_size: int = 100,
        seed: int = 10,
        instruction_limit: int | None = None,
        data_dir: str | None = None,
    ):
        self.splits = list(splits)
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.data_dir = data_dir
        self.data = []
        self.gt = {}
        self.scans = set()
        for item in load_datasets(splits, data_dir=data_dir):
            assert item["path_id"] not in self.gt
            self.gt[item["path_id"]] = item
            instructions = item["instructions"]
            if instruction_limit:
                instructions = instructions[:instruction_limit]
            for j, instr in enumerate(instructions):
                self.scans.add(item["scan"])
                new_item = dict(item)
                new_item["instr_id"] = "%s_%d" % (item["path_id"], j)
                new_item["instructions"] = instr
                if tokenizer:
                    (
                        new_item["instr_encoding"],
                        new_item["instr_length"],
                    ) = tokenizer.encode_sentence(instr)
                self.data.append(new_item)
        self.seed = seed
        self._rng = random.Random(seed)
        self._rng.shuffle(self.data)
        self.ix = 0

    def __len__(self):
        return len(self.data)

    def reset_epoch(self):
        self.ix = 0

    def get_state(self):
        """Serializable iterator state (cursor, item order, shuffle RNG) —
        part of the resumable training checkpoint."""
        return {
            "ix": self.ix,
            "order": [item["instr_id"] for item in self.data],
            "rng_state": self._rng.getstate(),
        }

    def set_state(self, state):
        by_id = {item["instr_id"]: item for item in self.data}
        self.data = [by_id[iid] for iid in state["order"]]
        self.ix = state["ix"]
        self._rng.setstate(state["rng_state"])

    def next_minibatch(self, sort_instr_length: bool = False):
        """Draw the next ``batch_size`` items (wrap-around + reshuffle)."""
        batch = self.data[self.ix : self.ix + self.batch_size]
        if len(batch) < self.batch_size:
            self._rng.shuffle(self.data)
            self.ix = self.batch_size - len(batch)
            batch += self.data[: self.ix]
        else:
            self.ix += self.batch_size
        if sort_instr_length:
            batch = sorted(
                batch, key=lambda item: item["instr_length"], reverse=True
            )
        return batch


def encode_batch(
    batch,
    graph_bank: GraphBank,
    max_instruction_length: int = 80,
    reverse_instructions: bool = True,
):
    """Materialize a minibatch as fixed-shape arrays for the jitted rollout.

    Returns a dict with:
      scan        (B,)   int32 index into graph_bank.scan_ids
      start_node  (B,)   int32 local node index of path[0]
      goal_node   (B,)   int32 local node index of path[-1]
      heading     (B,)   int32 snapped heading step of the initial heading
      seq         (B, L) int32 padded (reversed, EOS-terminated) instruction
      seq_mask    (B, L) bool True at padding
      seq_length  (B,)   int32
    plus python-side metadata lists: instr_id, scan_id, path, item.
    """
    b = len(batch)
    scan = np.zeros((b,), dtype=np.int32)
    start_node = np.zeros((b,), dtype=np.int32)
    goal_node = np.zeros((b,), dtype=np.int32)
    heading = np.zeros((b,), dtype=np.int32)
    for i, item in enumerate(batch):
        sid = item["scan"]
        scan[i] = graph_bank.scan_row(sid)
        start_node[i] = graph_bank.local_index(sid, item["path"][0])
        goal_node[i] = graph_bank.local_index(sid, item["path"][-1])
        heading[i] = snap_heading(item["heading"])

    encodings = [item["instr_encoding"] for item in batch]
    seq, seq_mask, seq_length = batch_instructions(
        encodings, max_instruction_length, reverse=reverse_instructions
    )
    return {
        "scan": scan,
        "start_node": start_node,
        "goal_node": goal_node,
        "heading": heading,
        "seq": seq,
        "seq_mask": seq_mask,
        "seq_length": seq_length,
        "instr_id": [item["instr_id"] for item in batch],
        "scan_id": [item["scan"] for item in batch],
        "path": [item["path"] for item in batch],
        "item": batch,
    }


def encode_gold_paths(batch, graph_bank: GraphBank, max_steps: int = 10):
    """Teacher trajectories as fixed-shape local-node index arrays.

    The reference derives gold trajectories by rolling the teacher policy
    (next hop on the all-pairs-Dijkstra shortest path) through the env
    (tasks/R2R/env.py:823-848), NOT by reading the dataset path — the two
    agree up to shortest-path ties.  We therefore walk our own precomputed
    ``next_hop`` matrix so the host-side gold path always matches the
    on-device teacher.

    Returns (nodes (B, max_steps+1) int32 padded by repeating the goal,
    path_len (B,) int32 = number of teacher actions, stop included).
    """
    b = len(batch)
    nodes = np.zeros((b, max_steps + 1), dtype=np.int32)
    path_len = np.zeros((b,), dtype=np.int32)
    for i, item in enumerate(batch):
        sid = item["scan"]
        s = graph_bank.scan_row(sid)
        cur = graph_bank.local_index(sid, item["path"][0])
        goal = graph_bank.local_index(sid, item["path"][-1])
        p = [cur]
        while cur != goal and len(p) <= max_steps:
            cur = int(graph_bank.next_hop[s, cur, goal])
            assert cur >= 0, "goal unreachable"
            p.append(cur)
        p = p[: max_steps + 1]
        nodes[i, : len(p)] = p
        nodes[i, len(p) :] = p[-1]
        # actions = moves + the stop action (if it still fits in max_steps)
        path_len[i] = min(len(p), max_steps)
    return nodes, path_len
