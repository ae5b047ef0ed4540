"""Baseline agents (Stop/Random/Shortest) under the R2R protocol."""

import numpy as np
import pytest

from speaker_follower_tpu.agents.baselines import (
    random_agent,
    shortest_agent,
    stop_agent,
)
from speaker_follower_tpu.data.dataset import R2RDataset
from speaker_follower_tpu.data.features import random_feature_bank
from speaker_follower_tpu.data.graph import load_graph_bank
from speaker_follower_tpu.data.text import Tokenizer, read_vocab
from speaker_follower_tpu.env import vecenv
from speaker_follower_tpu.evaluation.follower_eval import Evaluation

CONN = "/root/reference/connectivity"


@pytest.fixture(scope="module")
def world():
    vocab = read_vocab("/root/reference/tasks/R2R/data/sub_train_vocab.txt")
    ds = R2RDataset(["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab), batch_size=16)
    bank = load_graph_bank(sorted(ds.scans), CONN, cache_dir="/root/repo/.cache")
    tables = vecenv.make_env_tables(bank, random_feature_bank(bank, dim=8, seed=0))
    ev = Evaluation(["sub_val_seen"], bank)
    return ds, bank, tables, ev


def test_stop_agent(world):
    ds, bank, tables, ev = world
    results = stop_agent(ds, bank, tables)
    summary, _ = ev.score_results(results)
    assert summary["success_rate"] < 0.05
    assert summary["steps"] == 0.0


def test_shortest_agent_is_perfect(world):
    ds, bank, tables, ev = world
    results = shortest_agent(ds, bank, tables)
    summary, _ = ev.score_results(results)
    assert summary["success_rate"] == 1.0
    assert summary["nav_error"] == 0.0
    # trajectories exclude the duplicated stop state: steps == path hops
    assert 3.5 < summary["steps"] < 7.0


def test_random_agent_between_stop_and_shortest(world):
    ds, bank, tables, ev = world
    results = random_agent(ds, bank, tables, seed=1)
    summary, _ = ev.score_results(results)
    assert 0.02 < summary["success_rate"] < 0.9
    # random walks move: average trajectory length > 0
    assert summary["lengths"] > 1.0
