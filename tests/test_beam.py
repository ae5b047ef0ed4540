"""Beam search invariants — the reference's own consistency checks
(follower.py:147-166): beam_size=1 must equal the greedy argmax rollout,
and larger beams must dominate the greedy score."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_follower_tpu.agents import beam as ba
from speaker_follower_tpu.agents import rollout as ra
from speaker_follower_tpu.data.dataset import R2RDataset, encode_batch
from speaker_follower_tpu.data.features import random_feature_bank
from speaker_follower_tpu.data.graph import load_graph_bank
from speaker_follower_tpu.data.text import Tokenizer, read_vocab
from speaker_follower_tpu.env import vecenv
from speaker_follower_tpu.models.follower import init_follower

CONN = "/root/reference/connectivity"
FEAT = 32
EP_LEN = 10


@pytest.fixture(scope="module")
def world():
    vocab = read_vocab("/root/reference/tasks/R2R/data/sub_train_vocab.txt")
    tok = Tokenizer(vocab=vocab)
    ds = R2RDataset(["sub_val_seen"], tokenizer=tok, batch_size=6, seed=10)
    keep = sorted(ds.scans)[:3]
    ds.data = [d for d in ds.data if d["scan"] in keep]
    bank = load_graph_bank(keep, CONN)
    feats = random_feature_bank(bank, dim=FEAT, seed=0)
    tables = vecenv.make_env_tables(bank, feats)
    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT + 128, feature_size=FEAT + 128,
    )
    enc = encode_batch(ds.next_minibatch(), bank)
    db = {
        k: jnp.asarray(enc[k])
        for k in ["scan", "start_node", "goal_node", "heading", "seq", "seq_mask", "seq_length"]
    }
    return bank, tables, params, enc, db


def test_beam1_equals_greedy(world):
    bank, tables, params, enc, db = world
    greedy = ra.rollout(
        params, tables, db, jax.random.PRNGKey(0),
        feedback="argmax", episode_len=EP_LEN,
    )
    res = ba.beam_search(params, tables, db, beam_size=1, episode_len=EP_LEN)
    g_trajs = ra.trajectories_from_rollout(greedy, enc, bank)
    b_cands = ba.beam_trajectories(res, enc, bank)
    for gt, cands in zip(g_trajs, b_cands):
        assert len(cands) == 1
        bt = cands[0]
        assert gt["instr_id"] == bt["instr_id"]
        assert gt["actions"] == bt["actions"], (gt["actions"], bt["actions"])
        assert [p[0] for p in gt["trajectory"]] == [p[0] for p in bt["trajectory"]]
        assert abs(gt["score"] - bt["score"]) < 1e-4


def test_beam_topk_dominates_greedy(world):
    bank, tables, params, enc, db = world
    greedy = ra.rollout(
        params, tables, db, jax.random.PRNGKey(0),
        feedback="argmax", episode_len=EP_LEN,
    )
    res = ba.beam_search(params, tables, db, beam_size=8, episode_len=EP_LEN)
    scores = np.asarray(res.scores)
    count = np.asarray(res.count)
    g_score = np.asarray(greedy.score)
    for i in range(scores.shape[0]):
        assert count[i] >= 1
        # best completed beam hypothesis >= greedy trajectory score
        assert scores[i, 0] >= g_score[i] - 1e-4
        # scores are sorted descending
        valid = scores[i, : count[i]]
        assert (np.diff(valid) <= 1e-6).all()


def test_beam_candidates_are_executable(world):
    """Each candidate's action sequence must replay to the same node path."""
    bank, tables, params, enc, db = world
    res = ba.beam_search(params, tables, db, beam_size=4, episode_len=EP_LEN)
    actions = np.asarray(res.actions)
    lengths = np.asarray(res.lengths)
    nodes = np.asarray(res.nodes)
    count = np.asarray(res.count)
    b, k, _ = actions.shape
    for i in range(b):
        sid = enc["scan_id"][i]
        g = bank.graphs[sid]
        for j in range(int(count[i])):
            cur = int(enc["start_node"][i])
            heading = int(enc["heading"][i])
            for t in range(int(lengths[i, j])):
                a = int(actions[i, j, t])
                if a == 0:
                    pass  # stop: stay
                else:
                    count_n = int(g.adj_count[cur])
                    assert 1 <= a <= count_n
                    slot = int(g.adj_perm[cur, heading, a - 1])
                    view = int(g.adj_view[cur, slot])
                    cur = int(g.adj_next[cur, slot])
                    heading = view % 12
                assert int(nodes[i, j, t]) == cur
