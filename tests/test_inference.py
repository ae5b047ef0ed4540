"""Pragmatic inference tests: speaker beam-1 == argmax decode (the
reference's commented consistency check, speaker.py:343-351), rational
follower/speaker end-to-end, and augmentation output format."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_follower_tpu.agents import speaker as sa
from speaker_follower_tpu.data.dataset import R2RDataset, encode_batch
from speaker_follower_tpu.data.features import random_feature_bank
from speaker_follower_tpu.data.graph import load_graph_bank
from speaker_follower_tpu.data.text import EOS_IDX, Tokenizer, read_vocab
from speaker_follower_tpu.env import vecenv
from speaker_follower_tpu.models.follower import init_follower
from speaker_follower_tpu.models.speaker import init_speaker

CONN = "/root/reference/connectivity"
FEAT = 32
MAXLEN = 40


@pytest.fixture(scope="module")
def world():
    vocab = read_vocab("/root/reference/tasks/R2R/data/sub_train_vocab.txt")
    tok = Tokenizer(vocab=vocab)
    ds = R2RDataset(["sub_val_seen"], tokenizer=tok, batch_size=4, seed=10)
    keep = sorted(ds.scans)[:2]
    ds.data = [d for d in ds.data if d["scan"] in keep]
    bank = load_graph_bank(keep, CONN)
    feats = random_feature_bank(bank, dim=FEAT, seed=0)
    tables = vecenv.make_env_tables(bank, feats)
    f_params = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT + 128, feature_size=FEAT + 128,
    )
    s_params = init_speaker(
        jax.random.PRNGKey(1), vocab_size=len(vocab),
        action_embedding_size=FEAT + 128, feature_size=FEAT + 128,
        word_embedding_size=16, hidden_size=32,
    )
    return vocab, tok, ds, bank, tables, f_params, s_params


def _gold(world):
    vocab, tok, ds, bank, tables, f_params, s_params = world
    enc = encode_batch(ds.next_minibatch(), bank,
                       max_instruction_length=MAXLEN, reverse_instructions=False)
    db = {k: jnp.asarray(enc[k]) for k in ["scan", "start_node", "goal_node", "heading"]}
    gold = sa.gold_rollout(tables, db, episode_len=10)
    return enc, gold, int(np.asarray(gold.path_len).max())


def test_speaker_beam1_equals_argmax(world):
    vocab, tok, ds, bank, tables, f_params, s_params = world
    enc, gold, unroll = _gold(world)
    out = sa.score_instructions(
        s_params, gold, jnp.asarray(enc["seq"]), jax.random.PRNGKey(0),
        feedback="argmax", instruction_len=MAXLEN, unroll_len=unroll,
        deterministic=True,
    )
    greedy = sa.speaker_results_from_output(out, enc["instr_id"], tok)
    res = sa.beam_search(
        s_params, gold, beam_size=1, instruction_len=MAXLEN, unroll_len=unroll
    )
    beams = sa.beam_results(res, enc["instr_id"], tok)
    for i, instr_id in enumerate(enc["instr_id"]):
        g = greedy[instr_id]
        assert len(beams[i]) == 1
        b = beams[i][0]
        assert g["word_indices"] == b["word_indices"], (
            g["word_indices"], b["word_indices"]
        )
        assert abs(g["score"] - b["score"]) < 1e-4


def test_speaker_beam_scores_sorted_and_eos_terminated(world):
    vocab, tok, ds, bank, tables, f_params, s_params = world
    enc, gold, unroll = _gold(world)
    res = sa.beam_search(
        s_params, gold, beam_size=5, instruction_len=MAXLEN, unroll_len=unroll
    )
    beams = sa.beam_results(res, enc["instr_id"], tok)
    for cands in beams:
        assert len(cands) >= 1
        scores = [c["score"] for c in cands]
        assert scores == sorted(scores, reverse=True)
        for c in cands:
            assert c["word_indices"][-1] == EOS_IDX or len(c["word_indices"]) == MAXLEN


def test_forced_rollout_matches_gold_on_teacher_actions(world):
    vocab, tok, ds, bank, tables, f_params, s_params = world
    enc, gold, unroll = _gold(world)
    batch = {
        "scan": jnp.asarray(enc["scan"]),
        "start_node": jnp.asarray(enc["start_node"]),
        "heading": jnp.asarray(enc["heading"]),
        "forced_actions": gold.actions,
        "forced_len": gold.path_len,
    }
    replay = sa.forced_rollout(tables, batch, episode_len=10)
    np.testing.assert_array_equal(np.asarray(replay.nodes), np.asarray(gold.nodes))
    np.testing.assert_allclose(
        np.asarray(replay.action_embeddings),
        np.asarray(gold.action_embeddings),
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(replay.path_len), np.asarray(gold.path_len)
    )


@pytest.mark.slow
def test_rational_follower_end_to_end(world, tmp_path):
    from speaker_follower_tpu.evaluation.follower_eval import Evaluation
    from speaker_follower_tpu.inference.rational_follower import (
        run_rational_follower,
    )

    vocab, tok, ds, bank, tables, f_params, s_params = world
    full_bank = load_graph_bank(
        sorted(R2RDataset(["sub_val_seen"]).scans), CONN
    )
    ev = Evaluation(["sub_val_seen"], full_bank)
    # restrict the evaluator to the subset we kept
    kept_ids = {d["instr_id"] for d in ds.data}
    ev.instr_ids = kept_ids

    for sf_mode, phys in [(False, False), (True, False), (True, True)]:
        acc, counts = run_rational_follower(
            ds, ev, f_params, s_params, tables, bank,
            beam_size=3, state_factored_search=sf_mode,
            physical_traversal=phys, max_instruction_length=MAXLEN,
        )
        assert set(acc.keys()) == {0.0, 0.95}
        for w, summary in acc.items():
            assert 0.0 <= summary["success_rate"] <= 1.0
            assert np.isfinite(summary["nav_error"])


def test_rational_follower_include_gold_and_oracle(world, tmp_path):
    """--include_gold / --compute_oracle (rational_follower.py:35-56,
    158-174): gold is candidate 0 of every instance, and since the
    teacher-forced gold trajectory ends at the goal, the oracle pick
    over a pool containing it must be a 100% success rate."""
    from speaker_follower_tpu.evaluation.follower_eval import Evaluation
    from speaker_follower_tpu.inference.rational_follower import (
        run_rational_follower,
    )

    vocab, tok, ds, bank, tables, f_params, s_params = world
    full_bank = load_graph_bank(sorted(R2RDataset(["sub_val_seen"]).scans), CONN)
    ev = Evaluation(["sub_val_seen"], full_bank)
    ev.instr_ids = {d["instr_id"] for d in ds.data}

    out_file = str(tmp_path / "cands.json")
    acc, counts = run_rational_follower(
        ds, ev, f_params, s_params, tables, bank,
        beam_size=3, state_factored_search=True,
        max_instruction_length=MAXLEN,
        include_gold=True, compute_oracle=True, output_file=out_file,
    )
    assert acc["oracle"]["success_rate"] == 1.0
    assert acc["oracle"]["nav_error"] == 0.0
    # gold rank-0 tagging in the dump; scored like any other candidate
    dump = json.load(open(out_file))
    assert dump
    for cands in dump.values():
        assert cands[0]["gold"] is True
        assert all(c["gold"] is False for c in cands[1:])
        assert np.isfinite(cands[0]["speaker_score"])
        assert np.isfinite(cands[0]["follower_score"])

    # the reference's own include_gold+physical_traversal pairing
    # misaligns candidate_inf_states — must refuse, not reproduce
    with pytest.raises(ValueError, match="include_gold"):
        run_rational_follower(
            ds, ev, f_params, s_params, tables, bank,
            beam_size=3, state_factored_search=True,
            physical_traversal=True, include_gold=True,
            max_instruction_length=MAXLEN,
        )


def test_rational_speaker_include_gold(world, tmp_path):
    """--include_gold (rational_speaker.py:36-51, fixed here: the
    reference entry point drops the flag at rational_speaker.py:142-144):
    candidate 0 is the teacher-force-scored GOLD instruction."""
    from speaker_follower_tpu.evaluation.speaker_eval import SpeakerEvaluation
    from speaker_follower_tpu.inference.rational_speaker import (
        run_rational_speaker,
    )

    vocab, tok, ds, bank, tables, f_params, s_params = world
    sev = SpeakerEvaluation(["sub_val_seen"])
    kept_ids = {d["instr_id"] for d in ds.data}
    sev.instr_ids = kept_ids
    by_instr = {d["instr_id"]: d for d in ds.data}

    out_file = str(tmp_path / "spk_cands.json")
    scores_by_weight, _ = run_rational_speaker(
        ds, sev, s_params, f_params, tables, bank, tok,
        n_candidates=3, max_instruction_length=MAXLEN,
        include_gold=True, output_file=out_file,
    )
    assert len(scores_by_weight) == 21
    dump = json.load(open(out_file))
    assert dump
    for iid, cands in dump.items():
        assert cands[0]["gold"] is True
        # gold word_indices = the instance's own encoding (truncated to
        # the scoring window), EOS-terminated like the beam candidates
        gold_enc = [
            int(w) for w in by_instr[iid]["instr_encoding"][: MAXLEN - 1]
        ]
        got = cands[0]["word_indices"]
        assert got[: len(gold_enc)] == gold_enc
        assert np.isfinite(cands[0]["speaker_score"])
        assert np.isfinite(cands[0]["follower_score"])


def test_rational_speaker_end_to_end(world):
    from speaker_follower_tpu.evaluation.speaker_eval import SpeakerEvaluation
    from speaker_follower_tpu.inference.rational_speaker import (
        run_rational_speaker,
    )

    vocab, tok, ds, bank, tables, f_params, s_params = world
    sev = SpeakerEvaluation(["sub_val_seen"])
    kept_ids = {d["instr_id"] for d in ds.data}
    sev.instr_ids = kept_ids

    scores_by_weight, results_by_weight = run_rational_speaker(
        ds, sev, s_params, f_params, tables, bank, tok,
        n_candidates=3, max_instruction_length=MAXLEN,
    )
    assert len(scores_by_weight) == 21
    for w, summary in scores_by_weight.items():
        assert "bleu" in summary


def test_augmentation_output_format(world, tmp_path):
    from speaker_follower_tpu.inference.augmentation import augment_from_speaker

    vocab, tok, ds, bank, tables, f_params, s_params = world
    # the pred split has its own scans -> its own bank/tables
    unseen = R2RDataset(["sub_val_unseen"], tokenizer=tok, batch_size=4)
    ubank = load_graph_bank(sorted(unseen.scans), CONN)
    utables = vecenv.make_env_tables(
        ubank, random_feature_bank(ubank, dim=FEAT, seed=3)
    )
    outputs = augment_from_speaker(
        s_params, utables, ubank, tok, ["sub_val_unseen"],
        str(tmp_path / "aug"), max_instruction_length=MAXLEN,
    )
    (name, (summary, path)), = outputs.items()
    with open(path) as f:
        data = json.load(f)
    assert len(data) > 0
    for item in data[:5]:
        assert set(item.keys()) >= {"scan", "path_id", "path", "heading", "instructions"}
        assert len(item["instructions"]) == 1
        assert isinstance(item["instructions"][0], str)

@pytest.mark.slow
def test_rational_follower_fused_search_matches_host(world):
    """run_rational_follower with fused_search=True must produce the same
    accuracies and choices as the host-orchestrated state-factored path."""
    from speaker_follower_tpu.evaluation.follower_eval import Evaluation
    from speaker_follower_tpu.inference.rational_follower import (
        run_rational_follower,
    )

    vocab, tok, ds, bank, tables, f_params, s_params = world
    full_bank = load_graph_bank(
        sorted(R2RDataset(["sub_val_seen"]).scans), CONN
    )
    ev = Evaluation(["sub_val_seen"], full_bank)
    ev.instr_ids = {d["instr_id"] for d in ds.data}

    out = {}
    state0 = ds.get_state()
    for fused in (False, True):
        # identical batch composition for both runs: the reference's
        # global loop break makes per-instruction results depend on the
        # co-batched instructions, so the iterator state must be pinned
        ds.set_state(state0)
        out[fused] = run_rational_follower(
            ds, ev, f_params, s_params, tables, bank,
            beam_size=3, state_factored_search=True, physical_traversal=True,
            max_instruction_length=MAXLEN, fused_search=fused,
        )
    acc_h, counts_h = out[False]
    acc_f, counts_f = out[True]
    for w in acc_h:
        for k, v in acc_h[w].items():
            np.testing.assert_allclose(v, acc_f[w][k], atol=1e-6, err_msg=f"{w}/{k}")
    assert counts_h == counts_f


def test_speaker_score_candidates_chunked_matches_unchunked(world):
    """max_device_batch chunking (the axon large-replay-batch workaround)
    must be a pure dispatch strategy: same scores as one dispatch,
    including tail-chunk padding."""
    from speaker_follower_tpu.inference.rational_follower import (
        speaker_score_candidates,
    )

    vocab, tok, ds, bank, tables, f_params, s_params = world
    rng = np.random.RandomState(7)
    g0 = bank.graphs[bank.scan_ids[0]]
    inc = np.nonzero(g0.included & (g0.adj_count > 0))[0]
    cands = []
    for j in range(11):  # 11 % 4 != 0: exercises the padded tail chunk
        node = int(inc[rng.randint(len(inc))])
        n_act = rng.randint(1, 5)
        acts = [int(rng.randint(1, g0.adj_count[node] + 1))] + [
            0
        ] * (n_act - 1)
        cands.append({
            "_scan_ix": 0,
            "_start_node": node,
            "_heading": int(rng.randint(12)),
            "actions": acts,
            "instr_encoding": rng.randint(
                4, len(vocab), size=rng.randint(3, 10)
            ).astype(np.int32),
        })
    one = speaker_score_candidates(
        s_params, tables, cands, max_instruction_length=MAXLEN,
        use_glove=False,
    )
    chunked = speaker_score_candidates(
        s_params, tables, cands, max_instruction_length=MAXLEN,
        use_glove=False, max_device_batch=4,
    )
    assert np.isfinite(one).all()
    np.testing.assert_allclose(chunked, one, rtol=2e-5, atol=1e-5)


def test_speaker_score_chunk_auto_resolution():
    """"auto" dispatch sizing: every dispatch costs seconds over the
    tunnel, so pick the LARGEST safe chunk.  The chunk-16 cap belongs to
    the MATERIALIZED replay only (its stacked-gather program faulted the
    axon worker at B >= ~24 on >= ~61-scan worlds, docs/ROUND3.md); the
    lazy replay (the default) measured clean at B=32/64/256/1024 on the
    full 90-scan world (runs/probe_forced_fault_r4.log) and at
    B=2048/4096 with 0.10/0.18 s steady-state dispatches
    (runs/probe_score_phase_r5.log), so it chunks like small worlds
    everywhere: one dispatch up to 4096 candidates (a full beam-40
    batch, 64 x 40 = 2560, is ONE dispatch), 4096-chunks beyond."""
    from speaker_follower_tpu.inference.rational_follower import (
        _resolve_score_chunk,
    )

    # materialized replay keeps the fault-signature cap
    assert _resolve_score_chunk(61, 7829, m=8, lazy_features=False) == 16
    assert _resolve_score_chunk(58, 4000, m=256, lazy_features=False) == 16
    assert _resolve_score_chunk(10, 7700, m=256, lazy_features=False) == 16
    assert _resolve_score_chunk(55, 7418, m=1024, lazy_features=False) is None
    # lazy replay (default): no cap below 4096, even on the full world
    assert _resolve_score_chunk(90, 10800, m=1024) is None
    assert _resolve_score_chunk(61, 7829, m=8) is None
    assert _resolve_score_chunk(90, 10800, m=2560) is None
    assert _resolve_score_chunk(90, 10800, m=4096) is None
    assert _resolve_score_chunk(90, 10800, m=5000) == 4096
    # the 55-scan/7418-node sub-split val world
    assert _resolve_score_chunk(55, 7418, m=1024) is None
    assert _resolve_score_chunk(55, 7418, m=2560) is None
    assert _resolve_score_chunk(5, 500, m=9000) == 4096


def test_fused_teacher_scoring_matches_step_loop(world):
    """score_instructions(fused_teacher=True) — one LSTM scan + batched
    attention — must equal the sequential decoder loop exactly in
    deterministic mode (loss, words, word_scores, active, score)."""
    vocab, tok, ds, bank, tables, f_params, s_params = world
    enc, gold, unroll = _gold(world)
    kw = dict(
        feedback="teacher", instruction_len=MAXLEN, unroll_len=unroll,
        deterministic=True, use_glove=False,
    )
    loop = sa.score_instructions(
        s_params, gold, jnp.asarray(enc["seq"]), jax.random.PRNGKey(0),
        fused_teacher=False, **kw,
    )
    fused = sa.score_instructions(
        s_params, gold, jnp.asarray(enc["seq"]), jax.random.PRNGKey(0),
        fused_teacher=True, **kw,
    )
    np.testing.assert_array_equal(np.asarray(fused.words), np.asarray(loop.words))
    np.testing.assert_array_equal(np.asarray(fused.active), np.asarray(loop.active))
    np.testing.assert_allclose(
        np.asarray(fused.word_scores), np.asarray(loop.word_scores),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(fused.score), np.asarray(loop.score), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        float(fused.loss), float(loop.loss), rtol=1e-5, atol=1e-5
    )

    # gradients flow and match the loop's (training path)
    def loss_of(fused_flag, p):
        return sa.score_instructions(
            p, gold, jnp.asarray(enc["seq"]), jax.random.PRNGKey(0),
            fused_teacher=fused_flag, **kw,
        ).loss

    g_loop = jax.grad(lambda p: loss_of(False, p))(s_params)
    g_fused = jax.grad(lambda p: loss_of(True, p))(s_params)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_loop)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)


def test_fused_teacher_pallas_lstm_matches_xla(world):
    """The Pallas word-chain (ops/lstm.py) inside the fused teacher decode
    (interpret mode on CPU) matches the XLA scan."""
    vocab, tok, ds, bank, tables, f_params, s_params = world
    enc, gold, unroll = _gold(world)
    kw = dict(
        feedback="teacher", instruction_len=MAXLEN, unroll_len=unroll,
        deterministic=True, use_glove=False,
    )
    xla = sa.score_instructions(
        s_params, gold, jnp.asarray(enc["seq"]), jax.random.PRNGKey(0), **kw
    )
    pal = sa.score_instructions(
        s_params, gold, jnp.asarray(enc["seq"]), jax.random.PRNGKey(0),
        use_pallas=True, pallas_interpret=True, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(pal.score), np.asarray(xla.score), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(float(pal.loss), float(xla.loss),
                               rtol=1e-5, atol=1e-5)


def test_lazy_features_scoring_matches_materialized(world):
    """forced_rollout(lazy_features=True) + the encoder's in-scan panorama
    gather must reproduce the materialized (B, T, 36, D) path exactly —
    the structural fix for the axon stacked-gather fault (docs/ROUND3.md)
    must be a pure program transformation."""
    import jax

    from speaker_follower_tpu.agents import speaker as sa
    from speaker_follower_tpu.inference.rational_follower import (
        speaker_score_candidates,
    )

    vocab, tok, ds, bank, tables, f_params, s_params = world
    rng = np.random.RandomState(11)
    g0 = bank.graphs[bank.scan_ids[0]]
    inc = np.nonzero(g0.included & (g0.adj_count > 0))[0]
    cands = []
    for j in range(9):
        node = int(inc[rng.randint(len(inc))])
        n_act = rng.randint(1, 6)
        acts = [int(rng.randint(1, g0.adj_count[node] + 1))
                for _ in range(n_act - 1)] + [0]
        cands.append({
            "_scan_ix": 0,
            "_start_node": node,
            "_heading": int(rng.randint(12)),
            "actions": acts,
            "instr_encoding": rng.randint(
                4, len(vocab), size=rng.randint(3, 10)
            ).astype(np.int32),
        })

    lazy = speaker_score_candidates(
        s_params, tables, cands, max_instruction_length=MAXLEN,
        use_glove=False, lazy_features=True,
    )
    materialized = speaker_score_candidates(
        s_params, tables, cands, max_instruction_length=MAXLEN,
        use_glove=False, lazy_features=False,
    )
    np.testing.assert_allclose(lazy, materialized, rtol=1e-6, atol=1e-6)

    # GoldTrajectories-level exactness: shared fields identical
    b = 8
    batch = {
        "scan": jnp.zeros((b,), jnp.int32),
        "start_node": jnp.asarray(inc[:b].astype(np.int32)),
        "heading": jnp.asarray(rng.randint(12, size=b).astype(np.int32)),
        "forced_actions": jnp.asarray(
            np.stack([
                np.pad(np.asarray([1] * (i % 3 + 1), np.int32),
                       (0, 10 - (i % 3 + 1)))
                for i in range(b)
            ])
        ),
        "forced_len": jnp.asarray((np.arange(b) % 3 + 1).astype(np.int32)),
    }
    g_lazy = sa.forced_rollout(tables, batch, lazy_features=True)
    g_mat = sa.forced_rollout(tables, batch, lazy_features=False)
    np.testing.assert_allclose(  # trig on gathered vs vectorized scalars
        np.asarray(g_lazy.action_embeddings),  # fuses differently: ~1e-7
        np.asarray(g_mat.action_embeddings), atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(g_lazy.actions),
                                  np.asarray(g_mat.actions))
    np.testing.assert_array_equal(np.asarray(g_lazy.nodes),
                                  np.asarray(g_mat.nodes))
    np.testing.assert_array_equal(np.asarray(g_lazy.path_len),
                                  np.asarray(g_mat.path_len))
    assert g_lazy.world_features is None
    # the lazy identity reconstructs the materialized panoramas
    pano = np.asarray(tables.features)[np.asarray(g_lazy.gnode)][:, :, :36]
    loc = np.asarray(tables.loc_embed)[np.asarray(g_lazy.view_index)]
    w = np.concatenate([pano, loc.astype(pano.dtype)], axis=-1)
    live = ~np.asarray(g_lazy.path_mask)
    w = np.where(live[:, :, None, None], w, 0.0)
    np.testing.assert_array_equal(w, np.asarray(g_mat.world_features))


def test_rational_follower_speaker_ensemble(world):
    """Ensemble rescoring semantics: a 2-member ensemble of the SAME
    speaker must reproduce the single-speaker run exactly (mean of
    identical log-likelihoods is the identity), and a mixed ensemble
    must evaluate without error at every weight.  Beyond reference
    parity — the reference scores with exactly one speaker."""
    from speaker_follower_tpu.evaluation.follower_eval import Evaluation
    from speaker_follower_tpu.inference.rational_follower import (
        run_rational_follower,
    )

    vocab, tok, ds, bank, tables, f_params, s_params = world
    full_bank = load_graph_bank(sorted(R2RDataset(["sub_val_seen"]).scans), CONN)
    ev = Evaluation(["sub_val_seen"], full_bank)
    ev.instr_ids = {d["instr_id"] for d in ds.data}

    kw = dict(beam_size=3, max_instruction_length=MAXLEN)
    single, _ = run_rational_follower(
        ds, ev, f_params, s_params, tables, bank, **kw)
    dup, _ = run_rational_follower(
        ds, ev, f_params, [s_params, s_params], tables, bank, **kw)
    assert single.keys() == dup.keys()
    for w in single:
        for metric in single[w]:
            np.testing.assert_allclose(
                single[w][metric], dup[w][metric], rtol=1e-6,
                err_msg=f"duplicate-member ensemble diverged at {w}/{metric}",
            )

    other = init_speaker(
        jax.random.PRNGKey(7), vocab_size=len(vocab),
        action_embedding_size=FEAT + 128, feature_size=FEAT + 128,
        word_embedding_size=16, hidden_size=32,
    )
    mixed, _ = run_rational_follower(
        ds, ev, f_params, [s_params, other], tables, bank, **kw)
    for w, summary in mixed.items():
        assert 0.0 <= summary["success_rate"] <= 1.0
        assert np.isfinite(summary["nav_error"])
