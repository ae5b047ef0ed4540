"""Evaluation protocol tests: BLEU parity vs the actual multi-bleu.perl,
and R2R metric semantics on constructed trajectories."""

import os
import re
import subprocess
import tempfile

import numpy as np
import pytest

from speaker_follower_tpu.evaluation.bleu import multi_bleu, single_bleu
from speaker_follower_tpu.evaluation.follower_eval import ERROR_MARGIN, Evaluation

PERL_BLEU = "/root/reference/scripts/multi-bleu.perl"


def perl_multi_bleu(multiple_references, hypotheses):
    """Run the actual moses script the reference uses, parse like bleu.py."""
    d = tempfile.mkdtemp()
    num_refs = len(multiple_references[0])
    for i in range(num_refs):
        with open(os.path.join(d, f"ref{i}"), "w") as f:
            for refs in multiple_references:
                f.write(" ".join(refs[i]) + "\n")
    hyp = os.path.join(d, "hyp")
    with open(hyp, "w") as f:
        for h in hypotheses:
            f.write(" ".join(h) + "\n")
    out = subprocess.run(
        f"perl {PERL_BLEU} {os.path.join(d, 'ref')} < {hyp}",
        shell=True,
        capture_output=True,
        text=True,
    ).stdout
    m = re.match(r"BLEU = ([\d.]+),.*BP=([\d.]+),.*\)", out)
    assert m, out
    bleu = float(m.group(1))
    bp = float(m.group(2))
    return bleu, (bleu / bp if bp != 0 else 0)


@pytest.mark.skipif(not os.path.exists(PERL_BLEU), reason="no perl script")
class TestBleuParity:
    def _check(self, refs, hyps):
        ours = multi_bleu(refs, hyps)
        theirs = perl_multi_bleu(refs, hyps)
        assert abs(ours[0] - theirs[0]) < 1e-9, (ours, theirs)
        assert abs(ours[1] - theirs[1]) < 1e-9, (ours, theirs)

    def test_simple(self):
        refs = [
            [["walk", "to", "the", "door"], ["go", "to", "the", "door"], ["approach", "the", "door"]],
            [["turn", "left", "and", "stop"], ["turn", "left", "then", "stop", "there"], ["go", "left"]],
        ]
        hyps = [["walk", "to", "the", "door"], ["turn", "left", "and", "wait"]]
        self._check(refs, hyps)

    def test_brevity_penalty(self):
        refs = [[["a", "b", "c", "d", "e", "f", "g", "h"]]]
        hyps = [["a", "b", "c", "d"]]
        self._check(refs, hyps)

    def test_random_corpora(self):
        rng = np.random.RandomState(0)
        vocab = ["walk", "turn", "left", "right", "stop", "door", "stairs", "the", "to", "and"]
        refs, hyps = [], []
        for _ in range(25):
            rs = []
            for _ in range(3):
                n = rng.randint(3, 15)
                rs.append([vocab[i] for i in rng.randint(len(vocab), size=n)])
            refs.append(rs)
            n = rng.randint(3, 15)
            hyps.append([vocab[i] for i in rng.randint(len(vocab), size=n)])
        self._check(refs, hyps)

    def test_zero_overlap(self):
        refs = [[["aa", "bb"]]]
        hyps = [["cc", "dd"]]
        self._check(refs, hyps)


class TestFollowerEvaluation:
    @pytest.fixture(scope="class")
    def setup(self):
        from speaker_follower_tpu.data.graph import load_graph_bank
        from speaker_follower_tpu.data.dataset import load_datasets

        data = load_datasets(["sub_val_seen"])
        scans = sorted({d["scan"] for d in data})
        bank = load_graph_bank(scans, "/root/reference/connectivity")
        ev = Evaluation(["sub_val_seen"], bank)
        return data, bank, ev

    def test_gold_paths_score_perfectly(self, setup):
        data, bank, ev = setup
        results = {}
        for item in data:
            for j in range(len(item["instructions"])):
                results["%d_%d" % (item["path_id"], j)] = {
                    "trajectory": [(vp, 0.0, 0.0) for vp in item["path"]]
                }
        summary, scores = ev.score_results(results)
        assert summary["success_rate"] == 1.0
        assert summary["nav_error"] == 0.0
        assert summary["oracle_rate"] == 1.0

    def test_stop_agent_scores(self, setup):
        data, bank, ev = setup
        results = {}
        for item in data:
            for j in range(len(item["instructions"])):
                results["%d_%d" % (item["path_id"], j)] = {
                    "trajectory": [(item["path"][0], 0.0, 0.0)]
                }
        summary, _ = ev.score_results(results)
        # R2R start points are > 3m from goals by construction ("distance"
        # field is ~5-25m), so stopping immediately almost never succeeds
        assert summary["success_rate"] < 0.05
        assert summary["steps"] == 0.0
        # nav_error equals the mean start->goal geodesic distance
        mean_d = np.mean(
            [
                ev._dist(item["scan"], item["path"][0], item["path"][-1])
                for item in data
                for _ in item["instructions"]
            ]
        )
        assert abs(summary["nav_error"] - mean_d) < 1e-4

    def test_missing_ids_assert(self, setup):
        data, bank, ev = setup
        with pytest.raises(AssertionError):
            ev.score_results({})


class TestBleuCli:
    """The standalone scorer surface (reference bleu.py:74-110)."""

    def _write(self, tmp_path, refs, hyps):
        rf, hf = tmp_path / "ref", tmp_path / "hyp"
        rf.write_text("".join(" ".join(r) + "\n" for r in refs))
        hf.write_text("".join(" ".join(h) + "\n" for h in hyps))
        return str(rf), str(hf)

    REFS = [
        ["walk", "to", "the", "door", "and", "stop"],
        ["turn", "left", "then", "stop", "there", "now"],
    ]
    HYPS = [
        ["walk", "to", "the", "door", "and", "wait"],
        ["turn", "left", "and", "stop", "there", "now"],
    ]

    def _run(self, capsys, *argv):
        from speaker_follower_tpu.evaluation.bleu import main

        main(list(argv))
        return float(capsys.readouterr().out.strip())

    def test_corpus_level_matches_single_bleu(self, tmp_path, capsys):
        rf, hf = self._write(tmp_path, self.REFS, self.HYPS)
        got = self._run(capsys, rf, hf)
        assert got == single_bleu(self.REFS, self.HYPS)[0]

    def test_sentence_level_is_mean_of_per_line(self, tmp_path, capsys):
        rf, hf = self._write(tmp_path, self.REFS, self.HYPS)
        got = self._run(capsys, rf, hf, "--sentence_level")
        want = np.mean(
            [single_bleu([r], [h])[0] for r, h in zip(self.REFS, self.HYPS)]
        )
        assert abs(got - want) < 1e-9

    def test_nltk_corpus(self, tmp_path, capsys):
        nltk = pytest.importorskip("nltk")
        rf, hf = self._write(tmp_path, self.REFS, self.HYPS)
        got = self._run(capsys, rf, hf, "--nltk")
        want = nltk.translate.bleu_score.corpus_bleu(
            [[r] for r in self.REFS], self.HYPS
        )
        assert abs(got - want) < 1e-9  # nltk scale [0,1], printed as-is

    def test_line_count_mismatch_exits(self, tmp_path):
        from speaker_follower_tpu.evaluation.bleu import main

        rf, hf = self._write(tmp_path, self.REFS, self.HYPS[:1])
        with pytest.raises(SystemExit, match="mismatch"):
            main([rf, hf])
