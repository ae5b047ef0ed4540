"""Multi-reference BLEU, numerically identical to moses multi-bleu.perl
(the reference shells out to scripts/multi-bleu.perl via tasks/R2R/bleu.py).

Semantics reproduced exactly:
  * n-gram precisions 1..4 with per-sentence clipped counts against the
    max reference count;
  * reference length = per sentence, the ref length closest to the
    hypothesis length, ties -> the shorter;
  * brevity penalty = exp(1 - ref_len/hyp_len) when hyp shorter;
  * bleu = BP * exp(mean log precision), zero precision -> log = -1e10ish;
  * the reference parses the PRINTED values (bleu.py:20-28), which are
    rounded to 2 decimals (x100) and BP to 3 decimals, and computes
    unpenalized = bleu / BP from those ROUNDED values — we reproduce that
    rounding so numbers match digit for digit.
"""

from __future__ import annotations

import math
from collections import Counter


def _ngrams(tokens, n):
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def corpus_stats(multiple_references, hypotheses):
    """Accumulate correct/total per n plus length stats."""
    correct = [0] * 5  # index 1..4
    total = [0] * 5
    hyp_len = 0
    ref_len = 0
    for refs, hyp in zip(multiple_references, hypotheses):
        hyp_len += len(hyp)
        closest_diff, closest_length = float("inf"), float("inf")
        max_ref_counts = {}
        for ref in refs:
            diff = abs(len(hyp) - len(ref))
            if diff < closest_diff:
                closest_diff, closest_length = diff, len(ref)
            elif diff == closest_diff:
                closest_length = min(closest_length, len(ref))
            for n in range(1, 5):
                for ng, c in _ngrams(ref, n).items():
                    if max_ref_counts.get(ng, 0) < c:
                        max_ref_counts[ng] = c
        ref_len += closest_length
        for n in range(1, 5):
            for ng, c in _ngrams(hyp, n).items():
                total[n] += c
                correct[n] += min(c, max_ref_counts.get(ng, 0))
    return correct, total, hyp_len, ref_len


def multi_bleu(multiple_references, hypotheses):
    """Returns (bleu, unpenalized_bleu) scaled to [0, 100], with the same
    print-rounding the reference pipeline applies (bleu.py:20-28)."""
    num_refs = len(multiple_references[0])
    assert all(len(r) == num_refs for r in multiple_references)
    correct, total, hyp_len, ref_len = corpus_stats(multiple_references, hypotheses)

    if ref_len == 0:
        return 0.0, 0.0

    precisions = [0.0] * 5
    for n in range(1, 5):
        precisions[n] = (correct[n] / total[n]) if total[n] else 0.0

    brevity_penalty = 1.0
    if hyp_len < ref_len:
        brevity_penalty = math.exp(1 - ref_len / hyp_len) if hyp_len > 0 else 0.0

    def safe_log(x):
        return math.log(x) if x else -9999999999.0

    bleu = brevity_penalty * math.exp(
        sum(safe_log(precisions[n]) for n in range(1, 5)) / 4.0
    )

    # reproduce the printf + regex-parse rounding of the reference pipeline
    bleu_printed = round(100 * bleu, 2)
    bp_printed = round(brevity_penalty, 3)
    unpenalized = bleu_printed / bp_printed if bp_printed != 0 else 0.0
    return bleu_printed, unpenalized


def single_bleu(references, hypotheses):
    return multi_bleu([[ref] for ref in references], hypotheses)


def read_file(fname):
    """One tokenized sentence per line (bleu.py:36-38)."""
    with open(fname) as f:
        return [line.split() for line in f]


def main(argv=None):
    """Standalone scorer, the reference's ``python bleu.py ref hyp``
    surface (bleu.py:74-110).  Prints one number: corpus BLEU in
    [0, 100] by default, or the mean sentence-level BLEU with
    ``--sentence_level``.

    ``--nltk`` scores with nltk.translate.bleu_score instead (nltk's
    scale is [0, 1]; printed as-is, like the reference).  Upstream
    deviation, implemented as intended here: at corpus level the
    reference computes the nltk score and then unconditionally
    overwrites it with the perl-pipeline score (bleu.py:104-108 — the
    assignment is not in an else), so its --nltk is dead without
    --sentence_level."""
    import argparse

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("ref_fname")
    parser.add_argument("hyp_fname")
    parser.add_argument("--sentence_level", action="store_true")
    parser.add_argument("--nltk", action="store_true")
    args = parser.parse_args(argv)

    refs = read_file(args.ref_fname)
    hyps = read_file(args.hyp_fname)
    if len(refs) != len(hyps):
        raise SystemExit(
            f"line-count mismatch: {len(refs)} references vs "
            f"{len(hyps)} hypotheses"
        )

    if args.sentence_level:
        if args.nltk:
            import nltk

            scores = [
                nltk.translate.bleu_score.sentence_bleu([ref], hyp)
                for ref, hyp in zip(refs, hyps)
            ]
        else:
            scores = [
                single_bleu([ref], [hyp])[0] for ref, hyp in zip(refs, hyps)
            ]
        result = sum(scores) / len(scores) if scores else 0.0
    elif args.nltk:
        import nltk

        result = nltk.translate.bleu_score.corpus_bleu(
            [[r] for r in refs], hyps
        )
    else:
        result = single_bleu(refs, hyps)[0]

    print(result)


if __name__ == "__main__":
    main()
