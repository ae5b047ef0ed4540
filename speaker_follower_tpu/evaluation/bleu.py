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
