"""Tokenizer/vocab parity with the reference implementation.

The reference tasks/R2R/utils.py has no torch top-level imports, so we
import it directly (read-only) and check our tokenizer produces identical
encodings on real instructions.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/tasks/R2R")

from speaker_follower_tpu.data import text as sft_text
from speaker_follower_tpu.data.dataset import load_datasets


@pytest.fixture(scope="module")
def ref_utils():
    import utils as ref_utils  # /root/reference/tasks/R2R/utils.py

    return ref_utils


@pytest.fixture(scope="module")
def vocab():
    return sft_text.read_vocab("/root/reference/tasks/R2R/data/train_vocab.txt")


def test_base_vocab_indices():
    assert sft_text.PAD_IDX == 0
    assert sft_text.UNK_IDX == 1
    assert sft_text.EOS_IDX == 2
    assert sft_text.BOS_IDX == 3


def test_split_sentence_matches_reference(ref_utils):
    sentences = [
        "Walk straight through to doorway!  Turn left, and stop...",
        "go UP the stairs;; then wait.",
        "It's a half-bath -- stop there?!",
        "  Leading   spaces.and.dots.. here ",
        "don't touch the #1 vase (on the left).",
    ]
    for s in sentences:
        assert sft_text.split_sentence(s) == ref_utils.Tokenizer.split_sentence(s)


def test_encode_matches_reference_on_real_data(ref_utils, vocab):
    ref_tok = ref_utils.Tokenizer(vocab=vocab)
    our_tok = sft_text.Tokenizer(vocab=vocab)
    data = load_datasets(["sub_val_seen"])
    for item in data[:50]:
        for instr in item["instructions"]:
            ref_enc, ref_len = ref_tok.encode_sentence(instr)
            our_enc, our_len = our_tok.encode_sentence(instr)
            assert our_len == ref_len
            assert np.array_equal(np.asarray(ref_enc), our_enc)


def test_decode_sentence(vocab):
    tok = sft_text.Tokenizer(vocab=vocab)
    enc, n = tok.encode_sentence("walk straight and stop")
    assert tok.decode_sentence(enc) == "walk straight and stop"
    with_eos = list(enc) + [sft_text.EOS_IDX, 5]
    assert tok.decode_sentence(with_eos, break_on_eos=True, join=False) == [
        "walk",
        "straight",
        "and",
        "stop",
    ]


def test_build_vocab_matches_reference(ref_utils):
    data = load_datasets(["sub_val_seen"])
    ours = sft_text.build_vocab(data, min_count=5)
    # reference build_vocab reads from disk via load_datasets; reproduce its
    # counting logic through its own Tokenizer on the same items
    from collections import Counter

    count = Counter()
    for item in data:
        for instr in item["instructions"]:
            count.update(ref_utils.Tokenizer.split_sentence(instr))
    ref = list(sft_text.BASE_VOCAB)
    for word, num in count.most_common():
        if num >= 5:
            ref.append(word)
        else:
            break
    assert ours == ref


def test_batch_instructions_matches_reference_semantics():
    encs = [np.array([5, 6, 7]), np.array([8]), np.array([9, 10, 11, 12, 13])]
    seq, mask, lengths = sft_text.batch_instructions(encs, max_length=4, reverse=True)
    # reversed + EOS appended + truncated to 4
    assert seq.shape == (3, 4)
    assert list(seq[0]) == [7, 6, 5, sft_text.EOS_IDX]
    assert list(seq[1]) == [8, sft_text.EOS_IDX, 0, 0]
    assert list(seq[2]) == [13, 12, 11, 10]  # truncated before EOS fits
    assert list(lengths) == [4, 2, 4]
    assert mask[1, 2] and mask[1, 3] and not mask[0].any()

    seq_s, mask_s, lengths_s, perm = sft_text.batch_instructions(
        encs, max_length=8, reverse=False, sort=True
    )
    assert list(lengths_s) == [6, 4, 2]
    assert list(perm) == [2, 0, 1]
