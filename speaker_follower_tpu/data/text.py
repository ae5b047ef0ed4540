"""Text utilities: vocabulary and tokenizer.

Byte-compatible with the reference tokenizer/vocab handling
(reference: tasks/R2R/utils.py:19-24, 69-148) so that instruction encodings,
vocab files, and released-checkpoint embedding rows line up exactly.

Quirk preserved deliberately: the base vocab is
``['<PAD>', '<UNK>', '<EOS>', '<BOS>']`` but the released ``train_vocab.txt``
has no ``<BOS>`` line — its index 3 is the word "the".  The speaker decoder
nevertheless uses index 3 as BOS (reference: tasks/R2R/utils.py:19-24 with
tasks/R2R/data/train_vocab.txt), so released speaker checkpoints bake the
"the" embedding in as the BOS embedding.  We reproduce that.
"""

from __future__ import annotations

import re
import string
from collections import Counter

import numpy as np

# padding, unknown word, end of sentence, beginning of sentence
BASE_VOCAB = ["<PAD>", "<UNK>", "<EOS>", "<BOS>"]

PAD_IDX = BASE_VOCAB.index("<PAD>")  # 0
UNK_IDX = BASE_VOCAB.index("<UNK>")  # 1
EOS_IDX = BASE_VOCAB.index("<EOS>")  # 2
BOS_IDX = BASE_VOCAB.index("<BOS>")  # 3

_SENTENCE_SPLIT_REGEX = re.compile(r"(\W+)")  # split on any non-alphanumeric


def split_sentence(sentence: str) -> list[str]:
    """Break a sentence into words and punctuation.

    Identical behavior to the reference splitter
    (tasks/R2R/utils.py:80-90): lowercase, split on non-alphanumeric runs,
    explode punctuation-only tokens into characters unless they are all
    full stops (e.g. '..').
    """
    toks = []
    for word in [
        s.strip().lower()
        for s in _SENTENCE_SPLIT_REGEX.split(sentence.strip())
        if len(s.strip()) > 0
    ]:
        if all(c in string.punctuation for c in word) and not all(
            c in "." for c in word
        ):
            toks += list(word)
        else:
            toks.append(word)
    return toks


class Tokenizer:
    """Encode/decode sentences against a fixed vocabulary.

    Matches reference tasks/R2R/utils.py:69-118: encode maps each token to
    its index or <UNK>; no EOS is appended at encode time (EOS/pad handling
    happens at batching time); decode stops at <PAD> (or <EOS> when
    ``break_on_eos``).
    """

    def __init__(self, vocab: list[str] | None = None):
        self.vocab = vocab
        self.word_to_index: dict[str, int] = {}
        if vocab:
            for i, word in enumerate(vocab):
                self.word_to_index[word] = i

    def encode_sentence(self, sentence: str) -> tuple[np.ndarray, int]:
        if not self.word_to_index:
            raise ValueError("Tokenizer has no vocab")
        encoding = [
            self.word_to_index.get(word, UNK_IDX)
            for word in split_sentence(sentence)
        ]
        arr = np.array(encoding, dtype=np.int64)
        return arr, len(encoding)

    def decode_sentence(self, encoding, break_on_eos: bool = False, join: bool = True):
        stop_idx = EOS_IDX if break_on_eos else PAD_IDX
        sentence = []
        for ix in encoding:
            if ix == stop_idx:
                break
            sentence.append(self.vocab[ix])
        if join:
            return " ".join(sentence)
        return sentence


def build_vocab(datasets, min_count: int = 5, start_vocab=BASE_VOCAB) -> list[str]:
    """Build a vocab from dataset items (reference tasks/R2R/utils.py:121-134).

    ``datasets`` is an iterable of R2R items with an ``instructions`` list.
    """
    count = Counter()
    for item in datasets:
        for instr in item["instructions"]:
            count.update(split_sentence(instr))
    vocab = list(start_vocab)
    for word, num in count.most_common():
        if num >= min_count:
            vocab.append(word)
        else:
            break
    return vocab


def write_vocab(vocab: list[str], path: str) -> None:
    with open(path, "w") as f:
        for word in vocab:
            f.write("%s\n" % word)


def read_vocab(path: str) -> list[str]:
    with open(path) as f:
        return [word.strip() for word in f.readlines()]


def batch_instructions(
    encoded_instructions,
    max_length: int,
    reverse: bool = False,
    sort: bool = False,
):
    """Pad/truncate encoded instructions into a fixed (N, max_length) array.

    Reproduces reference tasks/R2R/follower.py:75-105
    (batch_instructions_from_encoded): optionally reverse the tokens, append
    EOS, truncate to max_length, pad with <PAD>.  Returns
    ``(seq, mask, lengths[, perm])`` where ``mask`` is True at padding
    positions, and ``perm`` (when ``sort``) sorts by decreasing length.

    Unlike the reference, the returned array always has ``max_length``
    columns (static shapes for XLA); the mask is the source of truth.
    """
    num = len(encoded_instructions)
    seq = np.full((num, max_length), PAD_IDX, dtype=np.int32)
    lengths = np.zeros((num,), dtype=np.int32)
    for i, inst in enumerate(encoded_instructions):
        inst = np.asarray(inst, dtype=np.int32)
        if len(inst) > 0:
            assert inst[-1] != EOS_IDX
        if reverse:
            inst = inst[::-1]
        inst = np.concatenate((inst, [EOS_IDX]))[:max_length]
        seq[i, : len(inst)] = inst
        lengths[i] = len(inst)

    if sort:
        perm = np.argsort(-lengths, kind="stable")
        seq = seq[perm]
        lengths = lengths[perm]

    mask = seq == PAD_IDX
    # a length-L row may contain PAD_IDX==0 only in the padded tail, so the
    # mask is exactly "position >= length"
    if sort:
        return seq, mask, lengths, perm
    return seq, mask, lengths
