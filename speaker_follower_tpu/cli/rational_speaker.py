"""Pragmatic speaker CLI (replaces tasks/R2R/rational_speaker.py)."""

from __future__ import annotations

import pprint

from ..data.text import Tokenizer, read_vocab
from ..evaluation.speaker_eval import SpeakerEvaluation
from ..inference.rational_speaker import run_rational_speaker
from ..training import checkpoint as ckpt
from ..utils.misc import run
from . import common


def make_arg_parser():
    import argparse

    parser = argparse.ArgumentParser()
    common.add_common_args(parser)
    parser.add_argument("speaker_prefix")
    parser.add_argument("follower_prefix")
    parser.add_argument("--beam_size", type=int, default=10)
    parser.add_argument("--output_file")
    parser.add_argument(
        "--include_gold", action="store_true",
        help="prepend the teacher-force-scored gold instruction as "
        "candidate 0 (rational_speaker.py:36-51; the reference registers "
        "this flag but drops it at rational_speaker.py:142-144 — "
        "implemented as intended here)",
    )
    parser.add_argument(
        "--mask_undo", action="store_true",
        help="flag parity with rational_speaker.py:206; dead in the "
        "released reference (never read by the speaker path) — accepted "
        "as the same no-op",
    )
    parser.set_defaults(batch_size=30)
    return parser


def validate_entry_point(args):
    vocab = read_vocab(common.resolve_vocab(args))
    tok = Tokenizer(vocab=vocab)
    _, val_splits = common.resolve_splits(args, ["train"], ["val_seen", "val_unseen"])
    datasets, bank, tables, feature_dim = common.build_world(
        args, {s: s for s in val_splits}, tok
    )
    speaker_params = ckpt.load_params(args.speaker_prefix)
    follower_params = ckpt.load_params(args.follower_prefix)
    use_glove = not args.use_train_subset

    for env_name in sorted(val_splits):
        output_file = f"{args.output_file}_{env_name}.json" if args.output_file else None
        scores_by_weight, _ = run_rational_speaker(
            datasets[env_name],
            SpeakerEvaluation([env_name]),
            speaker_params,
            follower_params,
            tables,
            bank,
            tok,
            n_candidates=args.beam_size,
            use_glove=use_glove,
            output_file=output_file,
            include_gold=args.include_gold,
        )
        pprint.pprint(scores_by_weight)
        weight, summary = max(scores_by_weight.items(), key=lambda p: p[1]["bleu"])
        print(f"max bleu with weight: {weight}")
        for metric, val in summary.items():
            print(f"{env_name} {metric}\t{val}")


if __name__ == "__main__":
    run(make_arg_parser(), validate_entry_point)
