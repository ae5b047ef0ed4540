"""Data augmentation CLI
(replaces tasks/R2R/data_augmentation_from_speaker.py).

  python -m speaker_follower_tpu.cli.augment SPEAKER_CKPT OUTPUT_PREFIX \
      [--pred_splits data_augmentation_paths] \
      [--follower_prefix F --rational_speaker_weights 0.95]
"""

from __future__ import annotations

from ..data.text import Tokenizer, read_vocab
from ..inference.augmentation import augment_from_speaker
from ..training import checkpoint as ckpt
from ..utils.misc import run
from . import common


def make_arg_parser():
    import argparse

    parser = argparse.ArgumentParser()
    common.add_common_args(parser)
    parser.add_argument("speaker_model_prefix")
    parser.add_argument("pred_results_output_file")
    parser.add_argument(
        "--pred_splits", nargs="+", default=["data_augmentation_paths"]
    )
    parser.add_argument(
        "--pred_data_dir", default=None,
        help="directory holding R2R_<split>.json for the pred splits "
        "(e.g. the output of scripts/sample_augmentation_paths.py); "
        "default: the standard data dir",
    )
    parser.add_argument("--follower_model_prefix")
    parser.add_argument("--rational_speaker_weights", type=float, nargs="+")
    parser.add_argument("--rational_speaker_n_candidates", type=int, default=40)
    parser.set_defaults(batch_size=20)
    return parser


def entry_point(args):
    vocab = read_vocab(common.resolve_vocab(args))
    tok = Tokenizer(vocab=vocab)
    datasets, bank, tables, feature_dim = common.build_world(
        args, {s: s for s in args.pred_splits}, tok,
        data_dirs={s: args.pred_data_dir for s in args.pred_splits},
    )
    speaker_params = ckpt.load_params(args.speaker_model_prefix)
    follower_params = (
        ckpt.load_params(args.follower_model_prefix)
        if args.follower_model_prefix
        else None
    )
    outputs = augment_from_speaker(
        speaker_params,
        tables,
        bank,
        tok,
        args.pred_splits,
        args.pred_results_output_file,
        data_dir=args.pred_data_dir,
        follower_params=follower_params,
        rational_speaker_weights=args.rational_speaker_weights,
        n_candidates=args.rational_speaker_n_candidates,
        use_glove=not args.use_train_subset,
    )
    for name, (summary, path) in outputs.items():
        for metric, val in summary.items():
            print(f"pred {name} {metric}\t{val}")
        print(f"wrote {path}")


if __name__ == "__main__":
    run(make_arg_parser(), entry_point)
