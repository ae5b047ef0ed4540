"""Follower training CLI (replaces tasks/R2R/train.py).

Usage:
  python -m speaker_follower_tpu.cli.train_follower \
      --feedback_method sample --n_iters 20000 \
      [--use_pretraining --pretrain_splits literal_speaker_data_augmentation_paths \
       --n_pretrain_iters 50000]

Smoke run without downloads:
  python -m speaker_follower_tpu.cli.train_follower --use_train_subset \
      --image_feature_type random --n_iters 200 --batch_size 16
"""

from __future__ import annotations

import argparse

import jax

from ..data.text import Tokenizer, read_vocab
from ..models.follower import init_follower
from ..training.trainer import FollowerTrainer
from ..utils.misc import run
from . import common


def make_arg_parser():
    parser = argparse.ArgumentParser()
    common.add_common_args(parser)
    parser.add_argument(
        "--feedback_method", choices=["sample", "teacher"], default="sample"
    )
    parser.add_argument("--bidirectional", action="store_true")
    parser.add_argument("--n_iters", type=int, default=20000)
    parser.add_argument("--use_pretraining", action="store_true")
    parser.add_argument("--pretrain_splits", nargs="+", default=[])
    parser.add_argument("--pretrain_data_dir", default=None,
                        help="directory holding R2R_{split}.json for the "
                        "pretrain splits (e.g. augmentation output)")
    parser.add_argument("--n_pretrain_iters", type=int, default=50000)
    parser.add_argument("--use_test_set", action="store_true",
                        help="also track metrics on the test split")
    parser.add_argument("--seed", type=int, default=1)
    return parser


def train_setup(args):
    vocab = read_vocab(common.resolve_vocab(args))
    tok = Tokenizer(vocab=vocab)
    val = ["val_seen", "val_unseen"]
    if getattr(args, "use_test_set", False):
        val.append("test")
    train_splits, val_splits = common.resolve_splits(args, ["train"], val)
    split_map = {s: s for s in train_splits + val_splits}
    datasets, bank, tables, feature_dim = common.build_world(args, split_map, tok)
    if args.use_pretraining:
        from ..data.dataset import R2RDataset

        datasets["__pretrain__"] = R2RDataset(
            args.pretrain_splits, tokenizer=tok, batch_size=args.batch_size,
            data_dir=args.pretrain_data_dir,
        )
        assert datasets["__pretrain__"].scans <= set(bank.scan_ids), (
            "pretrain splits must use train scans"
        )

    glove = common.load_glove(args, vocab)
    params = init_follower(
        jax.random.PRNGKey(args.seed),
        vocab_size=len(vocab),
        word_embedding_size=common.WORD_EMBEDDING_SIZE,
        hidden_size=common.HIDDEN_SIZE,
        action_embedding_size=feature_dim + 128,
        feature_size=feature_dim + 128,
        bidirectional=args.bidirectional,
        glove=glove,
    )
    prefix = "follower_%s_%s" % (args.feedback_method, common.feature_name(args))
    if args.use_train_subset:
        prefix = "trainsub_" + prefix
    if args.use_pretraining:
        prefix = prefix.replace("follower", "follower_with_pretraining", 1)
    cfg = common.make_train_config(
        args, prefix, feedback=args.feedback_method, use_glove=glove is not None
    )
    val_envs = common.follower_val_envs(val_splits, datasets, bank)
    trainer = FollowerTrainer(
        params, tables, datasets[train_splits[0]], bank, cfg, val_envs=val_envs,
        rng=jax.random.PRNGKey(args.seed),
        mesh=common.resolve_mesh(args),
    )
    return trainer, datasets, train_splits


def train_val(args):
    trainer, datasets, train_splits = train_setup(args)
    if args.use_pretraining:
        # two-phase: pretrain on the augmented split(s), then finetune
        # (train.py:256-275)
        assert args.pretrain_splits, "must specify at least one pretrain split"
        original = trainer.train_ds
        trainer.train_ds = datasets["__pretrain__"]
        trainer.train(args.n_pretrain_iters)
        trainer.train_ds = original
    trainer.train(args.n_iters)


if __name__ == "__main__":
    run(make_arg_parser(), train_val)
