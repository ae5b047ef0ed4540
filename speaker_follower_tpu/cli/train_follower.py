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
    parser.add_argument("--resume", action="store_true",
                        help="resume a killed run from the "
                        "{prefix}_trainstate checkpoint (full state: "
                        "params, Adam moments, RNG, dataset iterator, "
                        "phase) — the continued validation trajectory is "
                        "bit-identical to the unkilled run")
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
    import os

    trainer, datasets, train_splits = train_setup(args)
    cfg = trainer.cfg
    state_path = (
        None if cfg.no_save
        else os.path.join(cfg.snapshot_dir, cfg.model_prefix + "_trainstate")
    )

    start_phase, start_iter, extra = None, 0, None
    if getattr(args, "resume", False) and state_path and os.path.exists(state_path):
        from ..training import checkpoint as ckpt

        # peek at the phase BEFORE applying: the saved dataset-iterator
        # state belongs to whichever dataset that phase was training on
        state = ckpt.load_state(state_path)
        start_phase = state.get("phase", "main")
        if start_phase == "pretrain":
            trainer.train_ds = datasets["__pretrain__"]
        start_iter = trainer.load_training_state(state_path, state=state)
        extra = trainer.resume_extra
        print(
            "resumed from %s: phase=%s iteration=%d"
            % (state_path, start_phase, start_iter)
        )

    if args.use_pretraining:
        # two-phase: pretrain on the augmented split(s), then finetune
        # (train.py:256-275)
        assert args.pretrain_splits, "must specify at least one pretrain split"
        in_pretrain = start_phase == "pretrain" and start_iter < args.n_pretrain_iters
        if start_phase is None or in_pretrain:
            original = datasets[train_splits[0]]
            trainer.train_ds = datasets["__pretrain__"]
            trainer.train(
                args.n_pretrain_iters,
                start_iter=start_iter if in_pretrain else 0,
                state_path=state_path, phase="pretrain",
                resume_extra=extra if in_pretrain else None,
            )
            trainer.train_ds = original
            start_phase, start_iter, extra = None, 0, None
        elif start_phase == "pretrain":
            # killed exactly at the pretrain/finetune boundary
            trainer.train_ds = datasets[train_splits[0]]
            start_phase, start_iter, extra = None, 0, None
    in_main = start_phase == "main"
    trainer.train(
        args.n_iters,
        start_iter=start_iter if in_main else 0,
        state_path=state_path, phase="main",
        resume_extra=extra if in_main else None,
    )


if __name__ == "__main__":
    run(make_arg_parser(), train_val)
