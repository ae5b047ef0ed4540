"""Speaker training CLI (replaces tasks/R2R/train_speaker.py).

Smoke run without downloads:
  python -m speaker_follower_tpu.cli.train_speaker --use_train_subset \
      --image_feature_type random --n_iters 200 --batch_size 16
"""

from __future__ import annotations

import argparse

import jax

from ..data.text import Tokenizer, read_vocab
from ..models.speaker import init_speaker
from ..training.trainer import SpeakerTrainer
from ..utils.misc import run
from . import common


def make_arg_parser():
    parser = argparse.ArgumentParser()
    common.add_common_args(parser)
    parser.add_argument("--n_iters", type=int, default=20000)
    parser.add_argument("--use_input_att_feed", action="store_true")
    parser.add_argument("--seed", type=int, default=1)
    return parser


def train_setup(args):
    vocab = read_vocab(common.resolve_vocab(args))
    tok = Tokenizer(vocab=vocab)
    train_splits, val_splits = common.resolve_splits(
        args, ["train"], ["val_seen", "val_unseen"]
    )
    split_map = {s: s for s in train_splits + val_splits}
    datasets, bank, tables, feature_dim = common.build_world(args, split_map, tok)

    glove = common.load_glove(args, vocab)
    params = init_speaker(
        jax.random.PRNGKey(args.seed),
        vocab_size=len(vocab),
        action_embedding_size=feature_dim + 128,
        feature_size=feature_dim + 128,
        word_embedding_size=common.WORD_EMBEDDING_SIZE,
        hidden_size=common.HIDDEN_SIZE,
        glove=glove,
        use_input_att_feed=args.use_input_att_feed,
    )
    prefix = "speaker_teacher_%s" % common.feature_name(args)
    if args.use_train_subset:
        prefix = "trainsub_" + prefix
    cfg = common.make_train_config(
        args, prefix, feedback="teacher", use_glove=glove is not None
    )
    val_envs = common.speaker_val_envs(val_splits, datasets)
    trainer = SpeakerTrainer(
        params, tables, datasets[train_splits[0]], bank, cfg,
        tokenizer=tok, val_envs=val_envs, rng=jax.random.PRNGKey(args.seed),
        mesh=common.resolve_mesh(args),
    )
    return trainer, datasets


def train_val(args):
    trainer, _ = train_setup(args)
    trainer.train(args.n_iters)


if __name__ == "__main__":
    run(make_arg_parser(), train_val)
