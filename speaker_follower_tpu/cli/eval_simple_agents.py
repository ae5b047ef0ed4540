"""Simple-baseline evaluation CLI (replaces tasks/R2R/eval.py:148-163):
run Stop / Shortest / Random on each split and print the R2R metrics."""

from __future__ import annotations

import pprint

from ..agents.baselines import BASELINE_AGENTS
from ..data.text import Tokenizer, read_vocab
from ..evaluation.follower_eval import Evaluation
from ..utils.misc import pretty_json_dump, run
from . import common

pp = pprint.PrettyPrinter(indent=4)


def make_arg_parser():
    import argparse

    parser = argparse.ArgumentParser()
    common.add_common_args(parser)
    parser.add_argument(
        "--splits", nargs="+", default=["val_seen", "val_unseen"]
    )
    parser.set_defaults(image_feature_type="none")
    return parser


def eval_simple_agents(args):
    vocab = read_vocab(common.resolve_vocab(args))
    tok = Tokenizer(vocab=vocab)
    splits = (
        ["sub_" + s for s in args.splits] if args.use_train_subset else args.splits
    )
    datasets, bank, tables, _ = common.build_world(
        args, {s: s for s in splits}, tok
    )
    for split in splits:
        ev = Evaluation([split], bank)
        for name, agent in BASELINE_AGENTS.items():
            results = agent(datasets[split], bank, tables)
            summary, _ = ev.score_results(results)
            print(f"\n{name} on {split}")
            pp.pprint(summary)


if __name__ == "__main__":
    run(make_arg_parser(), eval_simple_agents)
