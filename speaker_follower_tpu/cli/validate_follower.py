"""Follower validation CLI (replaces tasks/R2R/validate.py): load a saved
checkpoint, run greedy (or beam) decoding on the val splits, score with the
R2R protocol, optionally dump the EvalAI-format prediction file."""

from __future__ import annotations

import argparse

from ..agents import beam as ba
from ..data.dataset import encode_batch
from ..training import checkpoint as ckpt
from ..utils.misc import pretty_json_dump, run
from . import common
from .train_follower import train_setup


def make_arg_parser():
    from .train_follower import make_arg_parser as base

    parser = base()
    parser.add_argument("model_prefix", help="checkpoint path (params pytree)")
    parser.add_argument("--beam_size", type=int, default=1)
    parser.add_argument("--eval_file")
    return parser


def validate_entry_point(args):
    trainer, datasets, train_splits = train_setup(args)
    trainer.params = ckpt.load_params(args.model_prefix)

    import jax.numpy as jnp
    import numpy as np

    for env_name, (val_ds, evaluator) in sorted(trainer.val_envs.items()):
        if args.beam_size == 1:
            results, _ = trainer.test(val_ds, feedback="argmax")
        else:
            val_ds.reset_epoch()
            results = {}
            looped = False
            while not looped:
                enc = encode_batch(val_ds.next_minibatch(), trainer.graph_bank)
                db = {
                    k: jnp.asarray(enc[k])
                    for k in ["scan", "start_node", "goal_node", "heading",
                              "seq", "seq_mask", "seq_length"]
                }
                res = ba.beam_search(
                    trainer.params, trainer.tables, db,
                    beam_size=args.beam_size,
                    use_glove=trainer.cfg.use_glove,
                )
                for cands in ba.beam_trajectories(res, enc, trainer.graph_bank):
                    top = cands[0]
                    if top["instr_id"] in results:
                        looped = True
                    else:
                        results[top["instr_id"]] = top
        summary, _ = evaluator.score_results(results)
        if args.eval_file:
            eval_results = [
                {"instr_id": iid, "trajectory": r["trajectory"]}
                for iid, r in results.items()
            ]
            with open(f"{args.eval_file}_{env_name}.json", "w") as f:
                pretty_json_dump(eval_results, f)
        for metric, val in sorted(summary.items()):
            print(f"{env_name} {metric}\t{val}")


if __name__ == "__main__":
    run(make_arg_parser(), validate_entry_point)
