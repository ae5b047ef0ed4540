"""Speaker validation CLI (replaces tasks/R2R/validate_speaker.py)."""

from __future__ import annotations

from ..training import checkpoint as ckpt
from ..utils.misc import pretty_json_dump, run
from .train_speaker import make_arg_parser as base_parser
from .train_speaker import train_setup


def make_arg_parser():
    parser = base_parser()
    parser.add_argument("model_prefix", help="checkpoint path (params pytree)")
    parser.add_argument(
        "--gold_results_output_file",
        help="also score the TEACHER-forced decode (the model's "
        "likelihood of the gold instructions) and dump it here; the "
        "reference registers this flag but its consumer is commented "
        "out (validate_speaker.py:12-25,45) — implemented as intended",
    )
    parser.add_argument("--pred_results_output_file")
    return parser


def validate_entry_point(args):
    trainer, datasets = train_setup(args)
    trainer.params = ckpt.load_params(args.model_prefix)
    for env_name, (val_ds, evaluator) in sorted(trainer.val_envs.items()):
        if args.gold_results_output_file:
            gold_results, _ = trainer.test(
                val_ds, feedback="teacher", allow_cheat=True
            )
            gold_summary, _ = evaluator.score_results(gold_results)
            for metric, val in gold_summary.items():
                print(f"gold {env_name} {metric}\t{val}")
            with open(
                f"{args.gold_results_output_file}_{env_name}.json", "w"
            ) as f:
                pretty_json_dump(gold_results, f)
        results, _ = trainer.test(val_ds, feedback="argmax")
        summary, _ = evaluator.score_results(results)
        for metric, val in summary.items():
            print(f"pred {env_name} {metric}\t{val}")
        if args.pred_results_output_file:
            with open(f"{args.pred_results_output_file}_{env_name}.json", "w") as f:
                pretty_json_dump(results, f)


if __name__ == "__main__":
    run(make_arg_parser(), validate_entry_point)
