"""Pragmatic follower CLI (replaces tasks/R2R/rational_follower.py).

  python -m speaker_follower_tpu.cli.rational_follower \
      FOLLOWER_CKPT SPEAKER_CKPT --beam_size 40 --state_factored_search \
      [--physical_traversal] [--output_file F] [--eval_file F]
"""

from __future__ import annotations

import pprint

from ..data.text import Tokenizer, read_vocab
from ..inference.rational_follower import run_rational_follower
from ..training import checkpoint as ckpt
from ..utils.misc import run
from . import common


def _int_or_auto(s):
    """argparse type for --sf_first_pass: 'auto' or an integer."""
    return s if s == "auto" else int(s)


def make_arg_parser():
    import argparse

    parser = argparse.ArgumentParser()
    common.add_common_args(parser)
    parser.add_argument("follower_prefix")
    parser.add_argument("speaker_prefix")
    parser.add_argument("--beam_size", type=int, default=10)
    parser.add_argument("--state_factored_search", action="store_true")
    parser.add_argument(
        "--fused_search", action="store_true",
        help="run the state-factored search as ONE device program "
        "(fixed-capacity tables) instead of the host-orchestrated loop",
    )
    parser.add_argument("--state_first_n_ws_key", type=int, default=4)
    parser.add_argument(
        "--sf_chunk", type=int, default=None,
        help="fused-search per-dispatch instance cap (default: module "
        "default in agents.state_factored_fused)",
    )
    parser.add_argument(
        "--sf_first_pass", type=_int_or_auto, default=None,
        help="fused-search straggler-repack first-pass round budget: an "
        "integer, or 'auto' for the measured-distribution budget "
        "(agents.state_factored_fused._resolve_first_pass). Default: "
        "repacking OFF (module default; see the measured rationale in "
        "state_factored_search_fused's docstring)",
    )
    parser.add_argument(
        "--speaker_score_batch", type=int, default=None,
        help="chunk speaker replay+scoring dispatches to this many "
        "candidates; default auto (16 only on axon-fault-sized worlds, "
        "else up to 1024 per dispatch; see "
        "inference.rational_follower._resolve_score_chunk)",
    )
    parser.add_argument("--physical_traversal", action="store_true")
    parser.add_argument(
        "--include_gold", action="store_true",
        help="prepend the teacher-forced gold trajectory as candidate 0 "
        "of every instance, scored by both models "
        "(rational_follower.py:35-56); incompatible with "
        "--physical_traversal (see run_rational_follower)",
    )
    parser.add_argument(
        "--compute_oracle", action="store_true",
        help="also report the candidate-pool oracle: per instance pick "
        "the min-nav_error candidate (rational_follower.py:158-174)",
    )
    parser.add_argument(
        "--mask_undo", action="store_true",
        help="flag parity with rational_follower.py:249; in the released "
        "reference the flag only clones the logits and never masks "
        "anything (follower.py:594-597, 812-815), so selection is "
        "identical with or without it — accepted here as the same no-op",
    )
    # --data_parallel comes from common.add_common_args; here it means:
    # shard every search/scoring dispatch over a data mesh of all visible
    # devices (requires --fused_search); params/tables replicated,
    # per-instance arrays split over the mesh.
    parser.add_argument(
        "--speaker_weights", type=lambda s: tuple(float(x) for x in s.split(",")),
        default=(0.0, 0.95),
        help="comma-separated speaker mixture weights to evaluate (the "
             "reference hardcodes [0., 0.95], rational_follower.py:131; "
             "candidate scoring runs once, so extra weights cost only the "
             "host-side argmax + eval pass each)",
    )
    parser.add_argument("--output_file")
    parser.add_argument("--eval_file")
    parser.add_argument(
        "--val_splits", nargs="+", default=None,
        help="restrict evaluation to these splits (default: all val splits)",
    )
    parser.add_argument(
        "--ensemble_speakers", nargs="+", default=None, metavar="PREFIX",
        help="additional speaker checkpoint prefixes; candidates are "
             "rescored by every member and the log-likelihoods averaged "
             "(geometric-mean product-of-experts) before the mixture",
    )
    parser.add_argument(
        "--first_n", type=int, default=None,
        help="evaluate only the first N instructions of each split "
             "(smoke/debug runs; the evaluator is trimmed to match so its "
             "completeness assert still holds over the subset)",
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
    follower_params = ckpt.load_params(args.follower_prefix)
    speaker_params = ckpt.load_params(args.speaker_prefix)
    if args.ensemble_speakers:
        speaker_params = [speaker_params] + [
            ckpt.load_params(p) for p in args.ensemble_speakers
        ]
    use_glove = not args.use_train_subset
    mesh = None
    if args.data_parallel:
        from ..parallel import mesh as pm

        mesh = pm.make_mesh()

    from ..evaluation.follower_eval import Evaluation

    if args.val_splits:
        val_splits = [s for s in val_splits if s in args.val_splits]
        assert val_splits, f"--val_splits matched nothing: {args.val_splits}"
    for env_name in sorted(val_splits):
        eval_file = (
            f"{args.eval_file}_{env_name}_speaker_weight_%.2f.json"
            if args.eval_file
            else None
        )
        output_file = f"{args.output_file}_{env_name}.json" if args.output_file else None
        evaluator = Evaluation([env_name], bank)
        if args.first_n is not None:
            ds = datasets[env_name]
            ds.data = ds.data[: args.first_n]
            keep_ids = {d["instr_id"] for d in ds.data}
            evaluator.instr_ids = {
                i for i in evaluator.instr_ids if i in keep_ids
            }
        acc, counts = run_rational_follower(
            datasets[env_name],
            evaluator,
            follower_params,
            speaker_params,
            tables,
            bank,
            beam_size=args.beam_size,
            state_factored_search=args.state_factored_search,
            fused_search=args.fused_search,
            fused_search_chunk=args.sf_chunk,
            fused_first_pass=args.sf_first_pass,
            state_first_n_ws_key=args.state_first_n_ws_key,
            physical_traversal=args.physical_traversal,
            use_glove=use_glove,
            mesh=mesh,
            output_file=output_file,
            eval_file=eval_file,
            speaker_score_batch=(
                args.speaker_score_batch
                if args.speaker_score_batch is not None else "auto"
            ),
            include_gold=args.include_gold,
            compute_oracle=args.compute_oracle,
            speaker_weights=args.speaker_weights,
        )
        pprint.pprint(acc)
        weight, summary = max(
            (kv for kv in acc.items() if kv[0] != "oracle"),
            key=lambda p: p[1]["success_rate"],
        )
        print(f"max success_rate with weight: {weight}")
        for metric, val in summary.items():
            print(f"{env_name} {metric}\t{val}")


if __name__ == "__main__":
    run(make_arg_parser(), validate_entry_point)
