"""Real-data parity harness: released torch checkpoints -> val_unseen eval
-> diff vs the reference README's published table, in ONE command.

The BASELINE north star is "val_unseen success within 1 point of the
released models" — this script IS that check.  It needs three artifacts
that are download-only (absent in this environment, verified):

  * released weights   tasks/R2R/snapshots/release/{follower,speaker}_final_release_{enc,dec}
                       (download_*.sh, reference README.md:136-139)
  * image features     img_features/ResNet-152-imagenet.tsv (2.9 GB)
  * full val splits    tasks/R2R/data/R2R_val_{seen,unseen}.json

When every artifact exists the script runs the real comparison; when any
is missing it DRY-RUNS the identical pipeline end-to-end on synthetic
stand-ins (torch checkpoints synthesized at the released shapes via
checkpoint.export_torch_*, a seeded random feature bank, the in-repo
sub_val splits) so the whole path — torch deserialize -> convert ->
greedy eval -> [beam-40 state-factored + speaker rescoring] -> diff —
is exercised today and flips on the moment the downloads land.

Published targets (reference README.md:169 and :142):
  greedy:            val_seen 66.4  val_unseen 35.5
  pragmatic (beam 40 state-factored, speaker weight 0.95):
                     val_seen 70.1  val_unseen 54.6

Usage:
  python scripts/parity_eval.py                   # greedy parity
  python scripts/parity_eval.py --beam_size 40    # + pragmatic parity
  python scripts/parity_eval.py --log runs/parity_eval.log
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_ROOT = "/root/reference"
RELEASE_DIR = os.path.join(DATA_ROOT, "tasks/R2R/snapshots/release")
FEATURE_TSV = os.path.join(DATA_ROOT, "img_features/ResNet-152-imagenet.tsv")

# reference README.md:169 (greedy) and :142 (pragmatic, weight 0.95)
PUBLISHED = {
    "greedy": {"val_seen": 66.4, "val_unseen": 35.5},
    "pragmatic": {"val_seen": 70.1, "val_unseen": 54.6},
}
TOLERANCE_PTS = 1.0  # BASELINE.json north star


def _missing_artifacts(beam_size):
    need = {
        "follower_enc": os.path.join(RELEASE_DIR, "follower_final_release_enc"),
        "follower_dec": os.path.join(RELEASE_DIR, "follower_final_release_dec"),
        "features_tsv": FEATURE_TSV,
        "val_seen": os.path.join(DATA_ROOT, "tasks/R2R/data/R2R_val_seen.json"),
        "val_unseen": os.path.join(
            DATA_ROOT, "tasks/R2R/data/R2R_val_unseen.json"
        ),
    }
    if beam_size > 1:
        need["speaker_enc"] = os.path.join(
            RELEASE_DIR, "speaker_final_release_enc"
        )
        need["speaker_dec"] = os.path.join(
            RELEASE_DIR, "speaker_final_release_dec"
        )
    return need, {k: p for k, p in need.items() if not os.path.exists(p)}


def _synth_release_checkpoints(out_dir, vocab_size, beam_size):
    """Dry-run stand-ins: torch checkpoints with the released models' exact
    key names and shapes (follower: model.py:43-104/355-397 dims; speaker
    likewise), written through the same torch.save format the reference's
    save() used."""
    import jax

    from speaker_follower_tpu.models.follower import init_follower
    from speaker_follower_tpu.models.speaker import init_speaker
    from speaker_follower_tpu.training import checkpoint as ckpt

    paths = {
        "follower_enc": os.path.join(out_dir, "follower_final_release_enc"),
        "follower_dec": os.path.join(out_dir, "follower_final_release_dec"),
    }
    fparams = init_follower(jax.random.PRNGKey(0), vocab_size=vocab_size)
    ckpt.export_torch_follower(
        fparams, paths["follower_enc"], paths["follower_dec"]
    )
    if beam_size > 1:
        paths["speaker_enc"] = os.path.join(
            out_dir, "speaker_final_release_enc"
        )
        paths["speaker_dec"] = os.path.join(
            out_dir, "speaker_final_release_dec"
        )
        sparams = init_speaker(jax.random.PRNGKey(1), vocab_size=vocab_size)
        ckpt.export_torch_speaker(
            sparams, paths["speaker_enc"], paths["speaker_dec"]
        )
    return paths


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--beam_size", type=int, default=1,
                    help="1 = greedy parity only; 40 = + pragmatic parity")
    ap.add_argument("--log", default=None, help="append the verdict JSON here")
    ap.add_argument("--force_dry_run", action="store_true")
    ap.add_argument("--max_items", type=int, default=None,
                    help="smoke mode: evaluate only the first N items per "
                         "split (parity verdicts are then indicative only)")
    ap.add_argument("--skip_greedy", action="store_true",
                    help="run only the pragmatic stage")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force the jax platform (the sitecustomize-latched "
                         "axon backend ignores JAX_PLATFORMS; cpu is useful "
                         "for dry-run smokes when the tunnel is flaky)")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update(
            "jax_platforms",
            {"cpu": "cpu", "tpu": "axon"}[args.platform],
        )

    from speaker_follower_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    need, missing = _missing_artifacts(args.beam_size)
    dry_run = bool(missing) or args.force_dry_run
    mode = "DRY-RUN (synthetic stand-ins)" if dry_run else "REAL"
    print(f"parity_eval mode: {mode}")
    if missing:
        for k, p in sorted(missing.items()):
            print(f"  missing {k}: {p}")

    from speaker_follower_tpu.cli import train_follower as tf_cli
    from speaker_follower_tpu.training import checkpoint as ckpt

    # Assemble the eval environment through the standard CLI plumbing so
    # the harness exercises exactly what a user would run.
    cli_args = ["--no_save", "--batch_size", "64"]
    if dry_run:
        cli_args += ["--use_train_subset", "--image_feature_type", "random"]
    else:
        cli_args += ["--image_feature_type", "mean_pooled"]
    ns = tf_cli.make_arg_parser().parse_args(cli_args)
    trainer, _datasets, _ = tf_cli.train_setup(ns)
    if args.max_items:
        for env_name, (val_ds, evaluator) in trainer.val_envs.items():
            val_ds.data = val_ds.data[: args.max_items]
            keep = {it["instr_id"] for it in val_ds.data}
            evaluator.instr_ids &= keep
    vocab_size = trainer.params["encoder"]["embedding"]["w"].shape[0]

    if dry_run:
        tmp = tempfile.mkdtemp(prefix="parity_synth_")
        paths = _synth_release_checkpoints(tmp, vocab_size, args.beam_size)
    else:
        paths = need

    follower_params = ckpt.convert_torch_follower(
        paths["follower_enc"], paths["follower_dec"]
    )
    got_v = follower_params["encoder"]["embedding"]["w"].shape[0]
    assert got_v == vocab_size, (
        f"released checkpoint vocab {got_v} != env vocab {vocab_size}"
    )
    trainer.params = follower_params

    verdicts = []

    def check(kind, split, measured):
        target = PUBLISHED[kind][split if not dry_run else
                                 split.replace("sub_", "")]
        delta = measured - target
        ok = abs(delta) <= TOLERANCE_PTS
        verdicts.append({
            "kind": kind, "split": split, "measured_pct": round(measured, 2),
            "published_pct": target, "delta_pts": round(delta, 2),
            "within_1pt": ok, "dry_run": dry_run,
        })
        gate = "n/a (synthetic weights)" if dry_run else (
            "PASS" if ok else "FAIL"
        )
        print(f"{kind:10s} {split:16s} measured {measured:5.1f} "
              f"published {target:5.1f} delta {delta:+5.1f}  {gate}")

    # ---- greedy parity (README.md:169)
    if not args.skip_greedy:
        for env_name, (val_ds, evaluator) in sorted(trainer.val_envs.items()):
            results, _ = trainer.test(val_ds, feedback="argmax")
            summary, _ = evaluator.score_results(results)
            check("greedy", env_name, summary["success_rate"] * 100.0)

    # ---- pragmatic parity (README.md:142): beam-40 state-factored search
    # + speaker rescoring at weight 0.95, fused on-device search
    if args.beam_size > 1:
        from speaker_follower_tpu.inference.rational_follower import (
            run_rational_follower,
        )

        speaker_params = ckpt.convert_torch_speaker(
            paths["speaker_enc"], paths["speaker_dec"]
        )
        for env_name, (val_ds, evaluator) in sorted(trainer.val_envs.items()):
            acc_by_w, _ = run_rational_follower(
                val_ds, evaluator, follower_params, speaker_params,
                trainer.tables, trainer.graph_bank,
                beam_size=args.beam_size, state_factored_search=True,
                fused_search=True, physical_traversal=True,
                speaker_weights=(0.95,),
                # speaker scoring chunk: "auto" — the lazy replay (the
                # default) runs clean at B=1024 on the full 90-scan world
                # (runs/probe_forced_fault_r4.log), so no chunk-16 cap
            )
            check(
                "pragmatic", env_name,
                acc_by_w[0.95]["success_rate"] * 100.0,
            )

    if not verdicts:
        sys.exit("parity_eval: no checks ran (--skip_greedy without "
                 "--beam_size > 1 selects nothing)")
    out = {"mode": mode, "verdicts": verdicts,
           "all_within_1pt": all(v["within_1pt"] for v in verdicts)}
    print(json.dumps(out))
    if args.log:
        with open(args.log, "a") as f:
            f.write(json.dumps(out) + "\n")
    if not dry_run and not out["all_within_1pt"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
