#!/bin/bash
# Round-5 rescorer A/B: production beam-40 on sub_val_unseen with the
# retrained 20k speaker checkpoints (best-by-BLEU vs best-by-val-loss vs
# the round-3 production speaker, plus an ensemble), each with a dense
# mixture-weight sweep. One run per config; the XLA compile cache makes
# every run after the first start warm.
set -u
cd /root/repo
FOLLOWER=runs/snap_r3/trainsub_follower_with_pretraining_teacher_none_sub_train_iter_11300_sub_val_unseen-success_rate=0.336
OLD_SPEAKER=runs/snap/trainsub_speaker_teacher_none_sub_train_iter_3800_sub_val_unseen-bleu=25.470
WEIGHTS=0,0.5,0.7,0.8,0.9,0.95,1.0
COMMON="--use_train_subset --image_feature_type none --beam_size 40 \
  --batch_size 64 --state_factored_search --fused_search \
  --val_splits sub_val_unseen --speaker_weights $WEIGHTS"

run_one() {  # name speaker [extra args...]
  local name=$1; shift
  local speaker=$1; shift
  echo "=== $name ($speaker) $* ==="
  timeout 3000 python -u -m speaker_follower_tpu.cli.rational_follower \
    "$FOLLOWER" "$speaker" $COMMON "$@" 2>&1 | grep -iv experimental
  echo "=== $name exit=$? ==="
}

NEW_LOSS=$(ls -d runs/snap_r5/*unseen-loss=* | head -1)
NEW_BLEU=$(ls -d runs/snap_r5/*unseen-bleu=* | head -1)

run_one old_speaker_resweep "$OLD_SPEAKER"
run_one new_best_loss "$NEW_LOSS"
run_one new_best_bleu "$NEW_BLEU"
run_one ensemble_old_plus_loss "$OLD_SPEAKER" --ensemble_speakers "$NEW_LOSS"
