#!/bin/bash
# Round-3: runs after the 12k regen training releases the chip.
cd /root/repo
# wait for the trainer to write its exit marker
for i in $(seq 1 200); do
  grep -q "^exit=" runs/follower_twophase12k_teacher.log && break
  sleep 15
done
date
# A/B: per-instruction search cost vs chunk size and straggler repack
timeout 1500 python -u runs/probe_sf_repack.py > runs/probe_sf_repack_r3.log 2>&1
date
# full beam-40 pragmatic pipeline with the regenerated best checkpoint
BEST=$(ls runs/snap_r3 | grep "sub_val_unseen-success_rate" | sort -t= -k2 -g | tail -1)
echo "BEST=$BEST"
timeout 1500 python -m speaker_follower_tpu.cli.rational_follower \
  "runs/snap_r3/$BEST" \
  "runs/snap/trainsub_speaker_teacher_none_sub_train_iter_3800_sub_val_unseen-bleu=25.470" \
  --use_train_subset --image_feature_type none --beam_size 40 --batch_size 64 \
  --state_factored_search --fused_search --physical_traversal \
  --val_splits sub_val_unseen \
  > runs/sf_beam40_best_r3.log 2>&1
date
echo R3_POST_TRAIN_DONE
