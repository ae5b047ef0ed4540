#!/bin/bash
# Round-3: instrumented phase breakdown of fused beam-40 pragmatic
# inference on TPU — A/B of the search chunk size (16 vs 64) over the
# first batches of sub_val_unseen.  Each run is bounded; we only need
# the steady-state per-batch phase lines, not the final metrics.
cd /root/repo
set -x
date
SF_CHUNK=16 timeout 1500 python -m speaker_follower_tpu.cli.rational_follower \
  runs/snap/trainsub_follower_teacher_none_sub_train_iter_2700_sub_val_unseen-success_rate=0.279 \
  runs/snap/trainsub_speaker_teacher_none_sub_train_iter_2800_sub_val_unseen-bleu=17.620 \
  --use_train_subset --image_feature_type none --beam_size 40 --batch_size 64 \
  --state_factored_search --fused_search --physical_traversal \
  --sf_chunk 16 \
  --val_splits sub_val_unseen \
  > runs/probe_sf_phases_c16.log 2>&1 || true
date
timeout 1500 python -m speaker_follower_tpu.cli.rational_follower \
  runs/snap/trainsub_follower_teacher_none_sub_train_iter_2700_sub_val_unseen-success_rate=0.279 \
  runs/snap/trainsub_speaker_teacher_none_sub_train_iter_2800_sub_val_unseen-bleu=17.620 \
  --use_train_subset --image_feature_type none --beam_size 40 --batch_size 64 \
  --state_factored_search --fused_search --physical_traversal \
  --sf_chunk 64 \
  --val_splits sub_val_unseen \
  > runs/probe_sf_phases_c64.log 2>&1 || true
date
echo PROBE_SF_PHASES_DONE
