#!/bin/bash
# Round-2 TPU work queue — run AFTER the host-orchestrated state-factored
# run releases the chip.  Each step logs into runs/ and tolerates failure.
cd /root/repo
set -x

# 1. fused state-factored search, same split/config as the host run,
#    wall-clock comparison is the point
timeout 7200 python -m speaker_follower_tpu.cli.rational_follower \
  "runs/snap/trainsub_follower_teacher_none_sub_train_iter_2700_sub_val_unseen-success_rate=0.279" \
  "runs/snap/trainsub_speaker_teacher_none_sub_train_iter_2800_sub_val_unseen-bleu=17.620" \
  --use_train_subset --image_feature_type none --beam_size 10 --batch_size 32 \
  --state_factored_search --fused_search --physical_traversal \
  --val_splits sub_val_unseen \
  > runs/sf_full_batch32_fused.log 2>&1 || true

# 2-4. benchmarks: f32 headline, bf16 mixed precision, pallas train path
timeout 2400 python bench.py > runs/bench_r2_f32.json 2> runs/bench_r2_f32.log || true
BENCH_COMPUTE=bf16 timeout 2400 python bench.py \
  > runs/bench_r2_bf16.json 2> runs/bench_r2_bf16.log || true
BENCH_TRAIN_PALLAS=1 timeout 2400 python bench.py \
  > runs/bench_r2_pallas_train.json 2> runs/bench_r2_pallas_train.log || true

# 5-6. retrain the sub-split models WITH word-mapped GloVe (new this
#      round) for better demo checkpoints
timeout 3600 python -m speaker_follower_tpu.cli.train_follower \
  --use_train_subset --image_feature_type none --feedback_method teacher \
  --n_iters 3000 --batch_size 64 --snapshot_dir runs/snap_glove \
  > runs/follower_train_glove.log 2>&1 || true
timeout 3600 python -m speaker_follower_tpu.cli.train_speaker \
  --use_train_subset --image_feature_type none \
  --n_iters 3000 --batch_size 64 --snapshot_dir runs/snap_glove \
  > runs/speaker_train_glove.log 2>&1 || true

echo QUEUE_DONE
