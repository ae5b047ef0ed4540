"""Round-3 TPU probe: fused beam-40 search per-instruction cost vs
chunk size and straggler repack.

Pure search timing (no speaker scoring / traversal), 128 sub_val_unseen
instructions, zero features, the shipped 0.318 follower.  Each config's
per-dispatch compile/exec/fetch shows up on stderr via the
[fused_search] lines; this script prints one wall-clock summary line per
config.  Run AFTER any training job releases the chip.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from speaker_follower_tpu.data.dataset import R2RDataset, encode_batch
from speaker_follower_tpu.data.features import zero_feature_bank
from speaker_follower_tpu.data.graph import load_graph_bank
from speaker_follower_tpu.data.text import Tokenizer, read_vocab
from speaker_follower_tpu.env import vecenv
from speaker_follower_tpu.training.checkpoint import load_params
from speaker_follower_tpu.agents.state_factored_fused import (
    state_factored_search_fused,
)

CKPT = (
    "/root/repo/runs/snap/trainsub_follower_with_pretraining_teacher_none_"
    "sub_train_iter_4600_sub_val_unseen-success_rate=0.318"
)

vocab = read_vocab("/root/reference/tasks/R2R/data/train_vocab.txt")
ds = R2RDataset(
    ["sub_val_unseen"], tokenizer=Tokenizer(vocab=vocab), batch_size=128
)
bank = load_graph_bank(sorted(ds.scans), "/root/reference/connectivity")
tables = vecenv.make_env_tables(bank, zero_feature_bank(bank, dim=2048))
params = load_params(CKPT)
enc = encode_batch(ds.next_minibatch(), bank)

CONFIGS = [
    ("chunk16 one-pass", dict(max_device_batch=16, first_pass_rounds=0)),
    ("chunk64 one-pass", dict(max_device_batch=64, first_pass_rounds=0)),
    ("chunk64 repack", dict(max_device_batch=64, first_pass_rounds="auto")),
    ("chunk16 repack", dict(max_device_batch=16, first_pass_rounds="auto")),
]

for name, kw in CONFIGS:
    t0 = time.perf_counter()
    cands, _, _ = state_factored_search_fused(
        params, tables, enc, bank,
        completion_size=40, successor_size=1, episode_len=10,
        use_glove=True, **kw,
    )
    dt = time.perf_counter() - t0
    n = sum(len(c) > 0 for c in cands)
    print(
        f"[probe] {name}: {dt:.1f}s total for 128 instrs "
        f"({dt / 128 * 1000:.0f} ms/instr, {n} with candidates)",
        flush=True,
    )
