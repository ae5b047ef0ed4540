"""Measure the fused-search dedup-table occupancy distribution.

VERDICT r3 weak item 6: ``table_capacity`` (default 1024) was asserted
nowhere against the measured worst-case frontier size.  This probe runs
the production beam-10 and beam-40 state-factored searches over
sub_val_unseen instructions (zero features, the shipped 0.318 follower —
same setup as runs/probe_sf_repack.py, whose lane-round numbers the
round-3 notes cite) and prints the per-lane peak dedup-table occupancy
(`_SFState.peak_in_use`): mean / p50 / p90 / max, per beam size.

The occupancy counts are deterministic (same on CPU and TPU).  Pass
--cpu to pin the host platform (the sitecustomize latches the axon
backend regardless of JAX_PLATFORMS):

    python scripts/probe_sf_capacity.py [--n 128] [--cpu]

The measured numbers size the default capacity; see the capacity note in
agents/state_factored_fused.state_factored_search_fused.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=128, help="instructions to probe")
parser.add_argument("--chunk", type=int, default=64)
parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
args = parser.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

from speaker_follower_tpu.data.dataset import R2RDataset, encode_batch
from speaker_follower_tpu.data.features import zero_feature_bank
from speaker_follower_tpu.data.graph import load_graph_bank
from speaker_follower_tpu.data.text import Tokenizer, read_vocab
from speaker_follower_tpu.env import vecenv
from speaker_follower_tpu.training.checkpoint import load_params
from speaker_follower_tpu.agents import state_factored_fused as sff

CKPT = (
    "/root/repo/runs/snap/trainsub_follower_with_pretraining_teacher_none_"
    "sub_train_iter_4600_sub_val_unseen-success_rate=0.318"
)

vocab = read_vocab("/root/reference/tasks/R2R/data/train_vocab.txt")
ds = R2RDataset(
    ["sub_val_unseen"], tokenizer=Tokenizer(vocab=vocab), batch_size=args.n
)
bank = load_graph_bank(sorted(ds.scans), "/root/reference/connectivity")
tables = vecenv.make_env_tables(bank, zero_feature_bank(bank, dim=2048))
params = load_params(CKPT)
enc = encode_batch(ds.next_minibatch(), bank)

for beam in (10, 40):
    max_rounds = max(100, 8 * beam)  # the module default
    peaks = []
    t0 = time.perf_counter()
    for c0 in range(0, args.n, args.chunk):
        chunk = sff._index_batch(enc, list(range(c0, min(c0 + args.chunk, args.n))))
        out = sff._run_single(
            params, tables, chunk, bank,
            completion_size=beam, successor_size=1, episode_len=10,
            first_n_ws_key=4, max_rounds=max_rounds,
            table_capacity=1024, use_glove=True,
        )
        peaks.append(out[6])
    peaks = np.concatenate(peaks)
    q = lambda p: int(np.percentile(peaks, p))
    print(
        f"[capacity] beam {beam}: n={len(peaks)} peak_in_use "
        f"mean {peaks.mean():.0f} p50 {q(50)} p90 {q(90)} p99 {q(99)} "
        f"max {peaks.max()}  ({time.perf_counter() - t0:.0f}s)",
        flush=True,
    )
