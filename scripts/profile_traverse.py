"""Profile the pragmatic pipeline's host phases on one beam-40 batch.

The round-5 beam-40 run (runs/sf_beam40_r5.log) shows a 2.1 s median
host 'traverse' phase per 64-instruction batch whose obvious cost
(physical-trajectory reconstruction) micro-benchmarks at ~0.15 s — this
cProfiles one real batch end to end to find where the rest goes.

    python scripts/profile_traverse.py [--beam 40] [--cpu] [--n 64]
"""

import argparse
import cProfile
import pstats
import sys

sys.path.insert(0, "/root/repo")

parser = argparse.ArgumentParser()
parser.add_argument("--beam", type=int, default=40)
parser.add_argument("--n", type=int, default=64)
parser.add_argument("--cpu", action="store_true")
args = parser.parse_args()

if args.cpu:
    import jax

    jax.config.update("jax_platforms", "cpu")

from speaker_follower_tpu.data.dataset import R2RDataset
from speaker_follower_tpu.data.features import zero_feature_bank
from speaker_follower_tpu.data.graph import load_graph_bank
from speaker_follower_tpu.data.text import Tokenizer, read_vocab
from speaker_follower_tpu.env import vecenv
from speaker_follower_tpu.evaluation.follower_eval import Evaluation
from speaker_follower_tpu.inference.rational_follower import (
    run_rational_follower,
)
from speaker_follower_tpu.training.checkpoint import load_params

FOLLOWER = (
    "runs/snap_r3/trainsub_follower_with_pretraining_teacher_none_"
    "sub_train_iter_11300_sub_val_unseen-success_rate=0.336"
)
SPEAKER = (
    "runs/snap/trainsub_speaker_teacher_none_sub_train_iter_3800_"
    "sub_val_unseen-bleu=25.470"
)

vocab = read_vocab("/root/reference/tasks/R2R/data/train_vocab.txt")
ds = R2RDataset(
    ["sub_val_unseen"], tokenizer=Tokenizer(vocab=vocab), batch_size=args.n
)
ds.data = ds.data[: args.n]
bank = load_graph_bank(sorted(ds.scans), "/root/reference/connectivity")
tables = vecenv.make_env_tables(bank, zero_feature_bank(bank, dim=2048))
f_params = load_params(FOLLOWER)
s_params = load_params(SPEAKER)
ev = Evaluation(["sub_val_unseen"], bank)
ev.instr_ids = {d["instr_id"] for d in ds.data}

prof = cProfile.Profile()
prof.enable()
acc, _ = run_rational_follower(
    ds, ev, f_params, s_params, tables, bank,
    beam_size=args.beam, state_factored_search=True, fused_search=True,
    physical_traversal=True,
)
prof.disable()
st = pstats.Stats(prof)
st.sort_stats("cumulative").print_stats(40)
print({w: round(s["success_rate"], 3) for w, s in acc.items()})
