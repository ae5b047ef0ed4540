"""Bisect the fused state-factored search's TPU compile-time blowup.

Observed (round 2, v5e): the search program compiles in ~10 s at B=16,
~130 s at B=24, and kills the backend worker at B=32 — superlinear in
batch on the TPU backend ONLY (CPU compile is flat ~6 s at B=4/8/16, so
the blowup lives in a TPU-specific pass).  This probe AOT-compiles the
program across {batch, table_capacity, max_rounds, successor_size} so
the dominating dimension can be identified before restructuring.

Candidate restructure if the (B, K, hidden) h/c carry tables drive it:
store decoder states append-only per round — hist (B, R+1, S, hidden)
plus an int pointer per table entry (successors of one parent share its
h1/c1) — which shrinks state 3x at the production successor_size=1
config and turns the big scatters into dynamic_update_slice appends.

Usage: python scripts/probe_fused_search_compile.py --b 8 16 24          [--capacity 1024] [--rounds 320] [--successors 1]
"""
import sys, time, argparse
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from speaker_follower_tpu.agents import state_factored_fused as sff
from speaker_follower_tpu.data.graph import load_graph_bank
from speaker_follower_tpu.env import vecenv
from speaker_follower_tpu.data.features import random_feature_bank
from speaker_follower_tpu.models.follower import init_follower

ap = argparse.ArgumentParser()
ap.add_argument("--b", type=int, nargs="+", default=[8, 16])
ap.add_argument("--capacity", type=int, default=1024)
ap.add_argument("--rounds", type=int, default=320)
ap.add_argument("--successors", type=int, default=1)
ap.add_argument("--featdim", type=int, default=2048)
args = ap.parse_args()

scans = ["17DRP5sb8fy", "1LXtFkjw3qL"]
bank = load_graph_bank(scans, "/root/reference/connectivity", cache_dir="/root/repo/.cache")
feats = random_feature_bank(bank, dim=args.featdim, seed=0)
tables = vecenv.make_env_tables(bank, feats)
params = init_follower(jax.random.PRNGKey(0), vocab_size=992,
                       action_embedding_size=args.featdim+128,
                       feature_size=args.featdim+128)
params = jax.tree.map(jnp.asarray, params)

for B in args.b:
    seq = jnp.zeros((B, 80), jnp.int32).at[:, 0].set(5).at[:, 1].set(2)
    seql = jnp.full((B,), 2, jnp.int32)
    seqm = seq == 0
    scan_ix = jnp.zeros((B,), jnp.int32)
    node = jnp.zeros((B,), jnp.int32)
    heading = jnp.zeros((B,), jnp.int32)
    t0 = time.time()
    lowered = sff._search_program.lower(
        params, tables, seq, seql, seqm, scan_ix, node, heading,
        completion_size=40, successor_size=args.successors, episode_len=10,
        first_n_ws_key=4, max_rounds=args.rounds,
        table_capacity=args.capacity, use_glove=False,
    )
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    mem = compiled.memory_analysis()
    print(f"B={B:3d} cap={args.capacity} R={args.rounds} "
          f"trace {t1-t0:5.1f}s compile {t2-t1:6.1f}s  mem={mem}")
