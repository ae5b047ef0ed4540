"""Count XLA collectives in the data-parallel pragmatic-inference programs.

The v5e-8 projection for the beam-40 pipeline (runs/README.md, round 5)
rests on one claim: sharding the search/scoring batch over a data mesh
keeps each chip's program identical to the measured single-chip dispatch
at the shard size, so per-round wall-clock does not grow with the global
batch.  This probe makes that claim a measurement instead of an
assertion: it compiles the fused state-factored search and the speaker
candidate-scoring dispatch over the 8-device virtual mesh with
--xla_dump_to, then counts every collective op (all-reduce, all-gather,
reduce-scatter, collective-permute, all-to-all) in the optimized HLO and
reports the operand shapes, i.e. the exact number of bytes that must
cross ICI per dispatch.

Reference workload: /root/reference/tasks/R2R/rational_follower.py:11-195
(the pipeline being sharded).  Run on CPU (deterministic, no tunnel):

    python scripts/probe_mesh_collectives.py
"""

import os
import re
import sys
import tempfile

DUMP = tempfile.mkdtemp(prefix="hlo_dump_")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count=8 --xla_dump_to={DUMP}"
)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# sitecustomize latches the axon platform at interpreter start; this probe
# is a CPU compile-inspection, so override explicitly (env vars alone are
# ignored when the backend is already chosen).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from speaker_follower_tpu.agents import state_factored_fused as sff  # noqa: E402
from speaker_follower_tpu.data.dataset import R2RDataset, encode_batch  # noqa: E402
from speaker_follower_tpu.data.features import random_feature_bank  # noqa: E402
from speaker_follower_tpu.data.graph import load_graph_bank  # noqa: E402
from speaker_follower_tpu.data.text import Tokenizer, read_vocab  # noqa: E402
from speaker_follower_tpu.env import vecenv  # noqa: E402
from speaker_follower_tpu.inference.rational_follower import (  # noqa: E402
    speaker_score_candidates,
)
from speaker_follower_tpu.models.follower import init_follower  # noqa: E402
from speaker_follower_tpu.models.speaker import init_speaker  # noqa: E402
from speaker_follower_tpu.parallel import mesh as pm  # noqa: E402

CONN = "/root/reference/connectivity"
FEAT = 32

COLLECTIVE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\S+)\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start|-done)?\(",
)


def build_world():
    vocab = read_vocab("/root/reference/tasks/R2R/data/sub_train_vocab.txt")
    ds = R2RDataset(["sub_val_seen"], tokenizer=Tokenizer(vocab=vocab),
                    batch_size=8, seed=10)
    keep = sorted(ds.scans)[:2]
    ds.data = [d for d in ds.data if d["scan"] in keep]
    bank = load_graph_bank(keep, CONN)
    feats = random_feature_bank(bank, dim=FEAT, seed=0)
    tables = vecenv.make_env_tables(bank, feats)
    params = init_follower(
        jax.random.PRNGKey(0), vocab_size=len(vocab), word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT + 128,
        feature_size=FEAT + 128,
    )
    enc = encode_batch(ds.next_minibatch(), bank)
    return bank, tables, params, enc, len(vocab)


def scan_dump(tag, since):
    """Collect collectives from optimized-HLO modules dumped after `since`."""
    hits = {}
    files = 0
    for name in os.listdir(DUMP):
        if "after_optimizations" not in name or not name.endswith(".txt"):
            continue
        path = os.path.join(DUMP, name)
        if os.path.getmtime(path) < since:
            continue
        files += 1
        with open(path) as f:
            for line in f:
                m = COLLECTIVE.search(line)
                if m:
                    shape, op = m.group(1), m.group(2)
                    hits.setdefault((op, shape), 0)
                    hits[(op, shape)] += 1
    print(f"[{tag}] optimized modules scanned: {files}")
    if not hits:
        print(f"[{tag}] collectives: NONE")
    for (op, shape), n in sorted(hits.items()):
        print(f"[{tag}] {op:20s} x{n:<3d} operand {shape}")
    return hits


def main():
    import time

    bank, tables, params, enc, vocab_size = build_world()
    mesh = pm.make_mesh()
    print(f"devices: {jax.device_count()}  mesh: {mesh.shape}")

    params_r = pm.replicate(mesh, params)
    tables_r = type(tables)(*[
        jax.device_put(x, pm.replicated(mesh)) for x in tables
    ])
    keys = ["scan", "start_node", "goal_node", "heading", "seq", "seq_mask",
            "seq_length"]
    sharded = pm.shard_batch(mesh, {k: np.asarray(enc[k]) for k in keys})
    enc_s = dict(enc)
    enc_s.update(sharded)

    t0 = time.time()
    cands, _, _ = sff.state_factored_search_fused(
        params_r, tables_r, enc_s, bank,
        completion_size=4, successor_size=2, episode_len=10,
    )
    search_hits = scan_dump("fused_search/mesh8", t0)

    s_params = init_speaker(
        jax.random.PRNGKey(1), vocab_size=vocab_size, word_embedding_size=16,
        hidden_size=32, action_embedding_size=FEAT + 128,
        feature_size=FEAT + 128,
    )
    flat = []
    for i, cl in enumerate(cands):
        for cand in cl:
            cand["_scan_ix"] = int(np.asarray(enc["scan"])[i])
            cand["_start_node"] = int(np.asarray(enc["start_node"])[i])
            cand["_heading"] = int(np.asarray(enc["heading"])[i])
            flat.append(cand)
    s_params_r = pm.replicate(mesh, s_params)
    t1 = time.time()
    speaker_score_candidates(
        s_params_r, tables_r, flat, use_glove=False, max_device_batch=None,
        mesh=mesh,
    )
    score_hits = scan_dump("speaker_score/mesh8", t1)

    search_bytes = _bytes(search_hits)
    score_bytes = _bytes(score_hits)
    print(f"\nICI bytes per search dispatch:  {search_bytes}")
    print(f"ICI bytes per scoring dispatch: {score_bytes}")


_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s16": 2,
                "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "u64": 8}


def _bytes(hits):
    total = 0
    for (op, shape), n in hits.items():
        m = re.match(r"(\w+?)\[([\d,]*)\]", shape)
        if not m:
            continue
        nb = _DTYPE_BYTES.get(m.group(1), 4)
        dims = [int(d) for d in m.group(2).split(",") if d]
        size = nb
        for d in dims:
            size *= d
        total += size * n
    return total


if __name__ == "__main__":
    main()
