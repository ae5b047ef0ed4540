"""Training loops for follower and speaker.

Replaces tasks/R2R/train.py + train_speaker.py: same recipe (Adam 1e-4,
weight decay 5e-4, batch 100, episode len 10, instruction len 80, dropout
0.5, validation every 100 iters, best-checkpoint tracking keyed on
success_rate / BLEU, CSV logging), but the inner loop is a single jitted
train step — encoder, full episode rollout, loss, backward, and optimizer
update all in one XLA program.
"""

from __future__ import annotations

import csv
import os
import time
from collections import defaultdict
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..agents import rollout as ra
from ..agents import speaker as sa
from ..data.dataset import encode_batch
from ..data.text import batch_instructions
from . import checkpoint as ckpt
from .optim import adam_with_torch_wd, make_frozen_mask

MAX_INPUT_LENGTH = 80  # train.py:26
EPISODE_LEN = 10  # train.py:29
LOG_EVERY = 100  # train.py:39
SAVE_EVERY = 1000  # train.py:40


@dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 5e-4
    dropout_ratio: float = 0.5
    feedback: str = "sample"  # train.py default feedback_method
    episode_len: int = EPISODE_LEN
    max_instruction_length: int = MAX_INPUT_LENGTH
    use_glove: bool = True
    log_every: int = LOG_EVERY
    save_every: int = SAVE_EVERY
    snapshot_dir: str = "snapshots"
    result_dir: str = "results"
    plot_dir: str = "plots"
    model_prefix: str = "follower"
    no_save: bool = False
    # Mixed precision: "bfloat16" runs the rollout's matmuls in bf16 on
    # the MXU while softmax/CE and the Adam update stay f32 (master params
    # are f32; the cast happens inside the loss).  None = pure f32.
    compute_dtype: str | None = None
    # Fused Pallas pano-attention (ops/pano_attention.py, custom-VJP so it
    # trains) — requires view-padded tables (make_env_tables pad_views;
    # XLA paths slice the padding back off, so padded tables are safe
    # everywhere).  Applied to both the train step and eval rollouts.
    use_pallas: bool = False
    pallas_interpret: bool = False  # CPU-testing escape hatch
    # jax.checkpoint around the rollout step: recompute activations in
    # the backward pass instead of storing episode_len of them — for
    # very large episode batches (e.g. 4096 full-dim) that otherwise
    # exceed HBM.  Values are bit-identical (tests/test_rollout.py).
    remat: bool = False
    # Time-batched decoder tail (agents/rollout._factored_tail): the text
    # attention + scoring + CE run once over all T steps outside the scan
    # (no gradient flows through action selection), so their backward
    # batches over time.  Loss/grads equal the in-scan computation exactly
    # (tests/test_rollout_factored.py).  Effective only together with
    # use_pallas: without the bank-score kernel the tail's (T*B, MD)-row
    # XLA gather both negates the win (measured +22 ms at b2048,
    # runs/profile_b2048_factored_r4.log) and executes a large-gather
    # program of the same shape class as the axon worker-fault signature
    # (docs/ROUND3.md; a non-pallas factored CLI run reproduced a worker
    # kill on 2026-08-19).
    factored_loss: bool = True
    # jax.profiler trace dir: captures the SECOND training interval (the
    # first is compile+warmup) on both trainers.  None = off.
    profile_dir: str | None = None
    # Device-resident data pipeline (training/device_data.py): pre-encode
    # the whole training split to device arrays once and run each
    # log_every interval as ONE jitted K-step lax.scan (per-step minibatch
    # = on-device gather of pre-staged rows).  Removes the ~28 ms/iter
    # host dispatch + per-batch encode that otherwise dominates
    # wall-clock on a 1-core host.  False = per-iteration dispatch (the
    # reference's loop shape, train.py:68-166).
    device_data: bool = True


def _drop_superseded_best(last_model_saved: dict, key, new_path: str):
    """Delete the previous best snapshot for ``key`` once a better one is
    saved (reference train.py:144-149: the superseded best is os.remove'd
    so snapshots/ holds one best per (split, metric) plus the periodic
    saves)."""
    old = last_model_saved.get(key)
    if old is not None and old != new_path and os.path.exists(old):
        os.remove(old)
    last_model_saved[key] = new_path


def _device_batch(enc):
    keys = ["scan", "start_node", "goal_node", "heading", "seq", "seq_mask", "seq_length"]
    return {k: jnp.asarray(enc[k]) for k in keys}


class FollowerTrainer:
    def __init__(self, params, tables, train_ds, graph_bank, cfg: TrainConfig,
                 val_envs=None, rng=None, mesh=None):
        """``mesh``: optional jax.sharding.Mesh for data-parallel episode
        sharding — params/optimizer/tables replicated, batches sharded on
        their leading axis (parallel/mesh.py)."""
        # own a private copy: the interval path donates param buffers
        # (donate_argnums), which would otherwise delete the CALLER's
        # arrays out from under them on the first train_interval call
        self.params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        self.tables = tables
        self.train_ds = train_ds
        self.graph_bank = graph_bank
        self.cfg = cfg
        self.val_envs = val_envs or {}
        self.rng = rng if rng is not None else jax.random.PRNGKey(1)
        self.mesh = mesh

        frozen = {"encoder/embedding/w"} if cfg.use_glove else set()
        mask = make_frozen_mask(params, frozen)
        self.tx = adam_with_torch_wd(
            cfg.learning_rate, cfg.weight_decay, trainable_mask=mask
        )
        if mesh is not None:
            from ..parallel import mesh as pm

            # on a 2-D ("data", "model") mesh, column-shard the params
            # (tensor parallelism); a 1-D mesh replicates (shard_params
            # falls back to replication without a model axis)
            self.params = pm.shard_params(mesh, self.params)
            self.tables = type(tables)(
                *[jax.device_put(jnp.asarray(x), pm.replicated(mesh)) for x in tables]
            )
        self.opt_state = self.tx.init(self.params)
        self.data_log = defaultdict(list)
        self._step_fn = self._build_step_fn()
        self._store = None  # lazy DeviceStore (cfg.device_data)
        self._interval_fn = None  # lazy jitted K-step scan
        self._eval_stores = {}  # id(ds) -> DeviceStore for eval epochs
        # outer-jit the eval rollout with positional args: direct calls to
        # the partial-jitted rollout pay ~28ms host dispatch per call
        self._eval_rollouts = {}

    def _eval_rollout(self, feedback, inference=False):
        key = (feedback, inference)
        if key not in self._eval_rollouts:
            cfg = self.cfg

            self._eval_rollouts[key] = jax.jit(
                lambda p, t, b, r: ra.rollout(
                    p, t, b, r,
                    feedback=feedback, episode_len=cfg.episode_len,
                    deterministic=True, use_glove=cfg.use_glove,
                    use_pallas=cfg.use_pallas,
                    pallas_interpret=cfg.pallas_interpret,
                    inference=inference,
                )
            )
        return self._eval_rollouts[key]

    def _maybe_shard(self, batch):
        if self.mesh is None:
            return batch
        from ..parallel import mesh as pm

        return pm.shard_batch(self.mesh, batch)

    def _loss_fn(self, params, tables, batch, rng):
        cfg = self.cfg
        out = ra.rollout(
            params,
            tables,
            batch,
            rng,
            feedback=cfg.feedback,
            episode_len=cfg.episode_len,
            deterministic=False,
            dropout_ratio=cfg.dropout_ratio,
            use_glove=cfg.use_glove,
            compute_dtype=cfg.compute_dtype,
            use_pallas=cfg.use_pallas,
            pallas_interpret=cfg.pallas_interpret,
            remat=cfg.remat,
            factored_loss=cfg.factored_loss and cfg.use_pallas,
        )
        return out.loss

    def _build_step_fn(self):
        @jax.jit
        def step(params, opt_state, tables, batch, rng):
            loss, grads = jax.value_and_grad(self._loss_fn)(
                params, tables, batch, rng
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        return step

    def _get_store(self):
        # keyed by dataset identity: the two-phase CLI swaps train_ds
        # between the pretraining and finetuning phases
        if self._store is None or self._store[0] is not self.train_ds:
            from .device_data import DeviceStore

            self._store = (
                self.train_ds,
                DeviceStore(
                    self.train_ds, self.graph_bank,
                    max_instruction_length=self.cfg.max_instruction_length,
                    mesh=self.mesh,
                ),
            )
        return self._store[1]

    def _get_interval_fn(self):
        """One jitted program for a whole K-step training interval: scan
        over (row-indices, step-keys), per-step on-device gather from the
        pre-staged dataset store, fwd+bwd+Adam per step.  K is baked by
        the idx shape (at most two compilations: log_every + remainder)."""
        if self._interval_fn is None:
            mesh = self.mesh
            tx = self.tx

            def interval(params, opt_state, tables, store_arrays, idx, keys):
                def one_step(carry, xs):
                    p, o = carry
                    ix, k = xs
                    batch = {
                        name: arr[ix] for name, arr in store_arrays.items()
                    }
                    if mesh is not None:
                        from ..parallel import mesh as pm

                        s = pm.data_sharded(mesh)
                        batch = {
                            name: jax.lax.with_sharding_constraint(v, s)
                            for name, v in batch.items()
                        }
                    loss, grads = jax.value_and_grad(self._loss_fn)(
                        p, tables, batch, k
                    )
                    updates, o = tx.update(grads, o, p)
                    p = jax.tree.map(lambda a, u: a + u, p, updates)
                    return (p, o), loss

                (params, opt_state), losses = jax.lax.scan(
                    one_step, (params, opt_state), (idx, keys)
                )
                return params, opt_state, losses

            # donate params/opt_state: the caller rebinds both from the
            # return value, so XLA updates Adam state in place instead
            # of copying ~6x param bytes per interval
            self._interval_fn = jax.jit(interval, donate_argnums=(0, 1))
        return self._interval_fn

    def train_interval(self, n_iters: int):
        if not self.cfg.device_data:
            return self._train_interval_host(n_iters)
        store = self._get_store()
        idx = np.stack(
            [store.rows(self.train_ds.next_minibatch())
             for _ in range(n_iters)]
        )
        # one split call for the whole interval (vs one per iteration):
        # keys[0] becomes the next trainer RNG state, keys[1:] the
        # per-step keys — a deterministic, resumable stream
        keys = jax.random.split(self.rng, n_iters + 1)
        self.rng = keys[0]
        self.params, self.opt_state, losses = self._get_interval_fn()(
            self.params, self.opt_state, self.tables, store.arrays,
            jnp.asarray(idx), keys[1:],
        )
        return [float(x) for x in np.asarray(losses)]

    def _train_interval_host(self, n_iters: int):
        """Per-iteration dispatch (the reference's loop shape) — the
        cfg.device_data=False fallback, and the oracle the scanned
        interval is equivalence-tested against."""
        losses = []
        for _ in range(n_iters):
            batch = self.train_ds.next_minibatch()
            enc = encode_batch(
                batch, self.graph_bank,
                max_instruction_length=self.cfg.max_instruction_length,
            )
            self.rng, step_rng = jax.random.split(self.rng)
            self.params, self.opt_state, loss = self._step_fn(
                self.params, self.opt_state, self.tables,
                self._maybe_shard(_device_batch(enc)), step_rng,
            )
            losses.append(float(loss))
        return losses

    def test(self, ds, feedback="argmax", allow_cheat=False, collect_loss=False):
        """Evaluate once per instruction (reference BaseAgent.test,
        follower.py:135-192): cover the dataset, first occurrence per
        instr_id wins.  With cfg.device_data the whole epoch runs as ONE
        jitted scan over pre-staged minibatches (one dispatch per split
        instead of one per minibatch); otherwise iterate until ids repeat
        (the reference's loop shape)."""
        assert allow_cheat or feedback in ("argmax", "sample")
        if not self.cfg.device_data:
            return self._test_host(ds, feedback, collect_loss)

        from .device_data import DeviceStore, epoch_index_matrix

        store = self._eval_stores.get(id(ds))
        if store is None:
            store = DeviceStore(
                ds, self.graph_bank,
                max_instruction_length=self.cfg.max_instruction_length,
                mesh=self.mesh,
            )
            self._eval_stores[id(ds)] = store
        ds.reset_epoch()
        idx = epoch_index_matrix(ds, store)
        self.rng, key = jax.random.split(self.rng)
        keys = jax.random.split(key, idx.shape[0])
        # pure decoding (no loss requested) runs the inference-mode
        # rollout: no CE bookkeeping, fused in-scan tail under pallas
        inference = not collect_loss and feedback in ("argmax", "sample")
        out = self._get_eval_epoch_fn(feedback, inference)(
            self.params, self.tables, store.arrays, jnp.asarray(idx), keys
        )
        out = jax.tree.map(np.asarray, out)  # one bulk host transfer

        results = {}
        losses = [float(l) for l in out.loss] if collect_loss else []
        for m in range(idx.shape[0]):
            rows = idx[m]
            items = [store.items[r] for r in rows]
            meta = {
                "instr_id": [it["instr_id"] for it in items],
                "scan_id": [it["scan"] for it in items],
                "path": [it["path"] for it in items],
                "item": items,
                "start_node": store.host["start_node"][rows],
                "heading": store.host["heading"][rows],
            }
            out_m = jax.tree.map(lambda x: x[m], out)
            for traj in ra.trajectories_from_rollout(
                out_m, meta, self.graph_bank
            ):
                if traj["instr_id"] not in results:
                    results[traj["instr_id"]] = traj
        return results, losses

    def _get_eval_epoch_fn(self, feedback, inference=False):
        """Jitted full-epoch eval: lax.scan of the rollout over an (M, B)
        row-index matrix (compiles once per (feedback, inference, M, B))."""
        key = ("epoch", feedback, inference)
        if key not in self._eval_rollouts:
            cfg = self.cfg
            mesh = self.mesh

            def epoch(params, tables, store_arrays, idx, keys):
                def one(_, xs):
                    ix, k = xs
                    batch = {
                        name: arr[ix] for name, arr in store_arrays.items()
                    }
                    if mesh is not None:
                        from ..parallel import mesh as pm

                        s = pm.data_sharded(mesh)
                        batch = {
                            name: jax.lax.with_sharding_constraint(v, s)
                            for name, v in batch.items()
                        }
                    out = ra.rollout(
                        params, tables, batch, k,
                        feedback=feedback, episode_len=cfg.episode_len,
                        deterministic=True, use_glove=cfg.use_glove,
                        use_pallas=cfg.use_pallas,
                        pallas_interpret=cfg.pallas_interpret,
                        inference=inference,
                    )
                    return 0, out

                _, outs = jax.lax.scan(one, 0, (idx, keys))
                return outs

            self._eval_rollouts[key] = jax.jit(epoch)
        return self._eval_rollouts[key]

    def _test_host(self, ds, feedback, collect_loss):
        ds.reset_epoch()
        results = {}
        losses = []
        looped = False
        while not looped:
            batch = ds.next_minibatch()
            enc = encode_batch(
                batch, self.graph_bank,
                max_instruction_length=self.cfg.max_instruction_length,
            )
            self.rng, step_rng = jax.random.split(self.rng)
            inference = not collect_loss and feedback in ("argmax", "sample")
            out = self._eval_rollout(feedback, inference)(
                self.params, self.tables,
                self._maybe_shard(_device_batch(enc)), step_rng,
            )
            if collect_loss:
                losses.append(float(out.loss))
            for traj in ra.trajectories_from_rollout(out, enc, self.graph_bank):
                if traj["instr_id"] in results:
                    looped = True
                else:
                    results[traj["instr_id"]] = traj
        return results, losses

    def train(self, n_iters: int, log_every: int | None = None, *,
              start_iter: int = 0, state_path: str | None = None,
              phase: str = "main", resume_extra: dict | None = None):
        """Full training loop with periodic validation + best-ckpt tracking
        (train.py:68-166).

        Resumable, unlike the reference (follower.py:1032 'Loads
        parameters (but not training state)'): with ``state_path`` the
        full training state — params, Adam moments, RNG, dataset
        iterator, logs, best-metric table — is checkpointed atomically
        every ``cfg.save_every`` iters; a killed run restarted with
        ``start_iter``/``resume_extra`` from :meth:`load_training_state`
        reproduces the unkilled run's validation trajectory bit-for-bit
        (tests/test_training.py::test_kill_resume_bit_identical)."""
        cfg = self.cfg
        log_every = log_every or cfg.log_every
        resume_extra = resume_extra or {}
        start = time.time() - float(resume_extra.get("elapsed_s", 0.0))
        best_metrics = dict(resume_extra.get("best_metrics", {}))
        # (env, metric) -> path; old best deleted
        last_model_saved = dict(resume_extra.get("last_model_saved", {}))
        split_string = "-".join(self.train_ds.splits)

        for idx in range(start_iter, n_iters, log_every):
            interval = min(log_every, n_iters - idx)
            it = idx + interval
            self.data_log["iteration"].append(it)
            # profile the 2nd interval (warm) or the only one there is
            profile_now = cfg.profile_dir is not None and (
                idx == log_every or (idx == 0 and n_iters <= log_every)
            )
            if profile_now:
                from ..utils.profiling import xla_trace

                with xla_trace(cfg.profile_dir):
                    losses = self.train_interval(interval)
            else:
                losses = self.train_interval(interval)
            train_loss_avg = float(np.mean(losses))
            self.data_log["train loss"].append(train_loss_avg)
            loss_str = "train loss: %.4f" % train_loss_avg

            for env_name, (val_ds, evaluator) in sorted(self.val_envs.items()):
                # validation loss under training conditions (teacher access)
                _, val_losses = self.test(
                    val_ds, feedback=cfg.feedback.split("+")[-1]
                    if cfg.feedback != "teacher" else "teacher",
                    allow_cheat=True, collect_loss=True,
                )
                val_loss_avg = float(np.mean(val_losses)) if val_losses else 0.0
                self.data_log["%s loss" % env_name].append(val_loss_avg)
                # eval-condition results
                results, _ = self.test(val_ds, feedback="argmax")
                summary, _ = evaluator.score_results(results)
                loss_str += ", %s loss: %.4f" % (env_name, val_loss_avg)
                for metric, val in sorted(summary.items()):
                    self.data_log["%s %s" % (env_name, metric)].append(val)
                    if metric == "success_rate":
                        loss_str += ", %s: %.3f" % (metric, val)
                        key = (env_name, metric)
                        if key not in best_metrics or best_metrics[key] < val:
                            best_metrics[key] = val
                            if not cfg.no_save:
                                path = os.path.join(
                                    cfg.snapshot_dir,
                                    "%s_%s_iter_%d_%s-%s=%.3f"
                                    % (cfg.model_prefix, split_string, it,
                                       env_name, metric, val),
                                )
                                ckpt.save_params(path, self.params)
                                _drop_superseded_best(
                                    last_model_saved, key, path
                                )

            print(
                "%.1fm (%d %d%%) %s"
                % ((time.time() - start) / 60, it, it * 100 // n_iters, loss_str)
            )
            if not cfg.no_save:
                if cfg.save_every and it % cfg.save_every == 0:
                    ckpt.save_params(
                        os.path.join(
                            cfg.snapshot_dir,
                            "%s_%s_iter_%d" % (cfg.model_prefix, split_string, it),
                        ),
                        self.params,
                    )
                self._write_csv(split_string)
            if state_path is not None and cfg.save_every and (
                it % cfg.save_every == 0 or it >= n_iters
            ):
                self.save_training_state(
                    state_path, iteration=it,
                    extra={
                        "phase": phase,
                        "n_iters": n_iters,
                        "elapsed_s": time.time() - start,
                        "best_metrics": best_metrics,
                        "last_model_saved": last_model_saved,
                    },
                )
        return best_metrics

    def save_training_state(self, path: str, iteration: int = 0,
                            extra: dict | None = None):
        """Full resumable state — params, optimizer moments, RNG, logs —
        unlike the reference's weights-only snapshots (follower.py:1032
        'Loads parameters (but not training state)').  Written atomically
        (tmp + rename): a kill mid-save never corrupts the resume point."""
        state = {
            "params": self.params,
            "opt_state": self.opt_state,
            "rng": self.rng,
            "iteration": iteration,
            "data_log": dict(self.data_log),
            "dataset_state": self.train_ds.get_state(),
        }
        if extra:
            state.update(extra)
        tmp = path + ".tmp"
        ckpt.save_state(tmp, state)
        os.replace(tmp, path)

    def load_training_state(self, path: str, state=None) -> int:
        """Restore from :meth:`save_training_state`.  Extra entries
        (phase, best_metrics, ...) land in ``self.resume_extra`` for the
        caller to thread back into :meth:`train`.  ``state`` lets a caller
        that already parsed the file (e.g. to peek at the phase and swap
        train_ds first) skip the second read."""
        if state is None:
            state = ckpt.load_state(path)
        core = ("params", "opt_state", "rng", "iteration", "data_log",
                "dataset_state")
        self.resume_extra = {k: v for k, v in state.items() if k not in core}
        self.params = jax.tree.map(jnp.asarray, state["params"])
        if self.mesh is not None:
            # checkpoints store gathered host arrays; re-place them with
            # the same layout __init__ chose (column-sharded over "model"
            # on a 2-D mesh, replicated on a 1-D data mesh) so a resumed
            # sharded run continues exactly where the killed one stopped
            # (tests/test_parallel.py::test_mesh_train_save_resume_validate)
            from ..parallel import mesh as pm

            self.params = pm.shard_params(self.mesh, self.params)
        # npz checkpoints store optax NamedTuple states as plain tuples;
        # rebuild the containers against a fresh skeleton
        if self.mesh is not None:
            # re-place the restored host values with the same rule that
            # sharded the params: Adam moments mirror the param shapes so
            # shard_params gives them byte-identical specs, and scalars
            # (optax's step count) replicate over the mesh — every leaf
            # committed to the mesh's device set, so the compiled interval
            # fn sees a consistent assembly
            from ..parallel import mesh as pm

            self.opt_state = pm.shard_params(
                self.mesh,
                ckpt.restructure_like(self.tx.init(self.params),
                                      state["opt_state"]),
            )
        else:
            self.opt_state = jax.tree.map(
                jnp.asarray,
                ckpt.restructure_like(self.tx.init(self.params),
                                      state["opt_state"]),
            )
        self.rng = jnp.asarray(state["rng"])
        self.data_log = defaultdict(list, state["data_log"])
        if "dataset_state" in state:
            self.train_ds.set_state(state["dataset_state"])
        return int(state["iteration"])

    def _write_csv(self, split_string):
        os.makedirs(self.cfg.plot_dir, exist_ok=True)
        path = os.path.join(
            self.cfg.plot_dir, "%s_%s_log.csv" % (self.cfg.model_prefix, split_string)
        )
        cols = list(self.data_log.keys())
        n = max(len(v) for v in self.data_log.values())
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(cols)
            for i in range(n):
                w.writerow(
                    [self.data_log[c][i] if i < len(self.data_log[c]) else "" for c in cols]
                )


class SpeakerTrainer:
    def __init__(self, params, tables, train_ds, graph_bank, cfg: TrainConfig,
                 tokenizer=None, val_envs=None, rng=None, mesh=None):
        # private copy — the interval path donates param buffers (see
        # FollowerTrainer.__init__)
        self.params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        self.tables = tables
        self.train_ds = train_ds
        self.graph_bank = graph_bank
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.val_envs = val_envs or {}
        self.rng = rng if rng is not None else jax.random.PRNGKey(2)
        self.mesh = mesh

        # speaker decoder embedding is GloVe-frozen (train_speaker.py:191-193)
        frozen = {"decoder/embedding/w"} if cfg.use_glove else set()
        mask = make_frozen_mask(params, frozen)
        self.tx = adam_with_torch_wd(
            cfg.learning_rate, cfg.weight_decay, trainable_mask=mask
        )
        if mesh is not None:
            from ..parallel import mesh as pm

            # on a 2-D ("data", "model") mesh, column-shard the params
            # (tensor parallelism); a 1-D mesh replicates (shard_params
            # falls back to replication without a model axis)
            self.params = pm.shard_params(mesh, self.params)
            self.tables = type(tables)(
                *[jax.device_put(jnp.asarray(x), pm.replicated(mesh)) for x in tables]
            )
        self.opt_state = self.tx.init(self.params)
        self.data_log = defaultdict(list)
        self._step_fn = self._build_step_fn()
        self._store = None  # lazy DeviceStore (cfg.device_data)
        self._interval_fn = None  # lazy jitted K-step scan
        self._eval_stores = {}  # id(ds) -> DeviceStore for eval epochs
        self._eval_fns = {}

    def _eval_fn(self, feedback, unroll_len):
        key = (feedback, unroll_len)
        if key not in self._eval_fns:
            cfg = self.cfg

            self._eval_fns[key] = jax.jit(
                lambda p, g, seq, r, t: sa.score_instructions(
                    p, g, seq, r,
                    feedback=feedback,
                    instruction_len=cfg.max_instruction_length,
                    unroll_len=unroll_len,
                    deterministic=True,
                    use_glove=cfg.use_glove,
                    use_pallas=cfg.use_pallas,
                    pallas_interpret=cfg.pallas_interpret,
                    tables=t,
                )
            )
        return self._eval_fns[key]

    def _encode_speaker_batch(self, batch):
        enc = encode_batch(
            batch, self.graph_bank,
            max_instruction_length=self.cfg.max_instruction_length,
            reverse_instructions=False,  # speaker instructions are not reversed
        )
        return enc

    def _loss_fn(self, params, gold, instr_seq, unroll_len, rng,
                 encoder_valid_len=None, tables=None):
        cfg = self.cfg
        # use_pallas drives the fused-teacher word chain (ops/lstm.py) AND
        # — with lazy gold trajectories — the fused bank-gather visual
        # attention in the trajectory encoder (ops/pano_attention.py)
        out = sa.score_instructions(
            params, gold, instr_seq, rng,
            feedback="teacher",
            instruction_len=cfg.max_instruction_length,
            unroll_len=unroll_len,
            remat=cfg.remat,
            deterministic=False,
            dropout_ratio=cfg.dropout_ratio,
            use_glove=cfg.use_glove,
            compute_dtype=cfg.compute_dtype,
            encoder_valid_len=encoder_valid_len,
            use_pallas=cfg.use_pallas,
            pallas_interpret=cfg.pallas_interpret,
            tables=tables,
        )
        return out.loss

    def _build_step_fn(self):
        from functools import partial

        # tables is an ARGUMENT (never a closure: closed-over device
        # arrays bake into the executable as constants); only consumed
        # when gold is lazy (cfg.use_pallas)
        @partial(jax.jit, static_argnames=("unroll_len",))
        def step(params, opt_state, gold, instr_seq, rng, tables,
                 unroll_len):
            loss, grads = jax.value_and_grad(self._loss_fn)(
                params, gold, instr_seq, unroll_len, rng, None, tables
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        return step

    def _get_store(self):
        # keyed by dataset identity (see FollowerTrainer._get_store)
        if self._store is None or self._store[0] is not self.train_ds:
            from .device_data import DeviceStore

            self._store = (
                self.train_ds,
                DeviceStore(
                    self.train_ds, self.graph_bank,
                    max_instruction_length=self.cfg.max_instruction_length,
                    reverse_instructions=False,  # speaker targets: not reversed
                    mesh=self.mesh,
                ),
            )
        return self._store[1]

    def _get_interval_fn(self):
        """K-step scanned speaker interval: per-step on-device gather,
        gold-trajectory rollout, teacher-forced scoring, Adam update — one
        dispatch per interval.  Unlike the per-iteration path (which syncs
        max(path_len) to the host to shrink the encoder unroll), the scan
        always unrolls episode_len steps; padded steps are masked
        (path_mask), so values are identical and the whole interval stays
        on device."""
        if self._interval_fn is None:
            cfg = self.cfg
            mesh = self.mesh
            tx = self.tx

            def interval(params, opt_state, tables, store_arrays, idx, keys):
                def one_step(carry, xs):
                    p, o = carry
                    ix, k = xs
                    batch = {
                        name: arr[ix] for name, arr in store_arrays.items()
                    }
                    if mesh is not None:
                        from ..parallel import mesh as pm

                        s = pm.data_sharded(mesh)
                        batch = {
                            name: jax.lax.with_sharding_constraint(v, s)
                            for name, v in batch.items()
                        }
                    gold = sa.gold_rollout(
                        tables, batch, episode_len=cfg.episode_len,
                        lazy_features=cfg.use_pallas,
                    )
                    # traced batch-max path length reproduces the host
                    # path's shrink-wrapped unroll (reference batch-max
                    # semantics) without a per-iteration host sync
                    loss, grads = jax.value_and_grad(self._loss_fn)(
                        p, gold, batch["seq"], cfg.episode_len, k,
                        gold.path_len.max(),
                        tables if cfg.use_pallas else None,
                    )
                    updates, o = tx.update(grads, o, p)
                    p = jax.tree.map(lambda a, u: a + u, p, updates)
                    return (p, o), loss

                (params, opt_state), losses = jax.lax.scan(
                    one_step, (params, opt_state), (idx, keys)
                )
                return params, opt_state, losses

            # donate params/opt_state: the caller rebinds both from the
            # return value, so XLA updates Adam state in place instead
            # of copying ~6x param bytes per interval
            self._interval_fn = jax.jit(interval, donate_argnums=(0, 1))
        return self._interval_fn

    def _gold_and_instr(self, enc):
        db = _device_batch(enc)
        seq = jnp.asarray(enc["seq"])
        if self.mesh is not None:
            from ..parallel import mesh as pm

            db = pm.shard_batch(self.mesh, db)
            seq = jax.device_put(seq, pm.data_sharded(self.mesh))
        gold = sa.gold_rollout(
            self.tables, db, episode_len=self.cfg.episode_len,
            lazy_features=self.cfg.use_pallas,
        )
        unroll_len = int(np.asarray(gold.path_len).max())
        return gold, seq, unroll_len

    def train_interval(self, n_iters: int):
        if not self.cfg.device_data:
            return self._train_interval_host(n_iters)
        store = self._get_store()
        idx = np.stack(
            [store.rows(self.train_ds.next_minibatch())
             for _ in range(n_iters)]
        )
        keys = jax.random.split(self.rng, n_iters + 1)
        self.rng = keys[0]
        self.params, self.opt_state, losses = self._get_interval_fn()(
            self.params, self.opt_state, self.tables, store.arrays,
            jnp.asarray(idx), keys[1:],
        )
        return [float(x) for x in np.asarray(losses)]

    def _train_interval_host(self, n_iters: int):
        """Per-iteration dispatch fallback (cfg.device_data=False) and the
        equivalence oracle for the scanned interval."""
        losses = []
        for _ in range(n_iters):
            batch = self.train_ds.next_minibatch()
            enc = self._encode_speaker_batch(batch)
            gold, instr_seq, unroll_len = self._gold_and_instr(enc)
            self.rng, step_rng = jax.random.split(self.rng)
            self.params, self.opt_state, loss = self._step_fn(
                self.params, self.opt_state, gold, instr_seq, step_rng,
                self.tables if self.cfg.use_pallas else None,
                unroll_len=unroll_len,
            )
            losses.append(float(loss))
        return losses

    def test(self, ds, feedback="argmax", allow_cheat=False, collect_loss=False):
        assert allow_cheat or feedback in ("argmax", "sample")
        if not self.cfg.device_data:
            return self._test_host(ds, feedback, collect_loss)

        from .device_data import DeviceStore, epoch_index_matrix

        store = self._eval_stores.get(id(ds))
        if store is None:
            store = DeviceStore(
                ds, self.graph_bank,
                max_instruction_length=self.cfg.max_instruction_length,
                reverse_instructions=False,
                mesh=self.mesh,
            )
            self._eval_stores[id(ds)] = store
        ds.reset_epoch()
        idx = epoch_index_matrix(ds, store)
        self.rng, key = jax.random.split(self.rng)
        keys = jax.random.split(key, idx.shape[0])
        out = self._get_eval_epoch_fn(feedback)(
            self.params, self.tables, store.arrays, jnp.asarray(idx), keys
        )
        out = jax.tree.map(np.asarray, out)

        results = {}
        losses = [float(l) for l in out.loss] if collect_loss else []
        for m in range(idx.shape[0]):
            instr_ids = [store.items[r]["instr_id"] for r in idx[m]]
            out_m = jax.tree.map(lambda x: x[m], out)
            batch_results = sa.speaker_results_from_output(
                out_m, instr_ids, self.tokenizer
            )
            for instr_id, r in batch_results.items():
                if instr_id not in results:
                    results[instr_id] = r
        return results, losses

    def _get_eval_epoch_fn(self, feedback):
        """Jitted full-epoch speaker eval: scan of [gold rollout ->
        decode/score] over an (M, B) row-index matrix; the traced
        batch-max encoder_valid_len replaces the host path's per-batch
        unroll_len sync."""
        key = ("epoch", feedback)
        if key not in self._eval_fns:
            cfg = self.cfg
            mesh = self.mesh

            def epoch(params, tables, store_arrays, idx, keys):
                def one(_, xs):
                    ix, k = xs
                    batch = {
                        name: arr[ix] for name, arr in store_arrays.items()
                    }
                    if mesh is not None:
                        from ..parallel import mesh as pm

                        s = pm.data_sharded(mesh)
                        batch = {
                            name: jax.lax.with_sharding_constraint(v, s)
                            for name, v in batch.items()
                        }
                    gold = sa.gold_rollout(
                        tables, batch, episode_len=cfg.episode_len,
                        lazy_features=cfg.use_pallas,
                    )
                    out = sa.score_instructions(
                        params, gold, batch["seq"], k,
                        feedback=feedback,
                        instruction_len=cfg.max_instruction_length,
                        unroll_len=cfg.episode_len,
                        deterministic=True,
                        use_glove=cfg.use_glove,
                        encoder_valid_len=gold.path_len.max(),
                        use_pallas=cfg.use_pallas,
                        pallas_interpret=cfg.pallas_interpret,
                        tables=tables if cfg.use_pallas else None,
                    )
                    return 0, out

                _, outs = jax.lax.scan(one, 0, (idx, keys))
                return outs

            self._eval_fns[key] = jax.jit(epoch)
        return self._eval_fns[key]

    def _test_host(self, ds, feedback, collect_loss):
        ds.reset_epoch()
        results = {}
        losses = []
        looped = False
        while not looped:
            batch = ds.next_minibatch()
            enc = self._encode_speaker_batch(batch)
            gold, instr_seq, unroll_len = self._gold_and_instr(enc)
            self.rng, step_rng = jax.random.split(self.rng)
            out = self._eval_fn(feedback, unroll_len)(
                self.params, gold, instr_seq, step_rng,
                self.tables if self.cfg.use_pallas else None,
            )
            if collect_loss:
                losses.append(float(out.loss))
            batch_results = sa.speaker_results_from_output(
                out, enc["instr_id"], self.tokenizer
            )
            for instr_id, r in batch_results.items():
                if instr_id in results:
                    looped = True
                else:
                    results[instr_id] = r
        return results, losses

    def train(self, n_iters: int, log_every: int | None = None):
        cfg = self.cfg
        log_every = log_every or cfg.log_every
        start = time.time()
        best_metrics = {}
        last_model_saved = {}  # (env, metric) -> path; old best deleted
        split_string = "-".join(self.train_ds.splits)

        for idx in range(0, n_iters, log_every):
            interval = min(log_every, n_iters - idx)
            it = idx + interval
            self.data_log["iteration"].append(it)
            # profile the 2nd interval (warm) or the only one there is
            profile_now = cfg.profile_dir is not None and (
                idx == log_every or (idx == 0 and n_iters <= log_every)
            )
            if profile_now:
                from ..utils.profiling import xla_trace

                with xla_trace(cfg.profile_dir):
                    losses = self.train_interval(interval)
            else:
                losses = self.train_interval(interval)
            train_loss_avg = float(np.mean(losses))
            self.data_log["train loss"].append(train_loss_avg)
            loss_str = "train loss: %.4f" % train_loss_avg

            for env_name, (val_ds, evaluator) in sorted(self.val_envs.items()):
                _, val_losses = self.test(
                    val_ds, feedback="teacher", allow_cheat=True, collect_loss=True
                )
                val_loss_avg = float(np.mean(val_losses)) if val_losses else 0.0
                self.data_log["%s loss" % env_name].append(val_loss_avg)
                # best-by-val-loss snapshot (beyond reference parity: the
                # reference keys speaker snapshots on decode BLEU only,
                # train_speaker.py:134-151, but pragmatic RESCORING consumes
                # the speaker's likelihood, which val teacher-forced loss
                # measures directly; runs/sf_beam40_oracle_r5.log shows the
                # rescorer, not the candidate pool, binds accuracy)
                loss_key = (env_name, "loss")
                if (loss_key not in best_metrics
                        or val_loss_avg < best_metrics[loss_key]):
                    best_metrics[loss_key] = val_loss_avg
                    if not cfg.no_save:
                        path = os.path.join(
                            cfg.snapshot_dir,
                            "%s_%s_iter_%d_%s-loss=%.4f"
                            % (cfg.model_prefix, split_string, it,
                               env_name, val_loss_avg),
                        )
                        ckpt.save_params(path, self.params)
                        _drop_superseded_best(last_model_saved, loss_key, path)
                results, _ = self.test(val_ds, feedback="argmax")
                summary, _ = evaluator.score_results(results)
                loss_str += ", %s loss: %.4f" % (env_name, val_loss_avg)
                for metric, val in summary.items():
                    self.data_log["%s %s" % (env_name, metric)].append(val)
                    if metric == "bleu":
                        loss_str += ", %s: %.3f" % (metric, val)
                        key = (env_name, metric)
                        if key not in best_metrics or best_metrics[key] < val:
                            best_metrics[key] = val
                            if not cfg.no_save:
                                path = os.path.join(
                                    cfg.snapshot_dir,
                                    "%s_%s_iter_%d_%s-%s=%.3f"
                                    % (cfg.model_prefix, split_string, it,
                                       env_name, metric, val),
                                )
                                ckpt.save_params(path, self.params)
                                _drop_superseded_best(
                                    last_model_saved, key, path
                                )
            print(
                "%.1fm (%d %d%%) %s"
                % ((time.time() - start) / 60, it, it * 100 // n_iters, loss_str)
            )
            if not cfg.no_save and cfg.save_every and it % cfg.save_every == 0:
                ckpt.save_params(
                    os.path.join(
                        cfg.snapshot_dir,
                        "%s_%s_iter_%d" % (cfg.model_prefix, split_string, it),
                    ),
                    self.params,
                )
        return best_metrics
