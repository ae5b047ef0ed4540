"""Device-mesh utilities: data-parallel and tensor-parallel sharding.

The reference is single-GPU (SURVEY.md §2.4: no distributed code at all);
here scale-out is first-class.  Episodes are embarrassingly data-parallel,
so the canonical production layout is a 1-D ``("data",)`` mesh with
  * params, optimizer state, env tables: replicated,
  * per-episode batch arrays: sharded on axis 0 over "data".
XLA inserts the gradient psum across ICI automatically from the sharding
annotations on the jitted train step.

A 2-D ``("data", "model")`` mesh adds Megatron-style tensor parallelism
for memory scaling: weight matrices are column-sharded over "model" on
their output (gate) axis — the torch-layout LSTM weights are (4H, in), so
axis 0 — and XLA/GSPMD propagates the shardings through the rollout,
inserting the all-gathers of h between recurrent steps and the gradient
reduce-scatters itself (the scaling-book recipe: annotate, let XLA place
collectives on ICI).  At h=512 this workload is data-parallel-bound, so
TP is the framework capability for bigger models, not the default.

For multi-host, call :func:`init_multihost` once per host process before
building the mesh; the same annotations then span hosts (DCN between
slices), and :func:`data_parallel_batch_slice` gives each host its shard
of the global episode batch for per-host data loading.

Pipeline/expert/sequence parallelism are deliberately absent: there are
no pipeline stages worth the bubbles in a 2-LSTM seq2seq (episode len 10,
instruction len 80), no MoE layers, and the recurrence serializes the
sequence axis — the parallelism that matters for this workload is episode
data parallelism, with TP available for memory scaling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh2(devices=None, model: int = 1) -> Mesh:
    """2-D ("data", "model") mesh: adjacent devices share the model axis
    (highest ICI bandwidth for the per-step TP collectives)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if devices.size % model:
        raise ValueError(f"{devices.size} devices not divisible by model={model}")
    return Mesh(devices.reshape(-1, model), (DATA_AXIS, MODEL_AXIS))


def param_shardings(mesh: Mesh, params, min_dim: int = 128):
    """PartitionSpec tree for Megatron-style column parallelism: each leaf
    is sharded over "model" on its first axis divisible by the model-axis
    size (the output/gate axis in this repo's torch-layout (out, in)
    matrices) and at least ``min_dim`` wide; everything else (biases under
    min_dim, scalars) replicates.  On a mesh without a model axis the
    whole tree replicates."""
    model_n = dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1)

    def spec(leaf):
        if model_n > 1 and hasattr(leaf, "shape"):
            for ax, d in enumerate(leaf.shape):
                if d >= min_dim and d % model_n == 0:
                    return NamedSharding(mesh, P(*([None] * ax + [MODEL_AXIS])))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def shard_params(mesh: Mesh, params, min_dim: int = 128):
    """device_put each param leaf per :func:`param_shardings`."""
    return jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), s),
        params,
        param_shardings(mesh, params, min_dim),
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place per-episode arrays with their leading axis split over the data
    axis.  The mesh size must divide the batch size; for ragged final
    batches pad first with :func:`pad_batch_to`."""
    n = mesh.devices.size
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1 and v.shape[0] % n:
            raise ValueError(
                f"batch axis 0 of {k!r} has size {v.shape[0]}, not divisible by "
                f"the {n}-device mesh; pad with pad_batch_to(batch, "
                f"{-(-v.shape[0] // n) * n}) first"
            )
    sharding = data_sharded(mesh)
    return {
        k: jax.device_put(jnp.asarray(v), sharding)
        for k, v in batch.items()
        if hasattr(v, "shape")
    }


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding), tree)


def pad_batch_to(batch_np: dict, size: int):
    """Pad host batch arrays (axis 0) up to ``size`` by repeating the last
    element; returns (padded, true_size).  Padded episodes are real episodes
    (duplicates) — callers dedup results by instr_id, so duplicates are
    harmless; losses are averaged per-step over live episodes."""
    import numpy as np

    out = {}
    b = None
    for k, v in batch_np.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            b = v.shape[0]
            pad = size - b
            if pad > 0:
                v = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
            out[k] = v
        else:
            out[k] = v
    return out, b


_MULTIHOST_DECIDED = False


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Multi-host entry point: one call per host process BEFORE any other
    JAX use, then build meshes over ``jax.devices()`` exactly as on one
    host — the global device list spans all hosts, the same sharding
    annotations apply, and XLA places intra-slice collectives on ICI and
    inter-slice ones on DCN (the scaling-book recipe; SURVEY.md §2.4/§5.8
    for why the reference has no analog).

    With no arguments this uses cluster auto-detection (TPU pods populate
    the coordinator from the metadata server); args pass straight through
    to ``jax.distributed.initialize`` for manual clusters.

    Returns a summary dict {process_id, num_processes, local_devices,
    global_devices} for logging.  Idempotent: a second call is a no-op.
    """
    global _MULTIHOST_DECIDED
    already = getattr(jax.distributed, "global_state", None)
    clustered = already is not None and already.coordinator_address is not None
    if not clustered and not _MULTIHOST_DECIDED:
        kwargs = {}
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        try:
            jax.distributed.initialize(**kwargs)
        except (ValueError, RuntimeError) as e:
            if kwargs:
                raise
            # no explicit args and either no cluster detected or the
            # backend already initialized uncoordinated (bare single
            # process, e.g. CPU dev box / test session): run unclustered
            # — but say so, in case a real pod's cluster auto-detection
            # failed (silently training on 1/N of the data would be
            # worse than the noise)
            import sys

            print(
                "init_multihost: jax.distributed.initialize failed "
                f"({type(e).__name__}: {e}); running single-process",
                file=sys.stderr,
            )
        _MULTIHOST_DECIDED = True
    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def data_parallel_batch_slice(global_batch_size: int):
    """(start, size) of this host's slice of a globally-sharded episode
    batch: with per-host data loading each process materializes only its
    own shard and ``jax.make_array_from_process_local_data`` assembles the
    global array.  Requires process_count | global_batch_size."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes"
        )
    per = global_batch_size // n
    return jax.process_index() * per, per
