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

For multi-host, ``jax.distributed.initialize()`` before building the mesh;
the same annotations then span hosts (DCN between slices).

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
