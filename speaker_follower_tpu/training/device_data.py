"""Device-resident dataset store: the whole split pre-encoded ONCE.

The reference re-assembles every minibatch on the host each iteration
(R2RBatch._next_minibatch + per-item numpy packing, tasks/R2R/env.py:723-804)
— at ~28 ms of host dispatch per iteration on a 1-core host that cost
dominates training wall-clock (the device step itself is ~1 ms).  Here the
*entire* dataset is encoded to fixed-shape arrays once and uploaded; a
training interval then runs as ONE jitted K-step ``lax.scan`` whose per-step
minibatch is a device-side gather ``arr[idx[k]]`` of pre-staged rows.  The
host's only per-interval work is drawing K x B row indices from the same
seeded round-robin iterator (order identical to the per-iteration path, so
resume/checkpoint state is unchanged).
"""

from __future__ import annotations

import numpy as np

from ..data.dataset import R2RDataset, encode_batch

#: batch keys that live in the store, in the order encode_batch emits them
ARRAY_KEYS = (
    "scan",
    "start_node",
    "goal_node",
    "heading",
    "seq",
    "seq_mask",
    "seq_length",
)


class DeviceStore:
    """All items of an :class:`R2RDataset` as device arrays keyed by row.

    ``arrays`` maps each of :data:`ARRAY_KEYS` to an (N, ...) jnp array
    (N = number of instruction-expanded items); ``rows(batch)`` maps a
    host minibatch (list of item dicts) to its row indices.
    """

    def __init__(self, ds: R2RDataset, graph_bank, *,
                 max_instruction_length: int = 80,
                 reverse_instructions: bool = True, mesh=None):
        import jax
        import jax.numpy as jnp

        # one pass over the dataset; item order here is arbitrary (rows
        # are looked up by instr_id, which is unique per item)
        items = list(ds.data)
        enc = encode_batch(
            items, graph_bank,
            max_instruction_length=max_instruction_length,
            reverse_instructions=reverse_instructions,
        )
        arrays = {k: np.asarray(enc[k]) for k in ARRAY_KEYS}
        self.items = items  # row -> item dict (eval metadata)
        self.host = arrays  # np copies (host-side trajectory metadata)
        if mesh is not None:
            from ..parallel import mesh as pm

            sharding = pm.replicated(mesh)
            self.arrays = {
                k: jax.device_put(jnp.asarray(v), sharding)
                for k, v in arrays.items()
            }
        else:
            self.arrays = {k: jnp.asarray(v) for k, v in arrays.items()}
        self._row_of = {item["instr_id"]: i for i, item in enumerate(items)}
        assert len(self._row_of) == len(items), "instr_id must be unique"

    def __len__(self):
        return len(self._row_of)

    def rows(self, batch) -> np.ndarray:
        """Row indices (B,) int32 for a minibatch of item dicts."""
        return np.fromiter(
            (self._row_of[item["instr_id"]] for item in batch),
            dtype=np.int32, count=len(batch),
        )

    def gather(self, idx):
        """Device-side minibatch gather — call under jit.  ``idx`` is a
        (B,) int32 row-index array."""
        return {k: v[idx] for k, v in self.arrays.items()}


def epoch_index_matrix(ds: R2RDataset, store: DeviceStore) -> np.ndarray:
    """(M, B) row indices covering every item of ``ds`` once, in the
    dataset's current order, final batch padded by wrapping to the start
    (the wrapped duplicates are dropped by the caller's dedup-by-instr_id,
    reproducing the reference's iterate-until-looped eval protocol,
    follower.py:135-192)."""
    rows = store.rows(ds.data)
    b = ds.batch_size
    m = -(-len(rows) // b)
    # np.resize tiles cyclically, covering datasets smaller than one batch
    return np.resize(rows, m * b).reshape(m, b)
