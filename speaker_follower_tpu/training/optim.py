"""Optimizer matching the reference training recipe.

Reference (train.py:263-268, train_speaker.py:72-77): torch.optim.Adam
(lr 1e-4, weight_decay 5e-4, betas (0.9, 0.999), eps 1e-8) over the
trainable params only — frozen GloVe embeddings are excluded entirely
(filter_param, train.py:64-65).

torch Adam applies weight decay by adding wd*param to the gradient BEFORE
the moment updates, which is optax.add_decayed_weights placed before
scale_by_adam (NOT adamw, which decays after).
"""

from __future__ import annotations

import jax
import optax


def make_frozen_mask(params, frozen_paths):
    """True = trainable.  ``frozen_paths`` is a set of '/'-joined key paths
    (e.g. {'encoder/embedding/w'}) to freeze."""

    def mask_fn(path, _):
        joined = "/".join(str(k.key) for k in path)
        return joined not in frozen_paths

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def adam_with_torch_wd(
    learning_rate: float = 1e-4,
    weight_decay: float = 5e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    trainable_mask=None,
):
    """torch.optim.Adam(lr, weight_decay) equivalent; optionally zeroes
    updates for frozen params (mask True = trainable)."""
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale(-learning_rate),
    )
    if trainable_mask is not None:
        # NOTE: optax.masked passes unmasked updates through UNCHANGED (raw
        # gradients), it does not zero them — multi_transform + set_to_zero
        # is the correct way to freeze params.
        labels = jax.tree.map(
            lambda trainable: "train" if trainable else "freeze", trainable_mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx
