"""Optimizer parity: our optax chain must match torch.optim.Adam with
weight_decay step for step (the reference training recipe,
train.py:263-268)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from speaker_follower_tpu.training.optim import adam_with_torch_wd


def test_matches_torch_adam_with_weight_decay():
    torch.manual_seed(0)
    w0 = torch.randn(6, 4)
    lin = torch.nn.Linear(4, 6, bias=False)
    with torch.no_grad():
        lin.weight.copy_(w0)
    opt = torch.optim.Adam(lin.parameters(), lr=1e-2, weight_decay=5e-3)

    params = {"w": jnp.asarray(w0.numpy())}
    tx = adam_with_torch_wd(learning_rate=1e-2, weight_decay=5e-3)
    opt_state = tx.init(params)

    x = torch.randn(8, 4)
    y = torch.randn(8, 6)
    xj, yj = jnp.asarray(x.numpy()), jnp.asarray(y.numpy())

    def loss_fn(p):
        return jnp.mean((xj @ p["w"].T - yj) ** 2)

    for step in range(5):
        opt.zero_grad()
        loss = torch.mean((lin(x) - y) ** 2)
        loss.backward()
        opt.step()

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

        np.testing.assert_allclose(
            np.asarray(params["w"]),
            lin.weight.detach().numpy(),
            atol=2e-6,
            err_msg=f"diverged at step {step}",
        )


def test_frozen_mask_paths():
    from speaker_follower_tpu.training.optim import make_frozen_mask

    params = {"encoder": {"embedding": {"w": jnp.zeros(3)}, "lstm": {"w": jnp.zeros(3)}}}
    mask = make_frozen_mask(params, {"encoder/embedding/w"})
    assert mask["encoder"]["embedding"]["w"] is False
    assert mask["encoder"]["lstm"]["w"] is True
