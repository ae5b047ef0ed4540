"""Minimal pure-pytree module toolkit: parameter initialization and linear /
embedding / LSTM primitives with PyTorch-compatible semantics.

Params are nested dicts of jnp arrays; apply functions are pure.  Dims and
initializers match the reference (PyTorch 0.3 defaults) so converted
released checkpoints line up:
  * nn.Linear: W (out, in), b (out,), both U(-1/sqrt(in), 1/sqrt(in));
  * nn.Embedding: N(0, 1);
  * nn.LSTM / nn.LSTMCell: gate order i, f, g, o; weights
    W_ih (4H, in), W_hh (4H, H), biases b_ih + b_hh, all
    U(-1/sqrt(H), 1/sqrt(H)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


# ---------------------------------------------------------------- linear

def linear_init(key, in_dim, out_dim, bias=True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    p = {"w": uniform(kw, (out_dim, in_dim), bound, dtype)}
    if bias:
        p["b"] = uniform(kb, (out_dim,), bound, dtype)
    return p


def linear(p, x):
    y = x @ p["w"].T
    if "b" in p:
        y = y + p["b"]
    return y


# ------------------------------------------------------------- embedding

def embedding_init(key, num, dim, dtype=jnp.float32):
    return {"w": jax.random.normal(key, (num, dim), dtype)}


def embedding(p, idx):
    return p["w"][idx]


# ------------------------------------------------------------------ lstm

def lstm_cell_init(key, in_dim, hidden, dtype=jnp.float32):
    k = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(hidden)
    return {
        "w_ih": uniform(k[0], (4 * hidden, in_dim), bound, dtype),
        "w_hh": uniform(k[1], (4 * hidden, hidden), bound, dtype),
        "b_ih": uniform(k[2], (4 * hidden,), bound, dtype),
        "b_hh": uniform(k[3], (4 * hidden,), bound, dtype),
    }


def lstm_cell(p, x, h, c):
    """One LSTMCell step, torch gate order (i, f, g, o)."""
    return _lstm_gates(p, x @ p["w_ih"].T + p["b_ih"] + p["b_hh"], h, c)


def _lstm_gates(p, xg, h, c):
    """LSTM step from a precomputed input projection ``xg`` = x W_ih^T +
    biases.  Hoisting the input projection out of lax.scan turns L small
    per-step matmuls into ONE (B*L, in)x(in, 4H) MXU matmul — a rewrite
    XLA does not do across scan iterations."""
    gates = xg + h @ p["w_hh"].T
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c1 = f * c + i * g
    h1 = o * jnp.tanh(c1)
    return h1, c1


def lstm_scan(p, xs, h0, c0, reverse: bool = False):
    """Run an LSTM over time axis 1 of xs (B, L, D) -> outputs (B, L, H)."""

    def step(carry, xg):
        h, c = carry
        h1, c1 = _lstm_gates(p, xg, h, c)
        return (h1, c1), h1

    xg = xs @ p["w_ih"].T + p["b_ih"] + p["b_hh"]  # (B, L, 4H), one matmul
    (h_f, c_f), out = jax.lax.scan(
        step, (h0, c0), jnp.swapaxes(xg, 0, 1), reverse=reverse
    )
    return jnp.swapaxes(out, 0, 1), (h_f, c_f)


def masked_lstm_scan(p, xs, lengths, h0, c0, reverse: bool = False):
    """LSTM over padded sequences emulating torch pack_padded_sequence:

    * forward: state stops updating once t >= length, so the returned final
      (h, c) equal the state at t = length - 1; outputs at padded positions
      are zeroed (pad_packed_sequence zero-fills);
    * reverse: the backward pass of a torch bi-LSTM starts at t = length - 1
      per sequence.  We emulate by masking updates at t >= length while
      scanning from the right, which keeps (h0, c0) until entering the valid
      region — equivalent to starting at the true end.
    """
    b, l, _ = xs.shape
    t_index = jnp.arange(l)
    valid = t_index[None, :] < lengths[:, None]  # (B, L)

    def step(carry, inp):
        h, c = carry
        xg, v = inp  # (B, 4H), (B,)
        h1, c1 = _lstm_gates(p, xg, h, c)
        h1 = jnp.where(v[:, None], h1, h)
        c1 = jnp.where(v[:, None], c1, c)
        return (h1, c1), jnp.where(v[:, None], h1, 0.0)

    xg = xs @ p["w_ih"].T + p["b_ih"] + p["b_hh"]  # (B, L, 4H), one matmul
    valid_t = jnp.swapaxes(valid, 0, 1)
    (h_f, c_f), out = jax.lax.scan(
        step, (h0, c0), (jnp.swapaxes(xg, 0, 1), valid_t), reverse=reverse
    )
    return jnp.swapaxes(out, 0, 1), (h_f, c_f)


# --------------------------------------------------------------- dropout

def dropout(key, x, rate: float, deterministic: bool):
    """Inverted dropout (torch semantics: scale by 1/(1-p) at train)."""
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
