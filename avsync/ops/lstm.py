"""Scan-based (bi)directional LSTM — the TF stack's sequence model.

The reference's second model family uses Keras `Bidirectional(LSTM(256))`
(`train.py:522-531`). Cell math below matches the standard LSTM shared by
torch.nn.LSTM and Keras LSTM (gate order i, f, g, o in torch layout):

    i = sigmoid(x W_ii + b_ii + h W_hi + b_hi)
    f = sigmoid(x W_if + b_if + h W_hf + b_hf)
    g = tanh   (x W_ig + b_ig + h W_hg + b_hg)
    o = sigmoid(x W_io + b_io + h W_ho + b_ho)
    c' = f * c + i * g ;  h' = o * tanh(c')

Same TPU execution model as avsync.ops.gru: the input projection for all
timesteps is one MXU matmul outside the `lax.scan`; the scan carries (h, c).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class LSTMParams(NamedTuple):
    """One direction. Gate order along the 4H axis: [i, f, g, o]."""

    w_ih: jax.Array  # (input_dim, 4H)
    w_hh: jax.Array  # (H, 4H)
    b_ih: jax.Array  # (4H,)
    b_hh: jax.Array  # (4H,)


def init_lstm_params(
    key: jax.Array, input_dim: int, hidden_dim: int, dtype=jnp.float32
) -> LSTMParams:
    k = 1.0 / jnp.sqrt(hidden_dim)
    keys = jax.random.split(key, 4)
    return LSTMParams(
        w_ih=jax.random.uniform(keys[0], (input_dim, 4 * hidden_dim), dtype, -k, k),
        w_hh=jax.random.uniform(keys[1], (hidden_dim, 4 * hidden_dim), dtype, -k, k),
        b_ih=jax.random.uniform(keys[2], (4 * hidden_dim,), dtype, -k, k),
        b_hh=jax.random.uniform(keys[3], (4 * hidden_dim,), dtype, -k, k),
    )


def lstm_scan(
    params: LSTMParams,
    x: jax.Array,
    reverse: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """(B, T, D) -> (B, T, H); zero initial (h, c)."""
    B, T, _ = x.shape
    H = params.w_hh.shape[0]
    dt = compute_dtype or x.dtype

    gi = (
        jnp.einsum(
            "btd,dh->bth",
            x.astype(dt),
            params.w_ih.astype(dt),
            preferred_element_type=jnp.float32,
        )
        + params.b_ih
    )
    w_hh = params.w_hh.astype(dt)

    def step(carry, gi_t):
        h, c = carry
        gh = (
            jnp.dot(h.astype(dt), w_hh, preferred_element_type=jnp.float32)
            + params.b_hh
        )
        gates = gi_t + gh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)
    _, ys = lax.scan(step, (h0, c0), jnp.swapaxes(gi, 0, 1), reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def bilstm(
    fwd: LSTMParams, bwd: LSTMParams, x: jax.Array, compute_dtype=None
) -> jax.Array:
    """Bidirectional LSTM, [forward, backward] feature concat."""
    hf = lstm_scan(fwd, x, reverse=False, compute_dtype=compute_dtype)
    hb = lstm_scan(bwd, x, reverse=True, compute_dtype=compute_dtype)
    return jnp.concatenate([hf, hb], axis=-1)
