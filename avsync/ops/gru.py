"""Scan-based (bi)directional GRU with torch-GRU cell semantics.

The reference's sequence model is `nn.GRU(..., bidirectional=True)`
(`model.py:39-44`), which on GPU is a cuDNN fused kernel. The TPU-native
design is:

  * the input projection for ALL timesteps is hoisted out of the recurrence
    as one large (B*T, in) @ (in, 3H) matmul — this is where the FLOPs are
    and it runs on the MXU at full tilt;
  * the recurrence itself is a `lax.scan` whose body is a single
    (B, H) @ (H, 3H) matmul plus elementwise gate math (VPU);
  * the backward direction reuses the same scan on a time-reversed input.

Cell math matches torch.nn.GRU exactly (gate order r, z, n):

    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh   (x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h

Weights are stored transposed relative to torch ((in, 3H) / (H, 3H) for
right-multiplication); avsync/compat.py converts `.pth` layouts.
"""

from __future__ import annotations

import functools

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class GRUParams(NamedTuple):
    """One direction's parameters. Gate order along the 3H axis: [r, z, n]."""

    w_ih: jax.Array  # (input_dim, 3H)
    w_hh: jax.Array  # (H, 3H)
    b_ih: jax.Array  # (3H,)
    b_hh: jax.Array  # (3H,)


def init_gru_params(
    key: jax.Array, input_dim: int, hidden_dim: int, dtype=jnp.float32
) -> GRUParams:
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init, matching torch.nn.GRU's default."""
    k = 1.0 / jnp.sqrt(hidden_dim)
    keys = jax.random.split(key, 4)
    return GRUParams(
        w_ih=jax.random.uniform(keys[0], (input_dim, 3 * hidden_dim), dtype, -k, k),
        w_hh=jax.random.uniform(keys[1], (hidden_dim, 3 * hidden_dim), dtype, -k, k),
        b_ih=jax.random.uniform(keys[2], (3 * hidden_dim,), dtype, -k, k),
        b_hh=jax.random.uniform(keys[3], (3 * hidden_dim,), dtype, -k, k),
    )


def gru_scan(
    params: GRUParams,
    x: jax.Array,
    h0: jax.Array | None = None,
    reverse: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """Run a unidirectional GRU over (B, T, D) -> (B, T, H).

    The input projection runs outside the scan as one MXU matmul; the scan
    carries only (B, H) state.
    """
    B, T, _ = x.shape
    H = params.w_hh.shape[0]
    dt = compute_dtype or x.dtype

    w_ih = params.w_ih.astype(dt)
    w_hh = params.w_hh.astype(dt)

    # (B, T, 3H): all-timestep input projection, hoisted out of the scan.
    gi = (
        jnp.einsum("btd,dh->bth", x.astype(dt), w_ih, preferred_element_type=jnp.float32)
        + params.b_ih
    )

    if h0 is None:
        h0 = jnp.zeros((B, H), jnp.float32)

    def step(h, gi_t):
        gh = (
            jnp.dot(h.astype(dt), w_hh, preferred_element_type=jnp.float32)
            + params.b_hh
        )
        gi_r, gi_z, gi_n = jnp.split(gi_t, 3, axis=-1)
        gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(gi_r + gh_r)
        z = jax.nn.sigmoid(gi_z + gh_z)
        n = jnp.tanh(gi_n + r * gh_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    gi_t_major = jnp.swapaxes(gi, 0, 1)  # (T, B, 3H)
    _, ys = lax.scan(step, h0, gi_t_major, reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


def gru_scan_fused(
    params: GRUParams,
    x: jax.Array,
    reverse: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """gru_scan with the recurrence executed by the fused Pallas kernel
    (avsync.ops.pallas.gru): w_hh and the carry stay VMEM-resident across all
    T steps, inputs/outputs stream with double-buffered DMA.

    Fully trainable: the custom VJP runs the fused Pallas BACKWARD kernel
    (avsync.ops.pallas.gru.pallas_gru_bwd), which walks the chain in reverse
    with the dh carry, W_hh/W_hh^T and the dW/db accumulators VMEM-resident,
    recomputing gates from the (gi, h) residuals the forward already has.
    """
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
    return _pallas_recurrence(gi, params.w_hh, params.b_hh, reverse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_recurrence(gi, w_hh, b_hh, reverse):
    from avsync.ops.pallas.gru import pallas_gru_scan

    return pallas_gru_scan(gi, w_hh, b_hh, reverse=reverse)


def _scan_recurrence(gi, w_hh, b_hh, reverse):
    """Reference recurrence on precomputed gi (same math as gru_scan)."""
    B, T, threeH = gi.shape
    H = threeH // 3

    def step(h, gi_t):
        gh = jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh
        gi_r, gi_z, gi_n = jnp.split(gi_t, 3, axis=-1)
        gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(gi_r + gh_r)
        z = jax.nn.sigmoid(gi_z + gh_z)
        n = jnp.tanh(gi_n + r * gh_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((B, H), jnp.float32)
    _, ys = lax.scan(step, h0, jnp.swapaxes(gi, 0, 1), reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def _pallas_recurrence_fwd(gi, w_hh, b_hh, reverse):
    out = _pallas_recurrence(gi, w_hh, b_hh, reverse)
    # residuals are exactly the forward's inputs and outputs — the backward
    # kernel recomputes gates rather than storing r/z/n
    return out, (gi, out, w_hh, b_hh)


def _pallas_recurrence_bwd(reverse, residuals, g):
    from avsync.ops.pallas.gru import pallas_gru_bwd

    gi, out, w_hh, b_hh = residuals
    dgi, dw_hh, db_hh = pallas_gru_bwd(gi, out, g, w_hh, b_hh, reverse=reverse)
    return dgi.astype(gi.dtype), dw_hh.astype(w_hh.dtype), db_hh.astype(b_hh.dtype)


_pallas_recurrence.defvjp(_pallas_recurrence_fwd, _pallas_recurrence_bwd)


def bigru(
    fwd: GRUParams,
    bwd: GRUParams,
    x: jax.Array,
    compute_dtype=None,
) -> jax.Array:
    """Bidirectional GRU: concat([forward(x), backward(x)], -1) -> (B, T, 2H).

    Matches torch's bidirectional output layout (forward features first).
    The backward pass uses `lax.scan(reverse=True)`, which consumes the
    sequence from the end and emits outputs already in forward time order.
    """
    hf = gru_scan(fwd, x, reverse=False, compute_dtype=compute_dtype)
    hb = gru_scan(bwd, x, reverse=True, compute_dtype=compute_dtype)
    return jnp.concatenate([hf, hb], axis=-1)
