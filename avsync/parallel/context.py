"""Context (sequence) parallelism: shard the time axis across devices.

The reference has no notion of this (T is a fixed 75 frames), but SURVEY §5
calls for design headroom: make T a shardable axis so long-context variants
can split the recurrence. Two pieces:

  * `cp_gru_recurrence` — the GRU chain under `shard_map`: each device holds
    a T/n chunk of the precomputed input projections; the carried hidden
    state hands off device-to-device with `lax.ppermute` over the mesh axis.
    The chain is inherently sequential across chunks (device k works in round
    k), so this scales MEMORY (each device stores 1/n of the activations),
    not latency — exactly the trade long-context training wants.
  * conv3d halo exchange is NOT needed as a custom op: sharding the T axis
    of an NDHWC conv input with `jax.sharding` lets XLA insert the 1-frame
    halo collectives for the k_t=3 kernels automatically (tested in
    tests/test_context_parallel.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

SEQ_AXIS = "data"  # reuse the mesh's first axis for CP in tests/prototypes


def _chunk_scan(h0: jax.Array, gi: jax.Array, w_hh, b_hh) -> Tuple[jax.Array, jax.Array]:
    """Local GRU scan over this device's (B, T_local, 3H) chunk."""
    H = w_hh.shape[0]

    def step(h, gi_t):
        gh = jnp.dot(h, w_hh, preferred_element_type=jnp.float32) + b_hh
        r = jax.nn.sigmoid(gi_t[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi_t[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(gi_t[:, 2 * H :] + r * gh[:, 2 * H :])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h_last, ys = lax.scan(step, h0, jnp.swapaxes(gi, 0, 1))
    return h_last, jnp.swapaxes(ys, 0, 1)


def _cp_body(gi_local: jax.Array, w_hh: jax.Array, b_hh: jax.Array, axis: str):
    """shard_map body: sequential rounds with ppermute carry handoff."""
    n = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    B, T_local, threeH = gi_local.shape
    H = threeH // 3

    # The initial carry/output are device-invariant constants; mark them as
    # varying over the CP axis so the scan carry type matches the per-device
    # values produced inside (shard_map varying-axis typing).
    carry0 = lax.pcast(jnp.zeros((B, H), jnp.float32), (axis,), to="varying")
    out0 = lax.pcast(
        jnp.zeros((B, T_local, H), jnp.float32), (axis,), to="varying"
    )

    def round_fn(state, k):
        carry, out = state
        my_turn = k == idx
        h_last, ys = _chunk_scan(carry, gi_local, w_hh, b_hh)
        out = jnp.where(my_turn, ys, out)
        handoff = jnp.where(my_turn, h_last, carry)
        # pass the carry to the next device in the chain
        carry_next = lax.ppermute(
            handoff, axis, [(i, (i + 1) % n) for i in range(n)]
        )
        # device 0's incoming carry (from n-1) is only meaningful wrap-around;
        # the chain starts from zeros there, which round 0 already used.
        return (carry_next, out), None

    (carry, out), _ = lax.scan(round_fn, (carry0, out0), jnp.arange(n))
    del carry
    return out


def cp_gru_recurrence(
    mesh: Mesh,
    gi: jax.Array,
    w_hh: jax.Array,
    b_hh: jax.Array,
    axis: str = SEQ_AXIS,
) -> jax.Array:
    """Run the GRU recurrence with the T axis sharded over `axis`.

    gi: (B, T, 3H) with T divisible by the axis size. Returns (B, T, H),
    numerically identical to the single-device scan.
    """
    body = functools.partial(_cp_body, axis=axis)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(), P()),
        out_specs=P(None, axis, None),
    )
    return fn(gi, w_hh, b_hh.reshape(1, -1))
