"""Fused GRU recurrence as a single Pallas TPU kernel.

The GRU's FLOPs live in the input projection (hoisted out of the scan as one
MXU matmul — avsync/ops/gru.py); what remains is a latency-bound chain of 75
small steps. Under `lax.scan` each step is a separate fusion with its own
VMEM round trips for h and w_hh. This kernel runs the WHOLE recurrence in
one program:

  * w_hh (H, 3H) and the carried state h (B, H) stay resident in VMEM for
    all T steps — zero re-loads;
  * the per-step inputs gi[:, t] stream from HBM with double-buffered async
    DMA, overlapping the next step's load with the current step's compute;
  * outputs stream back to HBM the same way;
  * each step is one (B, H) x (H, 3H) MXU matmul plus VPU gate math.

Gate math matches torch.nn.GRU ([r, z, n] order) exactly — parity-tested
against avsync.ops.gru.gru_scan. The time-reversed direction runs the same
kernel with a flipped DMA index map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gru_kernel(reverse: bool, T: int, gi_hbm, w_hh_ref, b_hh_ref, out_hbm,
                h_scr, gi_buf, out_buf, in_sems, out_sems):
    B = h_scr.shape[0]
    H = h_scr.shape[1]
    del B

    def t_of(i):
        return (T - 1 - i) if reverse else i

    # gi/out are time-major (T, B, *) so per-step DMA slices the LEADING
    # dim — slicing a sublane-tiled middle dim is rejected by Mosaic.
    def in_dma(slot, i):
        return pltpu.make_async_copy(
            gi_hbm.at[t_of(i)], gi_buf.at[slot], in_sems.at[slot]
        )

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            out_buf.at[slot], out_hbm.at[t_of(i)], out_sems.at[slot]
        )

    h_scr[:] = jnp.zeros_like(h_scr)
    in_dma(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < T)
        def _():
            in_dma(nxt, i + 1).start()

        in_dma(slot, i).wait()
        gi_t = gi_buf[slot]  # (B, 3H)
        h = h_scr[:]
        gh = (
            jnp.dot(h, w_hh_ref[:], preferred_element_type=jnp.float32)
            + b_hh_ref[:]
        )
        r = jax.nn.sigmoid(gi_t[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi_t[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(gi_t[:, 2 * H :] + r * gh[:, 2 * H :])
        h_new = (1.0 - z) * n + z * h
        h_scr[:] = h_new

        # drain the previous output DMA on this slot before overwriting
        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        out_buf[slot] = h_new
        out_dma(slot, i).start()
        return ()

    jax.lax.fori_loop(0, T, body, ())
    # flush the last (up to) two in-flight output DMAs
    @pl.when(T >= 2)
    def _():
        out_dma(jax.lax.rem(T - 2, 2), T - 2).wait()

    out_dma(jax.lax.rem(T - 1, 2), T - 1).wait()


def _gru_kernel_vmem(reverse: bool, T: int, gi_ref, w_hh_ref, b_hh_ref,
                     out_ref, h_scr):
    """All-VMEM variant: gi/out resident, no DMA — wins when they fit."""
    H = h_scr.shape[1]
    h_scr[:] = jnp.zeros_like(h_scr)

    def body(i, _):
        t = (T - 1 - i) if reverse else i
        gi_t = gi_ref[t]
        h = h_scr[:]
        gh = (
            jnp.dot(h, w_hh_ref[:], preferred_element_type=jnp.float32)
            + b_hh_ref[:]
        )
        r = jax.nn.sigmoid(gi_t[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi_t[:, H : 2 * H] + gh[:, H : 2 * H])
        n = jnp.tanh(gi_t[:, 2 * H :] + r * gh[:, 2 * H :])
        h_new = (1.0 - z) * n + z * h
        h_scr[:] = h_new
        out_ref[t] = h_new
        return ()

    jax.lax.fori_loop(0, T, body, ())


# gi + out VMEM footprint below this threshold uses the resident variant.
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def pallas_gru_scan(
    gi: jax.Array,
    w_hh: jax.Array,
    b_hh: jax.Array,
    reverse: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Run the GRU recurrence over precomputed input projections.

    gi: (B, T, 3H) = x @ w_ih + b_ih for all timesteps; w_hh: (H, 3H);
    b_hh: (3H,). Returns (B, T, H) hidden states in forward time order
    (reverse=True consumes the sequence from the end, like
    `lax.scan(reverse=True)`).
    """
    B, T, threeH = gi.shape
    H = threeH // 3
    args = (
        jnp.swapaxes(gi.astype(jnp.float32), 0, 1),  # time-major (T, B, 3H)
        w_hh.astype(jnp.float32),
        b_hh.astype(jnp.float32).reshape(1, threeH),
    )
    footprint = 4 * T * B * (threeH + H)
    if footprint <= _VMEM_BUDGET_BYTES:
        out_tm = pl.pallas_call(
            functools.partial(_gru_kernel_vmem, reverse, T),
            out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(*args)
    else:
        out_tm = pl.pallas_call(
            functools.partial(_gru_kernel, reverse, T),
            out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # gi stays in HBM
                pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh resident
                pl.BlockSpec(memory_space=pltpu.VMEM),  # b_hh resident
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),  # streamed out
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),  # carried state
                pltpu.VMEM((2, B, threeH), jnp.float32),  # gi double buffer
                pltpu.VMEM((2, B, H), jnp.float32),  # out double buffer
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(*args)
    return jnp.swapaxes(out_tm, 0, 1)
