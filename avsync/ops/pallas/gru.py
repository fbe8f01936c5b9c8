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


def _gru_gate_grads(gi_t, hp, gh, dh_in, H):
    """Shared backward gate math for one step (torch [r, z, n] order).

    Recomputes the gates from (gi_t, gh) — cheaper than storing r/z/n
    residuals, and gh is one MXU matmul we need W_hh resident for anyway.
    Returns (dgi_t, dgh, dh_prev_direct) where dh_prev_direct = a * z.
    """
    r = jax.nn.sigmoid(gi_t[:, :H] + gh[:, :H])
    z = jax.nn.sigmoid(gi_t[:, H : 2 * H] + gh[:, H : 2 * H])
    gh_n = gh[:, 2 * H :]
    n = jnp.tanh(gi_t[:, 2 * H :] + r * gh_n)
    a = dh_in  # total gradient flowing into h_t
    dn = a * (1.0 - z)
    dz = a * (hp - n)
    dpre_n = dn * (1.0 - n * n)
    dr = dpre_n * gh_n
    dpre_r = dr * r * (1.0 - r)
    dpre_z = dz * z * (1.0 - z)
    dgi = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=1)
    dgh = jnp.concatenate([dpre_r, dpre_z, dpre_n * r], axis=1)
    return dgi, dgh, a * z


def _gru_bwd_kernel_vmem(reverse: bool, T: int, gi_ref, out_ref, g_ref,
                         w_hh_ref, w_hh_t_ref, b_hh_ref,
                         dgi_ref, dwhh_ref, dbhh_ref, dh_scr):
    """All-VMEM backward: walk the chain in reverse iteration order with the
    carry dh, W_hh/W_hh^T and the dW/db accumulators VMEM-resident."""
    B, H = dh_scr.shape
    del B
    dh_scr[:] = jnp.zeros_like(dh_scr)
    dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
    dbhh_ref[:] = jnp.zeros_like(dbhh_ref)

    def t_of(i):
        return (T - 1 - i) if reverse else i

    def body(j, _):
        i = T - 1 - j  # iteration index, walked backwards
        t = t_of(i)
        tp = t_of(jnp.maximum(i - 1, 0))
        hp = jnp.where(i > 0, out_ref[tp], jnp.zeros_like(out_ref[0]))
        gi_t = gi_ref[t]
        gh = (
            jnp.dot(hp, w_hh_ref[:], preferred_element_type=jnp.float32)
            + b_hh_ref[:]
        )
        dh_in = g_ref[t] + dh_scr[:]
        dgi, dgh, dh_direct = _gru_gate_grads(gi_t, hp, gh, dh_in, H)
        dgi_ref[t] = dgi
        dh_scr[:] = dh_direct + jnp.dot(
            dgh, w_hh_t_ref[:], preferred_element_type=jnp.float32
        )
        dwhh_ref[:] += jax.lax.dot_general(
            hp, dgh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbhh_ref[:] += jnp.sum(dgh, axis=0, keepdims=True)
        return ()

    jax.lax.fori_loop(0, T, body, ())


def _gru_bwd_kernel(reverse: bool, T: int, gi_hbm, out_hbm, g_hbm,
                    w_hh_ref, w_hh_t_ref, b_hh_ref,
                    dgi_hbm, dwhh_ref, dbhh_ref,
                    dh_scr, gi_buf, hp_buf, g_buf, dgi_buf,
                    gi_sems, hp_sems, g_sems, dgi_sems):
    """Streaming backward: gi/out/g stream in and dgi streams out with
    double-buffered DMA; dh carry, weights and accumulators stay in VMEM."""
    B, H = dh_scr.shape
    del B

    def t_of(i):
        return (T - 1 - i) if reverse else i

    # iteration j walks i = T-1-j; data index is t_of(i)
    def gi_dma(slot, j):
        return pltpu.make_async_copy(
            gi_hbm.at[t_of(T - 1 - j)], gi_buf.at[slot], gi_sems.at[slot]
        )

    def g_dma(slot, j):
        return pltpu.make_async_copy(
            g_hbm.at[t_of(T - 1 - j)], g_buf.at[slot], g_sems.at[slot]
        )

    def hp_dma(slot, j):
        # h_prev for iteration i = out[t_of(i-1)]; at i == 0 the buffer is
        # unused (masked to zeros below) — clamp the index to stay in bounds
        i = T - 1 - j
        return pltpu.make_async_copy(
            out_hbm.at[t_of(jnp.maximum(i - 1, 0))],
            hp_buf.at[slot],
            hp_sems.at[slot],
        )

    def dgi_dma(slot, j):
        return pltpu.make_async_copy(
            dgi_buf.at[slot], dgi_hbm.at[t_of(T - 1 - j)], dgi_sems.at[slot]
        )

    dh_scr[:] = jnp.zeros_like(dh_scr)
    dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
    dbhh_ref[:] = jnp.zeros_like(dbhh_ref)
    gi_dma(0, 0).start()
    g_dma(0, 0).start()
    hp_dma(0, 0).start()

    def body(j, _):
        slot = jax.lax.rem(j, 2)
        nxt = jax.lax.rem(j + 1, 2)
        i = T - 1 - j

        @pl.when(j + 1 < T)
        def _():
            gi_dma(nxt, j + 1).start()
            g_dma(nxt, j + 1).start()
            hp_dma(nxt, j + 1).start()

        gi_dma(slot, j).wait()
        g_dma(slot, j).wait()
        hp_dma(slot, j).wait()
        hp = jnp.where(i > 0, hp_buf[slot], jnp.zeros_like(hp_buf[0]))
        gh = (
            jnp.dot(hp, w_hh_ref[:], preferred_element_type=jnp.float32)
            + b_hh_ref[:]
        )
        dh_in = g_buf[slot] + dh_scr[:]
        dgi, dgh, dh_direct = _gru_gate_grads(gi_buf[slot], hp, gh, dh_in, H)
        dh_scr[:] = dh_direct + jnp.dot(
            dgh, w_hh_t_ref[:], preferred_element_type=jnp.float32
        )
        dwhh_ref[:] += jax.lax.dot_general(
            hp, dgh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbhh_ref[:] += jnp.sum(dgh, axis=0, keepdims=True)

        @pl.when(j >= 2)
        def _():
            dgi_dma(slot, j - 2).wait()

        dgi_buf[slot] = dgi
        dgi_dma(slot, j).start()
        return ()

    jax.lax.fori_loop(0, T, body, ())

    @pl.when(T >= 2)
    def _():
        dgi_dma(jax.lax.rem(T - 2, 2), T - 2).wait()

    dgi_dma(jax.lax.rem(T - 1, 2), T - 1).wait()


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def pallas_gru_bwd(
    gi: jax.Array,
    out: jax.Array,
    g: jax.Array,
    w_hh: jax.Array,
    b_hh: jax.Array,
    reverse: bool = False,
    interpret: bool = False,
):
    """Backward of the GRU recurrence in one Pallas program.

    gi: (B, T, 3H) forward input projections; out: (B, T, H) forward hidden
    states; g: (B, T, H) output cotangents. Returns (dgi, dw_hh, db_hh).
    Gates are recomputed from (gi, h_prev) — the residuals are exactly the
    forward's inputs and outputs, nothing extra is stored.
    """
    B, T, threeH = gi.shape
    H = threeH // 3
    args = (
        jnp.swapaxes(gi.astype(jnp.float32), 0, 1),
        jnp.swapaxes(out.astype(jnp.float32), 0, 1),
        jnp.swapaxes(g.astype(jnp.float32), 0, 1),
        w_hh.astype(jnp.float32),
        w_hh.astype(jnp.float32).T,
        b_hh.astype(jnp.float32).reshape(1, threeH),
    )
    out_shapes = (
        jax.ShapeDtypeStruct((T, B, threeH), jnp.float32),  # dgi (time-major)
        jax.ShapeDtypeStruct((H, threeH), jnp.float32),  # dw_hh
        jax.ShapeDtypeStruct((1, threeH), jnp.float32),  # db_hh
    )
    # resident variant needs gi + out + g + dgi in VMEM
    footprint = 4 * T * B * (threeH + H + H + threeH)
    if footprint <= _VMEM_BUDGET_BYTES:
        dgi_tm, dwhh, dbhh = pl.pallas_call(
            functools.partial(_gru_bwd_kernel_vmem, reverse, T),
            out_shape=out_shapes,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)),
            scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
            interpret=interpret,
        )(*args)
    else:
        dgi_tm, dwhh, dbhh = pl.pallas_call(
            functools.partial(_gru_bwd_kernel, reverse, T),
            out_shape=out_shapes,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # gi streams
                pl.BlockSpec(memory_space=pl.ANY),  # out streams
                pl.BlockSpec(memory_space=pl.ANY),  # g streams
                pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh
                pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh^T
                pl.BlockSpec(memory_space=pltpu.VMEM),  # b_hh
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),  # dgi streams
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((B, H), jnp.float32),  # dh carry
                pltpu.VMEM((2, B, threeH), jnp.float32),  # gi buffers
                pltpu.VMEM((2, B, H), jnp.float32),  # h_prev buffers
                pltpu.VMEM((2, B, H), jnp.float32),  # g buffers
                pltpu.VMEM((2, B, threeH), jnp.float32),  # dgi buffers
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(*args)
    return jnp.swapaxes(dgi_tm, 0, 1), dwhh, dbhh.reshape(threeH)


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
                pl.BlockSpec(memory_space=pl.ANY),  # gi stays in HBM
                pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh resident
                pl.BlockSpec(memory_space=pltpu.VMEM),  # b_hh resident
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),  # streamed out
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
