"""Fused Conv3D + ReLU + MaxPool3D(1,2,2) Pallas kernel for Cin=1 (conv1).

Why: conv1 is HBM-traffic-bound in XLA — the pre-pool activation is 4x the
pooled one and round-trips HBM because TPU XLA fuses neither reduce_window
nor a max-of-channel-slices into a convolution (measured in
scripts/conv_pack_experiment.py). This kernel keeps the pre-pool tile in
VMEM: per grid step it reads one sample's frames, im2cols 2x2-pooled output
positions against a pack4-blocked weight matrix (filling the MXU's 128
lanes that Cout=32 leaves 3/4 idle), applies bias+ReLU, maxes the 4 channel
blocks, and writes only the pooled activation.

Traffic per sample: read T*H*W (+pad) bf16 + write pooled T*(H/2)*(W/2)*C —
~1/16 of the XLA path's bytes for LipNet conv1.

Layout trick: W-stride-2 patch gathers are hostile to the TPU lane layout,
so the input is pre-split OUTSIDE the kernel (cheap XLA slice) into 4
(H-parity, W-parity) planes, zero-padded so every in-kernel tap is a
unit-stride static slice.

Reference op: the first LipNet block (`/root/reference/model.py:22-24`,
Conv3d(1, 32, (3,5,5)) + MaxPool3d((1,2,2))).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _parity_planes(x: jax.Array, kt: int, kh: int, kw: int) -> jax.Array:
    """(B, T, H, W) -> (B, 4, T + kt - 1, H/2 + 2, W/2 + 2) zero-padded
    parity planes, plane index = 2 * (h % 2) + (w % 2).

    Padding: (kt-1)//2 on each T side; 1 plane-cell on each H/2 and W/2 side
    (enough for kh, kw <= 5 with the pack4 window's {-1, 0, +1} plane
    offsets)."""
    B, T, H, W = x.shape
    pt = (kt - 1) // 2
    planes = jnp.stack(
        [
            x[:, :, 0::2, 0::2],
            x[:, :, 0::2, 1::2],
            x[:, :, 1::2, 0::2],
            x[:, :, 1::2, 1::2],
        ],
        axis=1,
    )  # (B, 4, T, H/2, W/2)
    return jnp.pad(planes, ((0, 0), (0, 0), (pt, pt), (1, 1), (1, 1)))


def _pack4_weight_matrix(kernel: jax.Array) -> jax.Array:
    """(kt, kh, kw, 1, C) -> (kt*(kh+1)*(kw+1), 4*C) patch-GEMM weights.

    Row index = tap (dt, dh, dw) over the enlarged (kh+1, kw+1) window of a
    2x2 output tile; column block (jh, jw) holds W[dt, dh-jh, dw-jw] where
    valid, zero elsewhere (same construction as ops.conv.pack4_kernel)."""
    kt, kh, kw, cin, cout = kernel.shape
    assert cin == 1, "fused conv-pool kernel is specialized to Cin=1"
    k = kernel[:, :, :, 0, :]
    rows = []
    for dt in range(kt):
        for dh in range(kh + 1):
            for dw in range(kw + 1):
                blocks = []
                for jh in (0, 1):
                    for jw in (0, 1):
                        if 0 <= dh - jh < kh and 0 <= dw - jw < kw:
                            blocks.append(k[dt, dh - jh, dw - jw])
                        else:
                            blocks.append(jnp.zeros((cout,), k.dtype))
                rows.append(jnp.concatenate(blocks))
    return jnp.stack(rows)  # (kt*(kh+1)*(kw+1), 4*C)


def _kernel(kt: int, kh: int, kw: int, T: int, H2: int, W2: int, C: int,
            TT: int, planes_ref, wmat_ref, bias_ref, out_ref, patch_scr):
    """One sample: loop T in chunks of TT, build patches, GEMM, relu+pool.

    Patches are TAP-major (taps, rows): each tap write is a unit-stride
    vector store, and the GEMM contracts dim 0 of both operands.
    """
    rows = TT * H2 * W2
    ph, pw = (kh - 1) // 2, (kw - 1) // 2

    def chunk(ci, _):
        t0 = ci * TT
        # --- im2col: every tap is a unit-stride slice of a parity plane ---
        idx = 0
        for dt in range(kt):
            for dh in range(kh + 1):
                for dw in range(kw + 1):
                    dh2, dw2 = dh - ph, dw - pw  # offsets of the 2x2 tile
                    p = 2 * (dh2 % 2) + (dw2 % 2)
                    hoff = 1 + (dh2 - (dh2 % 2)) // 2
                    woff = 1 + (dw2 - (dw2 % 2)) // 2
                    tap = planes_ref[
                        0,
                        p,
                        pl.ds(t0 + dt, TT),
                        pl.ds(hoff, H2),
                        pl.ds(woff, W2),
                    ]
                    patch_scr[idx] = tap.reshape(rows)
                    idx += 1
        # --- GEMM + bias + relu + pool(max over the 4 channel blocks) -----
        acc = lax.dot_general(
            patch_scr[:, :], wmat_ref[:, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows, 4C)
        acc = jax.nn.relu(acc + bias_ref[:])
        pooled = jnp.maximum(
            jnp.maximum(acc[:, :C], acc[:, C : 2 * C]),
            jnp.maximum(acc[:, 2 * C : 3 * C], acc[:, 3 * C :]),
        )
        out_ref[0, pl.ds(t0, TT)] = pooled.reshape(TT, H2, W2, C).astype(
            out_ref.dtype
        )
        return ()

    lax.fori_loop(0, T // TT, chunk, ())


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv1_pool_block(x, kernel, bias, opts):
    """Differentiable fused block. opts = (t_chunk, out_dtype_name,
    interpret). Forward runs the Pallas kernel; backward recomputes through
    the plain XLA composition (identical math, so identical gradients — and
    the recompute is what a remat policy would do anyway)."""
    t_chunk, out_dtype, interpret = opts
    return conv1_pool_fused(
        x, kernel, bias, t_chunk=t_chunk,
        out_dtype=jnp.dtype(out_dtype), interpret=interpret,
    )


def _xla_block(x, kernel, bias, out_dtype):
    from avsync.ops.conv import conv3d, max_pool3d

    dt = jnp.dtype(out_dtype)
    return max_pool3d(
        jax.nn.relu(conv3d(x, kernel, bias, compute_dtype=dt, preferred_dtype=dt))
    )


def _block_fwd(x, kernel, bias, opts):
    return conv1_pool_block(x, kernel, bias, opts), (x, kernel, bias)


def _block_bwd(opts, res, g):
    """dW/db from the fused Pallas backward (recomputes the pre-pool tile in
    VMEM, scatters the pool+relu gradient in-tile, accumulates dW as a
    patch^T GEMM). dx comes from the XLA composition's VJP — for conv1 (the
    input layer) nothing consumes dx and jit DCE prunes that entire branch.
    """
    x, kernel, bias = res
    t_chunk, out_dtype, interpret = opts
    dk, db = conv1_pool_bwd(
        x, kernel, bias, g, t_chunk=t_chunk,
        out_dtype=jnp.dtype(out_dtype), interpret=interpret,
    )

    def dx_fn(x):
        return _xla_block(x, kernel, bias, out_dtype)

    _, vjp = jax.vjp(dx_fn, x)
    (dx,) = vjp(g)
    return dx.astype(x.dtype), dk.astype(kernel.dtype), db.astype(bias.dtype)


conv1_pool_block.defvjp(_block_fwd, _block_bwd)


def _bwd_kernel(kt: int, kh: int, kw: int, T: int, H2: int, W2: int, C: int,
                TT: int, planes_ref, wmat_ref, bias_ref, g_ref,
                dwmat_ref, dbias_ref, patch_scr):
    """Accumulating backward: dwmat += patch @ dpre, dbias += sum(dpre).

    The grid walks samples sequentially on TPU, so += accumulation into the
    (constant-index) output blocks is safe; program 0 zero-initializes.
    """
    rows = TT * H2 * W2
    ph, pw = (kh - 1) // 2, (kw - 1) // 2

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwmat_ref[:, :] = jnp.zeros_like(dwmat_ref)
        dbias_ref[:, :] = jnp.zeros_like(dbias_ref)

    def chunk(ci, _):
        t0 = ci * TT
        idx = 0
        for dt in range(kt):
            for dh in range(kh + 1):
                for dw in range(kw + 1):
                    dh2, dw2 = dh - ph, dw - pw
                    p = 2 * (dh2 % 2) + (dw2 % 2)
                    hoff = 1 + (dh2 - (dh2 % 2)) // 2
                    woff = 1 + (dw2 - (dw2 % 2)) // 2
                    tap = planes_ref[
                        0, p,
                        pl.ds(t0 + dt, TT),
                        pl.ds(hoff, H2),
                        pl.ds(woff, W2),
                    ]
                    patch_scr[idx] = tap.reshape(rows)
                    idx += 1
        acc = lax.dot_general(
            patch_scr[:, :], wmat_ref[:, :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias_ref[:]
        r = jax.nn.relu(acc)
        blocks = [r[:, j * C : (j + 1) * C] for j in range(4)]
        pooled = jnp.maximum(
            jnp.maximum(blocks[0], blocks[1]),
            jnp.maximum(blocks[2], blocks[3]),
        )
        grad = (
            g_ref[0, pl.ds(t0, TT)].reshape(rows, C).astype(jnp.float32)
        )
        # pool bwd: first matching window position (select_and_scatter
        # order), then relu bwd masks by pre-activation sign
        taken = jnp.zeros_like(pooled, dtype=jnp.bool_)
        dpre_blocks = []
        for j in range(4):
            hit = jnp.logical_and(blocks[j] == pooled, jnp.logical_not(taken))
            taken = jnp.logical_or(taken, hit)
            alive = jnp.logical_and(hit, acc[:, j * C : (j + 1) * C] > 0)
            dpre_blocks.append(jnp.where(alive, grad, 0.0))
        dpre = jnp.concatenate(dpre_blocks, axis=1)  # (rows, 4C) f32
        dwmat_ref[:, :] += lax.dot_general(
            patch_scr[:, :].astype(jnp.float32), dpre,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbias_ref[:, :] += jnp.sum(dpre, axis=0, keepdims=True)
        return ()

    lax.fori_loop(0, T // TT, chunk, ())


@functools.partial(
    jax.jit, static_argnames=("t_chunk", "interpret", "out_dtype")
)
def conv1_pool_bwd(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    g: jax.Array,
    t_chunk: int = 5,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """(dkernel, dbias) of the fused block given pooled-output cotangent g.

    Recomputes the pre-pool tile from (x, kernel) in VMEM — no multi-GB
    dprepool tensor ever exists in HBM (the XLA backward materializes it
    twice over).
    """
    B, T, H, W, cin = x.shape
    kt, kh, kw, _, C = kernel.shape
    H2, W2 = H // 2, W // 2
    dt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    planes = _parity_planes(x[..., 0].astype(dt), kt, kh, kw)
    wmat = _pack4_weight_matrix(kernel).astype(dt)
    bias4 = jnp.tile(bias.astype(jnp.float32), 4).reshape(1, 4 * C)
    n_taps = kt * (kh + 1) * (kw + 1)

    dwmat, dbias4 = pl.pallas_call(
        functools.partial(_bwd_kernel, kt, kh, kw, T, H2, W2, C, t_chunk),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, 4, T + kt - 1, H2 + 2, W2 + 2),
                lambda b: (b, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(wmat.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(bias4.shape, lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, T, H2, W2, C), lambda b: (b, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (n_taps, 4 * C), lambda b: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 4 * C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_taps, 4 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * C), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((n_taps, t_chunk * H2 * W2), dt)],
        interpret=interpret,
    )(planes, wmat, bias4, g)

    # fold the packed-GEMM cotangents back onto the (kt,kh,kw,1,C) kernel and
    # (C,) bias through the construction's own VJP
    _, wvjp = jax.vjp(lambda k: _pack4_weight_matrix(k).astype(dt), kernel)
    (dkernel,) = wvjp(dwmat.astype(dt))
    dbias = dbias4.reshape(4, C).sum(0)
    return dkernel, dbias


@functools.partial(
    jax.jit, static_argnames=("t_chunk", "interpret", "out_dtype")
)
def conv1_pool_fused(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    t_chunk: int = 5,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """(B, T, H, W, 1) x (kt, kh, kw, 1, C) -> (B, T, H//2, W//2, C).

    Numerically equals max_pool3d(relu(conv3d(x, kernel, bias))) for SAME
    stride-1 convs with odd kernels and even H, W (f32 accumulation, output
    cast to `out_dtype`). T must be divisible by t_chunk.
    """
    B, T, H, W, cin = x.shape
    kt, kh, kw, _, C = kernel.shape
    assert cin == 1 and H % 2 == 0 and W % 2 == 0 and T % t_chunk == 0
    H2, W2 = H // 2, W // 2
    dt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    planes = _parity_planes(x[..., 0].astype(dt), kt, kh, kw)
    wmat = _pack4_weight_matrix(kernel).astype(dt)
    bias4 = jnp.tile(bias.astype(jnp.float32), 4).reshape(1, 4 * C)

    body = functools.partial(_kernel, kt, kh, kw, T, H2, W2, C, t_chunk)
    out = pl.pallas_call(
        body,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, 4, T + kt - 1, H2 + 2, W2 + 2),
                lambda b: (b, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                wmat.shape, lambda b: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                bias4.shape, lambda b: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, T, H2, W2, C), lambda b: (b, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, H2, W2, C), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((kt * (kh + 1) * (kw + 1), t_chunk * H2 * W2), dt),
        ],
        interpret=interpret,
    )(planes, wmat, bias4)
    return out
