"""Fused Conv3D + ReLU + MaxPool3D(1,2,2) Pallas kernels (conv1, Cin=1).

Why: conv1 is HBM-traffic-bound in XLA — the un-pooled activation is 4x the
pooled bytes and round-trips HBM because TPU XLA fuses neither
reduce_window nor a max-of-channel-slices into a convolution OR a dot
(both measured in scripts/conv_pack_experiment.py + the im2col variant).

How: the conv becomes an explicit patches-GEMM. XLA extracts im2col patches
over the enlarged (kt, kh+1, kw+1) window at stride (1,2,2) — one 2x2
output tile per window, i.e. pack4 — and the Pallas kernel consumes patch
tiles straight from HBM->VMEM, GEMMs them against the pack4-blocked weight
matrix (Cout=32 -> 4*Cout=128 full MXU lanes), applies bias+ReLU, folds the
2x2 pool as a max over the 4 channel blocks, and writes only the pooled
tile. The (B,T,H/2,W/2,4C) pre-pool tensor never exists.

Every in-kernel reshape keeps the minor (lane) dimension intact — merging
or splitting leading dims only — which is the subset Mosaic's layout
inference supports (a lane-merging variant died with "unsupported shape
cast").

The backward kernel recomputes the pre-pool tile from the same patches,
routes the pool gradient with select_and_scatter's first-match tie-break,
masks by the ReLU sign, and accumulates dW = patches^T @ dpre across the
sequential grid. dx comes from the XLA composition's VJP and is DCE-pruned
at the input layer (nothing consumes an input-video gradient).

Reference op: the first LipNet block (`/root/reference/model.py:22-24`,
Conv3d(1, 32, (3,5,5)) + MaxPool3d((1,2,2))).

STATUS — RETIRED for the forward path (measured + roofline, see PERF.md):
correct on real TPU (bf16 parity with the XLA block) but 61 ms vs 21 ms for
the pack4 XLA formulation, and the gap is structural, not tunable: the
patches formulation duplicates every input element kt*(kh+1)*(kw+1) = 108x,
so the patch tensor (~2.6 GB bf16 at bench geometry) costs >=24 ms of pure
HBM write+read before any compute — already above pack4's 21 ms total.
Beating pack4 would require building patches inside VMEM from raw input
tiles, which needs lane-dim merge/scatter reshapes Mosaic rejects
("unsupported shape cast"; only leading-dim reshapes compile). Kept as
tested groundwork behind ModelConfig.fused_conv_pool (default off); the
shipping conv1 path is pack4 (ops/conv.py), which the bench config uses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _patches(x: jax.Array, kt: int, kh: int, kw: int, dt) -> jax.Array:
    """(B, T, H, W, 1) -> (B, T, H/2, W/2, kt*(kh+1)*(kw+1)) pack4 patches."""
    pt, ph, pw = (kt - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    return lax.conv_general_dilated_patches(
        x.astype(dt),
        filter_shape=(kt, kh + 1, kw + 1),
        window_strides=(1, 2, 2),
        padding=((pt, pt), (ph, ph), (pw, pw)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=dt,
    )


def _pack4_weight_matrix(kernel: jax.Array) -> jax.Array:
    """(kt, kh, kw, 1, C) -> (kt*(kh+1)*(kw+1), 4*C) patch-GEMM weights.

    Row order matches `_patches` (tap-major (dt, dh, dw) over the enlarged
    window); column block (jh, jw) holds W[dt, dh-jh, dw-jw] where valid —
    the pack4 construction (ops.conv.pack4_kernel reshaped)."""
    from avsync.ops.conv import pack4_kernel

    kt, kh, kw, cin, cout = kernel.shape
    assert cin == 1, "fused conv-pool kernel is specialized to Cin=1"
    return pack4_kernel(kernel).reshape(-1, 4 * cout)


def _max4(acc: jax.Array, C: int) -> jax.Array:
    return jnp.maximum(
        jnp.maximum(acc[:, :C], acc[:, C : 2 * C]),
        jnp.maximum(acc[:, 2 * C : 3 * C], acc[:, 3 * C :]),
    )


def _fwd_kernel(C: int, patch_ref, wmat_ref, bias_ref, out_ref):
    # blocks arrive pre-flattened: (1, rows, taps) / (1, rows, C) — every
    # reshape happened in XLA on leading dims (Mosaic lane layouts untouched)
    acc = jnp.dot(
        patch_ref[0], wmat_ref[:, :], preferred_element_type=jnp.float32
    )
    acc = jax.nn.relu(acc + bias_ref[:])
    out_ref[0] = _max4(acc, C).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("t_chunk", "interpret", "out_dtype")
)
def conv1_pool_fused(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    t_chunk: int = 15,
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
    patches = _patches(x, kt, kh, kw, dt)
    wmat = _pack4_weight_matrix(kernel).astype(dt)
    bias4 = jnp.tile(bias.astype(jnp.float32), 4).reshape(1, 4 * C)
    n_taps = patches.shape[-1]
    rows = t_chunk * H2 * W2
    n_chunks = T // t_chunk
    # leading-dim reshape only (lane dim untouched): layout-free in XLA
    patches = patches.reshape(B * n_chunks, rows, n_taps)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, C),
        grid=(B * n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, rows, n_taps), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(wmat.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bias4.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B * n_chunks, rows, C), out_dtype),
        interpret=interpret,
    )(patches, wmat, bias4)
    return out.reshape(B, T, H2, W2, C)


# ---------------------------------------------------------------------------
# differentiable block
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv1_pool_block(x, kernel, bias, opts):
    """Differentiable fused block. opts = (t_chunk, out_dtype_name,
    interpret). Forward and dW/db run the Pallas kernels; dx falls back to
    the XLA composition's VJP (DCE-pruned when unused — conv1 is the input
    layer)."""
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


def _bwd_kernel(C: int, patch_ref, wmat_ref, bias_ref, g_ref,
                dwmat_ref, dbias_ref):
    """dwmat += patches^T @ dpre, dbias += sum(dpre); recompute in VMEM.

    The grid walks chunks sequentially on TPU, so accumulation into the
    constant-index output blocks is safe; the first program
    zero-initializes."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwmat_ref[:, :] = jnp.zeros_like(dwmat_ref)
        dbias_ref[:, :] = jnp.zeros_like(dbias_ref)

    p = patch_ref[0]
    acc = (
        jnp.dot(p, wmat_ref[:, :], preferred_element_type=jnp.float32)
        + bias_ref[:]
    )
    r = jax.nn.relu(acc)
    blocks = [r[:, j * C : (j + 1) * C] for j in range(4)]
    pooled = jnp.maximum(
        jnp.maximum(blocks[0], blocks[1]), jnp.maximum(blocks[2], blocks[3])
    )
    grad = g_ref[0].astype(jnp.float32)
    # pool bwd: first matching window position (select_and_scatter order),
    # then relu bwd masks by the pre-activation sign
    taken = jnp.zeros_like(pooled, dtype=jnp.bool_)
    dpre_blocks = []
    for j in range(4):
        hit = jnp.logical_and(blocks[j] == pooled, jnp.logical_not(taken))
        taken = jnp.logical_or(taken, hit)
        alive = jnp.logical_and(hit, acc[:, j * C : (j + 1) * C] > 0)
        dpre_blocks.append(jnp.where(alive, grad, 0.0))
    dpre = jnp.concatenate(dpre_blocks, axis=1)  # (rows, 4C) f32
    dwmat_ref[:, :] += lax.dot_general(
        p.astype(jnp.float32), dpre,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbias_ref[:, :] += jnp.sum(dpre, axis=0, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("t_chunk", "interpret", "out_dtype")
)
def conv1_pool_bwd(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    g: jax.Array,
    t_chunk: int = 15,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """(dkernel, dbias) of the fused block given pooled-output cotangent g.

    The multi-GB un-pooled gradient tensor never exists in HBM (the XLA
    backward materializes it and reads it back for the dW conv)."""
    B, T, H, W, cin = x.shape
    kt, kh, kw, _, C = kernel.shape
    H2, W2 = H // 2, W // 2
    dt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    patches = _patches(x, kt, kh, kw, dt)
    wmat = _pack4_weight_matrix(kernel).astype(dt)
    bias4 = jnp.tile(bias.astype(jnp.float32), 4).reshape(1, 4 * C)
    n_taps = patches.shape[-1]
    rows = t_chunk * H2 * W2
    n_chunks = T // t_chunk
    patches = patches.reshape(B * n_chunks, rows, n_taps)
    g2 = g.reshape(B * n_chunks, rows, C)

    dwmat, dbias4 = pl.pallas_call(
        functools.partial(_bwd_kernel, C),
        grid=(B * n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, rows, n_taps), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(wmat.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bias4.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, rows, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((n_taps, 4 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_taps, 4 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * C), jnp.float32),
        ),
        interpret=interpret,
    )(patches, wmat, bias4, g2)

    # fold the packed-GEMM cotangents back onto the (kt,kh,kw,1,C) kernel
    # and (C,) bias through the construction's own VJP
    _, wvjp = jax.vjp(lambda k: _pack4_weight_matrix(k).astype(dt), kernel)
    (dkernel,) = wvjp(dwmat.astype(dt))
    dbias = dbias4.reshape(4, C).sum(0)
    return dkernel, dbias
