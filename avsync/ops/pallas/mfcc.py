"""Fused mel->dB->DCT->statistics Pallas kernel for the MFCC front-end.

The FFT itself stays in XLA (Pallas has no FFT primitive); everything after
the power spectrogram fuses into ONE kernel per clip:

    power (F, K) --MXU--> mel (F, M) --VPU--> dB with masked top_db clamp
    --MXU--> MFCC (F, C) --VPU--> masked mean / unbiased std -> (2C,)

versus the XLA path's separate matmul/elementwise/reduction fusions with HBM
round trips for the (B, F, M) intermediates. The per-clip valid-frame count
rides in as a scalar-prefetch argument so the masked max/mean/std match the
variable-length semantics of avsync.ops.audio exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_AMIN = 1e-10


def _mel_stats_kernel(top_db: float, n_mfcc: int,
                      n_valid_ref, power_ref, melT_ref, dctT_ref, out_ref):
    b = pl.program_id(0)
    n = n_valid_ref[b]

    mel = jnp.dot(
        power_ref[0], melT_ref[:], preferred_element_type=jnp.float32
    )  # (F, M)
    log_spec = 10.0 * jnp.log10(jnp.maximum(_AMIN, mel))

    rows = jax.lax.broadcasted_iota(jnp.int32, log_spec.shape, 0)
    valid = rows < n
    masked = jnp.where(valid, log_spec, -jnp.inf)
    ref_max = jnp.max(masked)
    log_spec = jnp.maximum(log_spec, ref_max - top_db)

    mfcc = jnp.dot(
        log_spec, dctT_ref[:], preferred_element_type=jnp.float32
    )  # (F, Cpad)

    vm = valid[:, : mfcc.shape[1]].astype(jnp.float32)
    nf = jnp.maximum(n.astype(jnp.float32), 1.0)
    mean = jnp.sum(mfcc * vm, axis=0) / nf
    var = jnp.sum(((mfcc - mean[None, :]) * vm) ** 2, axis=0) / jnp.maximum(
        nf - 1.0, 1.0
    )
    std = jnp.where(n > 1, jnp.sqrt(var), 0.0)
    stats = jnp.concatenate([mean[None, :], std[None, :]], axis=0)  # (2, C)
    out_ref[0] = jnp.where(n > 0, stats, 0.0)
    del n_mfcc


@functools.partial(jax.jit, static_argnames=("top_db", "interpret"))
def pallas_mel_stats(
    power: jax.Array,
    n_valid: jax.Array,
    melT: jax.Array,
    dctT: jax.Array,
    top_db: float = 80.0,
    interpret: bool = False,
) -> jax.Array:
    """(B, F, K) power + (B,) valid-frame counts -> (B, 2*C) MFCC stats.

    melT: (K, M) mel filterbank (transposed); dctT: (M, C) ortho DCT.
    Returns concat(mean, unbiased std) over valid frames — identical to
    avsync.ops.audio.audio_stats.
    """
    B, F, K = power.shape
    C = dctT.shape[1]
    kernel = functools.partial(_mel_stats_kernel, top_db, C)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, F, K), lambda b, n: (b, 0, 0)),
                pl.BlockSpec((K, melT.shape[1]), lambda b, n: (0, 0)),
                pl.BlockSpec((melT.shape[1], C), lambda b, n: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 2, C), lambda b, n: (b, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2, C), jnp.float32),
        interpret=interpret,
    )(
        n_valid.astype(jnp.int32),
        power.astype(jnp.float32),
        melT.astype(jnp.float32),
        dctT.astype(jnp.float32),
    )
    return out.reshape(B, 2 * C)
