"""Shared timing helpers for the kernel-experiment scripts.

ONE definition of the honest-tunnel-sync protocol (profile_step,
fused_conv_timing, conv2_dx_experiment, conv_bwd_experiment,
conv_pack_experiment previously carried five identical copies — any fix to
the sync discipline had to land five times or the measurements diverged).
"""

from __future__ import annotations

import time

import numpy as np


def _sync(out):
    """Fetch ONE element of the first output leaf: forces device completion
    (block_until_ready lies through the axon tunnel) without transferring the
    whole array (a (B,75,50,100,32) activation is gigabytes)."""
    import jax

    x = jax.tree.leaves(out)[0]
    if hasattr(x, "reshape"):
        x = x.reshape(-1)[:1]
    float(np.asarray(x)[0])


def timeit(fn, *args, n=5, warmup=1):
    """Mean wall seconds per call over n timed calls after warmup calls,
    synced via _sync (NOT block_until_ready — see _sync)."""
    for _ in range(warmup):
        out = fn(*args)
        _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n
