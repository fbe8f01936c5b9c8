"""Per-block conv BACKWARD breakdown: where do the bwd milliseconds go?

perf_sweep2.py settled the forward (pack4 conv1 + bf16, no remat, 650
clips/s); the backward (~150 ms of the 197 ms step) is now the frontier.
This times each block's dW-only / dx-only / full grads, std vs pack4, to
pick the next kernel target.

Run: python scripts/conv_bwd_experiment.py  (JAX_PLATFORMS=axon)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import os as _os

_HERE = _os.path.dirname(_os.path.abspath(__file__))
sys.path.insert(0, _os.path.dirname(_HERE))  # repo root (avsync package)
sys.path.insert(0, _HERE)  # scripts/ (_bench_util)


from _bench_util import _sync  # noqa: E402,F401
from _bench_util import timeit as _timeit  # noqa: E402


def timeit(fn, *args):
    return _timeit(fn, *args, n=3)  # this script's historical default


def main():
    import jax
    import jax.numpy as jnp

    from avsync.ops.conv import (
        conv3d,
        conv3d_pack4,
        max_pool3d,
        pool_packed4,
    )

    rng = np.random.default_rng(0)
    DT = jnp.bfloat16
    B = 128

    def block_std(x, k, b):
        return max_pool3d(jax.nn.relu(conv3d(x, k, b, preferred_dtype=DT)))

    def block_p4(x, k, b):
        return pool_packed4(
            jax.nn.relu(conv3d_pack4(x, k, b, preferred_dtype=DT))
        )

    cases = {
        "conv1": ((B, 75, 50, 100, 1), (3, 5, 5, 1, 32)),
        "conv2": ((B, 75, 25, 50, 32), (3, 5, 5, 32, 64)),
        "conv3": ((B, 75, 12, 25, 64), (3, 3, 3, 64, 96)),
    }
    for name, (xs, ks) in cases.items():
        xb = jnp.asarray(rng.random(xs, np.float32), DT)
        kb = jnp.asarray((rng.random(ks, np.float32) - 0.5) * 0.1, DT)
        bb = jnp.asarray(rng.random(ks[-1], np.float32), DT)
        variants = {"std": block_std}
        if name == "conv1":
            variants["pack4"] = block_p4
        for vname, blk in variants.items():
            entry = {"block": name, "variant": vname}

            def loss(x, k):
                return blk(x, k, bb).astype(jnp.float32).sum()

            t = timeit(jax.jit(jax.grad(loss, argnums=1)), xb, kb)
            entry["dw_only_ms"] = round(t * 1e3, 2)
            if name != "conv1":  # input layer: dx never needed in the model
                t = timeit(jax.jit(jax.grad(loss, argnums=0)), xb, kb)
                entry["dx_only_ms"] = round(t * 1e3, 2)
                t = timeit(jax.jit(jax.grad(loss, argnums=(0, 1))), xb, kb)
                entry["dx_dw_ms"] = round(t * 1e3, 2)
            print(json.dumps(entry), flush=True)


if __name__ == "__main__":
    main()
