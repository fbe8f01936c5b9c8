"""Validate + time packed conv formulations against standard XLA conv3d.

Findings from round 1 of this experiment (f32 pre-pool): conv1 is
HBM-traffic-bound (4.6 TFLOP/s — the un-pooled activation is 4x the pooled
one and round-trips HBM), conv2 is compute-bound at ~60% MXU (pack2's 1.2x
FLOPs make it a net loss there). This version measures everything with bf16
pre-pool activations (what the model actually emits) and adds pack4 for
conv1: 2x2 output positions packed into channels, so MaxPool(1,2,2) becomes
a fused max over channel blocks and the pre-pool tensor never exists.

Run: python scripts/conv_pack_experiment.py  (JAX_PLATFORMS=axon)
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


from _bench_util import _sync, timeit  # noqa: E402,F401


def main():
    import jax
    import jax.numpy as jnp

    from avsync.ops.conv import (
        conv3d,
        conv3d_pack2,
        conv3d_pack4,
        max_pool3d,
        pool_packed2,
        pool_packed4,
    )

    rng = np.random.default_rng(0)
    DT = jnp.bfloat16

    # bf16 conv OUTPUT (preferred_dtype) — a separate .astype does not fuse
    # into TPU convolutions, so the f32 activation would round-trip HBM
    def block_std(x, k, b):
        return max_pool3d(jax.nn.relu(conv3d(x, k, b, preferred_dtype=DT)))

    def block_p2(x, k, b):
        return pool_packed2(
            jax.nn.relu(conv3d_pack2(x, k, b, preferred_dtype=DT))
        )

    def block_p4(x, k, b):
        return pool_packed4(
            jax.nn.relu(conv3d_pack4(x, k, b, preferred_dtype=DT))
        )

    # --- numerical equivalence (small shapes, f32) -----------------------
    xs32 = jnp.asarray(rng.random((2, 4, 10, 12, 3)).astype(np.float32))
    ks32 = jnp.asarray(rng.random((3, 5, 5, 3, 6)).astype(np.float32) - 0.5)
    bs32 = jnp.asarray(rng.random(6).astype(np.float32))
    ref = max_pool3d(jax.nn.relu(conv3d(xs32, ks32, bs32)))
    for name, blk in (("pack2", lambda *a: pool_packed2(jax.nn.relu(conv3d_pack2(*a)))),
                      ("pack4", lambda *a: pool_packed4(jax.nn.relu(conv3d_pack4(*a))))):
        err = float(jnp.max(jnp.abs(ref - blk(xs32, ks32, bs32))))
        print(json.dumps({"check": f"{name}_block_equivalence", "max_err": err}))
        assert err < 1e-4, (name, err)

    # --- per-block timing at bench geometry (B=128, bf16) -----------------
    B = 128
    cases = {
        "conv1": ((B, 75, 50, 100, 1), (3, 5, 5, 1, 32)),
        "conv2": ((B, 75, 25, 50, 32), (3, 5, 5, 32, 64)),
        "conv3": ((B, 75, 12, 25, 64), (3, 3, 3, 64, 96)),
    }
    data = {}
    for name, (xs, ks) in cases.items():
        xb = jnp.asarray(rng.random(xs, np.float32), DT)
        kb = jnp.asarray((rng.random(ks, np.float32) - 0.5) * 0.1, DT)
        bb = jnp.asarray(rng.random(ks[-1], np.float32), DT)
        data[name] = (xb, kb, bb)
        flops = 2 * np.prod(xs[:4]) * ks[4] * np.prod(ks[:4])
        entry = {"block": name}
        variants = {"std": block_std}
        if xs[3] % 2 == 0:
            variants["pack2"] = block_p2
        if xs[2] % 2 == 0 and xs[3] % 2 == 0 and name != "conv3":
            variants["pack4"] = block_p4
        for vname, blk in variants.items():
            t = timeit(jax.jit(blk), xb, kb, bb, n=5)
            entry[f"{vname}_ms"] = round(t * 1e3, 2)
            entry[f"{vname}_tflops"] = round(flops / t / 1e12, 1)
        print(json.dumps(entry), flush=True)

    # --- fwd+bwd of the full 3-block stack ---------------------------------
    ks = [data[n][1] for n in cases]
    bs = [data[n][2] for n in cases]
    x0 = data["conv1"][0]

    def stack(fns, ks, x):
        for f, k, b in zip(fns, ks, bs):
            x = f(x, k, b)
        return x.astype(jnp.float32).sum()

    for label, fns in (
        ("std,std,std", [block_std] * 3),
        ("pack4,std,std", [block_p4, block_std, block_std]),
        ("pack4,pack4,std", [block_p4, block_p4, block_std]),
    ):
        g = jax.jit(jax.grad(
            lambda ks, x: stack(fns, ks, x), argnums=0))
        t = timeit(g, ks, x0, n=3)
        print(json.dumps({"stack_fwd_bwd": label, "ms": round(t * 1e3, 2)}),
              flush=True)
        f = jax.jit(lambda ks, x: stack(fns, ks, x))
        t = timeit(f, ks, x0, n=5)
        print(json.dumps({"stack_fwd": label, "ms": round(t * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
