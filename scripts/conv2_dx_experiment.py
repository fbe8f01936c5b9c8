"""conv2 dx formulations: standard transpose-conv vs pack2.

For SAME stride-1 convs, dx = conv(dy, W flipped with in/out swapped) — a
plain conv with Cout=32, which fills only a quarter of the MXU lanes. pack2
packs W-pairs into channels (Cout 64) at 1.2x FLOPs; the packed result
unpacks with one reshape. This measures whether that trade wins at the
bench geometry, and checks numerics vs jax.grad.

Run: python scripts/conv2_dx_experiment.py  (JAX_PLATFORMS=axon)
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


def flip_swap(w):
    import jax.numpy as jnp

    return jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)


def main():
    import jax
    import jax.numpy as jnp

    from avsync.ops.conv import conv3d, conv3d_pack2

    rng = np.random.default_rng(0)

    # --- numerics (small, f32): both formulations == jax.grad ------------
    x = jnp.asarray(rng.random((2, 4, 6, 8, 3)).astype(np.float32))
    w = jnp.asarray((rng.random((3, 5, 5, 3, 5)) - 0.5).astype(np.float32))
    dy = jnp.asarray(rng.random((2, 4, 6, 8, 5)).astype(np.float32))
    _, vjp = jax.vjp(lambda x: conv3d(x, w), x)
    (ref_dx,) = vjp(dy)
    dx_conv = conv3d(dy, flip_swap(w))
    err1 = float(jnp.max(jnp.abs(dx_conv - ref_dx)))
    packed = conv3d_pack2(dy, flip_swap(w))
    B, T, H, W2, twoC = packed.shape
    dx_p2 = packed.reshape(B, T, H, W2, 2, twoC // 2).reshape(
        B, T, H, 2 * W2, twoC // 2
    )
    err2 = float(jnp.max(jnp.abs(dx_p2 - ref_dx)))
    print(json.dumps({"check_dx_conv": err1, "check_dx_pack2": err2}),
          flush=True)
    assert err1 < 1e-4 and err2 < 1e-4

    # --- timing at bench geometry (bf16) ----------------------------------
    DT = jnp.bfloat16
    B = 128
    dy = jnp.asarray(rng.random((B, 75, 25, 50, 64), np.float32), DT)
    w = jnp.asarray((rng.random((3, 5, 5, 32, 64), np.float32) - 0.5) * 0.1, DT)
    wfs = flip_swap(w)

    f_std = jax.jit(lambda dy, w: conv3d(dy, w, preferred_dtype=DT))
    t = timeit(f_std, dy, wfs)
    print(json.dumps({"dx_std_conv_ms": round(t * 1e3, 2)}), flush=True)

    def p2(dy, w):
        pk = conv3d_pack2(dy, w, preferred_dtype=DT)
        b, tt, h, w2, c2 = pk.shape
        return pk.reshape(b, tt, h, w2, 2, c2 // 2).reshape(
            b, tt, h, 2 * w2, c2 // 2
        )

    t = timeit(jax.jit(p2), dy, wfs)
    print(json.dumps({"dx_pack2_ms": round(t * 1e3, 2)}), flush=True)

    # the autodiff dx for comparison (what the model pays today)
    xfull = jnp.asarray(rng.random((B, 75, 25, 50, 32), np.float32), DT)
    g = jax.jit(
        lambda x, dy: jax.vjp(
            lambda x: conv3d(x, w, preferred_dtype=DT), x
        )[1](dy)[0]
    )
    t = timeit(g, xfull, dy)
    print(json.dumps({"dx_autodiff_ms": round(t * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
