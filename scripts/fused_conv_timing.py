"""Time the fused Pallas conv-pool kernel vs XLA variants at bench geometry,
and the full train step with fused_conv_pool on.

Run: python scripts/fused_conv_timing.py  (JAX_PLATFORMS=axon)
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

    from avsync.ops.conv import conv3d, conv3d_pack4, max_pool3d, pool_packed4
    from avsync.ops.pallas.convpool import conv1_pool_fused

    rng = np.random.default_rng(0)
    DT = jnp.bfloat16
    B = 128
    x = jnp.asarray(rng.random((B, 75, 50, 100, 1), np.float32), DT)
    k = jnp.asarray((rng.random((3, 5, 5, 1, 32), np.float32) - 0.5) * 0.1, DT)
    b = jnp.asarray(rng.random(32, np.float32), DT)

    std = jax.jit(
        lambda x, k, b: max_pool3d(jax.nn.relu(conv3d(x, k, b, preferred_dtype=DT)))
    )
    p4 = jax.jit(
        lambda x, k, b: pool_packed4(
            jax.nn.relu(conv3d_pack4(x, k, b, preferred_dtype=DT))
        )
    )
    print(json.dumps({"conv1_std_ms": round(timeit(std, x, k, b) * 1e3, 2)}),
          flush=True)
    print(json.dumps({"conv1_pack4_ms": round(timeit(p4, x, k, b) * 1e3, 2)}),
          flush=True)
    # numerics on TPU (bf16): fused vs std
    ref = std(x, k, b)
    for tc in (15, 5):
        fused = jax.jit(
            lambda x, k, b: conv1_pool_fused(x, k, b, t_chunk=tc)
        )
        try:
            got = fused(x, k, b)
            err = float(
                jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
            )
            t = timeit(fused, x, k, b)
            print(json.dumps({
                "conv1_fused_ms": round(t * 1e3, 2), "t_chunk": tc,
                "max_err_vs_std_bf16": err,
            }), flush=True)
        except Exception as e:
            print(json.dumps({"t_chunk": tc, "error": str(e)[:300]}),
                  flush=True)

    # full train step with fused conv1
    from avsync.config import AvsyncConfig, ModelConfig, TrainConfig
    from avsync.parallel import make_mesh
    from avsync.train import LipNetTrainer
    from avsync.utils.flops import lipnet_train_flops, v5e_peak_flops
    from avsync.utils.logging import Logger

    for packed, fused_flag in ((True, True), (False, True)):
        cfg = AvsyncConfig(
            model=ModelConfig(
                compute_dtype="bfloat16", packed_conv=packed,
                fused_conv_pool=fused_flag,
            ),
            train=TrainConfig(remat=False),
        )
        trainer = LipNetTrainer(
            cfg, mesh=make_mesh((len(jax.devices()), 1)),
            log=Logger(None, console=False),
        )
        batch = {
            "video": rng.random((B, 75, 50, 100, 1)).astype(np.float32),
            "labels": np.pad(
                rng.integers(1, 37, size=(B, 24)).astype(np.int32),
                ((0, 0), (0, 8)),
            ),
            "label_lengths": np.full((B,), 24, np.int32),
        }
        try:
            state = trainer.init_state(batch)
            dbatch = trainer._device_batch(batch)

            def step():
                nonlocal state
                state, m = trainer.compiled["train"](
                    state, dbatch, trainer.rng, np.float32(trainer.current_lr)
                )
                return m["loss"]

            t = timeit(step, n=5)
            cps = B / t
            print(json.dumps({
                "train_step": {"packed": packed, "fused": fused_flag},
                "step_ms": round(t * 1e3, 2),
                "clips_per_sec": round(cps, 1),
                "mfu": round(
                    cps * lipnet_train_flops(cfg.model) / v5e_peak_flops(), 3
                ),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "train_step": {"packed": packed, "fused": fused_flag},
                "error": str(e)[:300],
            }), flush=True)


if __name__ == "__main__":
    main()
