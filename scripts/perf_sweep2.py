"""Round-2 train-step config sweep: {remat} x {packed_conv} x {batch}.

conv_pack_experiment.py showed pack4 wins forward (53->46 ms) but its
strided-conv backward gives it back; the open question is whether the 2-4x
smaller pre-pool memory lets us drop remat (which re-runs the whole conv
forward inside the backward). This sweeps the actual jitted train step.

Run: python scripts/perf_sweep2.py  (JAX_PLATFORMS=axon)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from avsync.config import AvsyncConfig, ModelConfig, TrainConfig
    from avsync.parallel import make_mesh
    from avsync.train import LipNetTrainer
    from avsync.utils.flops import lipnet_train_flops, v5e_peak_flops
    from avsync.utils.logging import Logger

    rng = np.random.default_rng(0)
    mesh = make_mesh((len(jax.devices()), 1))

    def measure(remat, packed, B):
        cfg = AvsyncConfig(
            model=ModelConfig(compute_dtype="bfloat16", packed_conv=packed),
            train=TrainConfig(remat=remat),
        )
        trainer = LipNetTrainer(cfg, mesh=mesh, log=Logger(None, console=False))
        batch = {
            "video": rng.random((B, 75, 50, 100, 1)).astype(np.float32),
            "labels": np.pad(
                rng.integers(1, 37, size=(B, 24)).astype(np.int32),
                ((0, 0), (0, 8)),
            ),
            "label_lengths": np.full((B,), 24, np.int32),
        }
        state = trainer.init_state(batch)
        dbatch = trainer._device_batch(batch)
        state, m = trainer.compiled["train"](
            state, dbatch, trainer.rng, np.float32(trainer.current_lr)
        )
        float(m["loss"])
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = trainer.compiled["train"](
                state, dbatch, trainer.rng, np.float32(trainer.current_lr)
            )
        float(m["loss"])
        dt = (time.perf_counter() - t0) / n
        cps = B / dt
        return {
            "remat": remat, "packed": packed, "B": B,
            "step_ms": round(dt * 1e3, 2),
            "clips_per_sec": round(cps, 1),
            "mfu": round(cps * lipnet_train_flops(cfg.model) / v5e_peak_flops(), 3),
        }

    for remat, packed, B in [
        (True, False, 128),   # round-1 tuned config (control)
        (True, True, 128),
        (False, True, 128),
        (False, False, 128),
        (False, True, 192),
        (True, True, 256),
    ]:
        try:
            print(json.dumps(measure(remat, packed, B)), flush=True)
        except Exception as e:
            print(json.dumps({
                "remat": remat, "packed": packed, "B": B,
                "error": str(e)[:160],
            }), flush=True)


if __name__ == "__main__":
    main()
