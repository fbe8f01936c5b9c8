"""Perf sweep for the LipNet train step on the real TPU.

Measures clips/sec/chip across (batch, compute_dtype, remat) combinations.
Sync via host value fetch (the axon tunnel's block_until_ready returns
early — see bench.py).

Run from /root/repo: python scripts/perf_sweep.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from avsync.config import AvsyncConfig, ModelConfig, TrainConfig
    from avsync.parallel import make_mesh
    from avsync.train import LipNetTrainer
    from avsync.utils.logging import Logger

    rng = np.random.default_rng(0)
    results = []
    for B, dtype, remat in [
        (16, "float32", False),
        (16, "bfloat16", False),
        (32, "bfloat16", True),
        (64, "bfloat16", True),
        (32, "float32", True),
    ]:
        cfg = AvsyncConfig(
            model=ModelConfig(compute_dtype=dtype),
            train=TrainConfig(remat=remat),
        )
        trainer = LipNetTrainer(
            cfg, mesh=make_mesh((1, 1)), log=Logger(None, console=False)
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
            t0 = time.perf_counter()
            state = trainer.init_state(batch)
            db = trainer._device_batch(batch)
            lr = np.float32(trainer.current_lr)
            state, m = trainer.compiled["train"](state, db, trainer.rng, lr)
            float(m["loss"])
            compile_s = time.perf_counter() - t0
            n = 5
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = trainer.compiled["train"](state, db, trainer.rng, lr)
            float(m["loss"])
            dt = (time.perf_counter() - t0) / n
            cps = B / dt
            print(
                f"B={B:3d} {dtype:9s} remat={remat!s:5s}: "
                f"{1000 * dt:7.1f} ms/step, {cps:7.1f} clips/s "
                f"(compile {compile_s:.0f}s)",
                flush=True,
            )
            results.append((B, dtype, remat, cps))
        except Exception as e:
            print(f"B={B} {dtype} remat={remat}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        del trainer

    if results:
        best = max(results, key=lambda r: r[-1])
        print(f"BEST: B={best[0]} {best[1]} remat={best[2]} -> {best[3]:.1f} clips/s")


if __name__ == "__main__":
    main()
