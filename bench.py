"""Benchmark: LipNet CTC train-step throughput (clips/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec", "vs_baseline": N}

Baseline: the reference PyTorch stack's train step on this host's CPU
(`trainer.py:28-77` semantics: forward + CTC + backward + clip + Adam,
B=2, T=75, 50x100 frames) measures 0.645 clips/sec (torch 2.13 CPU,
single core, measured 2026-08-16 on this machine). The driver-specified
north star is >=50x that on TPU (BASELINE.json).
"""

from __future__ import annotations

import json
import time

import numpy as np

TORCH_CPU_BASELINE_CLIPS_PER_SEC = 0.645


def main() -> None:
    import jax

    from avsync.config import AvsyncConfig
    from avsync.parallel import make_mesh
    from avsync.train import LipNetTrainer
    from avsync.utils.logging import Logger

    from avsync.config import ModelConfig, TrainConfig

    # Tuned on v5e (scripts/perf_sweep.py): bf16 compute + remat + B=128/chip
    # is the HBM ceiling: 514 clips/s vs 156 for f32 B=16 (B>=192 OOMs).
    cfg = AvsyncConfig(
        model=ModelConfig(compute_dtype="bfloat16"),
        train=TrainConfig(remat=True),
    )
    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev, 1))
    trainer = LipNetTrainer(cfg, mesh=mesh, log=Logger(None, console=False))

    B = 128 * n_dev
    rng = np.random.default_rng(0)
    batch = {
        "video": rng.random((B, 75, 50, 100, 1)).astype(np.float32),
        "labels": np.pad(
            rng.integers(1, 37, size=(B, 24)).astype(np.int32), ((0, 0), (0, 8))
        ),
        "label_lengths": np.full((B,), 24, np.int32),
    }
    state = trainer.init_state(batch)
    dbatch = trainer._device_batch(batch)

    # Warmup / compile. NOTE: fetch the loss VALUE — through the axon tunnel
    # block_until_ready returns before device execution completes, which
    # inflates throughput ~100x; a host value round-trip is the honest sync.
    state, metrics = trainer.compiled["train"](
        state, dbatch, trainer.rng, np.float32(trainer.current_lr)
    )
    float(metrics["loss"])

    n_steps = 5
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = trainer.compiled["train"](
            state, dbatch, trainer.rng, np.float32(trainer.current_lr)
        )
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    clips_per_sec = B * n_steps / dt
    per_chip = clips_per_sec / n_dev
    print(
        json.dumps(
            {
                "metric": "lipnet_train_clips_per_sec_per_chip",
                "value": round(per_chip, 2),
                "unit": "clips/sec",
                "vs_baseline": round(
                    per_chip / TORCH_CPU_BASELINE_CLIPS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
