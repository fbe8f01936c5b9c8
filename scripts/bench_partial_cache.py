"""Measure e2e training throughput vs device-cache fraction (VERDICT r3 #3).

Round 3's all-or-nothing cache cliffed 607 -> 132 clips/s/chip the moment a
corpus exceeded device_cache_budget_mb. The round-4 partial cache pins the
budget-sized prefix and streams the rest; this driver sweeps the budget so
the cached fraction runs 0 -> 100% over the bench corpus and reports the
e2e rate at each point — the acceptance test is throughput degrading
roughly linearly with the streamed fraction instead of cliffing.

Run on TPU: python scripts/bench_partial_cache.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from run_baselines import warm_until_steady  # noqa: E402

from avsync.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from avsync.config import AvsyncConfig, ModelConfig, TrainConfig  # noqa: E402
from avsync.data import GridDataSource, LipNetBatcher, synthetic  # noqa: E402
from avsync.parallel import make_mesh  # noqa: E402
from avsync.train import LipNetTrainer  # noqa: E402
from avsync.utils.logging import Logger  # noqa: E402

N_CLIPS = 256
CORPUS = f"/tmp/avsync_bench_corpus_{N_CLIPS}"


def main() -> int:
    import jax

    if not os.path.isdir(CORPUS):
        synthetic.write_corpus(
            CORPUS, n_speakers=4, clips_per_speaker=N_CLIPS // 4,
            preprocessed=True, seed=7, with_audio=False,
        )
    cfg = AvsyncConfig(
        model=ModelConfig(compute_dtype="bfloat16", packed_conv=True),
        train=TrainConfig(remat=False),
    )
    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev, 1))
    trainer = LipNetTrainer(cfg, mesh=mesh, log=Logger(None, console=False))
    src = GridDataSource(CORPUS)
    # smaller batch than bench.py's 128 -> 8 batches/epoch over the 256-clip
    # corpus, so the fraction sweep isn't dominated by 2-batch epoch noise
    # cap at half the corpus so a many-device host (B scales with n_dev and
    # epoch() drops the last partial batch) still gets >=2 batches/epoch
    # instead of zero (metrics=None crash) or one (meaningless sweep);
    # keep B a multiple of n_dev so the global batch shards over 'data'
    B = min(int(os.environ.get("AVSYNC_PARTIAL_BENCH_B", 64)) * n_dev,
            N_CLIPS // 2)
    B = max(n_dev, B // n_dev * n_dev)

    clip_mb = 4 * 75 * 50 * 100 / 2**20  # 1.43 MB f32
    total_mb = N_CLIPS * clip_mb
    rows = []
    state = None
    for frac in (0.0, 0.25, 0.5, 0.75, 1.0):
        budget = int(np.ceil(total_mb * frac)) if frac else 0
        mode = "off" if frac == 0.0 else "auto"
        data_cfg = dataclasses.replace(
            cfg.data, data_path=CORPUS, batch_size=B, device_cache=mode,
            device_cache_budget_mb=budget,
        )
        batcher = LipNetBatcher(
            src, dataclasses.replace(cfg, data=data_cfg), mesh=mesh
        )

        def run_epoch(state, seed):
            n, metrics = 0, None
            for batch in batcher.epoch(shuffle=True, seed=seed):
                state, metrics = trainer.compiled["train"](
                    state, trainer._device_batch(batch), trainer.rng,
                    np.float32(trainer.current_lr),
                )
                n += batch["video"].shape[0]
            float(np.asarray(metrics["loss"]))  # honest tunnel sync
            return state, n

        if state is None:
            first = batcher.first_batch(batch_size=B)
            state = trainer.init_state(
                {k: v for k, v in first.items() if k != "valid"}
            )
        # Shared warm-up protocol (see run_baselines.warm_until_steady):
        # time only after two consecutive warm epochs agree within 30%.
        def warm_once():
            nonlocal state
            state, _ = run_epoch(state, 0)

        warm_until_steady(warm_once)
        t0 = time.perf_counter()
        total = 0
        for ep in (1, 2):
            state, n = run_epoch(state, ep)
            total += n
        rate = total / (time.perf_counter() - t0) / n_dev
        n_cached = (batcher._device_cache or {}).get("n_cached", 0)
        rows.append({
            "cached_fraction": frac,
            "budget_mb": budget,
            "n_cached": int(n_cached),
            "clips_per_sec_per_chip": round(rate, 2),
        })
        print(json.dumps(rows[-1]), flush=True)

    out = {"partial_cache_sweep": rows, "corpus_clips": N_CLIPS,
           "corpus_mb": round(total_mb)}
    with open("/tmp/partial_cache_sweep.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
