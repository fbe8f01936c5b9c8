"""Component-level profile of the LipNet train step on the real TPU.

Times each stage at the bench geometry (B=128/chip, bf16, remat) and prints
one JSON line per component, plus the analytic FLOP budget and achieved
TFLOP/s, so the optimization targets are measured rather than guessed.

Run: python scripts/profile_step.py  (from /root/repo; JAX_PLATFORMS=axon)
NOTE: honest timing through the axon tunnel requires a host value fetch
(float(...)) per sync — block_until_ready returns early.
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

    from avsync.config import AvsyncConfig, ModelConfig, TrainConfig
    from avsync.models import LipNet
    from avsync.ops.conv import conv3d, max_pool3d
    from avsync.ops.gru import gru_scan, gru_scan_fused, init_gru_params
    from avsync.parallel import make_mesh
    from avsync.train import LipNetTrainer
    from avsync.utils.flops import (
        conv_stack_flops,
        gru_stack_flops,
        lipnet_forward_flops,
        lipnet_train_flops,
        v5e_peak_flops,
    )
    from avsync.utils.logging import Logger

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    DT = jnp.bfloat16
    cfg = AvsyncConfig(
        model=ModelConfig(compute_dtype="bfloat16"),
        train=TrainConfig(remat=True),
    )
    mcfg = cfg.model
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    results = {}

    def report(name, seconds, flops=None):
        entry = {"component": name, "ms": round(seconds * 1e3, 3)}
        if flops:
            entry["tflops_per_s"] = round(flops / seconds / 1e12, 2)
            entry["mxu_util"] = round(flops / seconds / v5e_peak_flops(), 3)
        results[name] = entry
        print(json.dumps(entry), flush=True)

    # --- full train step (the bench number) ------------------------------
    mesh = make_mesh((len(jax.devices()), 1))
    trainer = LipNetTrainer(cfg, mesh=mesh, log=Logger(None, console=False))
    batch = {
        "video": rng.random((B, 75, 50, 100, 1)).astype(np.float32),
        "labels": np.pad(
            rng.integers(1, 37, size=(B, 24)).astype(np.int32), ((0, 0), (0, 8))
        ),
        "label_lengths": np.full((B,), 24, np.int32),
    }
    state = trainer.init_state(batch)
    dbatch = trainer._device_batch(batch)

    def step():
        nonlocal state
        state, metrics = trainer.compiled["train"](
            state, dbatch, trainer.rng, np.float32(trainer.current_lr)
        )
        return metrics["loss"]

    t = timeit(step, n=5)
    report("train_step", t, B * lipnet_train_flops(mcfg))

    # --- forward only -----------------------------------------------------
    model = LipNet(mcfg)
    params = state.params
    video = dbatch["video"]
    fwd = jax.jit(lambda p, v: model.apply({"params": p}, v))
    t = timeit(fwd, params, video, n=5)
    report("forward", t, B * lipnet_forward_flops(mcfg))

    # --- conv stack only (fwd) --------------------------------------------
    convf = jax.jit(
        lambda p, v: model.apply({"params": p}, v, method=model.conv_features)
    )
    t = timeit(convf, params, video, n=5)
    report("conv_stack_fwd", t, B * conv_stack_flops(mcfg, 75, 50, 100))

    # --- conv stack fwd+bwd -----------------------------------------------
    conv_grad = jax.jit(
        jax.grad(
            lambda p, v: model.apply(
                {"params": p}, v, method=model.conv_features
            ).astype(jnp.float32).sum()
        )
    )
    t = timeit(conv_grad, params, video, n=3)
    report("conv_stack_fwd_bwd", t, 3 * B * conv_stack_flops(mcfg, 75, 50, 100))

    # --- each conv layer (fwd, bf16) ---------------------------------------
    shapes = [
        ((B, 75, 50, 100, 1), (3, 5, 5, 1, 32)),
        ((B, 75, 25, 50, 32), (3, 5, 5, 32, 64)),
        ((B, 75, 12, 25, 64), (3, 3, 3, 64, 96)),
    ]
    for i, (xs, ks) in enumerate(shapes):
        x = jnp.asarray(rng.random(xs, np.float32), DT)
        k = jnp.asarray(rng.random(ks, np.float32) * 0.1, DT)
        f = jax.jit(lambda x, k: conv3d(x, k))
        fl = 2 * np.prod(xs[:4]) * ks[4] * np.prod(ks[:4])
        t = timeit(f, x, k, n=5)
        report(f"conv{i + 1}_fwd", t, int(fl))

    # conv2 with output channels padded to 128 (diagnostic: if ~same time as
    # 64, the lane padding was already paying for the unused half)
    x = jnp.asarray(rng.random((B, 75, 25, 50, 32), np.float32), DT)
    k = jnp.asarray(rng.random((3, 5, 5, 32, 128), np.float32) * 0.1, DT)
    f = jax.jit(lambda x, k: conv3d(x, k))
    t = timeit(f, x, k, n=5)
    report("conv2_fwd_128out", t, int(2 * B * 75 * 25 * 50 * 128 * 32 * 75))

    # conv2+relu+pool fused cost (what the model actually executes per block)
    f = jax.jit(lambda x, k: max_pool3d(jax.nn.relu(conv3d(x, k))))
    k64 = jnp.asarray(rng.random((3, 5, 5, 32, 64), np.float32) * 0.1, DT)
    t = timeit(f, x, k64, n=5)
    report("conv2_relu_pool_fwd", t, int(2 * B * 75 * 25 * 50 * 64 * 32 * 75))

    # --- GRU stack (fwd) ----------------------------------------------------
    feat = jnp.asarray(rng.random((B, 75, 6912), np.float32), DT)
    p1 = init_gru_params(key, 6912, 256)
    p2 = init_gru_params(jax.random.fold_in(key, 1), 512, 256)

    def gru_stack(feat, p1, p2, scan_fn):
        h = jnp.concatenate(
            [scan_fn(p1, feat, reverse=False), scan_fn(p1, feat, reverse=True)],
            -1,
        )
        return jnp.concatenate(
            [scan_fn(p2, h, reverse=False), scan_fn(p2, h, reverse=True)], -1
        )

    f = jax.jit(lambda x, p1, p2: gru_stack(x, p1, p2, gru_scan))
    t = timeit(f, feat, p1, p2, n=5)
    report("gru_stack_fwd_scan", t, B * gru_stack_flops(mcfg, 75, 6912))

    try:
        fp = jax.jit(
            lambda x, p1, p2: gru_stack(
                x, p1, p2,
                lambda p, v, reverse: gru_scan_fused(p, v, reverse=reverse),
            )
        )
        t = timeit(fp, feat, p1, p2, n=5)
        report("gru_stack_fwd_pallas", t, B * gru_stack_flops(mcfg, 75, 6912))
    except Exception as e:  # pallas kernel may not fit this B
        print(json.dumps({"component": "gru_stack_fwd_pallas", "error": str(e)}))

    # GRU stack fwd+bwd (the training cost of the recurrence)
    g = jax.jit(
        jax.grad(
            lambda p1, x: gru_stack(x, p1, p2, gru_scan)
            .astype(jnp.float32)
            .sum()
        )
    )
    t = timeit(g, p1, feat, n=3)
    report("gru_stack_fwd_bwd_scan", t, 3 * B * gru_stack_flops(mcfg, 75, 6912))

    # --- CTC loss fwd+bwd ---------------------------------------------------
    from avsync.ops.ctc import ctc_loss_mean

    lp = jax.nn.log_softmax(
        jnp.asarray(rng.normal(size=(B, 75, 39)), jnp.float32), -1
    )
    labels = dbatch["labels"]
    lens = dbatch["label_lengths"]
    cf = jax.jit(jax.grad(lambda lp: ctc_loss_mean(lp, labels, lens)))
    t = timeit(cf, lp, n=3)
    report("ctc_fwd_bwd", t)

    # --- summary ------------------------------------------------------------
    print(json.dumps({
        "B": B,
        "flops_per_clip_train": lipnet_train_flops(mcfg),
        "flops_per_clip_fwd": lipnet_forward_flops(mcfg),
        "train_clips_per_sec": round(B / (results["train_step"]["ms"] / 1e3), 1),
    }))


if __name__ == "__main__":
    main()
