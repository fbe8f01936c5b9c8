"""Worker for tests/test_multihost.py — one multi-controller process.

Run as:  python tests/_multihost_worker.py <proc_id> <nproc> <port> <corpus>

Each process simulates one "host" of a pod: 4 virtual CPU devices, gloo
collectives, global 8-device ('data','model') mesh. It trains the tiny
LipNet for two epochs in both pipeline modes and prints one JSON line of
losses; the test compares them against an in-process single-controller run
of the same `run_losses` (bit-for-bit identical host code path — the
multi-controller seam is only WHERE each array's shards upload from).
"""

import json
import sys


def _tiny_cfg(corpus: str, device_cache: str, **train_kw):
    """Shared tiny geometry for every worker scenario (labels stay
    CTC-feasible at T=24 — zero_infinity would silently zero the loss)."""
    from avsync.config import AvsyncConfig, DataConfig, ModelConfig, TrainConfig

    return AvsyncConfig(
        model=ModelConfig(
            vocab_size=39, hidden_dim=8,
            conv_channels=(2, 3, 4),
            conv_kernels=((3, 5, 5), (3, 5, 5), (3, 3, 3)),
        ),
        data=DataConfig(
            data_path=corpus, batch_size=8,
            img_width=32, img_height=16, max_video_length=24,
            max_label_length=12, device_cache=device_cache,
        ),
        train=TrainConfig(learning_rate=1e-3, seed=7, **train_kw),
    )


def run_losses(corpus: str, mode: str, mesh_shape=(-1, 1)) -> list:
    """Two training epochs over the synthetic corpus; returns epoch losses.

    mode='stream': host decode -> H2D -> device preprocess each batch.
    mode='cache':  device-resident epoch cache ('on') — epoch 1 builds it,
                   epoch 2 is pure on-device gathers.
    mesh_shape=(4, 2) runs dp x tp — with 2 processes x 4 devices each
    tensor-parallel pair sits inside one host (the realistic pod layout:
    'model' collectives ride intra-host links) while the 'data' axis spans
    both hosts, so TP param placement (put_with_sharding slicing the gate
    columns per device) and cross-host gradient reduce compose.
    """
    import numpy as np

    from avsync.data import GridDataSource, LipNetBatcher
    from avsync.parallel import make_mesh
    from avsync.train import LipNetTrainer
    from avsync.utils.logging import Logger

    cfg = _tiny_cfg(corpus, "on" if mode == "cache" else "off")
    src = GridDataSource(corpus)
    if mesh_shape == "slice":
        # 2-level multi-slice mesh: ('slice','data','model') = (2, 4, 1) —
        # with 2 processes each slice IS one host, the DCN-crossing layout
        from avsync.parallel.mesh import make_hierarchical_mesh

        mesh = make_hierarchical_mesh((2, 4, 1))
    else:
        mesh = make_mesh(mesh_shape)
    batcher = LipNetBatcher(src, cfg, mesh=mesh)
    trainer = LipNetTrainer(cfg, mesh=mesh, log=Logger(None, console=False))
    state = trainer.init_state(batcher.first_batch())
    losses = []
    for epoch in range(2):
        state, loss = trainer.train_epoch(
            state, batcher.epoch(shuffle=True, seed=epoch)
        )
        losses.append(float(loss))
    del state
    return [round(x, 6) for x in np.asarray(losses).tolist()]


def run_scan_losses(corpus: str, ckpt_dir: str = None) -> tuple:
    """Two whole-epoch-scanned training epochs (full device cache, one
    dispatch per epoch) + an Orbax checkpoint save/restore roundtrip.
    Returns (losses, roundtrip_max_abs_err)."""
    import jax
    import numpy as np

    from avsync.data import GridDataSource, LipNetBatcher
    from avsync.parallel import make_mesh
    from avsync.train import LipNetTrainer
    from avsync.utils.logging import Logger

    cfg = _tiny_cfg(corpus, "on")
    src = GridDataSource(corpus)
    mesh = make_mesh((-1, 1))
    batcher = LipNetBatcher(src, cfg, mesh=mesh)
    trainer = LipNetTrainer(cfg, mesh=mesh, log=Logger(None, console=False))
    state = trainer.init_state(batcher.first_batch())
    losses = []
    for epoch in range(2):
        plan = batcher.scan_plan(shuffle=True, seed=epoch)
        assert plan is not None, "full cache expected -> scan plan"
        state, loss = trainer.train_epoch_scanned(state, plan)
        losses.append(float(loss))

    err = -1.0
    if ckpt_dir is not None:
        from avsync.utils.checkpoint import CheckpointManager

        mgr = CheckpointManager(ckpt_dir)
        mgr.save(1, {"params": state.params}, config=cfg)
        restored, _ = mgr.restore(1, template={"params": state.params})
        diffs = jax.tree.map(
            lambda a, b: float(np.max(np.abs(
                np.asarray(a, np.float64) - np.asarray(b, np.float64)
            ))),
            restored["params"], state.params,
        )
        err = max(jax.tree.leaves(diffs))
        mgr.close()
    return [round(x, 6) for x in losses], err


def run_partial_cache(corpus: str) -> dict:
    """Partial device cache under multi-controller: the budget-sized prefix
    is cached, the rest streams per epoch. Each host must decode only the
    missed rows ITS devices hold (the same _local_rows discipline as the
    streamed path) — without it every host decodes every miss and the
    partial cache costs P times the streamed path's host work. Returns the
    epoch losses plus the post-build per-host decode count so the test can
    assert the 1/P split."""
    import numpy as np

    from avsync.config import (
        AvsyncConfig, DataConfig, ModelConfig, TrainConfig,
    )
    from avsync.data import GridDataSource, LipNetBatcher
    from avsync.parallel import make_mesh
    from avsync.train import LipNetTrainer
    from avsync.utils.logging import Logger

    cfg = AvsyncConfig(
        model=ModelConfig(
            vocab_size=39, hidden_dim=8,
            conv_channels=(2, 3, 4),
            conv_kernels=((3, 5, 5), (3, 5, 5), (3, 3, 3)),
        ),
        data=DataConfig(
            data_path=corpus, batch_size=8,
            img_width=64, img_height=48, max_video_length=24,
            max_label_length=12,
            # 1 MB budget over 288 kB f32 clips -> 3 of 16 clips cached;
            # f32 pinned so the uint8-exact mode can't widen the prefix.
            # 'auto' (not 'on': that pins the WHOLE corpus regardless of
            # budget) — the cache builds on the second epoch() call
            device_cache="auto", device_cache_budget_mb=1,
            device_cache_dtype="float32",
        ),
        train=TrainConfig(learning_rate=1e-3, seed=7),
    )
    src = GridDataSource(corpus)
    mesh = make_mesh((-1, 1))
    batcher = LipNetBatcher(src, cfg, mesh=mesh)
    counts = {"n": 0}
    orig_decode = batcher._decode_clip

    def counting_decode(path):
        counts["n"] += 1
        return orig_decode(path)

    batcher._decode_clip = counting_decode
    trainer = LipNetTrainer(cfg, mesh=mesh, log=Logger(None, console=False))
    state = trainer.init_state(batcher.first_batch())
    losses = []
    decodes = []
    # epoch 0 streams + (under 'auto') builds the cache prefix on its
    # epoch() call; epochs 1-2 are the steady-state partial-cache regime
    # whose decode counts the test asserts on
    for epoch in range(3):
        counts["n"] = 0
        state, loss = trainer.train_epoch(
            state, batcher.epoch(shuffle=True, seed=epoch)
        )
        losses.append(float(loss))
        decodes.append(counts["n"])
    assert batcher._device_cache is not None
    n_cached = int(batcher._device_cache["n_cached"])
    del state
    return {
        "losses": [round(x, 6) for x in np.asarray(losses).tolist()],
        "n_cached": n_cached,
        "epoch_decodes": decodes,
    }


def run_preempt(corpus: str, proc_id: int, ckpt_dir: str) -> dict:
    """Preemption drill on a dp x tp mesh: ONLY process 0 receives SIGTERM
    (mid-run skew — the worst case for a process-local stop flag). The
    lockstep vote must stop BOTH processes at the same epoch boundary, and
    the final checkpoint must save the tensor-parallel (non-addressable)
    params via multihost.get_global without deadlock."""
    import os
    import signal

    from avsync.data import GridDataSource, LipNetBatcher
    from avsync.parallel import make_mesh
    from avsync.train import LipNetTrainer
    from avsync.utils.checkpoint import CheckpointManager
    from avsync.utils.logging import Logger

    cfg = _tiny_cfg(corpus, "off", checkpoint_every=100)
    src = GridDataSource(corpus)
    mesh = make_mesh((4, 2))
    batcher = LipNetBatcher(src, cfg, mesh=mesh)
    trainer = LipNetTrainer(cfg, mesh=mesh, log=Logger(None, console=False))

    def signal_proc0_at_2(state, epoch):
        if epoch == 2 and proc_id == 0:
            os.kill(os.getpid(), signal.SIGTERM)

    trainer.train(
        lambda: batcher.epoch(shuffle=True, seed=0),
        lambda: batcher.epoch(shuffle=False, seed=0),
        epochs=30,
        checkpoint_dir=ckpt_dir,
        example_fn=signal_proc0_at_2,
    )
    mgr = CheckpointManager(ckpt_dir)
    latest = int(mgr.latest_step())
    _, meta = mgr.restore(latest)
    mgr.close()
    return {
        "epochs_run": len(trainer.train_losses),
        "ckpt_latest": latest,
        "preempted_meta": float(meta.get("metrics", {}).get("preempted", 0)),
    }


def main() -> None:
    proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    corpus = sys.argv[4]
    partial_corpus = sys.argv[5] if len(sys.argv) > 5 else None

    from avsync.parallel import multihost

    multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=proc_id,
        simulate_cpu_devices=4,
    )
    import jax

    assert jax.device_count() == 4 * nproc, jax.devices()
    assert multihost.is_multiprocess() == (nproc > 1)
    # reuse compiled executables across worker invocations/processes (the
    # jax compilation cache is multi-process safe; cuts test wall sharply)
    from avsync.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    scan_losses, ckpt_err = run_scan_losses(corpus, ckpt_dir=corpus + "_ckpt")
    out = {
        "process": proc_id,
        "devices": jax.device_count(),
        "stream": run_losses(corpus, "stream"),
        "cache": run_losses(corpus, "cache"),
        "tp": run_losses(corpus, "stream", mesh_shape=(4, 2)),
        "slice": run_losses(corpus, "stream", mesh_shape="slice"),
        "scan": scan_losses,
        "ckpt_err": ckpt_err,
        "preempt": run_preempt(corpus, proc_id, corpus + "_preempt_ckpt"),
    }
    if partial_corpus is not None:
        out["partial"] = run_partial_cache(partial_corpus)
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
