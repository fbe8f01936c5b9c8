"""Serving-daemon throughput: dynamic batching under concurrent clients.

Measures the full TranscribeService path (host frames -> payload ->
batcher -> device preprocess/forward -> CTC decode -> host string) at
production LipNet geometry, sweeping client concurrency and comparing
the two transports:

  * raw  — uint8 payload, preprocess per BATCH on device (the default);
  * f32  — per-request device preprocess, f32 row payload (the old path).

Through the axon tunnel the per-request traffic dominates at low
concurrency: the f32 transport ships ~3x the clip in f32 round trips
(upload raw, download crop, re-upload crop) while raw ships one uint8
copy — on a direct-PCIe host the same sweep is forward-bound. Run on
the real chip:

    python scripts/bench_serving.py --clients 1 2 4 8 --n 64 \
        [--transports raw f32] [--int8] [--geometry 50x100]

Prints one JSON line per (transport, concurrency) plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_reader(quantize, tmpdir):
    import jax
    import jax.numpy as jnp

    from avsync.compat import save_lipnet_pth
    from avsync.config import AvsyncConfig, ModelConfig
    from avsync.models import LipNet
    from avsync.predictor import LipReader

    cfg = AvsyncConfig(model=ModelConfig(
        compute_dtype="bfloat16", packed_conv=True))
    model = LipNet(cfg.model)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 75, 50, 100, 1))
    )["params"]
    ckpt = os.path.join(tmpdir, "bench_serving_lipnet.pth")
    save_lipnet_pth(jax.device_get(params), ckpt, conv_shape=(96, 6, 12))
    calib = [np.random.default_rng(1).random((75, 50, 100)).astype(np.float32)
             * 255]
    return LipReader(ckpt, cfg, quantize=quantize,
                     calibration_frames=calib if quantize else None)


def build_scorer(tmpdir):
    import jax
    import jax.numpy as jnp

    from avsync.compat import save_detector_pth, save_lipnet_pth
    from avsync.config import AvsyncConfig, ModelConfig
    from avsync.models import LipNet, MisalignmentDetector
    from avsync.predictor import MisalignmentScorer

    cfg = AvsyncConfig(model=ModelConfig(
        compute_dtype="bfloat16", packed_conv=True))
    model = LipNet(cfg.model)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 75, 50, 100, 1))
    )["params"]
    lip = os.path.join(tmpdir, "bench_serving_lipnet.pth")
    save_lipnet_pth(jax.device_get(params), lip, conv_shape=(96, 6, 12))
    conv_dim = 96 * 6 * 12
    feat_dim = 2 * conv_dim + 2 * cfg.audio.n_mfcc
    det_model = MisalignmentDetector(hidden_dim=512)
    dp = det_model.init(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, feat_dim))
    )["params"]
    det = os.path.join(tmpdir, "bench_serving_detector.pth")
    save_detector_pth(
        jax.device_get(dp), det, feat_dim, 512,
        {"sample_rate": 16000, "n_mfcc": cfg.audio.n_mfcc,
         "max_shift_frames": 20},
        conv_shape=(96, 6, 12), n_audio_feats=2 * cfg.audio.n_mfcc,
    )
    return MisalignmentScorer(det, lip, cfg)


def run_sync_sweep(scorer, clips_u8, clients_list, n_requests, max_batch,
                   max_wait_ms, shifts=(0, 10, -10)):
    from avsync.serving import SyncScoreService

    rng = np.random.default_rng(3)
    audios = [(rng.standard_normal(48000) * 0.2).astype(np.float32)
              for _ in clips_u8]
    results = []
    for n_clients in clients_list:
        svc = SyncScoreService(scorer, max_batch=max_batch,
                               max_wait_ms=max_wait_ms)
        try:
            # warm every bucket (the fused scorer compiles per B-bucket) —
            # the SAME warmup production uses, at the clients' geometry
            svc.warmup(shifts=shifts, frames=clips_u8[0], audio=audios[0])

            per_client = max(1, n_requests // n_clients)
            errs = []

            def client(ci):
                try:
                    for i in range(per_client):
                        k = (ci + i) % len(clips_u8)
                        svc.score_arrays(clips_u8[k], audios[k], 25.0,
                                         shifts=shifts, timeout=600)
                except Exception as e:  # noqa: BLE001
                    errs.append(e)

            threads = [threading.Thread(target=client, args=(ci,))
                       for ci in range(n_clients)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt = time.perf_counter() - t0
            if errs:
                raise errs[0]
            snap = svc.stats.snapshot()
            total = per_client * n_clients
            rec = {
                "service": "sync_score",
                "clients": n_clients,
                "requests_per_sec": round(total / dt, 2),
                "shift_scores_per_sec": round(total * len(shifts) / dt, 2),
                "mean_latency_ms": snap["latency_ms"]["p50"],
                "p99_latency_ms": snap["latency_ms"]["p99"],
                "batch_histogram": snap["batches"],
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
        finally:
            svc.close()
    return results


def run_sweep(reader, transport, clips_u8, clients_list, n_requests,
              max_batch, max_wait_ms, artifact=None):
    from avsync.serving import ArtifactTranscribeService, TranscribeService

    results = []
    for n_clients in clients_list:
        if transport == "artifact":
            svc = ArtifactTranscribeService(
                artifact, max_batch=max_batch, max_wait_ms=max_wait_ms)
        else:
            svc = TranscribeService(reader, max_batch=max_batch,
                                    max_wait_ms=max_wait_ms,
                                    transport=transport)
        try:
            if transport == "artifact":
                svc.warmup()  # buckets compile from StableHLO
            else:
                svc.warmup(clips_u8[0])  # production's own bucket warmup
            per_client = max(1, n_requests // n_clients)
            errs = []

            def client(ci):
                try:
                    for i in range(per_client):
                        svc.transcribe_frames(
                            clips_u8[(ci + i) % len(clips_u8)], timeout=600)
                except Exception as e:  # noqa: BLE001
                    errs.append(e)

            threads = [threading.Thread(target=client, args=(ci,))
                       for ci in range(n_clients)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            dt = time.perf_counter() - t0
            if errs:
                raise errs[0]
            snap = svc.stats.snapshot()
            total = per_client * n_clients
            rec = {
                "transport": transport,
                "clients": n_clients,
                "clips_per_sec": round(total / dt, 2),
                "mean_latency_ms": snap["latency_ms"]["p50"],
                "p99_latency_ms": snap["latency_ms"]["p99"],
                "batch_histogram": snap["batches"],
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
        finally:
            svc.close()
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--n", type=int, default=64,
                    help="total requests per concurrency point")
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=10.0)
    ap.add_argument("--transports", nargs="+", default=["raw", "f32"],
                    choices=["raw", "f32", "artifact"],
                    help="'artifact' serves the same weights through an "
                         "AOT StableHLO export (ArtifactTranscribeService)")
    ap.add_argument("--artifact_buckets", type=int, nargs="+", default=None,
                    help="export one fully-static module per batch bucket "
                         "(e.g. 1 2 4 8) instead of the default symbolic-"
                         "batch artifact — the A/B for the static-bucket "
                         "export mode")
    ap.add_argument("--service", choices=["transcribe", "sync"],
                    default="transcribe")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--geometry", type=str, default="50x100",
                    help="HxW of client frames; 50x100 = pre-cropped, "
                         "anything else goes through the device ROI")
    ap.add_argument("--tmpdir", type=str, default="/tmp")
    args = ap.parse_args()

    import jax

    from avsync.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    h, w = (int(v) for v in args.geometry.split("x"))
    print(json.dumps({"mode": "int8" if args.int8 else "f32/bf16",
                      "backend": jax.devices()[0].platform,
                      "geometry": [75, h, w],
                      "max_batch": args.max_batch,
                      "max_wait_ms": args.max_wait_ms}), flush=True)
    rng = np.random.default_rng(2)
    clips = [rng.integers(0, 255, (75, h, w), np.uint8) for _ in range(4)]
    if args.service == "sync":
        scorer = build_scorer(args.tmpdir)
        res = run_sync_sweep(scorer, clips, args.clients, args.n,
                             args.max_batch, args.max_wait_ms)
        if len(res) > 1:
            print(json.dumps({
                "summary": "sync_daemon_scaling",
                "speedup_max_vs_1_client":
                    round(res[-1]["requests_per_sec"]
                          / res[0]["requests_per_sec"], 2),
            }), flush=True)
        return
    reader = build_reader("int8" if args.int8 else None, args.tmpdir)
    artifact = None
    if "artifact" in args.transports:
        from avsync.export import export_transcriber

        # same weights as the live reader (build_reader's ckpt)
        artifact = export_transcriber(
            os.path.join(args.tmpdir, "bench_serving_lipnet.pth"),
            reader.cfg, platforms=("tpu", "cpu"),
            batch_sizes=args.artifact_buckets,
        )
    by_transport = {}
    for transport in args.transports:
        res = run_sweep(reader, transport, clips, args.clients, args.n,
                        args.max_batch, args.max_wait_ms,
                        artifact=artifact)
        by_transport[transport] = res
        if len(res) > 1:
            print(json.dumps({
                "summary": "daemon_scaling", "transport": transport,
                "speedup_max_vs_1_client":
                    round(res[-1]["clips_per_sec"]
                          / res[0]["clips_per_sec"], 2),
            }), flush=True)
    if "raw" in by_transport and "f32" in by_transport:
        for r_raw, r_f32 in zip(by_transport["raw"], by_transport["f32"]):
            print(json.dumps({
                "summary": "raw_vs_f32",
                "clients": r_raw["clients"],
                "raw_over_f32":
                    round(r_raw["clips_per_sec"] / r_f32["clips_per_sec"], 2),
            }), flush=True)


if __name__ == "__main__":
    main()
