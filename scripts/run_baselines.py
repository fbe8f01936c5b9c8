"""Measure the five BASELINE.json scenarios end-to-end and publish results.

No GRID corpus exists in this environment, so every scenario runs on the
deterministic synthetic corpus (avsync.data.synthetic) — the SAME corpus for
the reference PyTorch stack (torch CPU, /root/reference) and for avsync
(real TPU), so the WER numbers are directly comparable. librosa itself is
absent, but the reference's misalignment-detector scenarios execute anyway
through avsync/compat_librosa.py (scripts/run_reference_detector.py), so
scenarios 3 and 5 carry measured reference-side AUROC.

Scenarios (BASELINE.json `configs`):
  1. single-clip LipNet inference (greedy CTC)
  2. batched preprocessing (mouth ROI + MFCC) over all clips
  3. sliding +/-shift AUROC sweep vs the trained detector
  4. LipNet CTC training, batch 8 (20 epochs here: the reference main.py
     hardcodes 20) -> WER on the held-out speaker
  5. misalignment-detector training on the mesh -> test AUROC

Run: python scripts/run_baselines.py [--skip-reference]
Writes `published` into BASELINE.json.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/avsync_baselines"
CORPUS = os.path.join(WORK, "corpus")  # preprocessed 75x50x100 clips
FULLFRAME = os.path.join(WORK, "fullframe")  # 200x400 raw frames for ROI
REF_DIR = os.path.join(WORK, "reference_run")
AV_DIR = os.path.join(WORK, "avsync_run")

N_SPEAKERS, CLIPS = 3, 8
EPOCHS = 20  # reference main.py hardcodes epochs=20 (`main.py:29`)


def warm_until_steady(run_once, iters: int = 5, tol: float = 0.3):
    """Run `run_once()` until two consecutive walls agree within `tol`.

    Shared warm-up protocol for every epoch-timing harness here and in
    bench_partial_cache.py: under the axon tunnel block_until_ready returns
    before device execution completes, so compile/dispatch backlog from the
    first (compiling) epoch drains into LATER epochs' final sync — timing
    right after one warm epoch undercounts steady state by up to ~30x
    (measured walls 150 s -> 13 s -> 0.46 s on a 24-clip corpus). Returns
    the last run_once() result."""
    prev = None
    out = None
    for _ in range(iters):
        t0 = time.time()
        out = run_once()
        wall = time.time() - t0
        if prev is not None and abs(wall - prev) / max(wall, prev) < tol:
            break
        prev = wall
    return out


def parse_training_log(log_text: str):
    """(test_auc, best_val_auc) parsed from a detector training.log — the
    ONE copy of the "Test AUC:"/"Best val AUC:" literal parsing (lines
    carry a [timestamp] prefix), previously duplicated across four
    drivers. Returns None for a metric whose line is absent."""
    test_auc = best_val = None
    for line in log_text.splitlines():
        if "Test AUC:" in line:
            test_auc = float(line.split("Test AUC:")[-1])
        if "Best val AUC:" in line:
            best_val = float(line.split("Best val AUC:")[-1])
    return test_auc, best_val


def ensure_corpora():
    from avsync.data import synthetic

    if not os.path.isdir(CORPUS):
        synthetic.write_corpus(
            CORPUS, n_speakers=N_SPEAKERS, clips_per_speaker=CLIPS,
            preprocessed=True, seed=42,
        )
    if not os.path.isdir(FULLFRAME):
        synthetic.write_corpus(
            FULLFRAME, n_speakers=N_SPEAKERS, clips_per_speaker=CLIPS,
            preprocessed=False, seed=43,
        )


def run_reference_training():
    """python /root/reference/main.py on the synthetic corpus (torch CPU).

    Runs in a scratch cwd with ./data -> corpus; the reference writes its
    checkpoints (lipnet_final.pth etc.) into that cwd.
    """
    final = os.path.join(REF_DIR, "lipnet_final.pth")
    if os.path.exists(final):
        return {"note": "reusing existing reference run"}
    os.makedirs(REF_DIR, exist_ok=True)
    link = os.path.join(REF_DIR, "data")
    if not os.path.exists(link):
        os.symlink(CORPUS, link)
    env = reference_env()
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "/root/reference/main.py"],
        cwd=REF_DIR, env=env, capture_output=True, text=True,
        timeout=7200,
    )
    wall = time.time() - t0
    if proc.returncode != 0 or not os.path.exists(final):
        raise RuntimeError(
            f"reference run failed rc={proc.returncode}:\n{proc.stderr[-2000:]}"
        )
    n_train = 2 * CLIPS * EPOCHS  # 2 train speakers
    return {
        "wall_seconds": round(wall, 1),
        "train_clips_per_sec": round(n_train / wall, 3),
        "checkpoint": final,
    }


def cli(args):
    from avsync.cli import main

    rc = main(args)
    assert rc == 0, f"avsync cli failed: {args}"


def reference_env():
    """Environment for CPU-pinned reference subprocesses: force the CPU
    backend and scrub the TPU-tunnel pool var so a reference run can never
    attach (or wedge) the tunnel held by the avsync side. Shared by every
    driver that shells out to reference code (run_hard_sweep.py imports
    this) so the scrub list cannot drift."""
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "MPLBACKEND": "Agg"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


# Canonical avsync-side training invocations for the baseline protocol.
# run_hard_sweep.py reuses these so the two drivers cannot drift apart.

def train_avsync_lipnet(pth, ckpt_dir):
    cli([
        "train", "--data_path", CORPUS, "--epochs", str(EPOCHS),
        "--batch_size", "8", "--checkpoint_dir", ckpt_dir,
        "--export_pth", pth,
    ])


def train_avsync_detector(pth, det, log_dir):
    cli([
        "misalign-train", "--data_path", CORPUS, "--checkpoint", pth,
        "--detector_checkpoint", det, "--epochs", "20",
        "--max_shift_frames", "15", "--log_dir", log_dir,
    ])


def scenario_4_training(results, skip_reference):
    """LipNet CTC training, batch 8, both stacks, same corpus + split."""
    os.makedirs(AV_DIR, exist_ok=True)
    ckpt_dir = os.path.join(AV_DIR, "lipnet_ckpts")
    pth = os.path.join(AV_DIR, "lipnet_final.pth")
    t0 = time.time()
    train_avsync_lipnet(pth, ckpt_dir)
    av_wall = time.time() - t0
    av_results = json.load(open(os.path.join(ckpt_dir, "test_results.json")))
    entry = {
        "scenario": "lipnet_training_batch8",
        "corpus": f"synthetic {N_SPEAKERS}x{CLIPS} clips, 75x50x100",
        "epochs": EPOCHS,
        "avsync": {
            "hardware": "1x TPU v5e chip (axon)",
            "wall_seconds": round(av_wall, 1),
            "wall_note": "dominated by one-time XLA compilation at this "
                         "tiny scale (steady state is ~0.4 s/epoch, see the "
                         "extended run; bench.py isolates step throughput)",
            "test_wer": av_results["wer"],
            "test_cer": av_results["cer"],
        },
    }
    if not skip_reference:
        ref = run_reference_training()
        entry["reference"] = {
            "hardware": "host CPU (torch), 1 core",
            **{k: v for k, v in ref.items() if k != "checkpoint"},
        }
        # score the reference-trained weights with the same evaluator
        ref_json = os.path.join(AV_DIR, "ref_test_results.json")
        cli([
            "test", "--data_path", CORPUS,
            "--checkpoint", os.path.join(REF_DIR, "lipnet_final.pth"),
            "--batch_size", "8", "--output", ref_json,
        ])
        rj = json.load(open(ref_json))
        entry["reference"]["test_wer"] = rj["wer"]
        entry["reference"]["test_cer"] = rj["cer"]
        entry["note"] = (
            "identical budget (the reference main.py hardcodes 20 epochs): "
            "at 40 optimizer steps CTC has not left the all-blank regime in "
            "either stack — see lipnet_training_extended for the learning-"
            "capacity run"
        )
    results["lipnet_training"] = entry
    print(json.dumps(entry), flush=True)

    # extended run: enough steps for CTC to actually learn the (learnable)
    # synthetic corpus; held-out-speaker WER measures generalization over the
    # shared phrase inventory. The equivalent reference run is quoted in
    # projected hours from its measured clips/sec.
    ext_dir = os.path.join(AV_DIR, "lipnet_ext")
    ext_epochs = int(os.environ.get("AVSYNC_EXT_EPOCHS", "1000"))
    t0 = time.time()
    cli([
        "train", "--data_path", CORPUS, "--epochs", str(ext_epochs),
        "--batch_size", "8", "--checkpoint_dir", ext_dir,
        "--export_pth", os.path.join(AV_DIR, "lipnet_ext.pth"),
        "--checkpoint_every", str(max(ext_epochs // 4, 1)),
    ])
    ext_wall = time.time() - t0
    ext = json.load(open(os.path.join(ext_dir, "test_results.json")))
    ext_entry = {
        "scenario": f"lipnet_training_extended ({ext_epochs} epochs)",
        "avsync": {
            "hardware": "1x TPU v5e chip",
            "wall_seconds": round(ext_wall, 1),
            "test_wer_heldout_speaker": ext["wer"],
            "test_cer_heldout_speaker": ext["cer"],
        },
    }
    if "reference" in entry and "train_clips_per_sec" in entry["reference"]:
        rate = entry["reference"]["train_clips_per_sec"]
        ext_entry["reference_projected_hours"] = round(
            ext_epochs * 2 * CLIPS / rate / 3600.0, 2
        )
    results["lipnet_training_extended"] = ext_entry
    print(json.dumps(ext_entry), flush=True)
    return pth


def scenario_1_single_clip(results, pth, skip_reference):
    """Single-clip inference: avsync LipReader (TPU, warm) vs torch CPU.

    Weights: the extended-run export when present (emits a real transcript;
    the 20-epoch budget checkpoint is still in the all-blank regime).
    """
    from avsync.config import AvsyncConfig
    from avsync.predictor import LipReader

    ext_pth = os.path.join(AV_DIR, "lipnet_ext.pth")
    if os.path.exists(ext_pth):
        pth = ext_pth
    clip = os.path.join(CORPUS, "s3", "clip00.npy")
    reader = LipReader(pth, AvsyncConfig())
    txt = reader.predict(clip)  # warm-up: decode + jit compile
    t0 = time.time()
    n = 20
    for _ in range(n):
        txt = reader.predict(clip)
    av_ms = (time.time() - t0) / n * 1e3
    entry = {
        "scenario": "single_clip_inference",
        "clip": "75 frames, 50x100",
        "avsync": {"hardware": "1x TPU v5e", "ms_per_clip": round(av_ms, 2),
                   "transcript": txt},
    }
    if not skip_reference:
        import torch

        sys.path.insert(0, "/root/reference")
        from model import LipNet as TorchLipNet  # noqa: E402

        m = TorchLipNet(39)
        sd = torch.load(pth, map_location="cpu")
        m.load_state_dict(sd)
        m.eval()
        video = np.load(clip).astype(np.float32) / 255.0
        x = torch.from_numpy(video[None, None])  # (1, 1, T, H, W)
        with torch.no_grad():
            m(x)
            t0 = time.time()
            for _ in range(3):
                out = m(x)
            ref_ms = (time.time() - t0) / 3 * 1e3
        entry["reference"] = {
            "hardware": "host CPU (torch)", "ms_per_clip": round(ref_ms, 2),
        }
        entry["speedup"] = round(ref_ms / av_ms, 1)
    results["single_clip_inference"] = entry
    print(json.dumps(entry), flush=True)


def scenario_2_preprocessing(results, skip_reference):
    """Batched preprocessing + MFCC — the 's1_processed offline feature
    dump' scenario. Primary number: processed clips (the scenario's corpus).
    Secondary: full-frame clips through the learned-localizer ROI path,
    which on THIS box is bounded by the axon tunnel's host->device transfer
    bandwidth (full frames are 16x the bytes of processed crops)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from avsync.config import AvsyncConfig, DataConfig
    from avsync.data import GridDataSource, LipNetBatcher
    from avsync.data.video import load_audio_for_video
    from avsync.ops import audio as audiolib
    from avsync.ops import audio_ref

    def measure(path, roi_mode, roi_host=False):
        # device_cache MUST be off here: this scenario bills itself as
        # decode+preprocess+H2D throughput (vs the reference's per-clip CPU
        # loop). Under the default 'auto' the 24-clip corpus is pinned in
        # HBM after epoch 1 and every later epoch is a pure on-device
        # gather — a different (much cheaper) workload.
        cfg = AvsyncConfig(
            data=DataConfig(data_path=path, batch_size=8, roi_mode=roi_mode,
                            device_cache="off", roi_host=roi_host)
        )
        src = GridDataSource(path)
        batcher = LipNetBatcher(src, cfg)

        def run_epoch():
            count = 0
            for b in batcher.epoch(shuffle=False, drop_last=False):
                jax.block_until_ready(b["video"])
                count += int(b["valid"])
            # honest tunnel sync
            float(np.asarray(b["video"]).ravel()[0])
            return count

        warm_until_steady(run_epoch)
        walls = []
        for _ in range(3):
            t0 = time.time()
            count = run_epoch()
            walls.append(time.time() - t0)
        return count / sorted(walls)[1]

    proc_rate = measure(CORPUS, "heuristic")
    roi_rate = measure(FULLFRAME, "model")
    # thin-link variant: ROI on the host CPU backend, uint8 crops over the
    # link (16x fewer bytes) — see DataConfig.roi_host
    roi_host_rate = measure(FULLFRAME, "model", roi_host=True)
    cfg = AvsyncConfig(data=DataConfig(data_path=FULLFRAME))
    src = GridDataSource(FULLFRAME)
    n = len(src)

    # audio MFCC stats, batched on device + parity vs the f64 oracle
    auds = []
    for s in src.samples:
        a, sr = load_audio_for_video(s.video_path, cfg.audio.sample_rate)
        auds.append(a)
    L = max(len(a) for a in auds)
    batch = np.zeros((n, L), np.float32)
    lens = np.zeros((n,), np.int32)
    for i, a in enumerate(auds):
        batch[i, : len(a)] = a
        lens[i] = len(a)
    stats_fn = jax.jit(
        lambda a, l: audiolib.audio_stats(a, l, cfg.audio)
    )
    out = stats_fn(jnp.asarray(batch), jnp.asarray(lens))
    float(np.asarray(out).ravel()[0])
    t0 = time.time()
    out = stats_fn(jnp.asarray(batch), jnp.asarray(lens))
    got = np.asarray(out)
    mfcc_wall = time.time() - t0
    oracle = audio_ref.audio_stats(
        auds[0].astype(np.float64), cfg.audio.sample_rate, cfg.audio.n_mfcc
    )
    # scale-relative error: per-element relative division explodes on
    # near-zero stats components (the test suite's bound is scale-relative)
    rel = np.abs(got[0] - oracle).max() / np.abs(oracle).max()
    entry = {
        "scenario": "batched_preprocessing",
        "clips": n,
        "avsync": {
            "hardware": "1x TPU v5e + host decode (1 CPU core)",
            "processed_clips_per_sec": round(proc_rate, 2),
            "fullframe_roi_clips_per_sec": round(roi_rate, 2),
            "fullframe_roi_host_clips_per_sec": round(roi_host_rate, 2),
            "roi_host_note": "DataConfig.roi_host=True: the SAME ROI "
                             "program jitted for the host CPU backend, "
                             "shipping uint8 crops (16x fewer link bytes) "
                             "instead of full frames; batches match the "
                             "device-ROI path within one uint8 step "
                             "(tests/test_data.py::TestHostRoi)",
            "protocol": "device_cache='off' — every timed epoch streams "
                        "host decode + H2D + device preprocess (the "
                        "workload this scenario bills); the default "
                        "'auto' cache would pin the corpus in HBM after "
                        "epoch 1 and turn the timed epochs into pure "
                        "on-device gathers",
            "roi_mode": "model (learned localizer)",
            "mfcc_batch_ms": round(mfcc_wall * 1e3, 2),
            "mfcc_scale_rel_err_vs_f64_oracle": float(rel),
        },
        "note": "librosa absent: MFCC parity is vs the in-repo float64 "
                "oracle (librosa-0.10 semantics). The full-frame ROI number "
                "is bounded by the axon tunnel's host->device bandwidth "
                "(full frames = 16x the processed-crop bytes); on directly "
                "attached hosts PCIe moves them ~100x faster.",
    }
    if not skip_reference:
        sys.path.insert(0, "/root/reference")
        import importlib

        import dataset as ref_dataset  # noqa: E402

        importlib.reload(ref_dataset)
        for path, key in ((CORPUS, "processed"), (FULLFRAME, "fullframe_roi")):
            ds = ref_dataset.GridDataset(
                path, [f"s{i+1}" for i in range(N_SPEAKERS)]
            )
            t0 = time.time()
            for vp, _ in ds.samples:
                ds.process_video(vp)
            ref_wall = time.time() - t0
            entry.setdefault("reference", {})[
                f"{key}_clips_per_sec"
            ] = round(len(ds) / ref_wall, 2)
        entry["reference"]["hardware"] = "host CPU (cv2/numpy per-frame loop)"
        entry["endpoint_note"] = (
            "endpoints differ: the reference numbers stop at host RAM "
            "(np.load/cv2 only — no accelerator in its loop); the avsync "
            "numbers END IN DEVICE HBM, preprocessed and training-ready, "
            "through the axon tunnel's constrained host->device link"
        )
    results["batched_preprocessing"] = entry
    print(json.dumps(entry), flush=True)


def scenario_5_detector_training(results, pth):
    det = os.path.join(AV_DIR, "detector.pth")
    log_dir = os.path.join(AV_DIR, "det_logs")
    t0 = time.time()
    train_avsync_detector(pth, det, log_dir)
    wall = time.time() - t0
    log_run = sorted(os.listdir(log_dir))[-1]
    txt = open(os.path.join(log_dir, log_run, "training.log")).read()
    test_auc, _ = parse_training_log(txt)
    results["detector_training"] = {
        "scenario": "misalignment_detector_training",
        "avsync": {
            "hardware": "1x TPU v5e (mesh (1,1); dp-scalable, see "
                        "tests/test_train_parallel.py for the 8-way mesh)",
            "wall_seconds": round(wall, 1),
            "test_auroc": test_auc,
        },
        "note": "reference side filled in by reference_detector() below "
                "(librosa shim)",
    }
    print(json.dumps(results["detector_training"]), flush=True)
    return det


def scenario_3_shift_sweep(results, pth, det):
    out_json = os.path.join(AV_DIR, "sweep.json")
    t0 = time.time()
    cli([
        "misalign-eval", "--data_path", CORPUS, "--checkpoint", pth,
        "--detector_checkpoint", det, "--min_shift", "5",
        "--max_shift", "20", "--output", out_json,
        # same sign-draw stream as run_reference_detector.phase_b_sweep
        "--seed", "0",
    ])
    wall = time.time() - t0
    sweep = json.load(open(out_json))
    results["shift_sweep_auroc"] = {
        "scenario": "sliding_shift_auroc",
        "avsync": {
            "hardware": "1x TPU v5e",
            "wall_seconds": round(wall, 1),
            "overall_auroc": sweep["overall_auroc"],
            "auroc_by_shift": sweep["auroc_by_shift"],
            "num_clips": sweep["num_clips"],
        },
    }
    print(json.dumps(results["shift_sweep_auroc"]), flush=True)


def reference_detector(results):
    """Reference-side numbers for scenarios 5 and 3: the ACTUAL reference
    misalignment pipeline executed under the avsync librosa shim
    (scripts/run_reference_detector.py)."""
    env = reference_env()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/run_reference_detector.py")],
        capture_output=True, text=True, timeout=7200, env=env,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"reference detector run failed:\n{proc.stderr[-2000:]}")
    ref = json.load(open(os.path.join(WORK, "reference_detector.json")))
    results["detector_training"]["reference"] = {
        k: v for k, v in ref["training"].items() if k != "detector_checkpoint"
    }
    results["detector_training"]["note"] = (
        "reference pipeline executed via avsync/compat_librosa.py (librosa "
        "itself is not installable here); same corpus, epochs, shift range "
        "and seed as the avsync run"
    )
    results["shift_sweep_auroc"]["reference"] = ref["sweep"]
    print(json.dumps({"reference_detector": ref["training"]}), flush=True)


def main():
    skip_reference = "--skip-reference" in sys.argv
    ensure_corpora()
    results = {
        "provenance": {
            "corpus": "synthetic GRID-style corpus (avsync.data.synthetic), "
                      f"{N_SPEAKERS} speakers x {CLIPS} clips, deterministic "
                      "seed 42 — no real GRID corpus exists in this "
                      "environment",
            "avsync_hardware": "1x TPU v5e via axon tunnel",
            "reference_hardware": "host CPU, single core, torch "
                                  "(reference code at /root/reference)",
            "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
    }
    pth = scenario_4_training(results, skip_reference)
    scenario_1_single_clip(results, pth, skip_reference)
    scenario_2_preprocessing(results, skip_reference)
    det = scenario_5_detector_training(results, pth)
    scenario_3_shift_sweep(results, pth, det)
    if not skip_reference:
        reference_detector(results)

    baseline_path = os.path.join(REPO, "BASELINE.json")
    doc = json.load(open(baseline_path))
    # MERGE per-scenario — wholesale replacement would delete the entries
    # published by the sibling drivers (run_hard_sweep, run_wer_headhead,
    # run_production_detector) and their provenance
    doc.setdefault("published", {}).update(results)
    with open(baseline_path, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"published (merged {len(results)} scenarios) -> {baseline_path}")


if __name__ == "__main__":
    main()
