"""Run the ACTUAL reference misalignment-detection pipeline, end to end.

VERDICT r2 "Next #1": BASELINE scenarios 3 and 5 carried no reference-side
number because the reference needs librosa (absent here). Its librosa
surface is three calls (`misalignment_detection_train.py:121,176,203`), all
covered by :mod:`avsync.compat_librosa` (backed by the float64 oracle in
avsync/ops/audio_ref.py). This driver injects that shim and then executes
the UNMODIFIED reference code (torch CPU):

  Phase A — training: runpy-runs `/root/reference/misalignment_detection_train.py`
            as __main__ on the synthetic corpus with the r2 reference-trained
            LipNet backbone (the same frozen-backbone protocol the reference
            uses), epochs/shift settings matching avsync's scenario-5 run.
  Phase B — sweep: imports the reference module as a library and scores
            aligned (shift 0) vs one random-signed shift per clip for each
            magnitude 5..20 through the reference FeatureExtractor +
            trained MisalignmentDetector — the exact protocol of
            `avsync misalign-eval` (avsync/cli.py::cmd_misalign_eval),
            same rng seed discipline.

Usage:
    python scripts/run_reference_detector.py [--update-baseline]

Writes /tmp/avsync_baselines/reference_detector.json; with
--update-baseline also merges the reference numbers into BASELINE.json's
published detector_training / shift_sweep_auroc scenarios.
"""

from __future__ import annotations

import argparse
import json
import os
import runpy
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import avsync.compat_librosa as librosa_shim  # noqa: E402

sys.modules["librosa"] = librosa_shim
sys.modules["librosa.feature"] = librosa_shim.feature
sys.path.insert(0, "/root/reference")

# Env overrides let other drivers (run_production_detector.py) point the
# same phase machinery at a different corpus/backbone/detector.
WORK = os.environ.get("AVSYNC_REF_WORK", "/tmp/avsync_baselines")
CORPUS = os.environ.get("AVSYNC_REF_CORPUS", os.path.join(WORK, "corpus"))
REF_DIR = os.environ.get("AVSYNC_REF_DIR", os.path.join(WORK, "reference_run"))
OUT_JSON = os.path.join(WORK, "reference_detector.json")
LIPNET_PTH = os.environ.get(
    "AVSYNC_REF_LIPNET", os.path.join(REF_DIR, "lipnet_final.pth")
)


def phase_a_training(seed: int = 42) -> dict:
    """Execute the reference training script as __main__."""
    os.makedirs(REF_DIR, exist_ok=True)
    det_pth = os.path.join(REF_DIR, "misalignment_detector.pth")
    log_dir = os.path.join(REF_DIR, "det_logs")
    os.environ.setdefault("MPLBACKEND", "Agg")
    argv = [
        "misalignment_detection_train.py",
        "--data_path", CORPUS,
        "--checkpoint", LIPNET_PTH,
        "--detector_checkpoint", det_pth,
        "--epochs", "20",
        "--max_shift_frames", "15",
        "--log_dir", log_dir,
        "--seed", str(seed),
    ]
    old_argv, sys.argv = sys.argv, argv
    t0 = time.time()
    try:
        runpy.run_path(
            "/root/reference/misalignment_detection_train.py",
            run_name="__main__",
        )
    finally:
        sys.argv = old_argv
    wall = time.time() - t0

    run = sorted(os.listdir(log_dir))[-1]
    log = open(os.path.join(log_dir, run, "training.log")).read()
    from run_baselines import parse_training_log

    test_auc, best_val = parse_training_log(log)
    # a missing summary line means the run did not complete (or the log
    # format drifted) — refuse to publish a null headline number
    assert test_auc is not None and best_val is not None, (
        f"reference training log {log_dir}/{run} lacks the final "
        "'Test AUC:'/'Best val AUC:' lines; not publishing a vacuous result"
    )
    return {
        "hardware": "host CPU (torch), 1 core",
        "wall_seconds": round(wall, 1),
        "test_auroc": test_auc,
        "best_val_auroc": best_val,
        "detector_checkpoint": det_pth,
        "provenance": "actual reference misalignment_detection_train.py "
                      "executed under the avsync librosa shim "
                      "(avsync/compat_librosa.py)",
    }


def phase_b_sweep(
    det_pth: str, seed: int = 0, min_shift: int = 5, max_shift: int = 20
) -> dict:
    """Per-magnitude AUROC sweep through the reference feature pipeline."""
    import torch
    from sklearn.metrics import roc_auc_score

    import misalignment_detection_train as ref  # noqa: E402 (reference)
    from dataset import GridDataset  # noqa: E402 (reference)

    cfg = ref.DetectorConfig(max_shift_frames=15)
    speakers = sorted(
        d for d in os.listdir(CORPUS) if d.startswith("s")
    )
    base = GridDataset(
        CORPUS, speakers, img_width=cfg.img_width, img_height=cfg.img_height,
        max_video_length=cfg.max_video_length,
    )
    device = torch.device("cpu")
    lipnet = ref.load_lipnet(LIPNET_PTH, len(base.vocab), device)
    extractor = ref.FeatureExtractor(base, lipnet, device, cfg)

    ckpt = torch.load(det_pth, map_location=device)
    det = ref.MisalignmentDetector(ckpt["input_dim"], ckpt["hidden_dim"])
    det.load_state_dict(ckpt["model_state_dict"])
    det.eval()

    paths = [v for v, _ in base.samples]
    n = len(paths)

    def scores(shifts):
        feats = torch.stack(
            [extractor.build_feature(p, int(s))[0] for p, s in zip(paths, shifts)]
        )
        with torch.no_grad():
            return torch.sigmoid(det(feats)).numpy()

    t0 = time.time()
    aligned = scores(np.zeros(n, np.int64))
    rng = np.random.default_rng(seed)
    by_shift = {}
    all_scores, all_labels = [aligned], [np.ones(n)]
    for s in range(min_shift, max_shift + 1):
        signs = rng.choice([-1, 1], size=n)
        shifted = scores(signs * s)
        by_shift[str(s)] = float(roc_auc_score(
            np.concatenate([np.ones(n), np.zeros(n)]),
            np.concatenate([aligned, shifted]),
        ))
        all_scores.append(shifted)
        all_labels.append(np.zeros(n))
    overall = float(roc_auc_score(
        np.concatenate(all_labels), np.concatenate(all_scores)
    ))
    return {
        "hardware": "host CPU (torch), 1 core",
        "wall_seconds": round(time.time() - t0, 1),
        "overall_auroc": overall,
        "auroc_by_shift": by_shift,
        "num_clips": n,
        "provenance": "reference FeatureExtractor + MisalignmentDetector "
                      "under the avsync librosa shim; protocol mirrors "
                      "`avsync misalign-eval` (aligned vs one random-signed "
                      "shift per clip per magnitude)",
    }


def update_baseline(results: dict, hard: bool = False) -> None:
    path = os.path.join(REPO, "BASELINE.json")
    doc = json.load(open(path))
    pub = doc.get("published", {})
    if not hard and "training" in results:
        det = pub.get("detector_training", {})
        det["reference"] = {
            k: v for k, v in results["training"].items()
            if k != "detector_checkpoint"
        }
        det["note"] = (
            "reference pipeline executed via avsync/compat_librosa.py "
            "(librosa itself is not installable here); same corpus, epochs, "
            "shift range and seed as the avsync run"
        )
        pub["detector_training"] = det
    key = "shift_sweep_auroc_hard" if hard else "shift_sweep_auroc"
    sweep = pub.get(key, {})
    sweep["reference"] = results["sweep"]
    if hard:
        sweep.setdefault("scenario", (
            "hard-mode sweep: shifts 1..4 video frames (40..160 ms) — small "
            "enough that only ~2-6 of ~120 MFCC hops change, so the "
            "mean/std audio stats barely move; the 5..20 sweep saturates "
            "both stacks at AUROC 1.0, this regime discriminates"
        ))
    pub[key] = sweep
    doc["published"] = pub
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"merged reference numbers into {path}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update-baseline", action="store_true")
    ap.add_argument("--skip-training", action="store_true",
                    help="reuse the existing trained detector (phase B only)")
    ap.add_argument("--min-shift", type=int, default=5)
    ap.add_argument("--max-shift", type=int, default=20)
    ap.add_argument("--hard", action="store_true",
                    help="shorthand for --min-shift 1 --max-shift 4; stores "
                         "results under shift_sweep_auroc_hard")
    ap.add_argument("--train-seed", type=int, default=42,
                    help="reference detector training seed (seed studies)")
    ap.add_argument("--no-save", action="store_true",
                    help="print results only; do not overwrite the JSON "
                         "artifacts (seed-study runs must not clobber the "
                         "published seed-42 record)")
    args = ap.parse_args()
    if args.hard:
        args.min_shift, args.max_shift = 1, 4

    results = {}
    det_pth = os.path.join(REF_DIR, "misalignment_detector.pth")
    if args.skip_training and not os.path.exists(det_pth):
        # NEVER silently retrain: the caller (e.g. run_production_detector
        # sweep-reference) asked to sweep an EXISTING detector; falling
        # through to phase_a_training would sweep a detector trained with
        # the wrong (baseline, non-production) flags and publish it as
        # production — fail loudly instead (e.g. after a /tmp wipe).
        raise SystemExit(
            f"--skip-training but no detector at {det_pth}; "
            "run the training phase first"
        )
    if args.skip_training and os.path.exists(det_pth):
        # reuse the prior training record when its JSON survived; the .pth
        # alone is enough for the sweep (the JSON may itself be sweep-only
        # if a previous run also skipped training)
        if os.path.exists(OUT_JSON):
            prior = json.load(open(OUT_JSON)).get("training")
            if prior is not None:
                results["training"] = prior
    else:
        results["training"] = phase_a_training(seed=args.train_seed)
        det_pth = results["training"]["detector_checkpoint"]
    if "training" in results:
        print(json.dumps(results["training"]), flush=True)
    results["sweep"] = phase_b_sweep(
        det_pth, min_shift=args.min_shift, max_shift=args.max_shift
    )
    print(json.dumps(results["sweep"]), flush=True)
    if not args.no_save:
        out_json = (OUT_JSON.replace(".json", "_hard.json") if args.hard
                    else OUT_JSON)
        with open(out_json, "w") as f:
            json.dump(results, f, indent=2)
    if args.update_baseline:
        update_baseline(results, hard=args.hard)
    return 0


if __name__ == "__main__":
    sys.exit(main())
