"""Hard-mode AUROC head-to-head: shifts 1..4 video frames, both stacks.

The published shift_sweep_auroc (scripts/run_baselines.py scenario 3 +
scripts/run_reference_detector.py) saturates BOTH stacks at AUROC 1.0 for
every magnitude 5..20 — parity, but a vacuous ceiling-vs-ceiling row. A
1-frame shift is 40 ms = 640 samples zero-filled at the clip edge
(`/root/reference/misalignment_detection_train.py:100-114` semantics), which
moves only ~2 of ~120 MFCC hops, so the mean/std audio statistics barely
change: this is the regime where detector quality actually discriminates.

This driver rebuilds only the artifacts the sweep needs (they live in /tmp
and do not survive machine resets), reusing anything already present:

  avsync side   — 20-epoch `avsync train` (TPU) -> lipnet .pth export,
                  `avsync misalign-train` (epochs 20, max_shift 15, seed 42),
                  `avsync misalign-eval --min_shift 1 --max_shift 4`.
  reference side— /root/reference/main.py 20 epochs (torch CPU) ->
                  lipnet_final.pth, then scripts/run_reference_detector.py
                  --hard (reference detector train + 1..4 sweep under the
                  avsync librosa shim).

Protocol is identical on both sides: same corpus, same detector training
config, and in the sweep the same aligned-vs-one-random-signed-shift-per-
clip-per-magnitude design with seed 0.

Run: python scripts/run_hard_sweep.py [--update-baseline]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts")
)

from run_baselines import (  # noqa: E402
    AV_DIR, CORPUS, REF_DIR, REPO, WORK, cli, ensure_corpora,
    reference_env, run_reference_training, train_avsync_detector,
    train_avsync_lipnet,
)

HARD_JSON = os.path.join(WORK, "reference_detector_hard.json")


def avsync_artifacts():
    """Train (or reuse) the avsync lipnet + detector on the corpus."""
    os.makedirs(AV_DIR, exist_ok=True)
    pth = os.path.join(AV_DIR, "lipnet_final.pth")
    if not os.path.exists(pth):
        train_avsync_lipnet(pth, os.path.join(AV_DIR, "lipnet_ckpts"))
    det = os.path.join(AV_DIR, "detector.pth")
    if not os.path.exists(det):
        train_avsync_detector(pth, det, os.path.join(AV_DIR, "det_logs"))
    return pth, det


def avsync_hard_sweep(pth: str, det: str) -> dict:
    out_json = os.path.join(AV_DIR, "sweep_hard.json")
    t0 = time.time()
    cli([
        "misalign-eval", "--data_path", CORPUS, "--checkpoint", pth,
        "--detector_checkpoint", det, "--min_shift", "1",
        "--max_shift", "4", "--output", out_json,
        # seed 0 matches run_reference_detector.phase_b_sweep: both sides
        # draw the per-clip shift SIGNS from np.default_rng(0) in the same
        # order, so the scored pair sets are identical (the CLI's default
        # seed is 42, which would sweep different sign patterns)
        "--seed", "0",
    ])
    wall = time.time() - t0
    sweep = json.load(open(out_json))
    return {
        "hardware": "1x TPU v5e",
        "wall_seconds": round(wall, 1),
        "overall_auroc": sweep["overall_auroc"],
        "auroc_by_shift": sweep["auroc_by_shift"],
        "num_clips": sweep["num_clips"],
    }


def reference_hard_sweep() -> dict:
    """Reference lipnet (if absent) + detector + 1..4 sweep, torch CPU."""
    run_reference_training()
    det_pth = os.path.join(REF_DIR, "misalignment_detector.pth")
    args = [sys.executable,
            os.path.join(REPO, "scripts/run_reference_detector.py"), "--hard"]
    if os.path.exists(det_pth):
        args.append("--skip-training")
    env = reference_env()
    proc = subprocess.run(args, capture_output=True, text=True,
                          timeout=7200, env=env)
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference hard sweep failed:\n{proc.stderr[-2000:]}")
    return json.load(open(HARD_JSON))["sweep"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    ensure_corpora()
    pth, det = avsync_artifacts()
    av = avsync_hard_sweep(pth, det)
    print(json.dumps({"avsync": av}, indent=2), flush=True)
    ref = reference_hard_sweep()
    print(json.dumps({"reference": ref}, indent=2), flush=True)

    entry = {
        "scenario": (
            "hard-mode sweep: shifts 1..4 video frames (40..160 ms) — small "
            "enough that only ~2-6 of ~120 MFCC hops change, so the mean/std "
            "audio stats barely move; the 5..20 sweep saturates both stacks "
            "at AUROC 1.0, this regime discriminates"
        ),
        "avsync": av,
        "reference": ref,
    }
    with open(os.path.join(WORK, "hard_sweep_headhead.json"), "w") as f:
        json.dump(entry, f, indent=2)
    if args.update_baseline:
        path = os.path.join(REPO, "BASELINE.json")
        doc = json.load(open(path))
        prior = doc.setdefault("published", {}).get(
            "shift_sweep_auroc_hard", {}
        )
        # preserve annotations added outside this driver (seed-sensitivity
        # studies, verdict notes) across refreshes
        for key, val in prior.items():
            entry.setdefault(key, val)
        for side in ("avsync", "reference"):
            for key, val in prior.get(side, {}).items():
                entry[side].setdefault(key, val)
        doc["published"]["shift_sweep_auroc_hard"] = entry
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)
        print(f"merged shift_sweep_auroc_hard into {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
