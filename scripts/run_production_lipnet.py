"""Production-corpus-scale LipNet training head-to-head (VERDICT r4 Next #1).

The detector pipeline got its 3,300-clip production head-to-head in round 4
(`detector_training_production`); LipNet *training* never did — its largest
published avsync run was 24 clips. This driver trains LipNet on the
detector's 30x110 production corpus (3,300 clips, 70/15/15 speaker split ->
2,310 train / 440 val clips per epoch at the reference's batch 8,
`/root/reference/main.py:63-77,99-104`) and measures steady-state epoch
walls in all three ingest regimes:

  cached    --device_cache on   whole train corpus pinned in HBM (uint8-
                                exact: the .npy corpus is uint8), epoch 2+
                                is one scanned device program
  partial   --device_cache auto with a budget smaller than the corpus ->
                                row-wise cached/streamed merge
                                (pipeline.py partial cache)
  streamed  --device_cache off  host .npy decode + uint8 H2D + device
                                preprocess every epoch, prefetch-overlapped

The reference side runs the UNMODIFIED reference training loop
(`/root/reference/trainer.py:28-105` Trainer.train_epoch + validate — Adam
1e-4, CTCLoss(blank=0, zero_infinity=True), grad clip 1.0) over the same
corpus/split/batch via reference GridDataset, for a bounded measured step
window (its ~0.6 clips/s on this host makes full epochs hours); epoch and
run walls are extrapolated from the measured per-step rates and labeled as
such.

  python scripts/run_production_lipnet.py corpus
  python scripts/run_production_lipnet.py avsync       # TPU, all 3 regimes
  python scripts/run_production_lipnet.py reference    # torch CPU, bounded
  python scripts/run_production_lipnet.py publish      # -> BASELINE.json

Env knobs:
  AVSYNC_PRODLIP_EPOCHS      avsync epochs per regime (default 4)
  AVSYNC_PRODLIP_REF_STEPS   reference measured train steps (default 40;
                             0 = run full epochs, hours)
  AVSYNC_PRODLIP_REF_EPOCHS  reference full epochs when REF_STEPS=0
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

WORK = "/tmp/avsync_prodlip"
CORPUS = os.path.join(WORK, "corpus")
AV_OUT = os.path.join(WORK, "avsync_prodlip.json")
REF_OUT = os.path.join(WORK, "reference_prodlip.json")

# Same corpus recipe as scripts/run_production_detector.py (30x110, seed 44)
# so the two production scenarios share one corpus on disk.
N_SPEAKERS, CLIPS_PER = 30, 110
BATCH = 8          # the reference's training batch (`main.py:104`, train.py:94)
EPOCHS = int(os.environ.get("AVSYNC_PRODLIP_EPOCHS", "4"))
SEED = 42
# 600 MB uint8 budget ~= 1677 of 2310 train clips cached (73%) — squarely in
# the partial-cache regime without being a degenerate 99%/1% split.
PARTIAL_BUDGET_MB = 600


def ensure_corpus() -> None:
    done = os.path.join(WORK, ".corpus_done")
    if os.path.exists(done):
        return
    # import only when building: the reference phase runs in-process and
    # must stay jax-free (avsync.data pulls in jax + the TPU plugin)
    from avsync.data import synthetic

    print(f"writing {N_SPEAKERS * CLIPS_PER}-clip corpus to {CORPUS} ...",
          flush=True)
    t0 = time.time()
    synthetic.write_corpus(
        CORPUS, n_speakers=N_SPEAKERS, clips_per_speaker=CLIPS_PER,
        preprocessed=True, seed=44,
    )
    open(done, "w").write("ok\n")
    print(f"corpus done in {time.time() - t0:.0f}s", flush=True)


def _partial_config_path() -> str:
    """A config JSON identical to the CLI's accelerator defaults except for
    the partial-cache budget (the only knob without a CLI flag)."""
    from avsync.config import AvsyncConfig, DataConfig

    cfg = AvsyncConfig(
        data=DataConfig(
            data_path=CORPUS, batch_size=BATCH, device_cache="auto",
            device_cache_budget_mb=PARTIAL_BUDGET_MB,
        ),
    )
    # perf flags (bf16/pack4) are passed explicitly on every run's CLI so
    # all three regimes share one compute configuration; the config file
    # carries only data-path/batch/cache fields
    path = os.path.join(WORK, "partial_config.json")
    with open(path, "w") as f:
        f.write(cfg.to_json())
    return path


def run_avsync() -> dict:
    """Three fresh-process `avsync train` runs on TPU, one per regime.

    One shared persistent compile cache: the FIRST run (cached regime) is
    executed twice — cold (first-ever compile) then warm; partial/streamed
    then ride the warm cache, isolating the regimes' data-path cost.
    """
    ensure_corpus()
    cc_dir = os.path.join(WORK, "compile_cache")
    shutil.rmtree(cc_dir, ignore_errors=True)

    def once(tag: str, extra_flags: list) -> dict:
        ckpt_dir = os.path.join(WORK, f"ckpts_{tag}")
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        cmd = [
            sys.executable, "-m", "avsync.cli", "train",
            "--data_path", CORPUS, "--batch_size", str(BATCH),
            "--epochs", str(EPOCHS), "--seed", str(SEED),
            "--checkpoint_dir", ckpt_dir, "--checkpoint_every", "1000",
            "--compute_dtype", "bfloat16", "--packed_conv",
        ] + extra_flags
        env = {**os.environ, "AVSYNC_COMPILE_CACHE": cc_dir}
        t0 = time.time()
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=2 * 3600, env=env, cwd=REPO)
        wall = time.time() - t0
        if proc.returncode != 0:
            raise RuntimeError(
                f"avsync prodlip run ({tag}) failed:\n{proc.stderr[-3000:]}")
        hist = json.load(open(os.path.join(ckpt_dir, "history.json")))
        es = hist["epoch_seconds"]
        assert len(es) == EPOCHS, (tag, es)
        steady = sorted(es[1:])[len(es[1:]) // 2]  # median of epochs 2+
        rec = {
            "wall_seconds": round(wall, 1),
            "epoch_seconds": es,
            "steady_epoch_seconds": steady,
            # 2310 train clips/epoch (288 drop-last batches = 2304 trained)
            # + 440 val clips scored; clips/s uses the train-set size, the
            # same denominator the reference extrapolation uses
            "train_clips_per_sec_steady": round(2310.0 / steady, 1),
            "final_train_loss": hist["loss"][-1],
            "final_val_loss": hist["val_loss"][-1],
        }
        print(f"[{tag}] {json.dumps(rec)}", flush=True)
        return rec

    cold = once("cached_cold", ["--device_cache", "on"])
    cached = once("cached", ["--device_cache", "on"])
    cached["wall_seconds_cold"] = cold["wall_seconds"]
    cached["epoch_seconds_cold"] = cold["epoch_seconds"]
    partial = once("partial", ["--device_cache", "auto",
                               "--config", _partial_config_path()])
    partial["budget_mb"] = PARTIAL_BUDGET_MB
    streamed = once("streamed", ["--device_cache", "off"])
    out = {
        "hardware": "1x TPU v5e (axon), 1 host CPU core",
        "epochs": EPOCHS,
        "batch_size": BATCH,
        "regimes": {
            "cached_uint8": cached,
            "partial_cache": partial,
            "streamed": streamed,
        },
        "note": "per-regime fresh process; one shared persistent compile "
                "cache (cached regime ran cold first — its "
                "wall_seconds_cold is the first-ever-invocation wall). "
                "epoch_seconds[0] includes cache build + any residual "
                "warm-up; steady = median of epochs 2+ and includes the "
                "440-clip validation pass, same as the reference's epoch.",
    }
    with open(AV_OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    return out


class _BoundedLoader:
    """First N batches of a DataLoader (len() reports N for tqdm)."""

    def __init__(self, loader, n: int):
        self.loader, self.n = loader, n

    def __len__(self):
        return self.n

    def __iter__(self):
        it = iter(self.loader)
        for _ in range(self.n):
            try:
                yield next(it)
            except StopIteration:
                # loader shorter than the requested window (PEP 479: a
                # bare StopIteration here would become RuntimeError)
                return


def run_reference() -> dict:
    """Unmodified reference training loop over the same corpus/split, torch
    CPU, for a bounded measured window; extrapolates epoch/run walls."""
    ensure_corpus()
    ref_steps = int(os.environ.get("AVSYNC_PRODLIP_REF_STEPS", "40"))
    import random

    import numpy as np
    import torch

    torch.set_num_threads(1)
    random.seed(SEED)
    np.random.seed(SEED)
    torch.manual_seed(SEED)
    sys.path.insert(0, "/root/reference")
    from torch.utils.data import DataLoader

    from dataset import GridDataset, collate_fn  # noqa: E402 (reference)
    from model import LipNet  # noqa: E402 (reference)
    from trainer import Trainer  # noqa: E402 (reference)

    speakers = sorted(
        d for d in os.listdir(CORPUS)
        if os.path.isdir(os.path.join(CORPUS, d))
    )
    n_train = int(len(speakers) * 0.7)
    n_val = int(len(speakers) * 0.15)
    train_sp = speakers[:n_train]
    val_sp = speakers[n_train:n_train + n_val]

    train_ds = GridDataset(CORPUS, train_sp)
    val_ds = GridDataset(CORPUS, val_sp)
    # num_workers=0: on this 1-core host worker processes cannot overlap
    # decode with compute and only add IPC cost — 0 is the fastest (i.e.
    # most conservative-against-avsync) reference configuration
    train_loader = DataLoader(train_ds, batch_size=BATCH, shuffle=True,
                              collate_fn=collate_fn)
    val_loader = DataLoader(val_ds, batch_size=BATCH, shuffle=False,
                            collate_fn=collate_fn)
    steps_train = (len(train_ds) + BATCH - 1) // BATCH
    steps_val = (len(val_ds) + BATCH - 1) // BATCH

    model = LipNet(vocab_size=len(train_ds.vocab))
    trainer = Trainer(model, torch.device("cpu"), learning_rate=1e-4)

    if ref_steps == 0:
        epochs = int(os.environ.get("AVSYNC_PRODLIP_REF_EPOCHS", "2"))
        walls = []
        for ep in range(epochs):
            t0 = time.time()
            tl = trainer.train_epoch(train_loader)
            vl = trainer.validate(val_loader)
            walls.append(round(time.time() - t0, 1))
            print(f"ref epoch {ep + 1}: {walls[-1]}s "
                  f"train_loss={tl:.4f} val_loss={vl:.4f}", flush=True)
        epoch_wall = sorted(walls)[len(walls) // 2]
        out = {
            "hardware": "host CPU (torch), 1 core",
            "mode": f"measured, {epochs} full epochs",
            "epoch_seconds": walls,
            "epoch_wall_seconds": epoch_wall,
            "train_clips_per_sec": round(len(train_ds) / epoch_wall, 3),
            "run_wall_seconds_for_4_epochs": round(4 * epoch_wall, 1),
        }
    else:
        t0 = time.time()
        trainer.train_epoch(_BoundedLoader(train_loader, ref_steps))
        train_window = time.time() - t0
        s_train = train_window / ref_steps
        val_steps = max(10, ref_steps // 4)
        t0 = time.time()
        trainer.validate(_BoundedLoader(val_loader, val_steps))
        s_val = (time.time() - t0) / val_steps
        epoch_wall = steps_train * s_train + steps_val * s_val
        out = {
            "hardware": "host CPU (torch), 1 core",
            "mode": (
                f"EXTRAPOLATED from a measured {ref_steps}-train-step + "
                f"{val_steps}-val-step window (unmodified reference "
                "Trainer.train_epoch/validate over reference GridDataset "
                "DataLoader batches)"
            ),
            "measured_train_steps": ref_steps,
            "seconds_per_train_step": round(s_train, 3),
            "seconds_per_val_step": round(s_val, 3),
            "train_clips_per_sec": round(BATCH / s_train, 3),
            "steps_per_epoch": {"train": steps_train, "val": steps_val},
            "epoch_wall_seconds": round(epoch_wall, 1),
            "run_wall_seconds_for_4_epochs": round(4 * epoch_wall, 1),
        }
    out["corpus_split"] = {
        "train_clips": len(train_ds), "val_clips": len(val_ds),
        "protocol_note": "reference DataLoader keeps the final partial "
                         "batch (289 train steps/epoch); avsync drops it "
                         "(288 steps, 2304/2310 clips) — 0.3% in the "
                         "reference's favor",
    }
    with open(REF_OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    return out


def publish() -> None:
    av = json.load(open(AV_OUT)) if os.path.exists(AV_OUT) else None
    ref = json.load(open(REF_OUT)) if os.path.exists(REF_OUT) else None
    assert av is not None, "run the avsync phase first"
    entry = {
        "scenario": "LipNet CTC training at production corpus scale: the "
                    "detector head-to-head's 3300-clip corpus, 70/15/15 "
                    "speaker split (2310 train / 440 val clips per epoch), "
                    "batch 8, Adam 1e-4 — measured in all three avsync "
                    "ingest regimes (uint8 device cache / partial cache / "
                    "streamed)",
        "corpus": f"synthetic, {N_SPEAKERS} speakers x {CLIPS_PER} clips, "
                  "75x50x100 uint8 .npy, seed 44 (shared with "
                  "detector_training_production)",
        "avsync": av,
    }
    if ref is not None:
        entry["reference"] = ref
        steady = av["regimes"]["cached_uint8"]["steady_epoch_seconds"]
        streamed = av["regimes"]["streamed"]["steady_epoch_seconds"]
        entry["speedup_epoch_steady_cached"] = round(
            ref["epoch_wall_seconds"] / steady, 1)
        entry["speedup_epoch_steady_streamed"] = round(
            ref["epoch_wall_seconds"] / streamed, 1)
        if "run_wall_seconds_for_4_epochs" in ref and av["epochs"] == 4:
            entry["speedup_run_cold"] = round(
                ref["run_wall_seconds_for_4_epochs"]
                / av["regimes"]["cached_uint8"]["wall_seconds_cold"], 1)
    path = os.path.join(REPO, "BASELINE.json")
    doc = json.load(open(path))
    doc.setdefault("published", {})["lipnet_training_production"] = entry
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"published lipnet_training_production -> {path}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("phase",
                    choices=["corpus", "avsync", "reference", "publish"])
    args = ap.parse_args()
    os.makedirs(WORK, exist_ok=True)
    if args.phase == "corpus":
        ensure_corpus()
    elif args.phase == "avsync":
        run_avsync()
    elif args.phase == "reference":
        run_reference()
    else:
        publish()
    return 0


if __name__ == "__main__":
    sys.exit(main())
