"""avsync side of the non-vacuous WER head-to-head (VERDICT r2 "Next #2").

scripts/run_reference_wer.py trains the reference LipNet (torch CPU,
reference Trainer.train_epoch — Adam 1e-4, CTC blank=0, clip 1.0) on one
speaker of the synthetic corpus and logs train-fit WER/CER per 25 epochs.
This driver trains avsync's LipNet on the SAME 8 clips with the SAME
optimizer hyperparameters and batch size for the same epoch budget (batch =
the whole 8-clip set, so both stacks see identical data per optimizer
step), logging the same metrics with the same edit-distance code — then
publishes the trajectory comparison into BASELINE.json as
`lipnet_wer_headhead`.

avsync runs its TPU-shipping default config (bf16 matmuls + pack4 conv —
what `avsync train` applies on accelerator backends), which makes this a
framework-vs-framework comparison at each side's native operating point on
identical data.

Run (after/while the reference job writes /tmp/avsync_refwer/progress.jsonl):
    python scripts/run_wer_headhead.py [--epochs N] [--update-baseline]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from run_reference_wer import CORPUS, SPEAKERS, wer_cer  # noqa: E402

WORK = "/tmp/avsync_refwer"
REF_PROGRESS = os.path.join(WORK, "progress.jsonl")
AV_PROGRESS = os.path.join(WORK, "avsync_progress.jsonl")


def read_ref():
    recs = []
    for line in open(REF_PROGRESS):
        try:
            recs.append(json.loads(line))
        except ValueError:
            continue  # truncated tail line from a mid-write crash
    if not recs or "config" not in recs[0]:
        raise SystemExit(
            f"{REF_PROGRESS} has no config header yet — the reference job "
            "has not started writing (or crashed before its first flush); "
            "wait for / restart scripts/run_reference_wer.py first"
        )
    cfg = recs[0]["config"]
    return cfg, [r for r in recs[1:] if "epoch" in r]


def train_avsync(max_epochs: int, every: int = 25):
    import jax

    from avsync import text as textlib
    from avsync.config import AvsyncConfig, DataConfig, ModelConfig, TrainConfig
    from avsync.data import GridDataSource, LipNetBatcher
    from avsync.parallel import make_mesh
    from avsync.train import LipNetTrainer
    from avsync.utils.logging import Logger

    on_accel = jax.default_backend() != "cpu"
    cfg = AvsyncConfig(
        data=DataConfig(data_path=CORPUS, batch_size=8, device_cache="auto"),
        model=ModelConfig(
            compute_dtype="bfloat16" if on_accel else "float32",
            packed_conv=on_accel,
        ),
        train=TrainConfig(learning_rate=1e-4, seed=42, remat=False),
    )
    mesh = make_mesh((1, 1))
    trainer = LipNetTrainer(cfg, mesh=mesh, log=Logger(None, console=False))
    src = GridDataSource(CORPUS, SPEAKERS)
    batcher = LipNetBatcher(src, cfg, mesh=mesh)
    targets = [s.text for s in src.samples]

    eval_batch = batcher.first_batch()
    state = trainer.init_state(eval_batch)
    records = []
    t0 = time.time()
    with open(AV_PROGRESS, "w") as out:
        out.write(json.dumps({"config": {
            "corpus": CORPUS, "speakers": SPEAKERS, "clips": len(src),
            "batch_size": 8, "steps_per_epoch": 1, "lr": 1e-4, "seed": 42,
            "optimizer": "avsync LipNetTrainer (Adam 1e-4, CTC blank=0, "
                         "clip 1.0), TPU default config "
                         f"(compute_dtype={cfg.model.compute_dtype}, "
                         f"packed_conv={cfg.model.packed_conv})",
        }}) + "\n")
        for epoch in range(1, max_epochs + 1):
            state, _ = trainer.train_epoch(
                state, batcher.epoch(shuffle=True, seed=42 + epoch)
            )
            if epoch % every == 0 or epoch == max_epochs:
                _, lp = trainer.compiled["eval"](
                    state.params, trainer._device_batch(eval_batch)
                )
                preds = textlib.decode_batch(lp[: eval_batch["valid"]])
                wer, cer = wer_cer(preds, targets)
                rec = {
                    "epoch": epoch, "steps": epoch,
                    "train_wer": round(wer, 4), "train_cer": round(cer, 4),
                    "wall_seconds": round(time.time() - t0, 1),
                    "example_pred": preds[0], "example_true": targets[0],
                }
                records.append(rec)
                out.write(json.dumps(rec) + "\n")
                out.flush()
                if wer == 0.0:
                    break
    return records


def first_subchance(records):
    for r in records:
        if r["train_wer"] < 1.0 and r.get("train_cer", 1.0) < 0.9:
            return r
    return None


def update_baseline(entry):
    path = os.path.join(REPO, "BASELINE.json")
    doc = json.load(open(path))
    doc.setdefault("published", {})["lipnet_wer_headhead"] = entry
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"merged lipnet_wer_headhead into {path}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=None,
                    help="override epoch budget (default: reference max)")
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    ref_cfg, ref_recs = read_ref()
    max_epochs = args.epochs or (ref_recs[-1]["epoch"] if ref_recs else 500)
    print(f"reference progress: {len(ref_recs)} evals up to epoch "
          f"{ref_recs[-1]['epoch'] if ref_recs else 0}; "
          f"avsync budget {max_epochs} epochs", flush=True)

    av_recs = train_avsync(max_epochs)

    def slim(r):
        return {k: r[k] for k in
                ("epoch", "steps", "train_wer", "train_cer", "wall_seconds")}

    entry = {
        "scenario": "lipnet_wer_headhead (train-fit, same 8 clips, same "
                    "Adam 1e-4 / CTC blank=0 / clip 1.0, batch=corpus so "
                    "identical data per optimizer step)",
        "corpus": f"{CORPUS} speakers={SPEAKERS}",
        "reference": {
            "hardware": "host CPU (torch), 1 core, reference "
                        "Trainer.train_epoch (trainer.py:28-77)",
            "trajectory": [slim(r) for r in ref_recs],
            "first_subchance": first_subchance(ref_recs),
        },
        "avsync": {
            "hardware": "1x TPU v5e (axon), TPU-default bf16+pack4 config",
            "trajectory": [slim(r) for r in av_recs],
            "first_subchance": first_subchance(av_recs),
        },
    }
    # matched-budget comparison at the largest epoch both sides reached
    common = min(ref_recs[-1]["epoch"], av_recs[-1]["epoch"]) if ref_recs else None
    if common:
        pick = lambda recs: max(
            (r for r in recs if r["epoch"] <= common), key=lambda r: r["epoch"]
        )
        entry["matched_budget"] = {
            "epoch": common,
            "reference": slim(pick(ref_recs)),
            "avsync": slim(pick(av_recs)),
        }
    print(json.dumps(entry, indent=2), flush=True)
    with open(os.path.join(WORK, "headhead.json"), "w") as f:
        json.dump(entry, f, indent=2)
    if args.update_baseline:
        update_baseline(entry)
    return 0


if __name__ == "__main__":
    sys.exit(main())
