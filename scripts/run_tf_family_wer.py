"""TF-family end-to-end learning run (VERDICT r4 Next #2).

`models/lipnet_tf.py` has cell-level LSTM + CTC parity tests, but every
published avsync *learning* result (WER 0.0 runs) is pytorch-family — and
the TF stack is the one the reference actually trained
(`/root/reference/train.py:623-776`, the only stack with checked-in loss
curves). This driver trains `model_family="tf"` (Conv3D 128/256/64 ->
3xBiLSTM(256) -> Dense 512x2 -> softmax, 140x46 standardized crops — the
reference's Keras architecture, `train.py:495-547`) on the WER head-to-head
corpus (speaker s1, 8 clips, batch = corpus so every optimizer step sees
identical data) and logs train-fit WER/CER every 25 epochs until it reaches
WER 0.0 or the budget runs out, with step throughput alongside the
pytorch-family numbers.

    python scripts/run_tf_family_wer.py [--epochs N] [--update-baseline]

Env knobs:
    AVSYNC_TFWER_MAXSEC   wall budget, default 2400
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from run_reference_wer import CORPUS, SPEAKERS, wer_cer  # noqa: E402

WORK = "/tmp/avsync_refwer"
PROGRESS = os.path.join(WORK, "tf_family_progress.jsonl")


def ensure_corpus() -> None:
    if os.path.isdir(CORPUS):
        return
    from avsync.data import synthetic

    synthetic.write_corpus(
        CORPUS, n_speakers=3, clips_per_speaker=8, preprocessed=True, seed=42,
    )


def train_tf(max_epochs: int, max_sec: float, every: int = 25):
    import jax

    from avsync import text as textlib
    from avsync.config import AvsyncConfig, DataConfig, ModelConfig, TrainConfig
    from avsync.data import GridDataSource, LipNetBatcher
    from avsync.parallel import make_mesh
    from avsync.train import LipNetTrainer
    from avsync.utils.logging import Logger

    on_accel = jax.default_backend() != "cpu"
    # the CLI's --model_family tf configuration (cli.py:205-214): TF-stack
    # geometry 140x46 + per-clip standardization (`train.py:88-89,266-273`),
    # reference Keras conv widths, same Adam 1e-4 as the pytorch head-to-head
    cfg = AvsyncConfig(
        data=DataConfig(
            data_path=CORPUS, batch_size=8, device_cache="auto",
            img_width=140, img_height=46, standardize_clips=True,
        ),
        model=ModelConfig(
            family="tf",
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
    with open(PROGRESS, "w") as out:
        out.write(json.dumps({"config": {
            "corpus": CORPUS, "speakers": SPEAKERS, "clips": len(src),
            "batch_size": 8, "steps_per_epoch": 1, "lr": 1e-4, "seed": 42,
            "model_family": "tf",
            "geometry": "140x46 standardized (train.py:88-89,266-273)",
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
                preds = textlib.tf_decode_batch(lp[: eval_batch["valid"]])
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
                print(json.dumps(rec), flush=True)
                if wer == 0.0 or time.time() - t0 > max_sec:
                    break
    return cfg, records


def update_baseline(entry):
    path = os.path.join(REPO, "BASELINE.json")
    doc = json.load(open(path))
    doc.setdefault("published", {})["lipnet_wer_tf_family"] = entry
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"merged lipnet_wer_tf_family into {path}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()
    max_sec = float(os.environ.get("AVSYNC_TFWER_MAXSEC", "2400"))
    os.makedirs(WORK, exist_ok=True)
    ensure_corpus()

    cfg, recs = train_tf(args.epochs, max_sec)

    def slim(r):
        return {k: r[k] for k in
                ("epoch", "steps", "train_wer", "train_cer", "wall_seconds")}

    last = recs[-1]
    entry = {
        "scenario": "lipnet_wer_tf_family (train-fit on the WER "
                    "head-to-head's 8 clips, batch=corpus): the reference's "
                    "TF/Keras architecture (train.py:495-547) trained "
                    "end-to-end by the family-polymorphic avsync trainer",
        "corpus": f"{CORPUS} speakers={SPEAKERS}",
        "hardware": "1x TPU v5e (axon), TPU-default bf16+pack4 config",
        "trajectory": [slim(r) for r in recs],
        "reached_wer": last["train_wer"],
        "reached_cer": last["train_cer"],
        "epochs_to_result": last["epoch"],
        "wall_seconds": last["wall_seconds"],
        "steps_per_sec": round(last["epoch"] / last["wall_seconds"], 3),
        "pytorch_family_reference_point": "see lipnet_wer_headhead.avsync "
                                          "(same corpus/protocol, pytorch "
                                          "family)",
    }
    print(json.dumps(entry, indent=2), flush=True)
    with open(os.path.join(WORK, "tf_family.json"), "w") as f:
        json.dump(entry, f, indent=2)
    if args.update_baseline:
        update_baseline(entry)
    return 0


if __name__ == "__main__":
    sys.exit(main())
