"""Train the reference LipNet (torch CPU) to a sub-chance WER operating point.

VERDICT r2 "Next #2": the budget-matched BASELINE row is vacuous — 40
optimizer steps leave both stacks in CTC's all-blank regime (WER 1.0 vs 1.0),
so "WER parity" was asserted, not measured. This driver runs the reference's
own optimization loop (`/root/reference/trainer.py:28-77` Trainer.train_epoch:
Adam 1e-4, CTCLoss(blank=0, reduction='mean', zero_infinity=True), grad-clip
1.0) on one speaker of the same synthetic corpus for as many epochs as a
wall-clock budget allows, scoring train-fit WER/CER periodically with the
reference's greedy decoder (`/root/reference/utils.py:8-36`).

The counterpart avsync run (same clips, same optimizer-step count, same
hyperparameters) is produced by scripts/run_baselines.py's
`scenario_wer_headhead`, which reads this script's progress.jsonl.

Run (background, single host core):
    nice -n19 python scripts/run_reference_wer.py > /tmp/avsync_refwer/run.log 2>&1 &
Env knobs:
    AVSYNC_REFWER_MAXSEC   wall budget, default 14400 (4 h)
    AVSYNC_REFWER_EPOCHS   epoch cap, default 4000
    AVSYNC_REFWER_EVERY    eval/checkpoint period, default 25 epochs

Outputs under /tmp/avsync_refwer/:
    progress.jsonl   one JSON line per eval: epoch, loss, train WER/CER
    lipnet_refwer_epoch{N}.pth   reference-format state_dict checkpoints
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/tmp/avsync_baselines/corpus"
WORK = "/tmp/avsync_refwer"
SPEAKERS = ["s1"]
BATCH = 8
SEED = 42


def edit_distance(a, b) -> int:
    """Plain Levenshtein over token sequences (words for WER, chars for CER).

    Deliberately NOT imported from avsync.eval: this process must stay
    jax-free (importing avsync pulls in jax + the axon TPU plugin, and this
    long-lived niced CPU job must never touch the TPU tunnel). Comparability
    is preserved because BOTH sides of the head-to-head score with THIS
    function — scripts/run_wer_headhead.py imports wer_cer from here."""
    prev = list(range(len(b) + 1))
    for i, x in enumerate(a, 1):
        cur = [i]
        for j, y in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (x != y)))
        prev = cur
    return prev[-1]


def wer_cer(preds, targets):
    w_err = w_tot = c_err = c_tot = 0
    for p, t in zip(preds, targets):
        w_err += edit_distance(p.split(), t.split())
        w_tot += max(len(t.split()), 1)
        c_err += edit_distance(p, t)
        c_tot += max(len(t), 1)
    return w_err / w_tot, c_err / c_tot


def main() -> int:
    max_sec = float(os.environ.get("AVSYNC_REFWER_MAXSEC", "14400"))
    max_epochs = int(os.environ.get("AVSYNC_REFWER_EPOCHS", "4000"))
    every = int(os.environ.get("AVSYNC_REFWER_EVERY", "25"))
    os.makedirs(WORK, exist_ok=True)
    if not os.path.isdir(CORPUS):
        sys.path.insert(0, REPO)
        from avsync.data import synthetic

        synthetic.write_corpus(
            CORPUS, n_speakers=3, clips_per_speaker=8, preprocessed=True,
            seed=42,
        )

    torch.set_num_threads(1)  # the box has one host core
    random.seed(SEED)
    np.random.seed(SEED)
    torch.manual_seed(SEED)

    from torch.utils.data import DataLoader

    from dataset import GridDataset, collate_fn  # noqa: E402 (reference)
    from model import LipNet  # noqa: E402 (reference)
    from trainer import Trainer  # noqa: E402 (reference)
    from utils import decode_prediction  # noqa: E402 (reference)

    ds = GridDataset(CORPUS, SPEAKERS)
    loader = DataLoader(
        ds, batch_size=BATCH, shuffle=True, collate_fn=collate_fn
    )
    steps_per_epoch = (len(ds) + BATCH - 1) // BATCH
    model = LipNet(vocab_size=len(ds.vocab))

    # Resume from the newest checkpoint if one exists (the job is long-lived
    # and must survive driver restarts; Adam state is rebuilt fresh, which
    # costs a brief re-warmup but keeps the checkpoint format the reference's
    # own plain state_dict). Note the RNG caveat too: the global seeds above
    # replay the epoch-1 DataLoader-shuffle/dropout streams after every
    # restart, so a resumed trajectory is not bit-equal to an uninterrupted
    # run — acceptable for the wall-clock/WER comparison, which measures
    # optimization progress, not a specific stream.
    start_epoch, wall_offset = 0, 0.0
    ckpts = sorted(
        (int(f.split("epoch")[1].split(".")[0]), f)
        for f in os.listdir(WORK)
        if f.startswith("lipnet_refwer_epoch") and f.endswith(".pth")
    ) if os.path.isdir(WORK) else []
    if ckpts:
        start_epoch, latest = ckpts[-1]
        model.load_state_dict(torch.load(os.path.join(WORK, latest)))
        # keep wall_seconds cumulative across restarts: resume from the last
        # recorded value (the published trajectory feeds time-to-WER
        # comparisons — a reset would understate the reference's wall-clock)
        try:
            for line in open(os.path.join(WORK, "progress.jsonl")):
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue  # truncated tail line from a mid-write crash
                if "wall_seconds" in rec:
                    wall_offset = max(wall_offset, rec["wall_seconds"])
        except FileNotFoundError:
            pass
        print(f"resuming from epoch {start_epoch} ({latest}), "
              f"wall offset {wall_offset:.0f}s", flush=True)

    trainer = Trainer(model, torch.device("cpu"))

    # Cache the processed clips + transcripts once for the periodic eval.
    frames, targets = [], []
    for vp, ap in ds.samples:
        frames.append(ds.process_video(vp))
        targets.append(ds.load_align_file(ap))
    eval_x = torch.stack(frames, dim=0)

    progress = os.path.join(WORK, "progress.jsonl")
    t0 = time.time()
    # Gate the header on the progress FILE (not on start_epoch): on resume
    # with checkpoints present but progress.jsonl missing/empty, the config
    # header must still be written or read_ref() has no recs[0]["config"].
    need_header = not (
        os.path.exists(progress) and os.path.getsize(progress) > 0
    )
    with open(progress, "w" if need_header else "a") as out:
        if need_header:
            out.write(json.dumps({
                "config": {
                    "corpus": CORPUS, "speakers": SPEAKERS, "clips": len(ds),
                    "batch_size": BATCH, "steps_per_epoch": steps_per_epoch,
                    "lr": 1e-4, "seed": SEED, "max_sec": max_sec,
                    "optimizer": "reference Trainer (Adam 1e-4, CTC blank=0, clip 1.0)",
                }}) + "\n")
            out.flush()
        for epoch in range(start_epoch + 1, max_epochs + 1):
            loss = trainer.train_epoch(loader)
            # budget checks include wall_offset: the max_sec budget is for
            # the CUMULATIVE run, so restarts must not re-grant it
            if epoch % every == 0 or wall_offset + time.time() - t0 > max_sec:
                model.eval()
                with torch.no_grad():
                    logits = model(eval_x)
                preds = [
                    decode_prediction(logits[i], ds) for i in range(len(ds))
                ]
                model.train()
                wer, cer = wer_cer(preds, targets)
                rec = {
                    "epoch": epoch, "steps": epoch * steps_per_epoch,
                    "train_loss": round(loss, 5),
                    "train_wer": round(wer, 4), "train_cer": round(cer, 4),
                    "wall_seconds": round(wall_offset + time.time() - t0, 1),
                    "example_pred": preds[0], "example_true": targets[0],
                }
                out.write(json.dumps(rec) + "\n")
                out.flush()
                torch.save(
                    model.state_dict(),
                    os.path.join(WORK, f"lipnet_refwer_epoch{epoch}.pth"),
                )
                if wer == 0.0 or wall_offset + time.time() - t0 > max_sec:
                    break
    print(f"done: {progress}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
