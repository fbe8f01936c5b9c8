"""Command-line entry points, reference-CLI compatible.

  python -m avsync.cli train          — LipNet CTC training (`main.py`,
                                        `train.py --mode train`)
  python -m avsync.cli test           — held-out CER/WER/accuracy ->
                                        test_results.json (`train.py:811-993`)
  python -m avsync.cli infer VIDEO    — single-video transcript
                                        (`train.py:998-1075`, `predict.py`)
  python -m avsync.cli misalign-train — detector training
                                        (`misalignment_detection_train.py`)
  python -m avsync.cli misalign-demo  — annotated demo export
                                        (`misalignment_detection_demo.py`)
  python -m avsync.cli quantize       — export int8 calibration scales
                                        (TPU-native extra; avsync/ops/quant.py)
  python -m avsync.cli serve          — HTTP serving daemon with dynamic
                                        batching (TPU-native extra;
                                        avsync/serving.py)
  python -m avsync.cli export         — AOT StableHLO serving artifact
                                        (TPU-native extra; avsync/export.py)

Flag names follow the reference argparse surfaces
(`misalignment_detection_train.py:322-342`, `train.py:1080-1109`).
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time
from datetime import datetime
from typing import List, Optional

import numpy as np

from avsync.config import (
    AudioConfig,
    AvsyncConfig,
    DataConfig,
    DetectorConfig,
    ModelConfig,
    TrainConfig,
)


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _conv_shape(cfg: AvsyncConfig):
    """(C, H, W) of the conv-stack output for the configured geometry —
    drives the (C,H,W)<->(H,W,C) weight permutation in avsync.compat."""
    h, w = cfg.data.img_height, cfg.data.img_width
    for _ in cfg.model.conv_channels:
        h, w = h // 2, w // 2
    return (cfg.model.conv_channels[-1], h, w)


def _load_lipnet_params(checkpoint: str, model, cfg: Optional[AvsyncConfig] = None):
    """Load LipNet params from a reference `.pth` or an avsync Orbax dir."""
    import jax
    import jax.numpy as jnp

    if checkpoint.endswith(".pth"):
        if cfg is not None and cfg.model.family == "tf":
            raise ValueError(
                "reference .pth checkpoints hold the PyTorch-family LipNet; "
                "family='tf' models load from avsync Orbax checkpoint dirs"
            )
        from avsync.compat import DEFAULT_CONV_SHAPE, load_lipnet_pth

        shape = _conv_shape(cfg) if cfg is not None else DEFAULT_CONV_SHAPE
        return jax.tree.map(
            jnp.asarray,
            load_lipnet_pth(
                checkpoint,
                num_conv=len(cfg.model.conv_channels) if cfg else 3,
                num_gru=cfg.model.num_gru_layers if cfg else 2,
                conv_shape=shape,
            ),
        )
    from avsync.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(checkpoint)
    state, _ = ckpt.restore()
    ckpt.close()
    params = state["params"] if isinstance(state, dict) else state.params
    return jax.tree.map(jnp.asarray, params)


def _fit_mesh(cfg: AvsyncConfig):
    """Mesh whose data axis divides the batch size (a global batch must
    shard evenly over 'data'; excess devices are left idle rather than
    erroring on small-batch configs)."""
    import math

    import jax

    from avsync.parallel import make_mesh

    n = len(jax.devices())
    d_req, m = cfg.train.mesh_shape
    if m <= 0:
        m = 1
    avail = max(n // m, 1)
    data = math.gcd(cfg.data.batch_size, avail) if d_req == -1 else d_req
    return make_mesh((data, m), devices=jax.devices()[: data * m])


def _tuned_perf_defaults(args):
    """(compute_dtype, packed_conv, remat) with backend-tuned defaults.

    The bench-measured fast path (bench.py: bf16 matmuls + pack4 conv, no
    remat — 648 clips/s/chip vs several x slower in f32/unpacked) is the
    default whenever the backend is an accelerator; CPU runs keep
    f32/unpacked so exact-parity tests hold. Explicit flags always win.
    """
    dtype = getattr(args, "compute_dtype", None)
    packed = getattr(args, "packed_conv", None)
    remat = getattr(args, "remat", None)
    if dtype is None or packed is None:
        import jax

        accel = jax.default_backend() != "cpu"
        if dtype is None:
            dtype = "bfloat16" if accel else "float32"
        if packed is None:
            packed = accel
    return dtype, bool(packed), bool(remat) if remat is not None else False


def _config_from_args(args) -> AvsyncConfig:
    """Build the config tree: start from --config JSON when given (geometry,
    model size, mesh...), then apply the reference-compatible CLI scalars."""
    import dataclasses

    def _arg(name, fallback):
        v = getattr(args, name, None)
        return fallback if v is None else v

    family = getattr(args, "model_family", None)
    if getattr(args, "config", None):
        with open(args.config) as f:
            base = AvsyncConfig.from_json(f.read())
        model_kw = {"family": _arg("model_family", base.model.family)}
        # perf flags: explicit CLI values override the config file; the
        # backend-tuned defaults apply only when no --config is given (a
        # config file's compute_dtype/packed_conv are deliberate choices)
        if getattr(args, "compute_dtype", None) is not None:
            model_kw["compute_dtype"] = args.compute_dtype
        if getattr(args, "packed_conv", None) is not None:
            model_kw["packed_conv"] = args.packed_conv
        data_kw = {
            "data_path": args.data_path,
            "batch_size": _arg("batch_size", base.data.batch_size),
            "roi_mode": _arg("roi_mode", base.data.roi_mode),
            "roi_host": _arg("roi_host", base.data.roi_host),
            "device_cache": _arg("device_cache", base.data.device_cache),
        }
        if family == "tf" and base.model.family != "tf":
            # --model_family tf over a pytorch-family config: also switch
            # the reference TF conv widths and data geometry
            # (`train.py:88-89,266-273,505-521`)
            model_kw["conv_channels"] = (128, 256, 64)
            data_kw.update(
                img_width=140, img_height=46, standardize_clips=True
            )
        return dataclasses.replace(
            base,
            model=dataclasses.replace(base.model, **model_kw),
            data=dataclasses.replace(base.data, **data_kw),
            detector=dataclasses.replace(
                base.detector,
                hidden_dim=_arg("hidden_dim", base.detector.hidden_dim),
                max_shift_frames=_arg(
                    "max_shift_frames", base.detector.max_shift_frames
                ),
                num_negative_samples=_arg(
                    "num_negatives", base.detector.num_negative_samples
                ),
                batch_size=_arg("batch_size", base.detector.batch_size),
                epochs=_arg("epochs", base.detector.epochs),
                lr=_arg("lr", base.detector.lr),
                weight_decay=_arg("weight_decay", base.detector.weight_decay),
            ),
            train=dataclasses.replace(
                base.train,
                remat=_arg("remat", base.train.remat),
                epochs=_arg("epochs", base.train.epochs),
                learning_rate=_arg("lr", base.train.learning_rate),
                seed=getattr(args, "seed", base.train.seed),
                checkpoint_dir=getattr(
                    args, "checkpoint_dir", base.train.checkpoint_dir
                ),
                quick_test=getattr(args, "quick_test", base.train.quick_test),
                tensorboard=_arg("tensorboard", base.train.tensorboard),
                log_dir=_arg("log_dir", base.train.log_dir),
                checkpoint_every=_arg(
                    "checkpoint_every", base.train.checkpoint_every
                ),
            ),
        )
    # Without --config, --model_family tf also switches the data geometry to
    # the TF stack's convention: 140x46 mouth crops + per-clip
    # standardization (`train.py:88-89,266-273`).
    tf_family = family == "tf"
    compute_dtype, packed_conv, remat = _tuned_perf_defaults(args)
    return AvsyncConfig(
        data=DataConfig(
            data_path=args.data_path,
            batch_size=_arg("batch_size", 8),
            img_width=140 if tf_family else 100,
            img_height=46 if tf_family else 50,
            standardize_clips=tf_family,
            roi_mode=_arg("roi_mode", "heuristic"),
            roi_host=bool(_arg("roi_host", False)),
            device_cache=_arg("device_cache", "auto"),
        ),
        model=ModelConfig(
            family=family or "pytorch",
            hidden_dim=getattr(args, "model_hidden_dim", 256),
            # conv_channels left None -> ModelConfig resolves the family's
            # reference widths (`model.py:16-20` vs `train.py:505-521`)
            compute_dtype=compute_dtype,
            packed_conv=packed_conv,
        ),
        audio=AudioConfig(
            sample_rate=_arg("sample_rate", 16000),
            n_mfcc=_arg("n_mfcc", 20),
        ),
        detector=DetectorConfig(
            hidden_dim=_arg("hidden_dim", 256),
            max_shift_frames=_arg("max_shift_frames", 15),
            num_negative_samples=_arg("num_negatives", 1),
            lr=_arg("lr", 1e-3),
            weight_decay=_arg("weight_decay", 1e-5),
            batch_size=_arg("batch_size", 32),
            epochs=_arg("epochs", 20),
        ),
        train=TrainConfig(
            learning_rate=_arg("lr", 1e-4),
            remat=remat,
            epochs=_arg("epochs", 50),
            seed=getattr(args, "seed", 42),
            checkpoint_dir=getattr(args, "checkpoint_dir", "./checkpoints"),
            log_dir=_arg("log_dir", "logs"),
            quick_test=getattr(args, "quick_test", False),
            tensorboard=_arg("tensorboard", False),
            checkpoint_every=_arg("checkpoint_every", 10),
        ),
    )


# ---------------------------------------------------------------------------
# train
# ---------------------------------------------------------------------------

def cmd_train(args) -> int:
    import jax

    from avsync.data import (
        GridDataSource,
        LipNetBatcher,
        check_data_structure,
        split_speakers,
    )
    from avsync.parallel import make_mesh
    from avsync.train import LipNetTrainer
    from avsync.utils.logging import Logger

    cfg = _config_from_args(args)
    speakers = args.speakers or check_data_structure(cfg.data.data_path)
    if not speakers:
        print(f"ERROR: no usable speakers under {cfg.data.data_path}")
        return 1
    train_sp, val_sp, test_sp = split_speakers(speakers, cfg.data.split)
    print(f"Speakers: train={train_sp} val={val_sp} test={test_sp}")

    mesh = _fit_mesh(cfg)
    trainer = LipNetTrainer(cfg, mesh=mesh)
    sources = {
        name: GridDataSource(cfg.data.data_path, sp)
        for name, sp in (("train", train_sp), ("val", val_sp), ("test", test_sp))
    }
    batchers = {
        name: LipNetBatcher(src, cfg, mesh=mesh) for name, src in sources.items()
    }

    if cfg.train.quick_test:
        # smoke mode (`main.py:154-167`): one batch through the forward pass
        batch = batchers["train"].first_batch()
        out = trainer.model.apply(
            {"params": trainer.init_state(batch).params}, batch["video"]
        )
        print(f"quick_test: input {batch['video'].shape} -> output {out.shape}")
        return 0

    example_fn = None
    if args.show_examples:
        from avsync import text as textlib

        ex_batches = {
            name: batchers[name].first_batch()
            for name in ("train", "val")
        }
        decode = (
            textlib.tf_decode_batch
            if cfg.model.family == "tf"
            else textlib.decode_batch
        )

        def example_fn(state, epoch):
            # per-epoch qualitative decode — the ProduceExample callback
            # (`train.py:552-608`)
            for name, b in ex_batches.items():
                _, lp = trainer.compiled["eval"](
                    state.params, trainer._device_batch(b)
                )
                preds = decode(lp[:2])
                srcs = sources[name]
                print(f"[{name} examples, epoch {epoch}]")
                for i, p in enumerate(preds):
                    print(f"  original:   {srcs.samples[i].text}")
                    print(f"  prediction: {p}")

    lr_schedule = None
    if args.lr_schedule == "keras":
        from avsync.train.lipnet_trainer import keras_lr_schedule

        lr_schedule = keras_lr_schedule

    resume_state = None
    start_epoch = 0
    resume_dir = args.resume
    ckpt_mgr = None
    if resume_dir == "auto":
        # relaunch-the-same-command convenience for preemption loops: pick
        # up from checkpoint_dir if it has snapshots, else train fresh
        from avsync.utils.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(cfg.train.checkpoint_dir)
        if ckpt_mgr.latest_step() is None:
            ckpt_mgr.close()
            ckpt_mgr = None
            resume_dir = None
            print("resume=auto: no snapshots yet — starting fresh")
        else:
            resume_dir = cfg.train.checkpoint_dir
    if resume_dir:
        from avsync.train.lipnet_trainer import TrainState
        from avsync.utils.checkpoint import CheckpointManager

        first = batchers["train"].first_batch()
        template = jax.device_get(trainer.init_state(first))
        ckpt = ckpt_mgr or CheckpointManager(resume_dir)
        restored, _meta = ckpt.restore(template=template)
        ckpt.close()
        resume_state = trainer.shard_state(
            TrainState(restored.params, restored.opt_state, restored.step)
        )
        step0 = int(np.asarray(restored.step))
        if args.resume == "auto":
            # relaunch-same-command semantics: --epochs is a TOTAL budget,
            # so credit the epochs already COMPLETED — from checkpoint
            # metadata (the trainer records epochs_completed; the step
            # counter would over-credit after mid-epoch preemptions, whose
            # partial-epoch steps accumulate across relaunches). Fallback
            # for pre-metadata snapshots: the steps//steps_per_epoch
            # heuristic (drop_last batching makes steps/epoch fixed).
            meta_metrics = (_meta or {}).get("metrics", {})
            done = meta_metrics.get("epochs_completed")
            if done is None:
                steps_per_epoch = max(
                    1, len(sources["train"]) // cfg.data.batch_size
                )
                done = step0 // steps_per_epoch
            start_epoch = min(int(done), cfg.train.epochs)
            if meta_metrics.get("early_stopped"):
                # the previous segment CONVERGED (early stop restored the
                # best weights) — a relaunch loop must not spend the
                # remaining budget training past that point
                print("resume=auto: previous run early-stopped — "
                      "treating the epoch budget as met")
                start_epoch = cfg.train.epochs
        print(f"Resumed from {resume_dir} at step {step0} "
              f"(epochs completed: {start_epoch})")

    # Fresh shuffle order per epoch (reference DataLoader(shuffle=True)
    # semantics) — with drop_last batching a fixed seed would also exclude
    # the same tail samples every epoch. Seeds continue the ABSOLUTE epoch
    # sequence on resume: restarting at seed+0 would replay the earliest
    # epochs' orders on every relaunch (and their excluded tails). Fresh
    # runs consume one extra draw first (trainer.train's init-state
    # template); resumes pass a restored state and draw none, so the
    # resume path starts one past start_epoch to keep epoch e on seed
    # index e in both cases.
    import itertools

    epoch_seq = itertools.count(
        start_epoch + 1 if resume_state is not None else 0
    )

    def train_source():
        # one seed draw per epoch, shared by both paths so the shuffle
        # order is identical whether the epoch scans or streams
        seed = cfg.train.seed + next(epoch_seq)
        plan = batchers["train"].scan_plan(shuffle=True, seed=seed)
        if plan is not None:  # fully device-cached: one dispatch per epoch
            return plan
        return batchers["train"].epoch(shuffle=True, seed=seed)

    state = trainer.train(
        train_source,
        lambda: batchers["val"].epoch(shuffle=False),
        state=resume_state,
        checkpoint_dir=cfg.train.checkpoint_dir,
        lr_schedule=lr_schedule,
        early_stopping_patience=args.early_stopping,
        example_fn=example_fn,
        history_path=os.path.join(cfg.train.checkpoint_dir, "history.json"),
        profile_dir=args.profile_dir,
        start_epoch=start_epoch,
    )
    trainer.plot_losses(os.path.join(cfg.train.checkpoint_dir, "training_history.png"))

    if args.export_pth:
        from avsync.compat import save_lipnet_pth

        save_lipnet_pth(
            jax.device_get(state.params), args.export_pth,
            num_conv=len(cfg.model.conv_channels),
            num_gru=cfg.model.num_gru_layers,
            conv_shape=_conv_shape(cfg),
        )
        print(f"Exported reference-format checkpoint to {args.export_pth}")
    _evaluate(trainer, state, batchers["test"], sources["test"],
              os.path.join(cfg.train.checkpoint_dir, "test_results.json"))
    return 0


def _evaluate(trainer, state, batcher, source, out_json: str, num_print: int = 5,
              beam_width: int = 0, quantize: Optional[str] = None):
    """Greedy-decode the split, print samples, dump CER/WER/accuracy JSON
    (`utils.py:38-86` + `train.py:916-942`).

    `quantize='int8'` runs the conv stack in int8 on the MXU
    (avsync/ops/quant.py), calibrated on the first eval batch — the same
    preprocessed distribution the whole split sees."""
    from avsync import text as textlib
    from avsync.eval import evaluate_transcripts

    # The TF family emits 32-way blank-last log-probs (blank=31); its decode
    # differs from the PyTorch stack's blank=0/39-way vocabulary.
    decode = (
        textlib.tf_decode_batch
        if trainer.config.model.family == "tf"
        else textlib.decode_batch
    )
    qfwd = qparams = None
    if quantize == "int8":
        from avsync.ops.quant import make_int8_forward, quantize_lipnet

        qfwd = make_int8_forward(trainer.model, trainer.config.model)
    preds: List[str] = []
    targets: List[str] = []
    idx = 0
    for batch in batcher.epoch(shuffle=False, drop_last=False):
        dbatch = trainer._device_batch(batch)
        if qfwd is not None:
            if qparams is None:
                qparams = quantize_lipnet(state.params, [dbatch["video"]])
            log_probs = qfwd(qparams, dbatch["video"])
        else:
            _, log_probs = trainer.compiled["eval"](state.params, dbatch)
        decoded = decode(
            log_probs[: batch["valid"]], beam_width=beam_width
        )
        for d in decoded:
            preds.append(d)
            targets.append(source.samples[idx].text)
            if idx < num_print:
                print(f"\nSample {idx + 1}:")
                print(f"True text: {targets[-1]}")
                print(f"Predicted text: {d}")
            idx += 1
    results = evaluate_transcripts(preds, targets)
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nTest results: {results} -> {out_json}")
    return results


# ---------------------------------------------------------------------------
# test / infer
# ---------------------------------------------------------------------------

def cmd_test(args) -> int:
    from avsync.data import GridDataSource, LipNetBatcher, check_data_structure, split_speakers
    from avsync.parallel import make_mesh
    from avsync.train import LipNetTrainer
    from avsync.train.lipnet_trainer import TrainState

    cfg = _config_from_args(args)
    quantize = getattr(args, "quantize", None)
    speakers = args.speakers or check_data_structure(cfg.data.data_path)
    _, _, test_sp = split_speakers(speakers, cfg.data.split)
    src = GridDataSource(cfg.data.data_path, test_sp)
    mesh = _fit_mesh(cfg)
    trainer = LipNetTrainer(cfg, mesh=mesh)
    params = _load_lipnet_params(args.checkpoint, trainer.model, cfg)
    state = TrainState(params, None, 0)
    batcher = LipNetBatcher(src, cfg, mesh=mesh)
    _evaluate(
        trainer, state, batcher, src, args.output or "test_results.json",
        beam_width=args.beam, quantize=quantize,
    )
    return 0


def cmd_infer(args) -> int:
    import jax

    from avsync import text as textlib
    from avsync.data.video import decode_video_gray
    from avsync.eval import calculate_cer, calculate_wer
    from avsync.models import make_lipnet

    cfg = _config_from_args(args)
    model = make_lipnet(cfg.model)
    decode = (
        textlib.tf_decode_batch
        if cfg.model.family == "tf"
        else textlib.decode_batch
    )
    params = _load_lipnet_params(args.checkpoint, model, cfg)

    frames = decode_video_gray(args.video, max_frames=cfg.data.max_video_length)
    if frames.size == 0:
        print(f"ERROR: no frames decoded from {args.video}")
        return 1
    # the serving preprocess (same ROI program + standardize semantics as
    # the training pipeline — see predictor.prepare_clip)
    from avsync.predictor import (
        load_localizer_params,
        load_mouth_detector,
        prepare_clip,
    )

    clips = prepare_clip(
        frames, cfg, load_localizer_params(cfg), load_mouth_detector(cfg)
    )
    if getattr(args, "quantize", None) == "int8":
        from avsync.ops.quant import make_int8_forward, quantize_lipnet

        qparams = quantize_lipnet(params, [clips])
        log_probs = make_int8_forward(model, cfg.model)(qparams, clips)
    else:
        log_probs = jax.jit(lambda p, v: model.apply({"params": p}, v))(params, clips)
    pred = decode(log_probs, beam_width=args.beam)[0]
    print(f"Predicted: {pred}")

    base = os.path.splitext(args.video)[0]
    for ext in (".align", ".txt"):
        if os.path.exists(base + ext):
            gt = textlib.load_align_file(base + ext)
            print(f"Ground truth: {gt}")
            print(f"CER: {calculate_cer(pred, gt):.4f}  WER: {calculate_wer(pred, gt):.4f}")
            break
    return 0


# ---------------------------------------------------------------------------
# quantize / serve
# ---------------------------------------------------------------------------

def cmd_quantize(args) -> int:
    """Export int8 calibration scales for deployment.

    Runs the f32 conv stack over a few preprocessed batches from
    --data_path (the SAME preprocessing serving runs) and writes the
    per-layer input scales to an .npz. `avsync serve/test --qscales FILE`
    (or LipReader(calibration_scales=FILE)) then quantizes at load time
    with no calibration data on the serving host."""
    from avsync.data import GridDataSource, LipNetBatcher
    from avsync.models import make_lipnet
    from avsync.ops.quant import calibrate_conv_input_scales

    cfg = _config_from_args(args)
    model = make_lipnet(cfg.model)
    params = _load_lipnet_params(args.checkpoint, model, cfg)
    src = GridDataSource(cfg.data.data_path, args.speakers or None)
    if len(src) == 0:
        print(f"ERROR: no clips under {cfg.data.data_path}")
        return 1
    batcher = LipNetBatcher(src, cfg)
    batches = []
    seen = 0
    for batch in batcher.epoch(shuffle=False, drop_last=False):
        batches.append(np.asarray(batch["video"][: batch["valid"]]))
        seen += int(batch["valid"])
        if seen >= args.n_calib:
            break
    scales = calibrate_conv_input_scales(params, batches)
    np.savez(
        args.out,
        input_scales=scales,
        family=cfg.model.family,
        n_calibration_clips=seen,
        checkpoint=os.path.abspath(args.checkpoint),
    )
    print(f"calibrated {len(scales)} conv layers on {seen} clips "
          f"-> {args.out}")
    print(f"input_scales: {scales.tolist()}")
    return 0


def cmd_export(args) -> int:
    """Serialize the full serving computation (preprocess + forward + CTC
    decode, weights baked in, symbolic batch dim) as one StableHLO module
    — the ahead-of-time deployment artifact (avsync/export.py). The
    reference's closest analogue is 'load the .pth in Python'
    (`predict.py:17-105`); this needs neither avsync nor the checkpoint on
    the serving host."""
    from avsync.export import export_sync_scorer, export_transcriber

    cfg = _config_from_args(args)
    geom = None
    if args.frame_geometry:
        h, w = (int(v) for v in args.frame_geometry.lower().split("x"))
        geom = (h, w)
    platforms = tuple(p.strip() for p in args.platforms.split(","))
    buckets = None
    if args.batch_sizes:
        try:
            buckets = [int(v) for v in args.batch_sizes.split(",")]
        except ValueError:
            print(f"--batch_sizes must be a comma-separated list of "
                  f"positive ints, got {args.batch_sizes!r}")
            return 2
        if any(b <= 0 for b in buckets):
            print(f"--batch_sizes entries must be positive, "
                  f"got {args.batch_sizes!r}")
            return 2
    if args.detector_checkpoint:
        art = export_sync_scorer(
            args.detector_checkpoint, args.checkpoint, cfg,
            num_shifts=args.shifts_per_request, frame_geometry=geom,
            platforms=platforms, batch_sizes=buckets,
        )
    else:
        art = export_transcriber(
            args.checkpoint, cfg, frame_geometry=geom, platforms=platforms,
            batch_sizes=buckets,
        )
    art.save(args.out)
    m = art.meta
    bdesc = ("b symbolic" if art.batch_sizes is None
             else f"static buckets {art.batch_sizes}")
    print(f"exported {args.out}: kind={m['kind']} family={m['family']} "
          f"frames=(b, {m['frame_shape'][0]}, {m['frame_shape'][1]}, "
          f"{m['frame_shape'][2]}) uint8 ({bdesc}), roi={m['roi']}, "
          f"platforms={m['platforms']}")
    return 0


def cmd_serve(args) -> int:
    """Serving daemon: LipReader (+ optional MisalignmentScorer) behind a
    dynamic batcher and a stdlib HTTP surface (avsync/serving.py)."""
    from avsync.predictor import LipReader, MisalignmentScorer
    from avsync.serving import (
        ArtifactSyncScoreService,
        ArtifactTranscribeService,
        AvsyncServer,
        SyncScoreService,
        TranscribeService,
    )

    if args.artifact:
        # AOT path: serve straight from exported StableHLO artifacts — no
        # checkpoint, no model lowering at startup (avsync/export.py)
        if args.checkpoint or args.detector_checkpoint:
            raise SystemExit(
                "--artifact serves the exported module; don't also pass "
                "--checkpoint/--detector_checkpoint (bake them in via "
                "`avsync export`)"
            )
        if getattr(args, "quantize", None) or args.dp != 1:
            raise SystemExit(
                "--quantize/--dp don't apply to --artifact serving: the "
                "artifact's computation is frozen at export time"
            )
        from avsync.export import load_exported

        transcriber = scorer = None
        for path in args.artifact:
            art = load_exported(path)
            kind = art.meta.get("kind", "transcriber")
            if kind == "transcriber":
                if transcriber is not None:
                    raise SystemExit("two transcriber artifacts given")
                transcriber = ArtifactTranscribeService(
                    art, max_batch=args.max_batch,
                    max_wait_ms=args.max_wait_ms,
                )
            elif kind == "sync_scorer":
                if scorer is not None:
                    raise SystemExit("two sync_scorer artifacts given")
                scorer = ArtifactSyncScoreService(
                    art, max_batch=args.max_batch,
                    max_wait_ms=args.max_wait_ms,
                )
            else:
                raise SystemExit(
                    f"unknown artifact kind {kind!r} in {path}"
                )
            print(f"loaded artifact {path}: kind={kind}")
        if getattr(args, "warmup", False):
            import time as _time

            t0 = _time.time()
            for svc in (transcriber, scorer):
                if svc is not None:
                    svc.warmup()
            print(f"warmup: compiled batch buckets 1..{args.max_batch} "
                  f"in {_time.time() - t0:.1f}s")
        server = AvsyncServer(
            transcriber, scorer, host=args.host, port=args.port,
            max_body_bytes=args.max_body_mb * 1024 * 1024,
        )
        host, port = server.address[0], server.address[1]
        print(f"avsync AOT serving on http://{host}:{port} "
              f"(max_batch={args.max_batch}, "
              f"max_wait_ms={args.max_wait_ms})")
        print("endpoints: GET /healthz /v1/stats; "
              "POST /v1/transcribe /v1/sync_score")
        return _serve_loop(server)

    if not args.checkpoint:
        raise SystemExit("need --checkpoint (live) or --artifact (AOT)")
    cfg = _config_from_args(args)
    mesh = None
    if args.dp != 1:
        import jax

        from avsync.parallel import make_mesh

        n = len(jax.devices()) if args.dp == 0 else args.dp
        if n > 1:
            mesh = make_mesh((n, 1))
            print(f"data-parallel serving over {n} devices")
    reader = LipReader(
        args.checkpoint, cfg,
        quantize=getattr(args, "quantize", None),
        calibration_scales=getattr(args, "qscales", None),
        mesh=mesh,
    )
    transcriber = TranscribeService(
        reader, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        transport=getattr(args, "transport", "raw"),
    )
    scorer = None
    if args.detector_checkpoint:
        scorer = SyncScoreService(
            MisalignmentScorer(
                args.detector_checkpoint, args.checkpoint, cfg
            ),
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        )
    if getattr(args, "warmup", False):
        import time as _time

        t0 = _time.time()
        transcriber.warmup()
        if scorer is not None:
            scorer.warmup()
        print(f"warmup: compiled batch buckets 1..{args.max_batch} "
              f"in {_time.time() - t0:.1f}s")
    server = AvsyncServer(
        transcriber, scorer, host=args.host, port=args.port,
        max_body_bytes=args.max_body_mb * 1024 * 1024,
    )
    host, port = server.address[0], server.address[1]
    print(f"avsync serving on http://{host}:{port} "
          f"(max_batch={args.max_batch}, max_wait_ms={args.max_wait_ms}, "
          f"quantize={getattr(args, 'quantize', None)})")
    print("endpoints: GET /healthz /v1/stats; "
          "POST /v1/transcribe /v1/sync_score")
    return _serve_loop(server)


def _serve_loop(server) -> int:
    import signal

    def _term(signum, frame):  # SIGTERM takes the same graceful path as ^C
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("\nshutting down")
        # shutdown drains in-flight batches (worker join); a REPEATED
        # SIGTERM during that drain (supervisors often resend) must not
        # abort it with a traceback — ignore further TERMs. A second ^C
        # (SIGINT) still force-quits, per convention.
        signal.signal(signal.SIGTERM, signal.SIG_IGN)
        server.shutdown()
    return 0


# ---------------------------------------------------------------------------
# misalign-train
# ---------------------------------------------------------------------------

def _bank_cache_path(cfg: AvsyncConfig, video_paths, checkpoint, cache_dir):
    """(path, key) for a cached FeatureBank, or (None, key) when disabled.

    The key fingerprints every input the bank is a pure function of: the
    ordered clip list with per-file (size, mtime), the frozen-LipNet
    checkpoint stat, and the geometry/audio config fields that shape the
    features. Any change misses cleanly and the bank is rebuilt."""
    import hashlib

    def stat(p):
        try:
            st = os.stat(p)
            return [p, st.st_size, st.st_mtime_ns]
        except OSError:
            return [p, -1, -1]

    key_doc = {
        "videos": [stat(p) for p in video_paths],
        "checkpoint": stat(checkpoint) if checkpoint else None,
        "audio": [cfg.audio.sample_rate, cfg.audio.n_mfcc,
                  cfg.audio.max_audio_samples],
        # the bank's fps array is a pure function of default_fps for .npy
        # corpora (get_video_fps falls back to it), so it must key the cache
        "fps": cfg.detector.default_fps,
        "geometry": [cfg.data.img_height, cfg.data.img_width,
                     cfg.data.max_video_length, cfg.data.roi_mode,
                     # roi_host changes bank values (uint8-quantized crops)
                     cfg.data.roi_host,
                     cfg.data.standardize_clips],
        "model": [cfg.model.family, tuple(cfg.model.conv_channels),
                  cfg.model.compute_dtype, cfg.model.packed_conv],
    }
    key = hashlib.sha256(
        json.dumps(key_doc, sort_keys=True).encode()
    ).hexdigest()
    if not cache_dir:
        return None, key
    return os.path.join(cache_dir, f"bank_{key[:16]}.npz"), key


def _build_bank(cfg: AvsyncConfig, src, model, params, video_paths,
                checkpoint=None, cache_dir=None):
    """Feature bank for an ordered list of video paths.

    With cache_dir set, the bank round-trips through an .npz keyed by the
    inputs' stat fingerprints — repeat sweeps over an unchanged corpus skip
    the conv-feature extraction entirely."""
    import jax.numpy as jnp

    from avsync.data import LipNetBatcher
    from avsync.data.grid import GridDataSource
    from avsync.data.video import get_video_fps, load_audio_for_video
    from avsync.features import (
        build_feature_bank,
        load_feature_bank,
        save_feature_bank,
    )
    from avsync.ops.audio import resample_host

    cache_path, key = _bank_cache_path(cfg, video_paths, checkpoint, cache_dir)
    if cache_path is not None:
        bank = load_feature_bank(cache_path, key)
        if bank is not None:
            return bank

    # restrict the source to the chosen paths, in order
    sub = GridDataSource.__new__(GridDataSource)
    sub.data_path = src.data_path
    sub.speakers = src.speakers
    by_path = {s.video_path: s for s in src.samples}
    sub.samples = [by_path[p] for p in video_paths]

    batcher = LipNetBatcher(sub, cfg)
    clips = batcher.epoch(shuffle=False, drop_last=False)
    audio_list, fps_list = [], []
    for p in video_paths:
        a, sr = load_audio_for_video(p, cfg.audio.sample_rate)
        if sr != cfg.audio.sample_rate:
            a = resample_host(a, sr, cfg.audio.sample_rate)
        audio_list.append(a)
        fps_list.append(get_video_fps(p, cfg.detector.default_fps))
    bank = build_feature_bank(model, params, clips, audio_list, fps_list, cfg)
    if cache_path is not None:
        save_feature_bank(cache_path, bank, key)
    return bank


def cmd_misalign_train(args) -> int:
    import jax

    from avsync.data import GridDataSource, discover_speakers, split_videos
    from avsync.eval import roc_curve
    from avsync.models import make_lipnet
    from avsync.train.detector_trainer import DetectorTrainer
    from avsync.utils.logging import Logger, format_time

    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    log_folder = os.path.join(args.log_dir, f"misalignment_{timestamp}")
    os.makedirs(log_folder, exist_ok=True)
    logger = Logger(os.path.join(log_folder, "training.log"), console=args.verbose)
    t0 = time.time()

    logger.log("=" * 60)
    logger.log("Misalignment Detection Training")
    logger.log("=" * 60)
    logger.log(f"Log folder: {log_folder}")
    logger.log(f"Arguments: {vars(args)}")

    cfg = _config_from_args(args)
    random.seed(cfg.train.seed)
    np.random.seed(cfg.train.seed)

    speakers = args.speakers or discover_speakers(cfg.data.data_path)
    src = GridDataSource(cfg.data.data_path, speakers)
    video_paths = [s.video_path for s in src.samples]
    if args.max_samples:
        random.shuffle(video_paths)
        video_paths = video_paths[: args.max_samples]
    logger.log(f"Using {len(video_paths)} videos from {len(speakers)} speakers")
    print(f"Using {len(video_paths)} videos")

    model = make_lipnet(cfg.model)
    params = _load_lipnet_params(args.checkpoint, model, cfg)

    train_p, val_p, test_p = split_videos(video_paths, seed=cfg.train.seed)
    logger.log(f"Train: {len(train_p)}, Val: {len(val_p)}, Test: {len(test_p)}")

    banks = {}
    for name, paths in (("train", train_p), ("val", val_p), ("test", test_p)):
        banks[name] = _build_bank(
            cfg, src, model, params, paths,
            checkpoint=args.checkpoint,
            cache_dir=getattr(args, "bank_cache", None),
        )
    logger.log("Feature banks built (device-resident)")

    from avsync.compat import save_detector_pth

    input_dim = banks["train"].visual.shape[1] + 2 * cfg.audio.n_mfcc
    det_cfg = {
        "sample_rate": cfg.audio.sample_rate,
        "n_mfcc": cfg.audio.n_mfcc,
        "max_shift_frames": cfg.detector.max_shift_frames,
    }

    def save_snapshot(st, epoch):
        save_detector_pth(
            jax.device_get(st.params),
            os.path.join(log_folder, f"checkpoint_epoch_{epoch}.pth"),
            input_dim, cfg.detector.hidden_dim, det_cfg,
            conv_shape=_conv_shape(cfg), n_audio_feats=2 * cfg.audio.n_mfcc,
        )

    from avsync.parallel import make_mesh

    mesh = make_mesh((len(jax.devices()), 1))
    trainer = DetectorTrainer(cfg, log=logger, mesh=mesh)
    state, summary = trainer.train(
        banks["train"], len(train_p), banks["val"], len(val_p),
        save_every=args.save_every, save_fn=save_snapshot,
    )

    logger.log("")
    logger.log("Evaluating on test set...")
    _, test_m = trainer.run_epoch(
        state, banks["test"], len(test_p), seed=cfg.train.seed + 999, train=False
    )
    logger.log(
        f"Test -> loss: {test_m['loss']:.4f}, acc: {test_m['acc']:.3f}, "
        f"auc: {test_m['auc']:.3f}"
    )

    # save detector: reference .pth layout + ROC artifact
    for path in (
        os.path.join(log_folder, os.path.basename(args.detector_checkpoint)),
        args.detector_checkpoint,
    ):
        save_detector_pth(
            jax.device_get(state.params), path, input_dim,
            cfg.detector.hidden_dim, det_cfg,
            conv_shape=_conv_shape(cfg), n_audio_feats=2 * cfg.audio.n_mfcc,
        )

    _plot_roc(test_m["labels"], test_m["probs"], os.path.join(log_folder, "roc.png"))
    logger.log(f"ROC saved to {os.path.join(log_folder, 'roc.png')}")
    total = time.time() - t0
    logger.log("")
    logger.log("=" * 60)
    logger.log("Training completed!")
    logger.log(f"Total time: {format_time(total)}")
    logger.log(f"Best val AUC: {summary['best_val_auc']:.3f}")
    logger.log(f"Test AUC: {test_m['auc']:.3f}")
    logger.log(f"Model saved to: {args.detector_checkpoint}")
    logger.log(f"Logs saved to: {log_folder}")
    logger.log("=" * 60)
    logger.close()
    print(f"Done. Best val AUC {summary['best_val_auc']:.3f}, "
          f"test AUC {test_m['auc']:.3f}. Logs: {log_folder}")
    return 0


def _plot_roc(labels, probs, out_path):
    """ROC artifact (`misalignment_detection_train.py:283-296`)."""
    from avsync.eval import auroc, roc_curve

    labels = np.asarray(labels)
    if labels.size == 0 or len(np.unique(labels)) < 2:
        return
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    fpr, tpr, _ = roc_curve(labels, probs)
    auc = float(auroc(jnp.asarray(labels, jnp.float32), jnp.asarray(probs)))
    plt.figure(figsize=(6, 6))
    plt.plot(fpr, tpr, label=f"ROC AUC = {auc:.3f}")
    plt.plot([0, 1], [0, 1], "k--")
    plt.xlabel("False Positive Rate")
    plt.ylabel("True Positive Rate")
    plt.legend(loc="lower right")
    plt.tight_layout()
    plt.savefig(out_path)
    plt.close()


# ---------------------------------------------------------------------------
# misalign-eval: sliding-shift AUROC sweep (BASELINE scenario #3)
# ---------------------------------------------------------------------------

# Clip-axis chunk for sweep scoring (module-level so tests can patch it to
# exercise the multi-chunk path on tiny corpora). 512 keeps one magnitude's
# STFT intermediate ~1 GB on device at production corpus sizes.
_SWEEP_CLIP_CHUNK = 512


def cmd_misalign_eval(args) -> int:
    """Score every clip aligned vs +/-s for each shift magnitude s and report
    AUROC per magnitude + overall — the 'sliding +/-5..20-frame shifts'
    evaluation scenario from BASELINE.json."""
    import jax
    import jax.numpy as jnp

    from avsync.compat import load_detector_pth
    from avsync.data import GridDataSource, discover_speakers
    from avsync.eval import auroc
    from avsync.features import gather_features
    from avsync.models import MisalignmentDetector, make_lipnet

    cfg = _config_from_args(args)
    det_params, meta = load_detector_pth(
        args.detector_checkpoint, conv_shape=_conv_shape(cfg),
        n_audio_feats=2 * cfg.audio.n_mfcc,
    )
    det_model = MisalignmentDetector(
        hidden_dim=int(meta.get("hidden_dim", cfg.detector.hidden_dim))
    )
    det_params = jax.tree.map(jnp.asarray, det_params)
    lip_model = make_lipnet(cfg.model)
    lip_params = _load_lipnet_params(args.checkpoint, lip_model, cfg)

    speakers = args.speakers or discover_speakers(cfg.data.data_path)
    src = GridDataSource(cfg.data.data_path, speakers)
    paths = [s.video_path for s in src.samples]
    if args.max_samples:
        paths = paths[: args.max_samples]
    bank = _build_bank(cfg, src, lip_model, lip_params, paths,
                       checkpoint=args.checkpoint,
                       cache_dir=getattr(args, "bank_cache", None))
    n = len(paths)

    # ONE jitted program for the whole sweep: gather->MFCC->detector for
    # the aligned row plus every shift magnitude, lax.map'ed over the
    # (M+1, n) shift matrix. The round-3 implementation dispatched ~50
    # individually-compiled eager ops per magnitude over the tunnel (40 s
    # of first-call warmup + one 50 ms RTT per magnitude on the 24-clip
    # corpus); this is a single executable, one dispatch for the whole
    # sweep, shared across CLI invocations via the persistent compile
    # cache. lax.map (not vmap) keeps peak memory at one magnitude's STFT.
    # bank/det_params MUST be jit arguments, not closures: closed-over
    # arrays are baked into the HLO as constants, and a production-scale
    # bank (~800 MB at 3300 clips) blows the remote-compile request limit
    # (HTTP 413) and would bloat the persistent cache entry.
    score_sweep = jax.jit(
        lambda bk, dp, vi, sh_rows: jax.lax.map(
            lambda sh: jax.nn.sigmoid(det_model.apply(
                {"params": dp},
                gather_features(bk, vi, sh, cfg.audio),
            )),
            sh_rows,
        )
    )
    idx = np.arange(n, dtype=np.int32)
    rng = np.random.default_rng(args.seed)
    mags = list(range(args.min_shift, args.max_shift + 1))
    rows = [np.zeros(n, np.int32)]  # aligned first — same rng stream as
    for s in mags:                  # the round-3 per-magnitude loop
        signs = rng.choice([-1, 1], size=n).astype(np.int32)
        rows.append(signs * s)
    row_mat = np.stack(rows)
    # chunk the clip axis: one magnitude's STFT intermediate is
    # O(n_clips * audio_hops * n_fft) — ~7 GB at 3300 clips — so
    # production-scale corpora score in <=_SWEEP_CLIP_CHUNK-clip chunks
    # (padded to one width so the program compiles once)
    CHUNK = _SWEEP_CLIP_CHUNK
    parts = []
    for c0 in range(0, n, CHUNK):
        sub = slice(c0, min(c0 + CHUNK, n))
        width = sub.stop - sub.start
        pad = (CHUNK - width) % CHUNK if n > CHUNK else 0
        sub_idx = np.pad(idx[sub], (0, pad))
        sub_rows = np.pad(row_mat[:, sub], ((0, 0), (0, pad)))
        out = np.asarray(
            score_sweep(bank, det_params,
                        jnp.asarray(sub_idx), jnp.asarray(sub_rows))
        )
        parts.append(out[:, :width])
    scored = np.concatenate(parts, axis=1)
    aligned, shifted_rows = scored[0], scored[1:]
    results = {}
    all_scores, all_labels = [aligned], [np.ones(n)]
    for s, shifted in zip(mags, shifted_rows):
        labels = np.concatenate([np.ones(n), np.zeros(n)])
        scores = np.concatenate([aligned, shifted])
        results[str(s)] = float(
            auroc(jnp.asarray(labels, jnp.float32), jnp.asarray(scores))
        )
        all_scores.append(shifted)
        all_labels.append(np.zeros(n))
    overall = float(
        auroc(
            jnp.asarray(np.concatenate(all_labels), jnp.float32),
            jnp.asarray(np.concatenate(all_scores)),
        )
    )
    out = {"auroc_by_shift": results, "overall_auroc": overall, "num_clips": n}
    print(json.dumps(out, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=2)
    return 0


# ---------------------------------------------------------------------------
# misalign-demo
# ---------------------------------------------------------------------------

def cmd_misalign_demo(args) -> int:
    import jax
    import jax.numpy as jnp

    from avsync.compat import load_detector_pth
    from avsync.data import GridDataSource, discover_speakers
    from avsync.data.video import (
        decode_video_gray,
        get_video_fps,
        load_audio_for_video,
    )
    from avsync.demo import export_demo
    from avsync.features import build_feature_bank, gather_features
    from avsync.models import MisalignmentDetector, make_lipnet
    from avsync.ops.audio import resample_host

    cfg = _config_from_args(args)
    det_params, meta = load_detector_pth(
        args.detector_checkpoint, conv_shape=_conv_shape(cfg),
        n_audio_feats=2 * cfg.audio.n_mfcc,
    )
    hidden = int(meta.get("hidden_dim", cfg.detector.hidden_dim))
    det_model = MisalignmentDetector(hidden_dim=hidden)
    det_params = jax.tree.map(jnp.asarray, det_params)
    # self-configure from the checkpoint (`misalignment_detection_demo.py:311-315`)
    saved = meta.get("config", {})
    audio_cfg = AudioConfig(
        sample_rate=int(saved.get("sample_rate", cfg.audio.sample_rate)),
        n_mfcc=int(saved.get("n_mfcc", cfg.audio.n_mfcc)),
    )
    cfg = cfg.replace(audio=audio_cfg)

    lip_model = make_lipnet(cfg.model)
    lip_params = _load_lipnet_params(args.checkpoint, lip_model, cfg)

    speakers = args.speakers or discover_speakers(cfg.data.data_path)
    src = GridDataSource(cfg.data.data_path, speakers)
    rng = random.Random(args.seed)
    os.makedirs(args.output_dir, exist_ok=True)

    score = jax.jit(
        lambda p, f: jax.nn.sigmoid(det_model.apply({"params": p}, f))
    )
    for speaker in speakers:
        # All three GRID layouts root a speaker's files under
        # <data_path>/<speaker>/ — match on that prefix (a bare substring
        # check misses flat/videos-in-root layouts).
        prefix = os.path.join(cfg.data.data_path, speaker) + os.sep
        vids = [s.video_path for s in src.samples if s.video_path.startswith(prefix)]
        if not vids:
            continue
        try:
            video_path = rng.choice(vids)
            shift = rng.randint(args.min_shift, args.max_shift)
            if rng.random() < 0.5:
                shift = -shift
            bank = _build_bank(cfg, src, lip_model, lip_params, [video_path])
            feats = gather_features(
                bank, jnp.asarray([0, 0]), jnp.asarray([0, shift]), cfg.audio
            )
            s_aligned, s_mis = (float(x) for x in score(det_params, feats))
            frames = decode_video_gray(video_path)
            a, sr = load_audio_for_video(video_path, cfg.audio.sample_rate)
            if sr != cfg.audio.sample_rate:
                a = resample_host(a, sr, cfg.audio.sample_rate)
            out_dir = os.path.join(args.output_dir, speaker)
            p1, p2 = export_demo(
                frames, a, cfg.audio.sample_rate,
                get_video_fps(video_path), shift, s_aligned, s_mis,
                out_dir, scale=args.scale,
            )
            print(
                f"{speaker}: {os.path.basename(video_path)} shift={shift:+d} "
                f"aligned={s_aligned:.3f} misaligned={s_mis:.3f} -> {p1}, {p2}"
            )
        except Exception as e:  # per-speaker resilience (`..._demo.py:355-358`)
            print(f"{speaker}: demo generation failed: {e}")
    return 0


# ---------------------------------------------------------------------------
# argparse wiring
# ---------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="avsync", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--data_path", type=str, default="./data")
        sp.add_argument("--speakers", nargs="*", default=None)
        sp.add_argument("--seed", type=int, default=42)
        sp.add_argument("--config", type=str, default=None,
                        help="AvsyncConfig JSON file (geometry/model/mesh)")
        sp.add_argument("--model_family", choices=["pytorch", "tf"],
                        default=None,
                        help="model stack: pytorch (Conv3D+BiGRU, default) "
                             "or tf (Conv3D+BiLSTM, 140x46 standardized)")
        sp.add_argument("--roi_mode",
                        choices=["heuristic", "detector", "variance", "model"],
                        default=None,
                        help="mouth ROI: fixed fractions / host cascade / "
                             "on-device variance / learned localizer. "
                             "'model' weights are trained on the synthetic "
                             "mouth distribution (scripts/train_localizer"
                             ".py); per-clip predictions that capture below-"
                             "average temporal motion fall back to the "
                             "heuristic crop")
        sp.add_argument("--roi_host", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="run ROI crop+resize on the HOST and ship "
                             "uint8 crops over the host->device link (16x "
                             "fewer bytes than full frames); for thin-link "
                             "deployments — same program as the device "
                             "path, CPU backend")
        sp.add_argument("--distributed", action="store_true",
                        help="join a multi-controller (multi-host pod) run: "
                             "calls jax.distributed.initialize() before any "
                             "backend use (cluster env autodetected — TPU "
                             "pod metadata / SLURM). Run the SAME command "
                             "on every host; the mesh then spans all hosts' "
                             "devices (avsync.parallel.multihost)")
        perf(sp)

    def perf(sp):
        # on every subcommand: the backend-tuned defaults
        # (_tuned_perf_defaults: bf16+pack4 on accelerators) apply to eval
        # and inference too, so the opt-out must exist everywhere for
        # "explicit flags always win" to hold
        sp.add_argument("--compute_dtype", choices=["float32", "bfloat16"],
                        default=None,
                        help="conv/GRU matmul dtype (params stay f32). "
                             "Default: bfloat16 on TPU, float32 on CPU — "
                             "the bench-tuned TPU config (bench.py)")
        sp.add_argument("--packed_conv", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="pack the 2x2 pool window into conv output "
                             "channels where geometry allows (fills the "
                             "MXU's 128 lanes, 4x smaller pre-pool HBM "
                             "footprint; exact same math). Default: on for "
                             "TPU, off for CPU")
        sp.add_argument("--remat", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="rematerialize the forward in backward (more "
                             "FLOPs, O(1) activation memory). Default off — "
                             "measured slower at the tuned batch size")

    t = sub.add_parser("train", help="LipNet CTC training")
    common(t)
    t.add_argument("--batch_size", type=int, default=None)
    t.add_argument("--epochs", type=int, default=None)
    t.add_argument("--lr", type=float, default=None)
    t.add_argument("--checkpoint_dir", type=str, default="./checkpoints")
    t.add_argument("--quick_test", action="store_true")
    t.add_argument("--export_pth", type=str, default=None,
                   help="also write a reference-format .pth")
    t.add_argument("--show_examples", action="store_true",
                   help="decode a few samples each epoch (ProduceExample)")
    t.add_argument("--lr_schedule", choices=["none", "keras"], default="none",
                   help="'keras' = flat->halving->exp decay (train.py:611-618)")
    t.add_argument("--early_stopping", type=int, default=None,
                   help="patience in epochs; restores best weights")
    t.add_argument("--resume", type=str, default=None,
                   help="Orbax checkpoint dir to resume training from "
                        "(restores params+optimizer+step), or 'auto' to "
                        "pick up from --checkpoint_dir when it has "
                        "snapshots (preemption relaunch loops; --epochs "
                        "then counts as a TOTAL budget across relaunches)")
    t.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of the FIRST epoch "
                        "into this directory (TensorBoard profile plugin)")
    t.add_argument("--log_dir", type=str, default=None,
                   help="log directory (default 'logs', or the --config value)")
    t.add_argument("--checkpoint_every", type=int, default=None,
                   help="epochs between periodic checkpoints (default 10)")
    t.add_argument("--tensorboard", action="store_true", default=None,
                   help="write TensorBoard event files (train/ + validation/ "
                        "under --log_dir; no TF dependency)")
    t.add_argument("--device_cache", choices=["auto", "on", "off"],
                   default=None,
                   help="pin the preprocessed corpus in device memory from "
                        "epoch 2 on (pure on-device batches); 'auto' "
                        "(default) does so when it fits the budget")
    t.set_defaults(fn=cmd_train)

    te = sub.add_parser("test", help="evaluate CER/WER on the test split")
    common(te)
    te.add_argument("--checkpoint", type=str, required=True,
                    help=".pth file or Orbax checkpoint dir")
    te.add_argument("--batch_size", type=int, default=None)
    te.add_argument("--output", type=str, default=None)
    te.add_argument("--quantize", choices=["int8"], default=None,
                    help="serve the conv stack in int8 "
                         "(avsync/ops/quant.py; calibrated on the first "
                         "eval batch; both model families). NOTE: measured "
                         "SLOWER than the default bf16+pack4 path on v5e "
                         "(XLA's s8 conv lowering — PERF.md); for "
                         "int8-mandated deployments, not a speed knob")
    te.add_argument("--beam", type=int, default=0,
                    help="CTC beam width (0 = greedy, the reference decode)")
    te.set_defaults(fn=cmd_test)

    i = sub.add_parser("infer", help="single-video inference")
    i.add_argument("video", type=str)
    i.add_argument("--checkpoint", type=str, required=True)
    i.add_argument("--data_path", type=str, default="./data")
    i.add_argument("--seed", type=int, default=42)
    i.add_argument("--config", type=str, default=None)
    i.add_argument("--model_family", choices=["pytorch", "tf"], default=None)
    i.add_argument("--beam", type=int, default=0)
    i.add_argument("--quantize", choices=["int8"], default=None,
                   help="int8 conv stack, calibrated on this clip")
    perf(i)
    i.set_defaults(fn=cmd_infer)

    q = sub.add_parser("quantize",
                       help="export int8 calibration scales for serving")
    common(q)
    q.add_argument("--checkpoint", type=str, required=True,
                   help=".pth file or Orbax checkpoint dir")
    q.add_argument("--out", type=str, default="qscales.npz",
                   help="output .npz (input_scales + provenance)")
    q.add_argument("--n_calib", type=int, default=16,
                   help="clips to calibrate on (absmax is monotone in "
                        "clips; a few representative ones suffice)")
    q.add_argument("--batch_size", type=int, default=None)
    q.set_defaults(fn=cmd_quantize)

    ex = sub.add_parser("export",
                        help="AOT StableHLO serving artifact (preprocess + "
                             "forward + CTC decode, weights baked in)")
    common(ex)
    ex.add_argument("--checkpoint", type=str, required=True,
                    help=".pth file or Orbax checkpoint dir")
    ex.add_argument("--out", type=str, default="lipnet_serving.npz",
                    help="output artifact (.npz: module + metadata)")
    ex.add_argument("--frame_geometry", type=str, default=None,
                    help="HxW of client frames; default = the model's "
                         "native geometry (pre-cropped clips). Any other "
                         "geometry bakes the on-device ROI program in")
    ex.add_argument("--platforms", type=str, default="tpu,cpu",
                    help="comma-separated lowering targets")
    ex.add_argument("--detector_checkpoint", type=str, default=None,
                    help="export the fused sync-scoring pipeline (this "
                         "detector + --checkpoint LipNet) instead of the "
                         "transcriber")
    ex.add_argument("--shifts_per_request", type=int, default=1,
                    help="K of the sync-scorer artifact (static per "
                         "module, like live serving's per-K programs)")
    ex.add_argument("--batch_sizes", type=str, default=None,
                    help="comma-separated static batch buckets (e.g. "
                         "'1,2,4,8'): one fully static module per size "
                         "instead of a symbolic batch dim — each bucket "
                         "compiles with complete shape knowledge at load "
                         "time (closes the symbolic-dim warm-throughput "
                         "penalty, PERF.md)")
    ex.set_defaults(fn=cmd_export)

    sv = sub.add_parser("serve",
                        help="HTTP serving daemon with dynamic batching")
    common(sv)
    sv.add_argument("--checkpoint", type=str, default=None,
                    help="LipNet .pth file or Orbax checkpoint dir")
    sv.add_argument("--detector_checkpoint", type=str, default=None,
                    help="also serve /v1/sync_score from this detector")
    sv.add_argument("--artifact", action="append", default=None,
                    help="serve from an `avsync export` StableHLO artifact "
                         "instead of a checkpoint (repeat for transcriber "
                         "+ sync_scorer); no model code or checkpoint "
                         "needed at startup")
    sv.add_argument("--host", type=str, default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8777)
    sv.add_argument("--max_batch", type=int, default=8,
                    help="dynamic batching: max rows per device dispatch")
    sv.add_argument("--max_wait_ms", type=float, default=10.0,
                    help="dynamic batching: max extra latency a lone "
                         "request pays waiting for batchmates")
    sv.add_argument("--max_body_mb", type=int, default=256,
                    help="reject request bodies larger than this (413) "
                         "before reading them — one oversized upload "
                         "must not OOM the daemon")
    sv.add_argument("--dp", type=int, default=1,
                    help="data-parallel serving over N devices (0 = all): "
                         "params replicate once, each batch shards its "
                         "rows over the mesh's data axis")
    sv.add_argument("--quantize", choices=["int8"], default=None,
                    help="int8 conv stack (see `avsync quantize`)")
    sv.add_argument("--qscales", type=str, default=None,
                    help="calibration scales .npz from `avsync quantize`; "
                         "without it, int8 calibrates lazily on the first "
                         "request")
    sv.add_argument("--warmup", action="store_true",
                    help="compile every batch bucket before binding the "
                         "port — the first real request pays steady-state "
                         "latency instead of the cold XLA compile")
    sv.add_argument("--transport", choices=["raw", "f32"], default="raw",
                    help="'raw' ships uint8 frames and preprocesses per "
                         "batch on device (4-12x less host<->device "
                         "traffic); 'f32' preprocesses per request")
    sv.set_defaults(fn=cmd_serve)

    m = sub.add_parser("misalign-train", help="train the misalignment detector")
    common(m)
    m.add_argument("--checkpoint", type=str, default="lipnet_final.pth")
    m.add_argument("--detector_checkpoint", type=str,
                   default="misalignment_detector.pth")
    m.add_argument("--batch_size", type=int, default=None)
    m.add_argument("--epochs", type=int, default=None)
    m.add_argument("--lr", type=float, default=None)
    m.add_argument("--weight_decay", type=float, default=None)
    m.add_argument("--hidden_dim", type=int, default=None)
    m.add_argument("--max_samples", type=int, default=None)
    m.add_argument("--max_shift_frames", type=int, default=None)
    m.add_argument("--num_negatives", type=int, default=None)
    m.add_argument("--sample_rate", type=int, default=None)
    m.add_argument("--n_mfcc", type=int, default=None)
    m.add_argument("--log_dir", type=str, default="logs")
    m.add_argument("--verbose", action="store_true")
    m.add_argument("--save_every", type=int, default=5)
    m.add_argument("--bank_cache", type=str, default=None,
                   help="directory for persisted FeatureBanks (keyed by "
                        "corpus+checkpoint fingerprints); repeat runs over "
                        "an unchanged corpus skip feature extraction")
    m.set_defaults(fn=cmd_misalign_train)

    e = sub.add_parser("misalign-eval",
                       help="sliding-shift AUROC sweep over a corpus")
    common(e)
    e.add_argument("--checkpoint", type=str, default="lipnet_final.pth")
    e.add_argument("--detector_checkpoint", type=str,
                   default="misalignment_detector.pth")
    e.add_argument("--min_shift", type=int, default=5)
    e.add_argument("--max_shift", type=int, default=20)
    e.add_argument("--max_samples", type=int, default=None)
    e.add_argument("--output", type=str, default=None)
    e.add_argument("--bank_cache", type=str, default=None,
                   help="directory for persisted FeatureBanks (see "
                        "misalign-train --bank_cache)")
    e.set_defaults(fn=cmd_misalign_eval)

    d = sub.add_parser("misalign-demo", help="export annotated demo videos")
    common(d)
    d.add_argument("--checkpoint", type=str, default="lipnet_final.pth")
    d.add_argument("--detector_checkpoint", type=str,
                   default="misalignment_detector.pth")
    d.add_argument("--output_dir", type=str, default="demo_output")
    d.add_argument("--min_shift", type=int, default=5)
    d.add_argument("--max_shift", type=int, default=20)
    d.add_argument("--scale", type=int, default=1)
    d.set_defaults(fn=cmd_misalign_demo)
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    if getattr(args, "distributed", False):
        if args.command != "train":
            print(
                "ERROR: --distributed supports the 'train' subcommand only "
                "— the misalignment pipeline, eval and serving are "
                "single-controller by design (see "
                "avsync/parallel/multihost.py scope note)",
                file=sys.stderr,
            )
            return 2
        # must precede any JAX backend use (including the compile cache,
        # which touches the backend to name its directory)
        from avsync.parallel.multihost import initialize

        idx = initialize()
        print(f"multi-controller: process {idx}", flush=True)
    # Persist compiled XLA executables across CLI invocations: at small
    # corpus scale compilation IS the wall-clock (see utils/compile_cache.py)
    from avsync.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
