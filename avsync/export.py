"""Ahead-of-time serving export: one self-contained StableHLO artifact.

The reference's deployment story is "import torch/TF and call the model
from Python" (`predict.py:17-105`, `train.py:998-1075`). The TPU-native
story is ahead-of-time: `avsync export` serializes the ENTIRE serving
computation — device preprocess (uint8 -> f32 [-> on-device ROI crop] ->
normalize), the LipNet forward, and the fused CTC greedy decode — as one
StableHLO module via `jax.export`, with:

  * weights baked in as constants (no checkpoint at load time),
  * a SYMBOLIC batch dimension (one artifact serves every batch size with
    no per-bucket recompiles on the loader side beyond XLA's own cache) —
    or, with `batch_sizes=`, one fully STATIC module per serving bucket in
    the same artifact, which compiles each bucket with complete shape
    knowledge and closes the symbolic-dim warm-throughput penalty
    (PERF.md "AOT artifact serving"),
  * multi-platform lowering (tpu + cpu by default), so the same bytes run
    on a v5e serving pod and on a CPU canary.

The artifact is an .npz: the serialized module plus a JSON metadata record
(family, vocabulary, blank id, frame geometry, the full AvsyncConfig).
Loading needs jax (for `jax.export.deserialize`) but NOT the avsync model
code — `load_exported` is a convenience wrapper that also restores the
id->text mapping from the metadata.

Exported signature:  frames (b, T, H, W) uint8  ->
    (decoded_ids (b, T') int32, lengths (b,) int32, log_probs (b, T', V))
where T' is the model's time length after the conv stack (== T here) and
ids map to characters via the embedded `id_to_char` table.

`export_sync_scorer` does the same for the flagship misalignment
pipeline: preprocess + frozen conv visual stats + fused
shift->MFCC->stats + detector head in one module,
    (frames (b,T,H,W) u8, audio (b,S) f32, audio_len (b,) i32,
     fps (b,) f32, shifts (b,K) i32) -> sync_probs (b,K) f32
with K (shifts per request) static per artifact and b symbolic.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence, Tuple

import numpy as np

from avsync.config import AvsyncConfig

_FORMAT = "avsync-stablehlo-v1"


def _as_uint8_frames(frames: np.ndarray) -> np.ndarray:
    """Validate raw-frame input instead of silently astype-truncating.

    The exported modules take RAW uint8 frames (0..255) — the same contract
    as the live serving path's uint8 branch. A float array here is almost
    always a caller mistake ([0,1]-normalized frames would floor to all-0
    black under a bare astype), so floats and out-of-range ints raise
    rather than silently diverging from `LipReader.predict_frames`.
    """
    frames = np.asarray(frames)
    if frames.dtype == np.uint8:
        return frames
    if np.issubdtype(frames.dtype, np.floating):
        raise ValueError(
            "exported artifacts take raw uint8 frames (0..255); got "
            f"{frames.dtype}. Pass the undecoded pixels (the live path's "
            "float branch is not part of the AOT module)."
        )
    if frames.size and (frames.min() < 0 or frames.max() > 255):
        raise ValueError(
            f"integer frames out of uint8 range [{frames.min()}, "
            f"{frames.max()}] — expected raw 0..255 pixels"
        )
    return frames.astype(np.uint8)


def _save_npz(path: str, modules: dict, meta: dict) -> None:
    # np.savez with a path STRING silently appends '.npz' when the suffix
    # is missing, so the written file would not match the path the CLI
    # reports; an open file object writes exactly `path`.
    # modules: {None: exported} (symbolic batch) or {b: exported} (one
    # static-shape module per batch bucket; see `batch_sizes=`).
    arrays = {}
    for b, exported in modules.items():
        key = "module" if b is None else f"module_b{int(b)}"
        arrays[key] = np.frombuffer(exported.serialize(), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, meta=json.dumps(meta), **arrays)


def _export_batched(serve, specs_of_batch, platforms, batch_sizes):
    """Export `serve` once per mode: {None: symbolic-b module} when
    batch_sizes is None, else one fully-static module per bucket.

    Static buckets exist because a symbolic leading dim constrains XLA's
    tiling/fusion choices when the StableHLO is compiled at load time, and
    the serving daemon pads to power-of-two buckets anyway — N static
    signatures cost nothing at runtime and let each bucket compile as if it
    had been jitted natively (VERDICT r4 Weak #1 / Next #3)."""
    import jax
    from jax import export as jexport

    if batch_sizes is None:
        b = jexport.symbolic_shape("b")[0]
        return {None: jexport.export(
            jax.jit(serve), platforms=list(platforms)
        )(*specs_of_batch(b))}
    sizes = sorted({int(b) for b in batch_sizes})
    if not sizes or sizes[0] < 1:
        raise ValueError(f"batch_sizes must be positive ints, got "
                         f"{batch_sizes!r}")
    return {
        b: jexport.export(jax.jit(serve), platforms=list(platforms))(
            *specs_of_batch(b)
        )
        for b in sizes
    }


class _BucketCaller:
    """Shared batch->module dispatch for both artifact kinds.

    Symbolic artifacts run any batch size through the one module; static
    artifacts pick the smallest bucket >= B, zero-pad the rows, and slice
    the outputs back to B."""

    def _init_modules(self, modules: dict) -> None:
        self._modules = dict(modules)
        self._buckets = sorted(k for k in modules if k is not None)

    @property
    def batch_sizes(self):
        """Static bucket sizes, or None for a symbolic-batch artifact."""
        return list(self._buckets) if self._buckets else None

    def _dispatch(self, args: tuple) -> tuple:
        B = args[0].shape[0]
        if None in self._modules:
            out = self._modules[None].call(*args)
            return out if isinstance(out, tuple) else (out,)
        bucket = next((b for b in self._buckets if b >= B), None)
        if bucket is None:
            raise ValueError(
                f"batch of {B} exceeds the largest exported bucket "
                f"{self._buckets[-1]}; re-export with larger batch_sizes "
                f"or split the batch"
            )
        if bucket > B:
            args = tuple(
                np.concatenate(
                    [a, np.zeros((bucket - B,) + a.shape[1:], a.dtype)],
                    axis=0,
                )
                for a in args
            )
        out = self._modules[bucket].call(*args)
        out = out if isinstance(out, tuple) else (out,)
        return tuple(np.asarray(o)[:B] for o in out)


def _vocab_meta(cfg: AvsyncConfig) -> dict:
    from avsync import text as textlib

    if cfg.model.family == "tf":
        return {
            "blank_id": textlib.TF_BLANK_ID,
            "id_to_char": {
                str(i): c for i, c in textlib.TF_IDX_TO_CHAR.items()
            },
        }
    return {
        "blank_id": textlib.BLANK_ID,
        "id_to_char": {
            str(i): c
            for i, c in textlib.IDX_TO_CHAR.items()
            if len(c) == 1  # skip <blank>/<pad> sentinels
        },
    }


def export_transcriber(
    checkpoint: str,
    cfg: Optional[AvsyncConfig] = None,
    frame_geometry: Optional[Tuple[int, int]] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
    batch_sizes: Optional[Sequence[int]] = None,
) -> "ExportedTranscriber":
    """Build the AOT transcription artifact (in memory; see `save`).

    frame_geometry: (H, W) of the CLIENT's frames. Defaults to the model's
    native (img_height, img_width) = pre-cropped mouth clips; any other
    geometry bakes the on-device ROI program in front of the model, so the
    artifact consumes raw full frames. ROI modes that need host-side work
    ('detector', the OpenCV cascade) cannot be exported — the exported
    module must be a single device program.

    batch_sizes: None (default) exports ONE module with a symbolic batch
    dim; a sequence (e.g. the serving buckets 1,2,4,8) exports one fully
    STATIC module per size in the same artifact — each bucket then compiles
    with full static-shape knowledge at load time, closing the
    symbolic-dim tiling penalty (PERF.md "AOT artifact serving").
    `call` transparently pads to the smallest covering bucket.
    """
    import jax

    from avsync import text as textlib
    from avsync.models import make_lipnet
    from avsync.predictor import (
        _load_params,
        get_preprocess_fn,
        load_localizer_params,
    )

    cfg = cfg or AvsyncConfig()
    d = cfg.data
    H, W = frame_geometry or (d.img_height, d.img_width)
    native = (H, W) != (d.img_height, d.img_width)
    if native and d.roi_mode == "detector":
        raise ValueError(
            "roi_mode='detector' runs a host-side cascade; export supports "
            "the on-device ROI modes ('model', 'variance', heuristic) or "
            "pre-cropped native-geometry frames"
        )
    model = make_lipnet(cfg.model)
    params = _load_params(checkpoint, cfg)
    loc = load_localizer_params(cfg) if native else None
    T = d.max_video_length
    prep = get_preprocess_fn(cfg, (T, H, W), has_boxes=False,
                             localizer_params=loc)
    blank_id = (textlib.TF_BLANK_ID if cfg.model.family == "tf"
                else textlib.BLANK_ID)

    def serve(frames):
        clips = prep(frames)
        log_probs = model.apply({"params": params}, clips)
        ids, lengths = textlib.ctc_greedy_decode(log_probs, blank_id)
        return ids, lengths, log_probs

    modules = _export_batched(
        serve,
        lambda b: (jax.ShapeDtypeStruct((b, T, H, W), np.uint8),),
        platforms, batch_sizes,
    )
    meta = {
        "format": _FORMAT,
        "kind": "transcriber",
        "family": cfg.model.family,
        "frame_shape": [T, H, W],
        "input_dtype": "uint8",
        "batch_sizes": (None if batch_sizes is None
                        else sorted({int(b) for b in batch_sizes})),
        "roi": ("embedded:" + d.roi_mode) if native else "none (pre-cropped)",
        "platforms": list(platforms),
        "outputs": ["decoded_ids (b, T) int32", "lengths (b,) int32",
                    "log_probs (b, T, V)"],
        "jax_version": jax.__version__,
        "config": cfg.to_dict(),
        **_vocab_meta(cfg),
    }
    return ExportedTranscriber(modules, meta)


class ExportedTranscriber(_BucketCaller):
    """A (de)serialized AOT transcription artifact.

    `call` executes the module (any batch size — either through the
    symbolic-batch module or padded to the smallest static bucket);
    `transcribe` adds the host-side id->text join using the embedded
    vocabulary, independent of avsync's text module.
    """

    def __init__(self, modules, meta: dict):
        self._init_modules(modules)
        self.meta = meta
        self._id_to_char = {
            int(k): v for k, v in meta["id_to_char"].items()
        }

    def save(self, path: str) -> None:
        _save_npz(path, self._modules, self.meta)

    def prepare_rows(self, frames: np.ndarray) -> np.ndarray:
        """Validate + shape raw frames into module-ready (B, T, H, W)
        uint8 rows: (T', H, W) auto-batches, short clips zero-pad on T
        (same as predictor.pad_frames), long clips truncate. Host-side
        only — rows from separate calls can be concatenated into one
        batched `call` (the dynamic-batching serving path)."""
        frames = _as_uint8_frames(frames)
        if frames.ndim == 3:
            frames = frames[None]
        if frames.ndim != 4:
            raise ValueError(
                f"expected (T, H, W) or (B, T, H, W) frames, got shape "
                f"{frames.shape}"
            )
        T, H, W = self.meta["frame_shape"]
        if frames.shape[2:] != (H, W):
            raise ValueError(
                f"artifact expects {H}x{W} frames, got "
                f"{frames.shape[2]}x{frames.shape[3]} — re-export with "
                f"frame_geometry=({frames.shape[2]}, {frames.shape[3]})"
            )
        if frames.shape[1] < T:
            pad = np.zeros(
                (frames.shape[0], T - frames.shape[1], H, W), frames.dtype
            )
            frames = np.concatenate([frames, pad], axis=1)
        return frames[:, :T]

    def call(self, frames: np.ndarray):
        """frames (B, T, H, W) uint8 (or (T, H, W), auto-batched; short
        clips zero-padded on T) -> (ids, lengths, log_probs) np arrays."""
        ids, lengths, log_probs = self._dispatch(
            (self.prepare_rows(frames),)
        )
        return (np.asarray(ids), np.asarray(lengths),
                np.asarray(log_probs))

    def transcribe(self, frames: np.ndarray):
        ids, lengths, _ = self.call(frames)
        return [
            "".join(
                self._id_to_char.get(int(i), "")
                for i in ids[r, : int(lengths[r])]
            )
            for r in range(ids.shape[0])
        ]


def export_sync_scorer(
    detector_checkpoint: str,
    lipnet_checkpoint: str,
    cfg: Optional[AvsyncConfig] = None,
    num_shifts: int = 1,
    frame_geometry: Optional[Tuple[int, int]] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
    batch_sizes: Optional[Sequence[int]] = None,
) -> "ExportedSyncScorer":
    """AOT artifact for the misalignment pipeline: ONE module computing
    preprocess -> frozen conv visual stats -> fused shift->MFCC->stats ->
    detector head, both checkpoints baked in.

    num_shifts (K) is static per artifact (the fused program is per-K in
    live serving too — `SyncScoreService.warmup`); batch is symbolic by
    default or one static module per entry of `batch_sizes` (see
    `export_transcriber`).
    """
    import jax

    from avsync.predictor import MisalignmentScorer, get_preprocess_fn

    cfg_in = cfg or AvsyncConfig()
    scorer = MisalignmentScorer(detector_checkpoint, lipnet_checkpoint,
                                cfg_in)
    cfg = scorer.cfg
    d = cfg.data
    H, W = frame_geometry or (d.img_height, d.img_width)
    native = (H, W) != (d.img_height, d.img_width)
    if native and d.roi_mode == "detector":
        raise ValueError(
            "roi_mode='detector' runs a host-side cascade; export supports "
            "the on-device ROI modes or pre-cropped native-geometry frames"
        )
    T = d.max_video_length
    S = cfg.audio.max_audio_samples
    prep = get_preprocess_fn(cfg, (T, H, W), has_boxes=False,
                             localizer_params=scorer._loc_params)
    det_params, lip_params = scorer.det_params, scorer.lip_params
    score_batch = scorer._score_batch

    def serve(frames, audio, audio_len, fps, shifts):
        clips = prep(frames)
        return score_batch(det_params, lip_params, clips, audio,
                           audio_len, fps, shifts)

    K = int(num_shifts)

    def specs_of(b):
        return (
            jax.ShapeDtypeStruct((b, T, H, W), np.uint8),
            jax.ShapeDtypeStruct((b, S), np.float32),
            jax.ShapeDtypeStruct((b,), np.int32),
            jax.ShapeDtypeStruct((b,), np.float32),
            jax.ShapeDtypeStruct((b, K), np.int32),
        )

    modules = _export_batched(serve, specs_of, platforms, batch_sizes)
    meta = {
        "format": _FORMAT,
        "kind": "sync_scorer",
        "family": cfg.model.family,
        "frame_shape": [T, H, W],
        "max_audio_samples": S,
        "num_shifts": K,
        "input_dtype": "uint8 frames, f32 audio",
        "batch_sizes": (None if batch_sizes is None
                        else sorted({int(b) for b in batch_sizes})),
        "roi": ("embedded:" + d.roi_mode) if native else "none (pre-cropped)",
        "platforms": list(platforms),
        "outputs": ["sync_probs (b, K) f32"],
        "jax_version": jax.__version__,
        "config": cfg.to_dict(),
    }
    return ExportedSyncScorer(modules, meta)


class ExportedSyncScorer(_BucketCaller):
    """A (de)serialized AOT sync-scoring artifact."""

    def __init__(self, modules, meta: dict):
        self._init_modules(modules)
        self.meta = meta

    def save(self, path: str) -> None:
        _save_npz(path, self._modules, self.meta)

    def call(self, frames, audio, audio_len, fps, shifts):
        """Batched raw call; all arrays batch-first, shapes as in meta."""
        (out,) = self._dispatch((
            np.ascontiguousarray(_as_uint8_frames(frames)),
            np.ascontiguousarray(audio, np.float32),
            np.asarray(audio_len, np.int32),
            np.asarray(fps, np.float32),
            np.asarray(shifts, np.int32),
        ))
        return np.asarray(out)

    def prepare_row(self, frames: np.ndarray, audio: np.ndarray,
                    fps: float, shifts: Sequence[int]) -> tuple:
        """One clip -> the module-ready b=1 payload row tuple
        (frames u8, audio f32, audio_len i32, fps f32, shifts i32), all
        batch-first. Host-side padding only — rows concatenate into one
        batched `call` (the dynamic-batching serving path)."""
        T, H, W = self.meta["frame_shape"]
        S = self.meta["max_audio_samples"]
        shifts = np.asarray(shifts, np.int32)
        if shifts.shape != (self.meta["num_shifts"],):
            raise ValueError(
                f"artifact was exported for {self.meta['num_shifts']} "
                f"shifts per request, got {shifts.shape}"
            )
        frames = _as_uint8_frames(frames)
        if frames.shape[1:] != (H, W):
            raise ValueError(
                f"artifact expects {H}x{W} frames, got {frames.shape[1:]}"
            )
        fbuf = np.zeros((1, T, H, W), np.uint8)
        fbuf[0, : min(len(frames), T)] = frames[:T]
        a = np.asarray(audio, np.float32)[:S]
        abuf = np.zeros((1, S), np.float32)
        abuf[0, : len(a)] = a
        return (fbuf, abuf, np.array([len(a)], np.int32),
                np.array([fps], np.float32), shifts[None])

    def score_arrays(self, frames: np.ndarray, audio: np.ndarray,
                     fps: float, shifts: Sequence[int]) -> np.ndarray:
        """One clip -> (K,) sync probabilities — the exported counterpart
        of `MisalignmentScorer.score_arrays` (same host-side padding)."""
        return self.call(*self.prepare_row(frames, audio, fps, shifts))[0]


def load_exported(path: str):
    """Load either artifact kind; returns ExportedTranscriber or
    ExportedSyncScorer per the embedded metadata. Handles both layouts:
    one symbolic-batch module ('module') or per-bucket static modules
    ('module_b1', 'module_b2', ...)."""
    from jax import export as jexport

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta.get("format") != _FORMAT:
            raise ValueError(
                f"not an avsync export artifact: format={meta.get('format')!r}"
            )
        modules = {}
        for key in z.files:
            if key == "module":
                modules[None] = jexport.deserialize(z[key].tobytes())
            elif key.startswith("module_b"):
                modules[int(key[len("module_b"):])] = jexport.deserialize(
                    z[key].tobytes()
                )
        if not modules:
            raise ValueError(f"{path} carries no serialized modules")
    if meta.get("kind", "transcriber") == "sync_scorer":
        return ExportedSyncScorer(modules, meta)
    return ExportedTranscriber(modules, meta)
