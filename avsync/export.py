"""Ahead-of-time serving export: one self-contained StableHLO artifact.

The reference's deployment story is "import torch/TF and call the model
from Python" (`predict.py:17-105`, `train.py:998-1075`). The TPU-native
story is ahead-of-time: `avsync export` serializes the ENTIRE serving
computation — device preprocess (uint8 -> f32 [-> on-device ROI crop] ->
normalize), the LipNet forward, and the fused CTC greedy decode — as one
StableHLO module via `jax.export`, with:

  * weights baked in as constants (no checkpoint at load time),
  * a SYMBOLIC batch dimension (one artifact serves every batch size with
    no per-bucket recompiles on the loader side beyond XLA's own cache),
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


def _save_npz(path: str, exported, meta: dict) -> None:
    # np.savez with a path STRING silently appends '.npz' when the suffix
    # is missing, so the written file would not match the path the CLI
    # reports; an open file object writes exactly `path`.
    blob = np.frombuffer(exported.serialize(), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, module=blob, meta=json.dumps(meta))


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
) -> "ExportedTranscriber":
    """Build the AOT transcription artifact (in memory; see `save`).

    frame_geometry: (H, W) of the CLIENT's frames. Defaults to the model's
    native (img_height, img_width) = pre-cropped mouth clips; any other
    geometry bakes the on-device ROI program in front of the model, so the
    artifact consumes raw full frames. ROI modes that need host-side work
    ('detector', the OpenCV cascade) cannot be exported — the exported
    module must be a single device program.
    """
    import jax
    from jax import export as jexport

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

    b = jexport.symbolic_shape("b")[0]
    spec = jax.ShapeDtypeStruct((b, T, H, W), np.uint8)
    exported = jexport.export(jax.jit(serve), platforms=list(platforms))(
        spec
    )
    meta = {
        "format": _FORMAT,
        "kind": "transcriber",
        "family": cfg.model.family,
        "frame_shape": [T, H, W],
        "input_dtype": "uint8",
        "roi": ("embedded:" + d.roi_mode) if native else "none (pre-cropped)",
        "platforms": list(platforms),
        "outputs": ["decoded_ids (b, T) int32", "lengths (b,) int32",
                    "log_probs (b, T, V)"],
        "jax_version": jax.__version__,
        "config": cfg.to_dict(),
        **_vocab_meta(cfg),
    }
    return ExportedTranscriber(exported, meta)


class ExportedTranscriber:
    """A (de)serialized AOT transcription artifact.

    `call` executes the module (any batch size — the batch dim is
    symbolic); `transcribe` adds the host-side id->text join using the
    embedded vocabulary, independent of avsync's text module.
    """

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta
        self._id_to_char = {
            int(k): v for k, v in meta["id_to_char"].items()
        }

    def save(self, path: str) -> None:
        _save_npz(path, self._exported, self.meta)

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
        ids, lengths, log_probs = self._exported.call(
            self.prepare_rows(frames)
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
) -> "ExportedSyncScorer":
    """AOT artifact for the misalignment pipeline: ONE module computing
    preprocess -> frozen conv visual stats -> fused shift->MFCC->stats ->
    detector head, both checkpoints baked in.

    num_shifts (K) is static per artifact (the fused program is per-K in
    live serving too — `SyncScoreService.warmup`); batch stays symbolic.
    """
    import jax
    from jax import export as jexport

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

    b = jexport.symbolic_shape("b")[0]
    K = int(num_shifts)
    specs = (
        jax.ShapeDtypeStruct((b, T, H, W), np.uint8),
        jax.ShapeDtypeStruct((b, S), np.float32),
        jax.ShapeDtypeStruct((b,), np.int32),
        jax.ShapeDtypeStruct((b,), np.float32),
        jax.ShapeDtypeStruct((b, K), np.int32),
    )
    exported = jexport.export(jax.jit(serve), platforms=list(platforms))(
        *specs
    )
    meta = {
        "format": _FORMAT,
        "kind": "sync_scorer",
        "family": cfg.model.family,
        "frame_shape": [T, H, W],
        "max_audio_samples": S,
        "num_shifts": K,
        "input_dtype": "uint8 frames, f32 audio",
        "roi": ("embedded:" + d.roi_mode) if native else "none (pre-cropped)",
        "platforms": list(platforms),
        "outputs": ["sync_probs (b, K) f32"],
        "jax_version": jax.__version__,
        "config": cfg.to_dict(),
    }
    return ExportedSyncScorer(exported, meta)


class ExportedSyncScorer:
    """A (de)serialized AOT sync-scoring artifact."""

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = meta

    def save(self, path: str) -> None:
        _save_npz(path, self._exported, self.meta)

    def call(self, frames, audio, audio_len, fps, shifts):
        """Batched raw call; all arrays batch-first, shapes as in meta."""
        out = self._exported.call(
            np.ascontiguousarray(_as_uint8_frames(frames)),
            np.ascontiguousarray(audio, np.float32),
            np.asarray(audio_len, np.int32),
            np.asarray(fps, np.float32),
            np.asarray(shifts, np.int32),
        )
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
    ExportedSyncScorer per the embedded metadata."""
    from jax import export as jexport

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta.get("format") != _FORMAT:
            raise ValueError(
                f"not an avsync export artifact: format={meta.get('format')!r}"
            )
        exported = jexport.deserialize(z["module"].tobytes())
    if meta.get("kind", "transcriber") == "sync_scorer":
        return ExportedSyncScorer(exported, meta)
    return ExportedTranscriber(exported, meta)
