"""Serving API: load a checkpoint once, predict many times.

The reference's inference surfaces are scripts (`predict.py`,
`train.py --mode inference`, `misalignment_detection_demo.py`) that rebuild
everything per run. These classes are the library equivalent: construct once
(params on device, steps jitted), then call per clip/batch.

  * `LipReader` — video file/array -> transcript (greedy CTC).
  * `MisalignmentScorer` — (video, shift) -> sync probability, the demo's
    scoring core (`misalignment_detection_demo.py:241-250`).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from avsync import text as textlib
from avsync.config import AvsyncConfig
from avsync.models import LipNet, MisalignmentDetector, make_lipnet
from avsync.ops import image as imglib


def _load_params(checkpoint: str, cfg: AvsyncConfig):
    from avsync.cli import _load_lipnet_params

    return _load_lipnet_params(checkpoint, None, cfg)


def load_localizer_params(cfg: AvsyncConfig):
    """Bundled localizer weights when cfg asks for the learned ROI; None
    (heuristic fallback — the policy lives in ONE place,
    models.localizer.load_bundled_params_or_none, shared with the training
    pipeline) otherwise."""
    if cfg.data.roi_mode != "model":
        return None
    from avsync.models.localizer import load_bundled_params_or_none

    return load_bundled_params_or_none()


def load_mouth_detector(cfg: AvsyncConfig):
    """Host cascade detector when cfg asks for roi_mode='detector'; None
    otherwise. Serving classes construct it once, like the pipeline."""
    if cfg.data.roi_mode != "detector":
        return None
    from avsync.data.mouth import MouthDetector

    return MouthDetector()


def pad_frames(frames: np.ndarray, cfg: AvsyncConfig) -> np.ndarray:
    """Host pad/truncate (T, H, W) raw frames to max_video_length,
    PRESERVING dtype (uint8 in, uint8 out — the cast to f32 happens on
    device so the host->device payload stays 4x smaller). Padding before
    the ROI program matches training's _decode_clip order; see
    prepare_clip's docstring."""
    d = cfg.data
    frames = np.asarray(frames)
    T = frames.shape[0]
    if T >= d.max_video_length:
        return frames[: d.max_video_length]
    return np.concatenate(
        [frames,
         np.zeros((d.max_video_length - T,) + frames.shape[1:],
                  frames.dtype)],
        axis=0,
    )


def detect_boxes_host(frames: np.ndarray, mouth_detector) -> np.ndarray:
    """Host cascade mouth boxes for ONE padded clip -> (1, T, 4) f32.
    The cascade requires 8-bit input (training always decodes uint8)."""
    return mouth_detector.detect_clip(
        np.ascontiguousarray(np.clip(frames, 0, 255)).astype(np.uint8)
    )[None].astype(np.float32)


def get_preprocess_fn(
    cfg: AvsyncConfig, frame_shape, has_boxes: bool,
    localizer_params=None, _cache=None,
):
    """Batch-first jitted preprocess: (B, T, H, W) uint8/f32 [+ (B, T, 4)
    boxes] -> (B, T, h, w, 1) f32 model input. ONE builder shared by
    prepare_clip (B=1) and the serving raw-transport batch path so the
    two can never drift. frame_shape is (T, H, W); the returned fn casts
    to f32 on device, so callers should ship native-dtype (uint8) arrays.
    """
    from avsync.data.pipeline import make_roi_crop_fn

    d = cfg.data
    target = (d.img_height, d.img_width)
    native = tuple(frame_shape[1:]) != target
    key = (tuple(frame_shape), native, has_boxes)
    fn = None if _cache is None else _cache.get(key)
    if fn is not None:
        return fn
    if not native:
        def run(x):
            out = (x.astype(jnp.float32) * (1.0 / 255.0))[..., None]
            return (imglib.standardize_clips(out)
                    if d.standardize_clips else out)
    elif has_boxes:
        def run(x, b):
            out = (imglib.crop_resize_boxes(x.astype(jnp.float32), b, target)
                   * (1.0 / 255.0))[..., None]
            return (imglib.standardize_clips(out)
                    if d.standardize_clips else out)
    else:
        lp = localizer_params
        if d.roi_mode == "model" and lp is None:
            lp = load_localizer_params(cfg)
        roi = make_roi_crop_fn(d, d.roi_mode, lp)

        def run(x):
            out = roi(x)
            return (imglib.standardize_clips(out)
                    if d.standardize_clips else out)
    fn = jax.jit(run)
    if _cache is not None:
        _cache[key] = fn
    return fn


def prepare_clip(
    frames: np.ndarray, cfg: AvsyncConfig, localizer_params=None,
    mouth_detector=None, _cache=None,
) -> jax.Array:
    """(T, H, W) uint8/float -> (1, max_len, h, w, 1) model input — the SAME
    preprocess the training pipeline runs, in the same order:

      1. pad/truncate the RAW frames to max_video_length (training's
         _decode_clip pads before _preprocess, so ROI box statistics —
         variance heatmaps, localizer pooling, per-clip standardize —
         include the zero tail; computing boxes on unpadded frames diverged
         by up to 0.86 on [0,1] pixels at T=5, caught in review);
      2. ROI program per cfg.data.roi_mode (make_roi_crop_fn, or host
         cascade boxes + device crop for 'detector') for native-size
         frames, plain /255 for already-cropped ones;
      3. per-clip standardize when the config asks (TF family).

    localizer_params / mouth_detector are loaded on demand when the mode
    needs them and the caller passed None; serving classes preload them
    once and pass their per-instance `_cache` dict so the whole chain
    compiles once per frame geometry (the pipeline's _preproc_cache
    discipline)."""
    d = cfg.data
    frames = pad_frames(frames, cfg)
    target = (d.img_height, d.img_width)
    native = frames.shape[1:] != target
    boxes = None
    if native and d.roi_mode == "detector":
        if mouth_detector is None:
            mouth_detector = load_mouth_detector(cfg)
        boxes = detect_boxes_host(frames, mouth_detector)

    fn = get_preprocess_fn(
        cfg, frames.shape, boxes is not None, localizer_params, _cache
    )
    x = jnp.asarray(frames)[None]
    if boxes is not None:
        return fn(x, jnp.asarray(boxes))
    return fn(x)


class LipReader:
    """Greedy-CTC lipreading from a trained LipNet checkpoint.

    `quantize='int8'` runs the conv stack (99% of the forward FLOPs,
    PERF.md) in int8 on the MXU (s8xs8->s32 is 2x the bf16 rate on v5e)
    with static activation scales — see avsync/ops/quant.py. Calibration
    sources, in precedence order:
      1. `calibration_scales`: per-layer input scales from a prior
         `avsync quantize` export (an .npz path or the (n_layers,) array) —
         deployment needs no calibration data at load time;
      2. `calibration_frames`: a few representative (T, H, W) clips;
      3. lazy — the first clip predicted (fine in practice since inputs are
         normalized frames, but representative clips are better).
    Both families quantize — their conv blocks share the Conv3D+ReLU+Pool
    shape; GRU/LSTM/dense layers stay float. Greedy decode is unchanged.

    `mesh` (a `jax.sharding.Mesh` from `avsync.parallel.make_mesh`) turns
    on data-parallel serving: params replicate across the mesh once at
    load, each batch shards its rows over the 'data' axis, and XLA runs
    the forward on every chip with no collectives on the hot path (the
    only cross-chip op is the result gather). Rows pad up to a multiple
    of the data-axis size; numerics are identical to single-chip serving
    (tested on the virtual 8-device mesh).
    """

    def __init__(
        self,
        checkpoint: str,
        config: Optional[AvsyncConfig] = None,
        quantize: Optional[str] = None,
        calibration_frames: Optional[Sequence[np.ndarray]] = None,
        calibration_scales: Optional[object] = None,
        mesh=None,
    ):
        self.cfg = config or AvsyncConfig()
        self.model = make_lipnet(self.cfg.model)
        self.params = _load_params(checkpoint, self.cfg)
        self.mesh = mesh
        self._n_data = 1
        if mesh is not None:
            from avsync.parallel import mesh as meshlib

            self._n_data = mesh.shape["data"]
            # replicate params across the mesh ONCE at load — per-request
            # transfers would swamp the forward
            self.params = jax.device_put(
                self.params, meshlib.replicated(mesh)
            )
        self._loc_params = load_localizer_params(self.cfg)
        self._mouth = load_mouth_detector(self.cfg)
        self._prep_cache: dict = {}  # jitted preprocess per frame geometry
        if quantize not in (None, "int8"):
            raise ValueError(f"unsupported quantize mode: {quantize!r}")
        self._quantize = quantize
        self._qparams = None
        # set (briefly) by TranscribeService.warmup: warmup's dummy frames
        # must never become the persistent int8 calibration set
        self._warming = False
        self._fwd = jax.jit(
            lambda p, v: self.model.apply({"params": p}, v)
        )
        if quantize == "int8":
            from avsync.ops.quant import make_int8_forward

            self._qfwd = make_int8_forward(self.model, self.cfg.model)
            if calibration_scales is not None:
                scales = calibration_scales
                if isinstance(scales, str):
                    with np.load(scales) as z:
                        zfam = str(z["family"]) if "family" in z else None
                        if zfam is not None and zfam != self.cfg.model.family:
                            raise ValueError(
                                f"calibration scales exported for family "
                                f"{zfam!r}, model is {self.cfg.model.family!r}"
                            )
                        scales = z["input_scales"]
                from avsync.ops.quant import quantize_lipnet

                self._qparams = self._replicate(quantize_lipnet(
                    self.params, [], input_scales=np.asarray(scales)
                ))
            elif calibration_frames:
                self._build_qparams(
                    [self._prepare(f) for f in calibration_frames]
                )
        self._decode = (
            textlib.tf_decode_batch
            if self.cfg.model.family == "tf"
            else textlib.decode_batch
        )

    def _prepare(self, frames: np.ndarray) -> jax.Array:
        return prepare_clip(frames, self.cfg, self._loc_params, self._mouth,
                            _cache=self._prep_cache)

    def prepare_raw(self, frames: np.ndarray):
        """Host half of the serving raw transport: (T, H, W) frames ->
        (frames_u8 (1, T, H, W)[, boxes (1, T, 4)]) payload tuple, dtype
        preserved (uint8 stays uint8 — 4x less host->device traffic than
        the f32 row `_prepare` produces). Device half is
        `preprocess_device`; together they compute EXACTLY `_prepare`
        (same get_preprocess_fn program), just batched and transfer-lean.
        """
        frames = pad_frames(frames, self.cfg)
        d = self.cfg.data
        native = frames.shape[1:] != (d.img_height, d.img_width)
        if native and d.roi_mode == "detector":
            return (frames[None], detect_boxes_host(frames, self._mouth))
        return (frames[None],)

    def preprocess_device(self, frames, boxes=None) -> jax.Array:
        """Device half of the raw transport: (B, T, H, W) raw frames
        [+ (B, T, 4) boxes] -> (B, T, h, w, 1) model input, one jitted
        program per frame geometry (cached in _prep_cache alongside
        prepare_clip's — they are the same programs)."""
        frames = jnp.asarray(frames)
        fn = get_preprocess_fn(
            self.cfg, frames.shape[1:], boxes is not None,
            self._loc_params, self._prep_cache,
        )
        if boxes is not None:
            return fn(frames, jnp.asarray(boxes))
        return fn(frames)

    def _build_qparams(self, batches) -> None:
        from avsync.ops.quant import quantize_lipnet

        self._qparams = self._replicate(quantize_lipnet(self.params, batches))

    def _replicate(self, tree):
        if self.mesh is None:
            return tree
        from avsync.parallel import mesh as meshlib

        return jax.device_put(tree, meshlib.replicated(self.mesh))

    def _shard_rows(self, clips: jax.Array):
        """Pad rows to a multiple of the data-axis size, shard over 'data'."""
        if self.mesh is None:
            return clips, clips.shape[0]
        from avsync.parallel import mesh as meshlib

        B = clips.shape[0]
        pad = -B % self._n_data
        if pad:
            clips = jnp.concatenate(
                [clips, jnp.zeros((pad,) + clips.shape[1:], clips.dtype)],
                axis=0,
            )
        return meshlib.shard_batch(self.mesh, clips), B

    def _logprobs(self, clips: jax.Array) -> jax.Array:
        clips, B = self._shard_rows(clips)
        if self._quantize is None:
            return self._fwd(self.params, clips)[:B]
        if self._qparams is None:  # lazy calibration on the first input
            if self._warming:
                # compile-only pass: scales are runtime inputs to the jitted
                # _qfwd (not baked constants), so throwaway qparams from the
                # dummy batch compile the bucket WITHOUT persisting — dummy
                # all-zero frames would otherwise calibrate every layer to
                # the degenerate absmax-0 fallback (scale 1.0 -> real [0,1]
                # inputs round to 0/1) and silently garble all later traffic
                from avsync.ops.quant import quantize_lipnet

                qp = self._replicate(quantize_lipnet(self.params, [clips]))
                return self._qfwd(qp, clips)[:B]
            self._build_qparams([clips])
        return self._qfwd(self._qparams, clips)[:B]

    def predict_frames(self, frames: np.ndarray) -> str:
        return self._decode(self._logprobs(self._prepare(frames)))[0]

    def predict(self, video_path: str) -> str:
        from avsync.data.video import decode_video_gray

        frames = decode_video_gray(
            video_path, max_frames=self.cfg.data.max_video_length
        )
        if frames.size == 0:
            raise ValueError(f"no frames decoded from {video_path}")
        return self.predict_frames(frames)

    def predict_batch(self, video_paths: Sequence[str]) -> List[str]:
        """Batched serving path: decode all clips on host, ONE uint8
        upload + batched device preprocess + one jitted forward + batched
        greedy decode (compiled once per batch size/geometry). Clips with
        mismatched geometries fall back to per-clip preprocess."""
        from avsync.data.video import decode_video_gray

        rows = []
        for p in video_paths:
            frames = decode_video_gray(
                p, max_frames=self.cfg.data.max_video_length
            )
            if frames.size == 0:
                raise ValueError(f"no frames decoded from {p}")
            rows.append((frames, self.prepare_raw(frames)))
        keys = {tuple((p.shape, str(p.dtype)) for p in r) for _, r in rows}
        if len(keys) == 1:
            stacked = tuple(
                np.concatenate([r[j] for _, r in rows], axis=0)
                for j in range(len(rows[0][1]))
            )
            clips = self.preprocess_device(*stacked)
        else:
            clips = jnp.concatenate(
                [self._prepare(f) for f, _ in rows], axis=0
            )
        return self._decode(self._logprobs(clips))


class MisalignmentScorer:
    """Audio-visual sync probability for (clip, shift) pairs."""

    def __init__(
        self,
        detector_checkpoint: str,
        lipnet_checkpoint: str,
        config: Optional[AvsyncConfig] = None,
    ):
        from avsync.cli import _conv_shape
        from avsync.compat import load_detector_pth

        self.cfg = config or AvsyncConfig()
        det_params, meta = load_detector_pth(
            detector_checkpoint,
            conv_shape=_conv_shape(self.cfg),
            n_audio_feats=2 * self.cfg.audio.n_mfcc,
        )
        hidden = int(meta.get("hidden_dim", self.cfg.detector.hidden_dim))
        self.detector = MisalignmentDetector(hidden_dim=hidden)
        self.det_params = jax.tree.map(jnp.asarray, det_params)
        self.lipnet = make_lipnet(self.cfg.model)
        self.lip_params = _load_params(lipnet_checkpoint, self.cfg)
        self._loc_params = load_localizer_params(self.cfg)
        self._mouth = load_mouth_detector(self.cfg)
        self._prep_cache: dict = {}  # jitted preprocess per frame geometry
        self._score = jax.jit(
            lambda p, f: jax.nn.sigmoid(self.detector.apply({"params": p}, f))
        )

        from avsync.features import visual_stats_fn
        from avsync.ops.audio import shifted_audio_stats

        vfn = visual_stats_fn(self.lipnet)
        acfg = self.cfg.audio
        detector = self.detector

        def score_batch(det_params, lip_params, clips, audio, lens, fps,
                        shifts):
            """ONE device program for B requests x K shifts each: conv
            visual stats + fused shift->MFCC->stats + detector forward —
            the serving replacement for the per-request FeatureBank
            round trip (visual features never visit the host)."""
            vis = vfn(lip_params, clips)  # (B, 2*conv_dim)
            B, K = shifts.shape
            vis_r = jnp.repeat(vis, K, axis=0)
            aud_r = jnp.repeat(audio, K, axis=0)
            lens_r = jnp.repeat(lens, K)
            fps_r = jnp.repeat(fps, K)
            astats = shifted_audio_stats(
                aud_r, lens_r, shifts.reshape(-1), fps_r, acfg
            )
            feats = jnp.concatenate([vis_r, astats], axis=-1)
            logits = detector.apply({"params": det_params}, feats)
            return jax.nn.sigmoid(logits).reshape(B, K)

        self._score_batch = jax.jit(score_batch)

    def prepare_raw(self, frames: np.ndarray, audio: np.ndarray, fps: float,
                    shifts: Sequence[int] = (0,)):
        """Host half of batched sync scoring: one request -> payload tuple
        (frames_u8 (1,T,H,W)[, boxes (1,T,4)], audio (1,S) f32,
        audio_len (1,) i32, fps (1,) f32, shifts (1,K) i32). Frames keep
        native dtype (uint8) — the cast + ROI run per batch on device,
        same transfer discipline as LipReader.prepare_raw."""
        frames = pad_frames(frames, self.cfg)
        d = self.cfg.data
        native = frames.shape[1:] != (d.img_height, d.img_width)
        head = ((frames[None], detect_boxes_host(frames, self._mouth))
                if native and d.roi_mode == "detector" else (frames[None],))
        S = self.cfg.audio.max_audio_samples
        a = np.asarray(audio, np.float32)[:S]
        buf = np.zeros((1, S), np.float32)
        buf[0, : len(a)] = a
        return head + (
            buf,
            np.array([len(a)], np.int32),
            np.array([fps], np.float32),
            np.asarray(shifts, np.int32)[None],
        )

    def score_payload_batch(self, payload) -> List[np.ndarray]:
        """Device half: stacked payload (B rows) -> list of (K,) sync-prob
        arrays, one per row, in ONE jitted program (per B-bucket/K/geometry).
        """
        has_boxes = len(payload) == 6
        frames = jnp.asarray(payload[0])
        boxes = jnp.asarray(payload[1]) if has_boxes else None
        audio, lens, fps, shifts = (jnp.asarray(p) for p in payload[-4:])
        fn = get_preprocess_fn(
            self.cfg, frames.shape[1:], has_boxes,
            self._loc_params, self._prep_cache,
        )
        clips = fn(frames, boxes) if has_boxes else fn(frames)
        probs = np.asarray(self._score_batch(
            self.det_params, self.lip_params, clips, audio, lens, fps, shifts
        ))
        return list(probs)

    def score_arrays(
        self,
        frames: np.ndarray,
        audio: np.ndarray,
        fps: float,
        shifts: Sequence[int] = (0,),
    ) -> np.ndarray:
        """(T,H,W) frames + mono 16 kHz audio -> sync probs per shift."""
        payload = self.prepare_raw(frames, audio, fps, shifts)
        return self.score_payload_batch(payload)[0]

    def score(self, video_path: str, shift_frames: int = 0) -> float:
        from avsync.data.video import (
            decode_video_gray,
            get_video_fps,
            load_audio_for_video,
        )
        from avsync.ops.audio import resample_host

        frames = decode_video_gray(
            video_path, max_frames=self.cfg.data.max_video_length
        )
        audio, sr = load_audio_for_video(video_path, self.cfg.audio.sample_rate)
        if sr != self.cfg.audio.sample_rate:
            audio = resample_host(audio, sr, self.cfg.audio.sample_rate)
        fps = get_video_fps(video_path, self.cfg.detector.default_fps)
        return float(
            self.score_arrays(frames, audio, fps, shifts=(shift_frames,))[0]
        )
