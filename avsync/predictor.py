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
    (heuristic fallback, same rule as the training pipeline) otherwise."""
    if cfg.data.roi_mode != "model":
        return None
    try:
        from avsync.models.localizer import load_bundled_params

        return load_bundled_params()
    except FileNotFoundError:
        import warnings

        warnings.warn(
            "localizer weight bundle missing; roi_mode='model' falls back "
            "to the heuristic crop"
        )
        return None


def load_mouth_detector(cfg: AvsyncConfig):
    """Host cascade detector when cfg asks for roi_mode='detector'; None
    otherwise. Serving classes construct it once, like the pipeline."""
    if cfg.data.roi_mode != "detector":
        return None
    from avsync.data.mouth import MouthDetector

    return MouthDetector()


def prepare_clip(
    frames: np.ndarray, cfg: AvsyncConfig, localizer_params=None,
    mouth_detector=None,
) -> jax.Array:
    """(T, H, W) uint8/float -> (1, max_len, h, w, 1) model input: the SAME
    ROI program the training pipeline runs (make_roi_crop_fn — heuristic /
    variance / learned localizer per cfg.data.roi_mode, or host cascade
    boxes + device crop for roi_mode='detector') for native-size frames,
    plain /255 for preprocessed ones. Pass localizer_params /
    mouth_detector (see load_localizer_params / load_mouth_detector);
    serving classes load them once at construction."""
    from avsync.data.pipeline import make_roi_crop_fn

    d = cfg.data
    x = jnp.asarray(frames, jnp.float32)[None]
    if frames.shape[1:] == (d.img_height, d.img_width):
        clips = (x * (1.0 / 255.0))[..., None]
    elif d.roi_mode == "detector" and mouth_detector is not None:
        # host cascade boxes + device crop, the pipeline's detector path
        boxes = jnp.asarray(mouth_detector.detect_clip(frames))[None]
        clips = (imglib.crop_resize_boxes(
            x, boxes, (d.img_height, d.img_width)
        ) * (1.0 / 255.0))[..., None]
    else:
        clips = make_roi_crop_fn(d, d.roi_mode, localizer_params)(x)
    clips, _ = imglib.pad_or_truncate_time(clips, d.max_video_length)
    if d.standardize_clips:
        # AFTER padding, matching the training pipeline (decode pads to
        # max_video_length before preprocess, so the per-clip mean/std
        # include the zero padding — `train.py:266-273` semantics)
        clips = imglib.standardize_clips(clips)
    return clips


class LipReader:
    """Greedy-CTC lipreading from a trained LipNet checkpoint."""

    def __init__(self, checkpoint: str, config: Optional[AvsyncConfig] = None):
        self.cfg = config or AvsyncConfig()
        self.model = make_lipnet(self.cfg.model)
        self.params = _load_params(checkpoint, self.cfg)
        self._loc_params = load_localizer_params(self.cfg)
        self._mouth = load_mouth_detector(self.cfg)
        self._fwd = jax.jit(
            lambda p, v: self.model.apply({"params": p}, v)
        )
        self._decode = (
            textlib.tf_decode_batch
            if self.cfg.model.family == "tf"
            else textlib.decode_batch
        )

    def predict_frames(self, frames: np.ndarray) -> str:
        log_probs = self._fwd(
            self.params,
            prepare_clip(frames, self.cfg, self._loc_params, self._mouth),
        )
        return self._decode(log_probs)[0]

    def predict(self, video_path: str) -> str:
        from avsync.data.video import decode_video_gray

        frames = decode_video_gray(
            video_path, max_frames=self.cfg.data.max_video_length
        )
        if frames.size == 0:
            raise ValueError(f"no frames decoded from {video_path}")
        return self.predict_frames(frames)

    def predict_batch(self, video_paths: Sequence[str]) -> List[str]:
        """Batched serving path: decode all clips on host, one jitted
        forward + batched greedy decode on device (compiled once per batch
        size/geometry)."""
        from avsync.data.video import decode_video_gray

        clips = []
        for p in video_paths:
            frames = decode_video_gray(
                p, max_frames=self.cfg.data.max_video_length
            )
            if frames.size == 0:
                raise ValueError(f"no frames decoded from {p}")
            clips.append(
                prepare_clip(frames, self.cfg, self._loc_params, self._mouth)
            )
        log_probs = self._fwd(self.params, jnp.concatenate(clips, axis=0))
        return self._decode(log_probs)


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
        self._score = jax.jit(
            lambda p, f: jax.nn.sigmoid(self.detector.apply({"params": p}, f))
        )

    def score_arrays(
        self,
        frames: np.ndarray,
        audio: np.ndarray,
        fps: float,
        shifts: Sequence[int] = (0,),
    ) -> np.ndarray:
        """(T,H,W) frames + mono 16 kHz audio -> sync probs per shift."""
        from avsync.features import build_feature_bank, gather_features

        clips = prepare_clip(
            frames, self.cfg, self._loc_params, self._mouth
        )
        bank = build_feature_bank(
            self.lipnet, self.lip_params, [clips], [audio], [fps], self.cfg
        )
        n = len(shifts)
        feats = gather_features(
            bank,
            jnp.zeros(n, jnp.int32),
            jnp.asarray(np.asarray(shifts, np.int32)),
            self.cfg.audio,
        )
        return np.asarray(self._score(self.det_params, feats))

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
