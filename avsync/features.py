"""Batched audio-visual feature extraction for the misalignment detector.

The reference extracts features one video at a time through Python-level
caches (`misalignment_detection_train.py:147-208`): frozen-LipNet conv
embeddings -> (mean, std) over time (13824 dims, shift-INVARIANT — the stats
pool over the whole clip, `:165`), plus MFCC (mean, std) of the possibly
shifted audio (40 dims). Only the audio half changes between positive and
negative samples, and only via the zeros `shift_audio` writes in — behavior
preserved here for parity.

TPU-native design: a `FeatureBank` precomputes per-video visual stats and
audio buffers as device arrays in one batched jitted pass; training then
gathers (video_idx, shift) pairs fully on device — no per-item host work, no
Python cache.
"""

from __future__ import annotations

import zipfile
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from avsync.config import AudioConfig, AvsyncConfig
from avsync.models import LipNet
from avsync.ops import audio as audiolib


def visual_stats_fn(model: LipNet):
    """Returns jittable fn: (params, clips (B,T,H,W,1)) -> (B, 2*conv_dim).

    concat(mean, unbiased std) over time of the frozen conv features —
    `misalignment_detection_train.py:157-165` (torch .std(dim=0) is the
    N-1 estimator)."""

    def fn(params, clips):
        emb = model.apply({"params": params}, clips, method=LipNet.conv_features)
        mean = jnp.mean(emb, axis=1)
        T = emb.shape[1]
        var = jnp.sum((emb - mean[:, None, :]) ** 2, axis=1) / jnp.maximum(
            T - 1, 1
        )
        return jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)

    return fn


class FeatureBank(NamedTuple):
    """Precomputed per-video device arrays. The assembled feature width is
    visual.shape[1] + 2 * n_mfcc (13864 at reference geometry,
    `misalignment_detection_train.py:409`)."""

    visual: jax.Array  # (N, 2*conv_dim)
    audio: jax.Array  # (N, max_audio_samples) zero-padded
    audio_lengths: jax.Array  # (N,)
    fps: jax.Array  # (N,)


# jitted visual-stats extractors, one per LipNet geometry: a fresh
# jax.jit(closure) per bank build would retrace/recompile on every call
# (misalign-train builds three banks — train/val/test), while the memoized
# fn compiles once per process and hits the persistent cache across
# processes (flax modules are frozen dataclasses, hashable by field values)
_VFN_CACHE: dict = {}


def _jitted_visual_stats(model: LipNet):
    fn = _VFN_CACHE.get(model)
    if fn is None:
        fn = _VFN_CACHE[model] = jax.jit(visual_stats_fn(model))
    return fn


def build_feature_bank(
    model: LipNet,
    params,
    clips_iter,
    audio_list: Sequence[np.ndarray],
    fps_list: Sequence[float],
    cfg: AvsyncConfig,
) -> FeatureBank:
    """Precompute the bank.

    clips_iter: iterable of (B, T, H, W, 1) preprocessed video batches whose
    concatenation covers all N videos in order (e.g. LipNetBatcher.epoch with
    shuffle=False). audio_list/fps_list: per-video mono 16 kHz audio + fps.
    """
    vfn = _jitted_visual_stats(model)
    vis_parts = []
    for batch in clips_iter:
        clips = batch["video"] if isinstance(batch, dict) else batch
        vis_parts.append(np.asarray(vfn(params, clips)))
    visual = np.concatenate(vis_parts, axis=0)

    S = cfg.audio.max_audio_samples
    N = len(audio_list)
    buf = np.zeros((N, S), np.float32)
    lengths = np.zeros((N,), np.int32)
    for i, a in enumerate(audio_list):
        a = np.asarray(a, np.float32)[:S]
        buf[i, : len(a)] = a
        lengths[i] = len(a)
    visual = visual[:N]
    return FeatureBank(
        visual=jnp.asarray(visual),
        audio=jnp.asarray(buf),
        audio_lengths=jnp.asarray(lengths),
        fps=jnp.asarray(np.asarray(fps_list, np.float32)),
    )


def save_feature_bank(path: str, bank: FeatureBank, key: str) -> None:
    """Persist a bank to .npz (crash-safe rename) with its validity key.

    The key fingerprints everything the bank depends on (video paths, the
    frozen-LipNet checkpoint stat, audio config, geometry) — see
    cli._bank_cache_path. Stale keys simply miss on load."""
    import os
    import tempfile

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(
                f,
                key=np.asarray(key),
                visual=np.asarray(bank.visual),
                audio=np.asarray(bank.audio),
                audio_lengths=np.asarray(bank.audio_lengths),
                fps=np.asarray(bank.fps),
            )
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_feature_bank(path: str, key: str) -> "FeatureBank | None":
    """Load a saved bank if present and its key matches; else None."""
    import os

    if not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            if str(z["key"]) != key:
                return None
            return FeatureBank(
                visual=jnp.asarray(z["visual"]),
                audio=jnp.asarray(z["audio"]),
                audio_lengths=jnp.asarray(z["audio_lengths"]),
                fps=jnp.asarray(z["fps"]),
            )
    except (OSError, ValueError, KeyError,
            zipfile.BadZipFile):  # corrupt/partial file
        return None


def gather_features(
    bank: FeatureBank,
    video_idx: jax.Array,
    shift_frames: jax.Array,
    audio_cfg: AudioConfig,
) -> jax.Array:
    """(video_idx, shift) pairs -> (M, 2*conv_dim + 2*n_mfcc) features, fully
    on device — the batched replacement for `build_feature`
    (`misalignment_detection_train.py:199-208`)."""
    vis = bank.visual[video_idx]
    aud = bank.audio[video_idx]
    lens = bank.audio_lengths[video_idx]
    fps = bank.fps[video_idx]
    astats = audiolib.shifted_audio_stats(aud, lens, shift_frames, fps, audio_cfg)
    return jnp.concatenate([vis, astats], axis=-1)


def sample_shift_labels(
    n_videos: int,
    max_shift_frames: int,
    num_negatives: int,
    rng: np.random.Generator,
    shuffle: bool = True,
):
    """Shift-contrastive sampling plan for one epoch
    (`misalignment_detection_train.py:218-234`): every video once with shift 0
    (label 1) and `num_negatives` times with shift ±uniform{1..max} (label 0).

    Returns (video_idx, shift_frames, labels) numpy arrays of length
    n_videos * (1 + num_negatives).
    """
    reps = 1 + num_negatives
    video_idx = np.repeat(np.arange(n_videos), reps)
    shifts = np.zeros(n_videos * reps, np.int32)
    labels = np.zeros(n_videos * reps, np.float32)
    labels[::reps] = 1.0
    neg_mask = labels == 0.0
    n_neg = int(neg_mask.sum())
    mag = rng.integers(1, max(1, max_shift_frames) + 1, size=n_neg)
    sign = rng.choice([-1, 1], size=n_neg)
    shifts[neg_mask] = (mag * sign).astype(np.int32)
    if shuffle:
        order = rng.permutation(len(video_idx))
        video_idx, shifts, labels = video_idx[order], shifts[order], labels[order]
    return video_idx.astype(np.int32), shifts, labels
