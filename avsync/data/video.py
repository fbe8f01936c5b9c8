"""Host-side media decode: video frames (cv2 / npy / C++ ingest) and WAV audio.

The reference decodes per frame inside DataLoader workers
(`dataset.py:201-236`) and converts/crops/resizes on host. Here the host only
decodes to raw grayscale uint8 frames — crop/resize/normalize run on device
(avsync.ops.image). uint8 transfer is 4x smaller than f32 over PCIe, which
verification showed is the dominant cost of shipping raw frames.

When the C++ libav ingest extension (avsync/ingest) is built, it replaces the
cv2 decode path transparently; cv2 remains the fallback.
"""

from __future__ import annotations

import os
import wave
from typing import Optional, Tuple

import numpy as np


def _cv2():
    import cv2

    return cv2


def decode_video_gray(
    video_path: str, max_frames: Optional[int] = None
) -> np.ndarray:
    """Decode a video file to (T, H, W) uint8 grayscale frames.

    npy files follow the reference's preprocessed-data convention
    (`dataset.py:186-198`): already mouth-cropped clips, values in [0,1] or
    [0,255]; returned as uint8 0..255 (the device pipeline re-normalizes).
    """
    if video_path.endswith(".npy"):
        frames = np.load(video_path)
        if frames.dtype != np.uint8:
            if frames.size and frames.max() <= 1.0:
                frames = frames * 255.0
            frames = np.clip(frames, 0, 255).astype(np.uint8)
        if max_frames is not None:
            frames = frames[:max_frames]
        return frames

    # Prefer the C++ ingest stage when available.
    try:
        from avsync.ingest import native

        if native.available():
            return native.decode_video_gray(video_path, max_frames)
    except ImportError:
        pass

    cv2 = _cv2()
    cap = cv2.VideoCapture(video_path)
    frames = []
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        if frame.ndim == 3:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        frames.append(frame)
        if max_frames is not None and len(frames) >= max_frames:
            break
    cap.release()
    if not frames:
        return np.zeros((0, 0, 0), np.uint8)
    return np.stack(frames)


def get_video_fps(video_path: str, fallback: float = 25.0) -> float:
    """FPS probe with fallback (`misalignment_detection_train.py:91-97`)."""
    if video_path.endswith(".npy"):
        return fallback
    try:
        from avsync.ingest import native

        if native.available():
            fps = native.get_fps(video_path)
            return fps if fps and fps > 1e-3 else fallback
    except ImportError:
        pass
    cv2 = _cv2()
    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS)
    cap.release()
    return fps if fps and fps > 1e-3 else fallback


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Pure-stdlib WAV reader -> (mono float32 in [-1,1], sample_rate).

    Covers PCM 8/16/32-bit and float32 WAVs; the audio-from-video path for
    .mpg goes through the C++ libav ingest (librosa/moviepy are not
    available in this environment — `misalignment_detection_train.py:170-197`
    used them as decode fallbacks, which the ingest stage replaces).
    """
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        # Could be int32 PCM or float32; wave module doesn't expose the
        # format tag, so sniff: float32 PCM magnitude stays <= ~1.
        as_f = np.frombuffer(raw, dtype="<f4")
        if np.all(np.isfinite(as_f)) and (np.abs(as_f).max(initial=0.0) <= 64.0):
            data = as_f.astype(np.float32)
        else:
            data = (
                np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
            )
    elif width == 1:
        data = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width} in {path}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return data, sr


def save_wav(path: str, data: np.ndarray, sr: int) -> None:
    """PCM16 WAV writer (for synthetic fixtures and demo export)."""
    pcm = np.clip(np.asarray(data, np.float32), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm16.tobytes())


def load_audio_for_video(
    video_path: str, fallback_sr: int = 16000
) -> Tuple[np.ndarray, int]:
    """Audio track for a video sample.

    Resolution order (mirrors the reference's librosa->moviepy chain,
    `misalignment_detection_train.py:170-197`, adapted to this stack):
      1. sibling .wav with the same basename (synthetic corpus / offline dump)
      2. C++ libav ingest extension (decodes the container's audio stream)
      3. silence at fallback_sr (with a warning) — keeps demos runnable.
    """
    base = os.path.splitext(video_path)[0]
    wav_path = base + ".wav"
    if os.path.exists(wav_path):
        return load_wav(wav_path)
    if not video_path.endswith(".npy"):  # .npy carries no audio stream
        try:
            from avsync.ingest import native

            if native.available():
                return native.decode_audio(video_path)
        except ImportError:
            pass
        except RuntimeError:
            pass  # undecodable container -> fall through to silence
    import warnings

    warnings.warn(
        f"no audio source for {video_path} (no sibling .wav, no native ingest); "
        "returning silence"
    )
    return np.zeros(0, np.float32), fallback_sr
