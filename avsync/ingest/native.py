"""ctypes wrapper for the C++ libav ingest library (ingest.cpp).

Auto-builds `libavsingest.so` with the bundled Makefile on first use when a
toolchain is present; callers degrade to the cv2 path when unavailable
(avsync.data.video routes through `available()`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libavsingest.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.avs_decode.restype = ctypes.c_void_p
        lib.avs_decode.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.avs_error.restype = ctypes.c_char_p
        lib.avs_error.argtypes = [ctypes.c_void_p]
        for name in ("avs_n_frames", "avs_height", "avs_width",
                     "avs_n_samples", "avs_sample_rate"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_void_p]
        lib.avs_fps.restype = ctypes.c_double
        lib.avs_fps.argtypes = [ctypes.c_void_p]
        lib.avs_video_data.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.avs_video_data.argtypes = [ctypes.c_void_p]
        lib.avs_audio_data.restype = ctypes.POINTER(ctypes.c_float)
        lib.avs_audio_data.argtypes = [ctypes.c_void_p]
        lib.avs_release.restype = None
        lib.avs_release.argtypes = [ctypes.c_void_p]
        lib.avs_decode_batch.restype = ctypes.POINTER(ctypes.c_void_p)
        lib.avs_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.avs_release_batch.restype = None
        lib.avs_release_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int,
        ]
        lib.avs_decode_batch_roi.restype = ctypes.POINTER(ctypes.c_void_p)
        lib.avs_decode_batch_roi.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.avs_mux_mp4.restype = ctypes.c_int
        lib.avs_mux_mp4.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def mux_mp4(
    path: str,
    frames: np.ndarray,
    fps: float,
    audio: Optional[np.ndarray] = None,
    sample_rate: int = 0,
) -> None:
    """Encode (T, H, W, 3) BGR uint8 frames (+ optional mono f32 audio) to an
    .mp4 with libx264 + aac — the reference demo's exact artifact format
    (`misalignment_detection_demo.py:231-237`)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library unavailable")
    frames = np.ascontiguousarray(frames, np.uint8)
    assert frames.ndim == 4 and frames.shape[-1] == 3, frames.shape
    if audio is None or audio.size == 0:
        a_ptr, n_samples, sample_rate = (
            ctypes.POINTER(ctypes.c_float)(), 0, 0,
        )
    else:
        audio = np.ascontiguousarray(audio, np.float32)
        a_ptr = audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        n_samples = audio.size
    err = ctypes.create_string_buffer(256)
    rc = lib.avs_mux_mp4(
        path.encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        frames.shape[0], frames.shape[1], frames.shape[2],
        float(fps), a_ptr, n_samples, sample_rate, err, 256,
    )
    if rc != 0:
        raise RuntimeError(f"mux failed: {err.value.decode()}")


def decode(
    path: str, max_frames: int = 0, target_sr: int = 0
) -> Tuple[np.ndarray, float, np.ndarray, int]:
    """Full decode: (video (T,H,W) uint8, fps, audio f32 mono, sample_rate).

    Raises RuntimeError on demux/codec failure.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library unavailable")
    h = lib.avs_decode(path.encode(), int(max_frames), int(target_sr))
    try:
        err = lib.avs_error(h)
        if err:
            raise RuntimeError(f"ingest: {err.decode()} ({path})")
        T, H, W = lib.avs_n_frames(h), lib.avs_height(h), lib.avs_width(h)
        if T > 0:
            video = np.ctypeslib.as_array(
                lib.avs_video_data(h), shape=(T, H, W)
            ).copy()
        else:
            video = np.zeros((0, 0, 0), np.uint8)
        n = lib.avs_n_samples(h)
        audio = (
            np.ctypeslib.as_array(lib.avs_audio_data(h), shape=(n,)).copy()
            if n > 0
            else np.zeros(0, np.float32)
        )
        return video, float(lib.avs_fps(h)), audio, int(lib.avs_sample_rate(h))
    finally:
        lib.avs_release(h)


def decode_batch(
    paths, max_frames: int = 0, target_sr: int = 0, n_threads: int = 0
):
    """Decode many files concurrently on the C++ thread pool.

    Returns a list of (video (T,H,W) uint8, fps, audio f32, sample_rate)
    tuples, order-preserving. Files that fail decode yield
    (empty video, 0.0, empty audio, 0) rather than raising, so one corrupt
    clip cannot kill a batch (the reference's defensive-fallback stance,
    `dataset.py:238-241`).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library unavailable")
    n = len(paths)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    handles = lib.avs_decode_batch(
        arr, n, int(max_frames), int(target_sr), int(n_threads)
    )
    out = []
    try:
        for i in range(n):
            h = handles[i]
            if lib.avs_error(h):
                out.append(
                    (np.zeros((0, 0, 0), np.uint8), 0.0, np.zeros(0, np.float32), 0)
                )
                continue
            T, H, W = lib.avs_n_frames(h), lib.avs_height(h), lib.avs_width(h)
            video = (
                np.ctypeslib.as_array(lib.avs_video_data(h), shape=(T, H, W)).copy()
                if T > 0
                else np.zeros((0, 0, 0), np.uint8)
            )
            ns = lib.avs_n_samples(h)
            audio = (
                np.ctypeslib.as_array(lib.avs_audio_data(h), shape=(ns,)).copy()
                if ns > 0
                else np.zeros(0, np.float32)
            )
            out.append((video, float(lib.avs_fps(h)), audio, int(lib.avs_sample_rate(h))))
    finally:
        lib.avs_release_batch(handles, n)
    return out


def decode_batch_roi(
    paths,
    crop: Tuple[float, float, float, float],
    out_hw: Tuple[int, int],
    max_frames: int = 0,
    target_sr: int = 0,
    n_threads: int = 0,
):
    """Batched decode with decode-time ROI crop + resize: frames arrive at
    model geometry (out_hw), cutting host->device transfer ~20x. crop is
    (y0, y1, x0, x1) normalized. Same return shape as `decode_batch`."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library unavailable")
    n = len(paths)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    y0, y1, x0, x1 = (float(c) for c in crop)
    handles = lib.avs_decode_batch_roi(
        arr, n, int(max_frames), int(target_sr), y0, y1, x0, x1,
        int(out_hw[1]), int(out_hw[0]), int(n_threads),
    )
    out = []
    try:
        for i in range(n):
            h = handles[i]
            if lib.avs_error(h):
                out.append(
                    (np.zeros((0, 0, 0), np.uint8), 0.0, np.zeros(0, np.float32), 0)
                )
                continue
            T, H, W = lib.avs_n_frames(h), lib.avs_height(h), lib.avs_width(h)
            video = (
                np.ctypeslib.as_array(lib.avs_video_data(h), shape=(T, H, W)).copy()
                if T > 0
                else np.zeros((0, 0, 0), np.uint8)
            )
            ns = lib.avs_n_samples(h)
            audio = (
                np.ctypeslib.as_array(lib.avs_audio_data(h), shape=(ns,)).copy()
                if ns > 0
                else np.zeros(0, np.float32)
            )
            out.append(
                (video, float(lib.avs_fps(h)), audio, int(lib.avs_sample_rate(h)))
            )
    finally:
        lib.avs_release_batch(handles, n)
    return out


def decode_video_gray(path: str, max_frames: Optional[int] = None) -> np.ndarray:
    video, _, _, _ = decode(path, max_frames or 0)
    return video


def get_fps(path: str) -> float:
    _, fps, _, _ = decode(path, max_frames=1)
    return fps


def decode_audio(path: str, target_sr: int = 0) -> Tuple[np.ndarray, int]:
    _, _, audio, sr = decode(path, max_frames=1, target_sr=target_sr)
    return audio, sr
