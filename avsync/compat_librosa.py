"""Minimal librosa-compatible module for running the *reference* pipeline.

librosa is not installable in this environment, which is the only reason the
reference's misalignment-detection stack (`misalignment_detection_train.py`)
cannot execute for a measured head-to-head. Its entire librosa surface is
three calls:

  - ``librosa.feature.mfcc(y=, sr=, n_mfcc=, hop_length=)``
        (`misalignment_detection_train.py:121`)
  - ``librosa.load(path, sr=None)``  (`misalignment_detection_train.py:176`)
  - ``librosa.resample(y, orig_sr=, target_sr=)``
        (`misalignment_detection_train.py:203`)

This module implements exactly those, backed by avsync's float64 oracle
(:mod:`avsync.ops.audio_ref` — librosa-0.10 default semantics, the same
oracle the JAX MFCC path is parity-tested against) and the stdlib WAV
reader. Inject with::

    import avsync.compat_librosa as shim
    sys.modules["librosa"] = shim
    sys.modules["librosa.feature"] = shim.feature

then run the unmodified reference code (scripts/run_reference_detector.py).

Deviations from real librosa, stated so the measurement is honest:

  - ``load`` decodes via soundfile/audioread in librosa; here it reads PCM
    WAVs with the stdlib ``wave`` module, and for ``.npy`` synthetic-corpus
    clips (which carry no audio stream — real librosa would raise and the
    reference would fall through to its moviepy path) it resolves the
    sibling ``.wav`` with the same basename, i.e. the synthetic corpus's
    audio-track convention. Identical samples reach the reference code
    either way.
  - ``resample`` uses polyphase FIR (scipy.signal.resample_poly) instead of
    librosa's default soxr_hq resampler — not bit-identical, but the
    synthetic corpus is written at the detector's 16 kHz target, so the
    reference's resample branch is a no-op there.
  - ``feature.mfcc`` is float64 end-to-end (librosa computes in the input
    dtype); parity vs librosa-0.10 formulas is documented in
    avsync/ops/audio_ref.py.
"""

from __future__ import annotations

import math
import os
import types

import numpy as np

from avsync.data.video import load_wav
from avsync.ops import audio_ref

__version__ = "0.10.0-avsync-shim"


def load(path: str, sr=None, mono: bool = True):
    """librosa.load: (mono float audio in [-1, 1], sample_rate).

    ``sr=None`` keeps the file's native rate (the reference passes sr=None
    and resamples explicitly afterwards).
    """
    base, ext = os.path.splitext(path)
    if ext == ".npy":
        wav = base + ".wav"
        if not os.path.exists(wav):
            raise RuntimeError(
                f"{path}: .npy clip has no audio stream and no sibling .wav"
            )
        path = wav
    y, native_sr = load_wav(path)
    if sr is not None and int(sr) != int(native_sr):
        y = resample(y, orig_sr=native_sr, target_sr=int(sr))
        native_sr = int(sr)
    return y.astype(np.float32), native_sr


def resample(y: np.ndarray, *, orig_sr: int, target_sr: int) -> np.ndarray:
    """librosa.resample via polyphase FIR (see module doc for the caveat)."""
    if int(orig_sr) == int(target_sr):
        return np.asarray(y)
    from scipy.signal import resample_poly

    g = math.gcd(int(orig_sr), int(target_sr))
    out = resample_poly(np.asarray(y, dtype=np.float64),
                        int(target_sr) // g, int(orig_sr) // g)
    # librosa fixes the output length to ceil(len * target / orig)
    n = int(np.ceil(len(y) * target_sr / orig_sr))
    if len(out) > n:
        out = out[:n]
    elif len(out) < n:
        out = np.pad(out, (0, n - len(out)))
    return out.astype(np.asarray(y).dtype, copy=False)


def _mfcc(*, y: np.ndarray, sr: int, n_mfcc: int = 20, hop_length=None):
    return audio_ref.mfcc(
        np.asarray(y, dtype=np.float64), int(sr), n_mfcc=n_mfcc,
        hop_length=hop_length,
    )


feature = types.ModuleType("librosa.feature")
feature.mfcc = _mfcc
