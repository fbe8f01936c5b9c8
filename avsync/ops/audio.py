"""On-device audio front-end: fused MFCC + shift augmentation (JAX/TPU).

Replaces the reference's host-side librosa calls
(`misalignment_detection_train.py:117-127` MFCC stats,
`misalignment_detection_train.py:100-114` zero-fill audio shift) with a
batched, jittable, static-shape pipeline:

  * Audio rides in fixed-size zero-padded buffers (B, max_samples) plus a
    lengths vector — zero padding composes exactly with librosa's
    'constant' STFT pad mode, so masking valid frames reproduces the
    variable-length result bit-for-bit (see avsync/ops/audio_ref.py for the
    oracle semantics).
  * Framing is a gather; the FFT is XLA's rfft; mel projection and DCT are
    two MXU matmuls; the top_db clamp and mean/std statistics mask invalid
    frames.
  * `shift_audio` is a roll + index mask, so ±N-frame shift-contrastive
    augmentation vmaps over the batch on device.

The mel/DCT constant matrices are built once in float64 numpy
(avsync/ops/audio_ref.py) and closed over as f32 device constants.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avsync.config import AudioConfig
from avsync.ops import audio_ref

_AMIN = 1e-10


@functools.lru_cache(maxsize=8)
def _constants(
    sr: int, n_fft: int, n_mels: int, n_mfcc: int, fmin: float, fmax
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    mel = audio_ref.mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    dct = audio_ref.dct_ortho_matrix(n_mfcc, n_mels)
    win = audio_ref.hann_periodic(n_fft)
    return (
        mel.astype(np.float32).T,  # (n_bins, n_mels) for right-multiplication
        dct.astype(np.float32).T,  # (n_mels, n_mfcc)
        win.astype(np.float32),
    )


def num_frames(n_samples: int, hop_length: int) -> int:
    return 1 + n_samples // hop_length


def power_spectrogram(
    audio: jax.Array, cfg: AudioConfig = AudioConfig()
) -> jax.Array:
    """(B, S) -> (B, F, 1 + n_fft//2) power spectrogram (centered, zero pad)."""
    S = audio.shape[1]
    hop = cfg.hop_length
    n_fft = cfg.n_fft
    _, _, win = _constants(
        cfg.sample_rate, n_fft, cfg.n_mels, cfg.n_mfcc, cfg.fmin, cfg.fmax
    )
    pad = n_fft // 2
    ypad = jnp.pad(audio, ((0, 0), (pad, pad)))
    F = num_frames(S, hop)
    starts = np.arange(F) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]  # (F, n_fft) static
    frames = ypad[:, idx]  # (B, F, n_fft) gather
    spec = jnp.fft.rfft(frames * jnp.asarray(win), axis=-1)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2  # (B, F, n_bins)


def mfcc_frames(
    audio: jax.Array,
    lengths: jax.Array,
    cfg: AudioConfig = AudioConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """Batched MFCC: (B, S) padded audio + (B,) lengths -> (B, F, n_mfcc), F-mask.

    F = 1 + S // hop is the static frame count; the boolean mask marks the
    1 + length // hop frames librosa would have produced for each example.
    """
    B, S = audio.shape
    hop = cfg.hop_length
    n_fft = cfg.n_fft
    melT, dctT, _ = (
        jnp.asarray(a)
        for a in _constants(
            cfg.sample_rate, n_fft, cfg.n_mels, cfg.n_mfcc, cfg.fmin, cfg.fmax
        )
    )
    F = num_frames(S, hop)
    power = power_spectrogram(audio, cfg)

    # precision=HIGHEST: without it TPU matmuls truncate f32 inputs to bf16.
    # MFCC is a vanishing fraction of any workload's FLOPs, and a 1-frame
    # A/V shift moves only ~2 of ~120 hops, so the stat deltas the detector
    # must separate sit near bf16's quantization floor — full-precision
    # lanes here are free fidelity.
    melspec = jnp.einsum(
        "bfk,km->bfm", power, melT, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    log_spec = 10.0 * jnp.log10(jnp.maximum(_AMIN, melspec))

    valid = jnp.arange(F)[None, :] < (1 + lengths // hop)[:, None]  # (B, F)
    # top_db clamp relative to each example's max over its VALID frames.
    masked = jnp.where(valid[..., None], log_spec, -jnp.inf)
    ref_max = jnp.max(masked, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, ref_max - cfg.top_db)

    mfcc = jnp.einsum(
        "bfm,mc->bfc", log_spec, dctT, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return mfcc, valid


def audio_stats(
    audio: jax.Array, lengths: jax.Array, cfg: AudioConfig = AudioConfig()
) -> jax.Array:
    """Batched `compute_audio_stats`: (B, S), (B,) -> (B, 2*n_mfcc).

    concat(mean, unbiased std) over valid MFCC frames, matching
    torch.mean/torch.std at `misalignment_detection_train.py:124-127`.
    All-empty audio (length 0) yields zeros, matching the reference's
    empty-audio guard (`:118-119`).
    """
    if cfg.use_pallas:
        from avsync.ops.pallas.mfcc import pallas_mel_stats

        melT, dctT, _ = _constants(
            cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.n_mfcc,
            cfg.fmin, cfg.fmax,
        )
        power = power_spectrogram(audio, cfg)
        n_valid = 1 + lengths // cfg.hop_length
        n_valid = jnp.where(lengths > 0, n_valid, 0)
        return pallas_mel_stats(
            power, n_valid, jnp.asarray(melT), jnp.asarray(dctT),
            top_db=cfg.top_db,
            # Mosaic kernels only compile for TPU; interpret elsewhere.
            interpret=jax.default_backend() != "tpu",
        )

    mfcc, valid = mfcc_frames(audio, lengths, cfg)
    vm = valid[..., None].astype(mfcc.dtype)
    n = jnp.sum(vm, axis=1)  # (B, 1)
    n_safe = jnp.maximum(n, 1.0)
    mean = jnp.sum(mfcc * vm, axis=1) / n_safe
    var = jnp.sum(((mfcc - mean[:, None, :]) * vm) ** 2, axis=1) / jnp.maximum(
        n - 1.0, 1.0
    )
    std = jnp.sqrt(var)
    std = jnp.where(n > 1, std, 0.0)
    stats = jnp.concatenate([mean, std], axis=-1)
    return jnp.where(lengths[:, None] > 0, stats, 0.0)


def shift_samples_for_frames(
    shift_frames: jax.Array, fps: jax.Array, sample_rate: int
) -> jax.Array:
    """shift_frames / fps * sr, truncated toward zero (python int() semantics
    at `misalignment_detection_train.py:103`)."""
    return jnp.trunc(
        shift_frames.astype(jnp.float32)
        / jnp.maximum(fps.astype(jnp.float32), 1e-5)
        * sample_rate
    ).astype(jnp.int32)


def shift_audio(
    audio: jax.Array, lengths: jax.Array, shift_samples: jax.Array
) -> jax.Array:
    """Batched zero-fill shift: out[i] = audio[i - s] where in-range, else 0.

    Matches `shift_audio` (`misalignment_detection_train.py:100-114`):
    positive shift delays audio (zeros at the front), negative advances it
    (zeros at the tail); the shift is relative to each example's true length,
    and the zero-padded tail beyond `lengths` stays zero.
    """
    B, S = audio.shape

    def one(y, L, s):
        rolled = jnp.roll(y, s)
        i = jnp.arange(S)
        src = i - s
        ok = (src >= 0) & (src < L) & (i < L)
        return jnp.where(ok, rolled, 0.0)

    return jax.vmap(one)(audio, lengths, shift_samples)


def shifted_audio_stats(
    audio: jax.Array,
    lengths: jax.Array,
    shift_frames: jax.Array,
    fps: jax.Array,
    cfg: AudioConfig = AudioConfig(),
) -> jax.Array:
    """Fused shift -> MFCC -> stats for a batch of (clip, shift) pairs — the
    device-side replacement for the reference's per-item
    `build_feature` audio path (`misalignment_detection_train.py:199-206`)."""
    s = shift_samples_for_frames(shift_frames, fps, cfg.sample_rate)
    return audio_stats(shift_audio(audio, lengths, s), lengths, cfg)


def resample_host(y: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Host-side polyphase resampling (scipy), used where the reference calls
    `librosa.resample` (`misalignment_detection_train.py:203`). librosa's
    default 'soxr_hq' and scipy's polyphase differ at the ~1e-3 level on real
    audio; both are anti-aliased. Exposed as a seam so a C++ soxr stage can
    slot in later."""
    if orig_sr == target_sr:
        return y.astype(np.float32)
    from fractions import Fraction

    from scipy.signal import resample_poly

    frac = Fraction(target_sr, orig_sr).limit_denominator(1000)
    out = resample_poly(y.astype(np.float64), frac.numerator, frac.denominator)
    return out.astype(np.float32)
