"""Audio front-end tests: JAX MFCC vs the float64 numpy oracle, and
shift_audio parity with the reference's zero-fill semantics."""

import numpy as np
import pytest
import jax.numpy as jnp

from avsync.config import AudioConfig
from avsync.ops import audio, audio_ref


CFG = AudioConfig(max_audio_samples=8000)  # 0.5 s @ 16 kHz keeps CPU tests fast


def _tone(n, sr=16000, f=440.0, seed=0):
    t = np.arange(n) / sr
    rng = np.random.default_rng(seed)
    return (
        0.5 * np.sin(2 * np.pi * f * t)
        + 0.2 * np.sin(2 * np.pi * 3.7 * f * t)
        + 0.01 * rng.standard_normal(n)
    ).astype(np.float32)


class TestOracleProperties:
    def test_mel_filterbank_shape_and_rowsums(self):
        fb = audio_ref.mel_filterbank(16000, 2048, 128)
        assert fb.shape == (128, 1025)
        # Slaney normalization: every filter has positive area.
        assert (fb.sum(axis=1) > 0).all()
        # triangles cover the band without gaps in the interior
        coverage = fb.sum(axis=0)
        assert (coverage[5:-5] > 0).all()

    def test_mel_scale_linear_below_1khz(self):
        f = np.array([0.0, 500.0, 1000.0])
        m = audio_ref.hz_to_mel_slaney(f)
        np.testing.assert_allclose(m, f * 3 / 200, rtol=1e-12)
        np.testing.assert_allclose(audio_ref.mel_to_hz_slaney(m), f, rtol=1e-12)

    def test_dct_matrix_is_orthonormal(self):
        D = audio_ref.dct_ortho_matrix(128, 128)
        np.testing.assert_allclose(D @ D.T, np.eye(128), atol=1e-10)

    def test_dct_matches_scipy(self):
        from scipy.fft import dct as scipy_dct

        x = np.random.default_rng(0).normal(size=(128, 7))
        ref = scipy_dct(x, type=2, axis=0, norm="ortho")[:20]
        ours = audio_ref.dct_ortho_matrix(20, 128) @ x
        np.testing.assert_allclose(ours, ref, atol=1e-10)

    def test_stft_frame_count(self):
        y = np.zeros(8000)
        S = audio_ref.stft_power(y, hop_length=400)
        assert S.shape == (1025, 1 + 8000 // 400)

    def test_hann_periodic_matches_scipy(self):
        from scipy.signal import get_window

        np.testing.assert_allclose(
            audio_ref.hann_periodic(2048), get_window("hann", 2048), atol=1e-12
        )


class TestJaxMfccParity:
    @pytest.mark.parametrize("n", [8000, 6400, 6001])
    def test_stats_match_oracle(self, n):
        y = _tone(n)
        ref = audio_ref.audio_stats(y.astype(np.float64), 16000, 20)

        buf = np.zeros((1, CFG.max_audio_samples), np.float32)
        buf[0, :n] = y
        ours = audio.audio_stats(
            jnp.asarray(buf), jnp.asarray([n]), CFG
        )
        # f32 pipeline vs f64 oracle: rel err budget 1e-5 (BASELINE target).
        np.testing.assert_allclose(
            np.asarray(ours)[0], ref, rtol=2e-5, atol=2e-4
        )

    def test_batch_of_different_lengths(self):
        ns = [8000, 5000, 1234]
        buf = np.zeros((3, CFG.max_audio_samples), np.float32)
        for i, n in enumerate(ns):
            buf[i, :n] = _tone(n, f=300.0 + 100 * i, seed=i)
        ours = np.asarray(
            audio.audio_stats(jnp.asarray(buf), jnp.asarray(ns), CFG)
        )
        for i, n in enumerate(ns):
            ref = audio_ref.audio_stats(buf[i, :n].astype(np.float64), 16000, 20)
            np.testing.assert_allclose(ours[i], ref, rtol=2e-5, atol=2e-4)

    def test_zero_length_yields_zeros(self):
        buf = np.zeros((1, CFG.max_audio_samples), np.float32)
        out = np.asarray(audio.audio_stats(jnp.asarray(buf), jnp.asarray([0]), CFG))
        np.testing.assert_array_equal(out, 0.0)

    def test_mfcc_frame_values_match_oracle(self):
        n = 6400
        y = _tone(n, f=523.0)
        ref = audio_ref.mfcc(y.astype(np.float64), 16000, n_mfcc=20)  # (20, F)
        buf = np.zeros((1, CFG.max_audio_samples), np.float32)
        buf[0, :n] = y
        ours, valid = audio.mfcc_frames(jnp.asarray(buf), jnp.asarray([n]), CFG)
        nv = int(np.asarray(valid)[0].sum())
        assert nv == ref.shape[1]
        np.testing.assert_allclose(
            np.asarray(ours)[0, :nv].T, ref, rtol=2e-5, atol=2e-4
        )


class TestShiftAudio:
    @pytest.mark.parametrize("shift_frames", [0, 3, -3, 10, -10, 200, -200])
    def test_matches_reference_semantics(self, shift_frames):
        n = 5000
        y = _tone(n, seed=5)
        fps, sr = 25.0, 16000
        ref = audio_ref.shift_audio(y, shift_frames, fps, sr)

        buf = np.zeros((1, CFG.max_audio_samples), np.float32)
        buf[0, :n] = y
        s = audio.shift_samples_for_frames(
            jnp.asarray([shift_frames]), jnp.asarray([fps]), sr
        )
        out = np.asarray(
            audio.shift_audio(jnp.asarray(buf), jnp.asarray([n]), s)
        )[0]
        np.testing.assert_allclose(out[:n], ref, atol=1e-7)
        np.testing.assert_array_equal(out[n:], 0.0)

    def test_shift_larger_than_clip_zeroes_everything(self):
        n = 1000
        buf = np.zeros((1, CFG.max_audio_samples), np.float32)
        buf[0, :n] = 1.0
        # 25 fps, 16 kHz: 2 frames = 1280 samples > 1000
        s = audio.shift_samples_for_frames(
            jnp.asarray([2]), jnp.asarray([25.0]), 16000
        )
        out = np.asarray(audio.shift_audio(jnp.asarray(buf), jnp.asarray([n]), s))
        np.testing.assert_array_equal(out, 0.0)

    def test_shifted_stats_fused_path(self):
        n = 6400
        y = _tone(n, seed=9)
        fps = 25.0
        ref_shifted = audio_ref.shift_audio(y, 4, fps, 16000)
        ref = audio_ref.audio_stats(ref_shifted.astype(np.float64), 16000, 20)
        buf = np.zeros((1, CFG.max_audio_samples), np.float32)
        buf[0, :n] = y
        ours = np.asarray(
            audio.shifted_audio_stats(
                jnp.asarray(buf),
                jnp.asarray([n]),
                jnp.asarray([4]),
                jnp.asarray([fps]),
                CFG,
            )
        )[0]
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-4)


class TestResample:
    def test_identity(self):
        y = _tone(1000)
        np.testing.assert_array_equal(audio.resample_host(y, 16000, 16000), y)

    def test_downsample_preserves_tone(self):
        sr0, sr1 = 48000, 16000
        t = np.arange(sr0) / sr0
        y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        out = audio.resample_host(y, sr0, sr1)
        assert abs(len(out) - sr1) <= 1
        # dominant frequency survives
        spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
        peak = np.argmax(spec) * sr1 / len(out)
        assert abs(peak - 440) < 5
