"""Fused Pallas MFCC-stats kernel parity vs the XLA path (interpret mode)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from avsync.config import AudioConfig
from avsync.ops import audio

CFG = AudioConfig(max_audio_samples=8000)
CFG_PALLAS = dataclasses.replace(CFG, use_pallas=True)


def _batch():
    rng = np.random.default_rng(0)
    ns = [8000, 5000, 0]
    buf = np.zeros((3, CFG.max_audio_samples), np.float32)
    for i, n in enumerate(ns):
        t = np.arange(n) / 16000
        buf[i, :n] = 0.5 * np.sin(2 * np.pi * (300 + 80 * i) * t) + \
            0.01 * rng.standard_normal(n)
    return jnp.asarray(buf), jnp.asarray(ns)


class TestPallasMelStats:
    def test_matches_xla_path(self):
        buf, ns = _batch()
        ref = np.asarray(audio.audio_stats(buf, ns, CFG))
        out = np.asarray(audio.audio_stats(buf, ns, CFG_PALLAS))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)

    def test_zero_length_zeros(self):
        buf, ns = _batch()
        out = np.asarray(audio.audio_stats(buf, ns, CFG_PALLAS))
        np.testing.assert_array_equal(out[2], 0.0)

    def test_matches_oracle(self):
        from avsync.ops import audio_ref

        buf, ns = _batch()
        out = np.asarray(audio.audio_stats(buf, ns, CFG_PALLAS))
        for i in range(2):
            n = int(ns[i])
            ref = audio_ref.audio_stats(
                np.asarray(buf)[i, :n].astype(np.float64), 16000, 20
            )
            np.testing.assert_allclose(out[i], ref, rtol=2e-5, atol=2e-4)
