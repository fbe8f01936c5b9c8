"""avsync.compat_librosa — the shim that lets the reference pipeline run.

The reference's entire librosa surface is feature.mfcc / load / resample
(`misalignment_detection_train.py:121,176,203`); these tests pin the shim's
behavior at exactly those call sites.
"""

import os
import sys

import numpy as np
import pytest

import avsync.compat_librosa as shim
from avsync.data.video import save_wav
from avsync.ops import audio_ref


@pytest.fixture(scope="module")
def wav_clip(tmp_path_factory):
    d = tmp_path_factory.mktemp("shim")
    rng = np.random.default_rng(7)
    audio = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    np.save(d / "clip.npy", np.zeros((2, 50, 100), np.uint8))
    save_wav(str(d / "clip.wav"), audio, 16000)
    return d, audio


def test_load_wav_direct(wav_clip):
    d, audio = wav_clip
    y, sr = shim.load(str(d / "clip.wav"), sr=None)
    assert sr == 16000 and y.dtype == np.float32
    # 16-bit PCM quantization is the only loss
    assert np.abs(y - audio).max() < 1e-4


def test_load_npy_resolves_sibling_wav(wav_clip):
    d, audio = wav_clip
    y, sr = shim.load(str(d / "clip.npy"), sr=None)
    assert sr == 16000 and len(y) == len(audio)


def test_load_npy_without_wav_raises(tmp_path):
    np.save(tmp_path / "lonely.npy", np.zeros((2, 4, 4), np.uint8))
    with pytest.raises(RuntimeError):
        shim.load(str(tmp_path / "lonely.npy"), sr=None)


def test_resample_noop_and_length():
    y = np.sin(np.linspace(0, 40 * np.pi, 8000)).astype(np.float32)
    same = shim.resample(y, orig_sr=16000, target_sr=16000)
    assert same is not y or np.array_equal(same, y)
    up = shim.resample(y, orig_sr=8000, target_sr=16000)
    assert len(up) == 16000  # librosa: ceil(len * target / orig)
    # a pure tone survives polyphase resampling
    assert np.abs(up[100:-100:2] - y[50:-50]).max() < 5e-2


def test_feature_mfcc_reference_call_site(wav_clip):
    """Exactly the reference's call: librosa.feature.mfcc(y=, sr=, n_mfcc=,
    hop_length=) -> (n_mfcc, 1 + len//hop), equal to the f64 oracle."""
    _, audio = wav_clip
    hop = 16000 // 40
    m = shim.feature.mfcc(y=audio, sr=16000, n_mfcc=20, hop_length=hop)
    assert m.shape == (20, 1 + len(audio) // hop)
    want = audio_ref.mfcc(audio.astype(np.float64), 16000, n_mfcc=20,
                          hop_length=hop)
    np.testing.assert_allclose(m, want, rtol=1e-12, atol=1e-12)


def test_reference_compute_audio_stats_under_shim(wav_clip):
    """Re-enact `compute_audio_stats` (misalignment_detection_train.py:117-127)
    through the injected shim and check it against the avsync oracle."""
    _, audio = wav_clip
    sys.modules["librosa"] = shim
    sys.modules["librosa.feature"] = shim.feature
    try:
        import librosa  # resolves to the shim
        import torch

        hop = max(1, int(16000 / 40))
        mfcc = librosa.feature.mfcc(y=audio, sr=16000, n_mfcc=20,
                                    hop_length=hop)
        t = torch.from_numpy(mfcc.T).float()
        got = torch.cat([t.mean(dim=0), t.std(dim=0)], dim=0).numpy()
    finally:
        sys.modules.pop("librosa", None)
        sys.modules.pop("librosa.feature", None)
    want = audio_ref.audio_stats(audio.astype(np.float64), 16000, 20)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 1e-5
