"""FeatureBank persistence + compile-cache wiring (round-4 wall-clock work).

The bank cache exists so repeat sweeps over an unchanged corpus skip the
frozen-LipNet conv-feature extraction (the dominant cost of
`misalign-eval` at small corpus scale); correctness hinges on the key
fingerprinting every input the bank depends on.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from avsync.features import FeatureBank, load_feature_bank, save_feature_bank


def _bank(n=4, d=6, s=100):
    rng = np.random.default_rng(0)
    return FeatureBank(
        visual=jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)),
        audio=jnp.asarray(rng.normal(size=(n, s)).astype(np.float32)),
        audio_lengths=jnp.asarray(np.full((n,), s, np.int32)),
        fps=jnp.asarray(np.full((n,), 25.0, np.float32)),
    )


def test_bank_roundtrip_exact(tmp_path):
    bank = _bank()
    p = str(tmp_path / "bank.npz")
    save_feature_bank(p, bank, key="k1")
    got = load_feature_bank(p, key="k1")
    assert got is not None
    for a, b in zip(bank, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bank_key_mismatch_misses(tmp_path):
    p = str(tmp_path / "bank.npz")
    save_feature_bank(p, _bank(), key="k1")
    assert load_feature_bank(p, key="other") is None


def test_bank_missing_and_corrupt(tmp_path):
    assert load_feature_bank(str(tmp_path / "absent.npz"), key="k") is None
    p = str(tmp_path / "corrupt.npz")
    with open(p, "wb") as f:
        f.write(b"not an npz")
    assert load_feature_bank(p, key="k") is None


def test_cache_key_tracks_inputs(tmp_path):
    """The key must change when a video file or the checkpoint changes."""
    from avsync.cli import _bank_cache_path
    from avsync.config import AvsyncConfig

    cfg = AvsyncConfig()
    v = tmp_path / "clip.npy"
    np.save(v, np.zeros((2, 2), np.uint8))
    ck = tmp_path / "lipnet.pth"
    ck.write_bytes(b"x" * 64)

    path1, key1 = _bank_cache_path(cfg, [str(v)], str(ck), str(tmp_path))
    # touch the video with different content size -> new key
    np.save(v, np.zeros((3, 3), np.uint8))
    path2, key2 = _bank_cache_path(cfg, [str(v)], str(ck), str(tmp_path))
    assert key1 != key2 and path1 != path2

    # checkpoint size change -> new key
    ck.write_bytes(b"x" * 128)
    _, key3 = _bank_cache_path(cfg, [str(v)], str(ck), str(tmp_path))
    assert key3 != key2

    # disabled cache dir -> no path, key still computed
    path4, key4 = _bank_cache_path(cfg, [str(v)], str(ck), None)
    assert path4 is None and key4 == key3


def test_default_cache_dir_is_host_fingerprinted(monkeypatch):
    # XLA:CPU cache entries are host-ISA-specific AOT code; the default dir
    # is namespaced by a CPU fingerprint so a cache written on one machine
    # is never loaded on another (cpu_aot_loader feature-mismatch / SIGILL).
    from avsync.utils import compile_cache

    d1 = compile_cache.default_cache_dir()
    d2 = compile_cache.default_cache_dir()
    assert d1 == d2  # stable within a host
    assert os.path.basename(d1).startswith("jax_compile-")
    suffix = os.path.basename(d1).split("-", 1)[1]
    assert len(suffix) == 12 and all(c in "0123456789abcdef" for c in suffix)

    # a host with different CPU features maps to a different dir
    monkeypatch.setattr(
        compile_cache, "_host_fingerprint", lambda: "feedfacecafe"
    )
    assert compile_cache.default_cache_dir() != d1


def test_enable_persistent_cache_env(tmp_path, monkeypatch):
    from avsync.utils import compile_cache

    monkeypatch.setenv("AVSYNC_COMPILE_CACHE", "off")
    assert compile_cache.enable_persistent_cache() is None

    cache_dir = str(tmp_path / "jax_cache")
    monkeypatch.setenv("AVSYNC_COMPILE_CACHE", cache_dir)
    assert compile_cache.enable_persistent_cache() == cache_dir
    assert os.path.isdir(cache_dir)
    import jax

    assert jax.config.jax_compilation_cache_dir == cache_dir
