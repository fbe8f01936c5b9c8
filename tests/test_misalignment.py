"""Misalignment pipeline tests: visual stats parity, feature bank, sampling,
and end-to-end detector training on the synthetic corpus (AUROC must beat
chance — the correlated synthetic audio makes the task learnable)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from avsync.config import (
    AudioConfig,
    AvsyncConfig,
    DataConfig,
    DetectorConfig,
    ModelConfig,
    TrainConfig,
)
from avsync.features import (
    build_feature_bank,
    gather_features,
    sample_shift_labels,
    visual_stats_fn,
)
from avsync.models import LipNet
from avsync.train.detector_trainer import DetectorTrainer
from avsync.utils.logging import Logger

TINY = ModelConfig(hidden_dim=4, conv_channels=(2, 2, 3))


class TestVisualStats:
    def test_mean_std_match_torch_semantics(self):
        model = LipNet(TINY)
        rng = np.random.default_rng(0)
        clips = jnp.asarray(rng.random((2, 6, 16, 32, 1)).astype(np.float32))
        params = model.init({"params": jax.random.PRNGKey(0)}, clips[:1])["params"]
        stats = np.asarray(visual_stats_fn(model)(params, clips))

        emb = np.asarray(
            model.apply({"params": params}, clips, method=LipNet.conv_features)
        )
        for b in range(2):
            t = torch.from_numpy(emb[b])
            ref = torch.cat([t.mean(dim=0), t.std(dim=0)]).numpy()
            np.testing.assert_allclose(stats[b], ref, atol=1e-5, rtol=1e-4)


class TestSampling:
    def test_plan_structure(self):
        rng = np.random.default_rng(0)
        vi, sh, lb = sample_shift_labels(10, 15, 1, rng, shuffle=False)
        assert len(vi) == 20
        assert (lb[::2] == 1.0).all() and (lb[1::2] == 0.0).all()
        assert (sh[::2] == 0).all()
        neg = sh[1::2]
        assert (np.abs(neg) >= 1).all() and (np.abs(neg) <= 15).all()

    def test_shuffled_deterministic(self):
        a = sample_shift_labels(8, 10, 2, np.random.default_rng(5))
        b = sample_shift_labels(8, 10, 2, np.random.default_rng(5))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def _make_bank(n_videos=6, T=6, audio_cfg=None):
    audio_cfg = audio_cfg or AudioConfig(max_audio_samples=4000)
    cfg = AvsyncConfig(model=TINY, audio=audio_cfg)
    model = LipNet(TINY)
    rng = np.random.default_rng(1)
    clips = rng.random((n_videos, T, 16, 32, 1)).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(1)}, jnp.asarray(clips[:1]))[
        "params"
    ]
    audio_list = [
        (np.sin(np.linspace(0, 50 + 10 * i, 3200)) * 0.5).astype(np.float32)
        for i in range(n_videos)
    ]
    bank = build_feature_bank(
        model,
        params,
        [jnp.asarray(clips[i : i + 3]) for i in range(0, n_videos, 3)],
        audio_list,
        [25.0] * n_videos,
        cfg,
    )
    return bank, cfg


class TestFeatureBank:
    def test_shapes_and_gather(self):
        bank, cfg = _make_bank()
        conv_dim = 3 * 2 * 4  # C=3, 16/8=2, 32/8=4
        assert bank.visual.shape == (6, 2 * conv_dim)
        feats = gather_features(
            bank,
            jnp.asarray([0, 0, 3]),
            jnp.asarray([0, 5, -5]),
            cfg.audio,
        )
        assert feats.shape == (3, 2 * conv_dim + 40)
        f = np.asarray(feats)
        # visual half identical for same video regardless of shift
        np.testing.assert_array_equal(f[0, : 2 * conv_dim], f[1, : 2 * conv_dim])
        # audio half differs when shifted
        assert not np.allclose(f[0, 2 * conv_dim :], f[1, 2 * conv_dim :])

    def test_zero_shift_matches_oracle_stats(self):
        from avsync.ops import audio_ref

        bank, cfg = _make_bank()
        feats = np.asarray(
            gather_features(bank, jnp.asarray([2]), jnp.asarray([0]), cfg.audio)
        )[0]
        aud = np.asarray(bank.audio[2])[: int(bank.audio_lengths[2])]
        ref = audio_ref.audio_stats(aud.astype(np.float64), 16000, 20)
        np.testing.assert_allclose(feats[-40:], ref, rtol=5e-5, atol=5e-4)


class TestScannedEpoch:
    def test_scanned_epoch_matches_step_loop_exactly(self):
        """The whole-epoch lax.scan dispatch must replay the per-step host
        loop bit-identically: same params trajectory, same probs/metrics
        (one tunnel dispatch per epoch is a pure scheduling change)."""
        bank, cfg = _make_bank()
        import dataclasses

        cfg = dataclasses.replace(
            cfg, detector=dataclasses.replace(
                cfg.detector, batch_size=4, max_shift_frames=5,
            )
        )
        n = int(bank.visual.shape[0])
        feature_dim = bank.visual.shape[1] + 2 * cfg.audio.n_mfcc

        def run(force_loop):
            tr = DetectorTrainer(cfg, log=Logger(None, console=False))
            tr._force_loop = force_loop
            state = tr.init_state(feature_dim)
            for epoch in range(2):
                state, m = tr.run_epoch(state, bank, n, seed=epoch)
            _, ev = tr.run_epoch(state, bank, n, seed=99, train=False)
            return state, m, ev

        s_scan, m_scan, e_scan = run(False)
        s_loop, m_loop, e_loop = run(True)
        # plan length 12 = 3 full batches of 4: scan covers everything
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            s_scan.params, s_loop.params,
        )
        assert m_scan["loss"] == pytest.approx(m_loop["loss"], abs=0)
        np.testing.assert_array_equal(m_scan["probs"], m_loop["probs"])
        np.testing.assert_array_equal(e_scan["probs"], e_loop["probs"])

    def test_scanned_epoch_with_ragged_tail(self):
        """Batch size that does not divide the plan: scan prefix + exact
        zero-weight-padded tail step must equal the pure loop."""
        bank, cfg = _make_bank()
        import dataclasses

        cfg = dataclasses.replace(
            cfg, detector=dataclasses.replace(
                cfg.detector, batch_size=5, max_shift_frames=5,
            )
        )
        n = int(bank.visual.shape[0])  # plan length 12 -> 2x5 + tail 2
        feature_dim = bank.visual.shape[1] + 2 * cfg.audio.n_mfcc

        def run(force_loop):
            tr = DetectorTrainer(cfg, log=Logger(None, console=False))
            tr._force_loop = force_loop
            state = tr.init_state(feature_dim)
            state, m = tr.run_epoch(state, bank, n, seed=3)
            return state, m

        s_scan, m_scan = run(False)
        s_loop, m_loop = run(True)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            s_scan.params, s_loop.params,
        )
        np.testing.assert_array_equal(m_scan["probs"], m_loop["probs"])
        assert m_scan["loss"] == pytest.approx(m_loop["loss"], rel=1e-12)


class TestDetectorEndToEnd:
    def test_training_learns_synthetic_misalignment(self, tmp_path):
        """Full pipeline on the synthetic corpus: feature bank from the
        (random-init, frozen) conv stack + correlated audio; detector must
        reach val AUROC > 0.8 on held-out videos (the zero-sweep signature of
        shifts is learnable from MFCC stats)."""
        from avsync.data import GridDataSource, LipNetBatcher, synthetic
        from avsync.data.video import get_video_fps, load_audio_for_video

        root = str(tmp_path / "grid")
        synthetic.write_corpus(
            root, n_speakers=2, clips_per_speaker=10,
            n_frames=12, height=16, width=32, seed=7,
        )
        audio_cfg = AudioConfig(max_audio_samples=8000)
        cfg = AvsyncConfig(
            data=DataConfig(
                data_path=root, img_height=16, img_width=32,
                max_video_length=12, batch_size=4,
            ),
            model=TINY,
            audio=audio_cfg,
            detector=DetectorConfig(
                hidden_dim=16, max_shift_frames=8, batch_size=8, epochs=12
            ),
            train=TrainConfig(seed=0),
        )
        src = GridDataSource(root)
        n = len(src)
        assert n == 20
        model = LipNet(TINY)
        params = model.init(
            {"params": jax.random.PRNGKey(3)},
            jnp.zeros((1, 12, 16, 32, 1)),
        )["params"]

        batcher = LipNetBatcher(src, cfg)
        clips = list(batcher.epoch(shuffle=False, drop_last=False))
        audio_list, fps_list = [], []
        for s in src.samples:
            a, sr = load_audio_for_video(s.video_path)
            assert sr == 16000 and len(a) > 0
            audio_list.append(a)
            fps_list.append(get_video_fps(s.video_path))
        bank = build_feature_bank(
            model, params, clips, audio_list, fps_list, cfg
        )

        # split videos 14/6 train/val by index
        import jax.numpy as jnp2

        train_bank = jax.tree.map(lambda x: x[:14], bank)
        val_bank = jax.tree.map(lambda x: x[14:], bank)
        trainer = DetectorTrainer(cfg, log=Logger(None, console=False))
        state, summary = trainer.train(train_bank, 14, val_bank, 6)
        assert summary["best_val_auc"] > 0.8, summary

        # data-parallel over the 8-device mesh: same data + seeds must give
        # the same learning outcome (batch 8 shards 1/device; the ragged
        # final batch exercises the zero-weight padding)
        from avsync.parallel import make_mesh

        mesh_trainer = DetectorTrainer(
            cfg, log=Logger(None, console=False), mesh=make_mesh((8, 1))
        )
        _, mesh_summary = mesh_trainer.train(train_bank, 14, val_bank, 6)
        assert mesh_summary["best_val_auc"] > 0.8, mesh_summary
        np.testing.assert_allclose(
            mesh_summary["best_val_auc"], summary["best_val_auc"], atol=0.05
        )


class TestModelSelection:
    def test_val_auc_ties_select_latest_epoch(self):
        """When val AUC saturates (1.0 every epoch), the restored weights
        must be the LAST epoch's, not the first saturating epoch's.

        This mirrors the reference's effective behavior: its
        `best_state = model.state_dict()` aliases the live tensors
        (`misalignment_detection_train.py:430-434`), so the final
        `load_state_dict` restores nothing and the final weights ship.
        A strict `>` here froze an undertrained model and cost measured
        AUROC (0.75 vs 1.0) on 1-frame shifts."""
        cfg = AvsyncConfig(
            model=TINY,
            detector=DetectorConfig(hidden_dim=8, epochs=4, batch_size=4),
        )
        trainer = DetectorTrainer(cfg, log=Logger(None, console=False))
        calls = {"n": 0}

        def scripted_run_epoch(state, bank, n_videos, seed, train=True,
                               batch_size=None):
            if train:
                calls["n"] += 1
                # a distinguishable param tree per epoch
                params = jax.tree.map(
                    lambda x: jnp.full_like(x, calls["n"]), state.params
                )
                state = state._replace(params=params)
                return state, {"loss": 0.0, "acc": 1.0, "auc": 1.0,
                               "labels": np.ones(2), "probs": np.ones(2)}
            return state, {"loss": 0.0, "acc": 1.0, "auc": 1.0,
                           "labels": np.ones(2), "probs": np.ones(2)}

        trainer.run_epoch = scripted_run_epoch
        state0 = trainer.init_state(feature_dim=6)
        # train() calls init_state internally; seed its rng identically
        trainer.init_state = lambda feature_dim: state0
        # feature_dim math inside train() only reads bank.visual.shape[1]
        bank = type("B", (), {"visual": np.zeros((2, 2))})
        state, summary = trainer.train(bank, 2, bank, 2, epochs=4)
        leaf = jax.tree.leaves(state.params)[0]
        assert float(np.asarray(leaf).ravel()[0]) == 4.0, (
            "expected the epoch-4 params (latest tie), got "
            f"{float(np.asarray(leaf).ravel()[0])}"
        )
        assert summary["best_val_auc"] == 1.0


class TestDetectorPreemption:
    def test_sigterm_snapshots_and_stops(self):
        """SIGTERM mid-run stops the detector loop at the epoch boundary
        after snapshotting via save_fn (mirrors LipNetTrainer's graceful
        preemption; single-controller scope, so a plain flag suffices)."""
        import os
        import signal

        cfg = AvsyncConfig(
            model=TINY,
            detector=DetectorConfig(hidden_dim=8, epochs=30, batch_size=4),
        )
        trainer = DetectorTrainer(cfg, log=Logger(None, console=False))
        calls = {"train": 0, "val": 0}
        before = signal.getsignal(signal.SIGTERM)

        def scripted_run_epoch(state, bank, n_videos, seed, train=True,
                               batch_size=None):
            if train:
                calls["train"] += 1
                if calls["train"] == 2:
                    os.kill(os.getpid(), signal.SIGTERM)
            else:
                calls["val"] += 1
            return state, {"loss": 0.0, "acc": 1.0, "auc": 1.0,
                           "labels": np.ones(2), "probs": np.ones(2)}

        trainer.run_epoch = scripted_run_epoch
        state0 = trainer.init_state(feature_dim=6)
        trainer.init_state = lambda feature_dim: state0
        bank = type("B", (), {"visual": np.zeros((2, 2))})
        saves = []
        trainer.train(
            bank, 2, bank, 2, epochs=30,
            save_fn=lambda st, ep: saves.append(ep),
        )
        assert calls["train"] == 2  # stopped at the boundary, not epoch 30
        # the signal landed DURING epoch 2's train pass — validation is
        # skipped for that epoch (the grace window goes to the snapshot)
        assert calls["val"] == 1
        assert saves == [2]  # snapshot written despite no save_every
        assert signal.getsignal(signal.SIGTERM) == before  # restored
