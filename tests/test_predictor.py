"""Serving API tests: LipReader and MisalignmentScorer."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from avsync.config import (
    AudioConfig,
    AvsyncConfig,
    DataConfig,
    DetectorConfig,
    ModelConfig,
)
from avsync.predictor import LipReader, MisalignmentScorer

TINY = AvsyncConfig(
    data=DataConfig(img_height=16, img_width=32, max_video_length=8),
    model=ModelConfig(hidden_dim=8, conv_channels=(2, 3, 4)),
    audio=AudioConfig(max_audio_samples=8000),
    detector=DetectorConfig(hidden_dim=16),
)


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    from avsync.compat import save_detector_pth, save_lipnet_pth
    from avsync.models import LipNet, MisalignmentDetector

    root = tmp_path_factory.mktemp("serve")
    model = LipNet(TINY.model)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8, 16, 32, 1))
    )["params"]
    lip = str(root / "lipnet.pth")
    conv_shape = (4, 2, 4)
    save_lipnet_pth(jax.device_get(params), lip, conv_shape=conv_shape)

    det_model = MisalignmentDetector(hidden_dim=16)
    conv_dim = 4 * 2 * 4
    feat_dim = 2 * conv_dim + 40
    det_params = det_model.init(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, feat_dim))
    )["params"]
    det = str(root / "detector.pth")
    save_detector_pth(
        jax.device_get(det_params), det, feat_dim, 16,
        {"sample_rate": 16000, "n_mfcc": 20, "max_shift_frames": 10},
        conv_shape=conv_shape, n_audio_feats=40,
    )
    return {"lipnet": lip, "detector": det, "root": str(root)}


class TestLipReader:
    def test_predict_frames_and_file(self, checkpoints):
        reader = LipReader(checkpoints["lipnet"], TINY)
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 255, (8, 16, 32), np.uint8)
        out = reader.predict_frames(frames)
        assert isinstance(out, str)

        clip_path = os.path.join(checkpoints["root"], "clip.npy")
        np.save(clip_path, frames)
        assert reader.predict(clip_path) == out

    def test_fullframe_input_goes_through_crop(self, checkpoints):
        reader = LipReader(checkpoints["lipnet"], TINY)
        rng = np.random.default_rng(1)
        frames = rng.integers(0, 255, (8, 64, 128), np.uint8)  # native size
        out = reader.predict_frames(frames)
        assert isinstance(out, str)

    def test_serving_roi_matches_training_pipeline(self, checkpoints):
        """prepare_clip must run the SAME ROI program as the training
        pipeline for every roi_mode — a serving stack that crops
        differently than training silently degrades accuracy."""
        import dataclasses

        from avsync.data.pipeline import LipNetBatcher
        from avsync.predictor import (
            load_localizer_params,
            load_mouth_detector,
            prepare_clip,
        )

        rng = np.random.default_rng(2)
        # T=5 < max_video_length=8: training pads the RAW frames before the
        # ROI program, so box statistics include the zero tail — serving
        # must do the same (computing boxes on unpadded frames diverged by
        # up to 0.86 on [0,1] pixels for 'variance', caught in review)
        frames = rng.integers(0, 255, (5, 64, 128), np.uint8)
        padded = np.concatenate(
            [frames, np.zeros((3, 64, 128), np.uint8)], axis=0
        )
        for roi_mode in ("heuristic", "variance", "model", "detector"):
            cfg = dataclasses.replace(
                TINY, data=dataclasses.replace(TINY.data, roi_mode=roi_mode)
            )
            served = np.asarray(
                prepare_clip(frames, cfg, load_localizer_params(cfg),
                             load_mouth_detector(cfg))
            )
            batcher = LipNetBatcher(None, cfg)
            boxes = (
                batcher._detector.detect_clip(padded)[None]
                if batcher._detector is not None else None
            )
            trained = np.asarray(
                batcher._preprocess(padded[None], boxes)
            )
            np.testing.assert_allclose(
                served[0], trained[0], atol=1e-6,
                err_msg=f"roi_mode={roi_mode}",
            )

    def test_serving_standardize_matches_training(self, checkpoints):
        """TF-family semantics: standardize_clips must apply in serving too,
        over the zero-PADDED clip exactly as the training pipeline does
        (decode pads to max_video_length before preprocess)."""
        import dataclasses

        from avsync.data.pipeline import LipNetBatcher
        from avsync.predictor import prepare_clip

        cfg = dataclasses.replace(
            TINY, data=dataclasses.replace(TINY.data, standardize_clips=True)
        )
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 255, (5, 64, 128), np.uint8)  # < max_len 8
        served = np.asarray(prepare_clip(frames, cfg))
        padded = np.concatenate(
            [frames, np.zeros((3, 64, 128), np.uint8)], axis=0
        )
        trained = np.asarray(
            LipNetBatcher(None, cfg)._preprocess(padded[None])
        )
        assert served.shape == trained.shape
        np.testing.assert_allclose(served[0], trained[0], atol=1e-5)
        # and it really is standardized (per-clip ~zero mean)
        assert abs(float(served.mean())) < 1e-3

    def test_empty_video_raises(self, checkpoints, tmp_path):
        reader = LipReader(checkpoints["lipnet"], TINY)
        p = str(tmp_path / "empty.npy")
        np.save(p, np.zeros((0, 0, 0), np.uint8))
        with pytest.raises(ValueError):
            reader.predict(p)


class TestMisalignmentScorer:
    def test_scores_in_unit_interval_and_shift_sensitivity(self, checkpoints):
        scorer = MisalignmentScorer(
            checkpoints["detector"], checkpoints["lipnet"], TINY
        )
        rng = np.random.default_rng(2)
        frames = rng.integers(0, 255, (8, 16, 32), np.uint8)
        audio = (np.sin(np.linspace(0, 200, 5000)) * 0.5).astype(np.float32)
        probs = scorer.score_arrays(frames, audio, 25.0, shifts=(0, 5, -5))
        assert probs.shape == (3,)
        assert ((probs >= 0) & (probs <= 1)).all()
        # shifted features differ -> scores differ (random heads saturate the
        # sigmoid, so compare relatively rather than with absolute atol)
        rel = abs(float(probs[0]) - float(probs[1])) / max(
            float(probs[0]), float(probs[1]), 1e-30
        )
        assert rel > 1e-3, probs

    def test_score_from_file(self, checkpoints):
        from avsync.data.video import save_wav

        scorer = MisalignmentScorer(
            checkpoints["detector"], checkpoints["lipnet"], TINY
        )
        rng = np.random.default_rng(3)
        clip = os.path.join(checkpoints["root"], "scored.npy")
        np.save(clip, rng.integers(0, 255, (8, 16, 32), np.uint8))
        save_wav(
            os.path.join(checkpoints["root"], "scored.wav"),
            (np.sin(np.linspace(0, 100, 5000)) * 0.4).astype(np.float32),
            16000,
        )
        s = scorer.score(clip, shift_frames=0)
        assert 0.0 <= s <= 1.0

    def test_score_arrays_matches_feature_bank_path(self, checkpoints):
        """score_arrays runs the fused one-program scorer; it must agree
        with the explicit FeatureBank path (build bank -> gather -> score)
        that misalign-eval uses offline."""
        import jax
        import jax.numpy as jnp

        from avsync.features import build_feature_bank, gather_features
        from avsync.predictor import prepare_clip

        scorer = MisalignmentScorer(
            checkpoints["detector"], checkpoints["lipnet"], TINY
        )
        rng = np.random.default_rng(4)
        frames = rng.integers(0, 255, (8, 16, 32), np.uint8)
        audio = (np.sin(np.linspace(0, 150, 6000)) * 0.5).astype(np.float32)
        shifts = (0, 3, -7)
        got = scorer.score_arrays(frames, audio, 25.0, shifts=shifts)

        clips = prepare_clip(frames, TINY)
        bank = build_feature_bank(
            scorer.lipnet, scorer.lip_params, [clips], [audio], [25.0], TINY
        )
        feats = gather_features(
            bank, jnp.zeros(len(shifts), jnp.int32),
            jnp.asarray(np.asarray(shifts, np.int32)), TINY.audio,
        )
        want = np.asarray(jax.nn.sigmoid(
            scorer.detector.apply({"params": scorer.det_params}, feats)
        ))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPredictBatch:
    def test_matches_per_clip_predict(self, checkpoints, tmp_path):
        reader = LipReader(checkpoints["lipnet"], TINY)
        rng = np.random.default_rng(7)
        paths = []
        for i in range(3):
            p = str(tmp_path / f"clip{i}.npy")
            np.save(p, rng.integers(0, 255, (8, 16, 32), np.uint8))
            paths.append(p)
        assert reader.predict_batch(paths) == [reader.predict(p)
                                               for p in paths]

    def test_mixed_geometry_falls_back_per_clip(self, checkpoints, tmp_path):
        reader = LipReader(checkpoints["lipnet"], TINY)
        rng = np.random.default_rng(8)
        a = str(tmp_path / "native.npy")
        np.save(a, rng.integers(0, 255, (8, 64, 128), np.uint8))
        b = str(tmp_path / "cropped.npy")
        np.save(b, rng.integers(0, 255, (8, 16, 32), np.uint8))
        assert reader.predict_batch([a, b]) == [reader.predict(a),
                                                reader.predict(b)]
