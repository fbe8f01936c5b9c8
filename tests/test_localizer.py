"""Learned mouth localizer: accuracy vs synthetic ground truth + pipeline wiring.

The localizer replaces the reference's dlib 68-landmark ROI path
(`train.py:126-188`); ground-truth boxes come from the synthetic corpus
where mouth geometry is known by construction.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from avsync.data import synthetic
from avsync.models import localizer as loc

HAVE_WEIGHTS = os.path.exists(loc._WEIGHTS_FILE)


class TestBoxMath:
    def test_decode_box_valid(self):
        raw = jnp.asarray(np.random.default_rng(0).normal(size=(16, 4)) * 3)
        box = np.asarray(loc.decode_box(raw))
        assert (box[:, 0] <= box[:, 1]).all()
        assert (box[:, 2] <= box[:, 3]).all()
        assert (box >= 0).all() and (box <= 1).all()

    def test_iou_identity_and_disjoint(self):
        a = jnp.asarray([[0.2, 0.6, 0.1, 0.5]])
        b = jnp.asarray([[0.7, 0.9, 0.6, 0.8]])
        assert float(loc.iou(a, a)[0]) == pytest.approx(1.0)
        assert float(loc.iou(a, b)[0]) == 0.0
        # half-overlap case, hand-computed
        c = jnp.asarray([[0.2, 0.6, 0.3, 0.7]])
        assert float(loc.iou(a, c)[0]) == pytest.approx(0.2 / 0.6, rel=1e-5)

    def test_ground_truth_box_covers_mouth(self):
        """mouth_box must contain the bright ellipse of the max-open frame."""
        rng = np.random.default_rng(3)
        center, scale = (0.6, 0.4), 1.2
        video, _ = synthetic.make_clip(
            rng, n_frames=30, height=120, width=200,
            mouth_center=center, mouth_scale=scale,
        )
        box = synthetic.mouth_box(center, scale, 120, 200)
        bright = np.argwhere(video.max(0) > 150)  # mouth pixels across clip
        ys, xs = bright[:, 0] / 120, bright[:, 1] / 200
        assert ys.min() >= box[0] - 0.01 and ys.max() <= box[1] + 0.01
        assert xs.min() >= box[2] - 0.01 and xs.max() <= box[3] + 0.01


@pytest.mark.skipif(not HAVE_WEIGHTS, reason="bundled weights not built")
class TestBundledLocalizer:
    def test_iou_vs_ground_truth(self):
        """Bundled weights localize unseen synthetic mouths (fresh seeds,
        geometries never used in training) with mean IoU >= 0.8."""
        params = loc.load_bundled_params()
        for seed, (h, w) in ((1234, (180, 360)), (99, (120, 160)),
                             (55, (240, 320))):
            rng = np.random.default_rng(seed)
            frames, boxes = synthetic.make_localizer_batch(
                rng, 32, height=h, width=w
            )
            pred = loc.localize_frames(params, jnp.asarray(frames))
            mean_iou = float(loc.iou(pred, jnp.asarray(boxes)).mean())
            assert mean_iou >= 0.8, f"{h}x{w}: mean IoU {mean_iou:.3f}"

    def test_iou_under_degradation(self):
        """The localizer must survive contrast loss, noise and an occluding
        rectangle (the robustness envelope the training augmentation buys —
        the dlib path it replaces handled real-world contrast)."""
        rng = np.random.default_rng(77)
        frames, boxes = synthetic.make_localizer_batch(
            rng, 32, height=160, width=280
        )
        f = frames / max(frames.max(), 1e-6)
        f = np.clip(f * 0.6 + 0.15, 0, 1)  # contrast/brightness shift
        f = np.clip(f + rng.normal(0, 0.05, f.shape).astype(np.float32), 0, 1)
        f[:, 10:40, 20:60] = 0.5  # occluder away from typical mouth region
        params = loc.load_bundled_params()
        pred = loc.localize_frames(params, jnp.asarray(f))
        mean_iou = float(loc.iou(pred, jnp.asarray(boxes)).mean())
        assert mean_iou >= 0.7, f"degraded mean IoU {mean_iou:.3f}"

    def test_clip_boxes_from_clip(self):
        rng = np.random.default_rng(7)
        center, scale = (0.7, 0.55), 1.0
        video, _ = synthetic.make_clip(
            rng, n_frames=16, height=200, width=400,
            mouth_center=center, mouth_scale=scale,
        )
        params = loc.load_bundled_params()
        box = loc.localize_clip_boxes(
            params, jnp.asarray(video, jnp.float32)[None]
        )
        gt = synthetic.mouth_box(center, scale, 200, 400)
        assert float(loc.iou(box[0], jnp.asarray(gt))) >= 0.7

    def test_localizer_beats_heuristic_on_offcenter_mouths(self):
        """Degradation guard: on mouths away from the heuristic-crop region,
        the learned box must retain (nearly) all mouth energy while the
        fixed-fraction crop loses much of it — the reason roi_mode='model'
        exists (`train.py:126-188`'s dlib path vs `dataset.py:216-218`)."""
        rng = np.random.default_rng(42)
        h, w = 160, 320
        params = loc.load_bundled_params()
        retained_model, retained_heur = [], []
        for _ in range(8):
            center = (rng.uniform(0.25, 0.4), rng.uniform(0.75, 0.9))
            video, _ = synthetic.make_clip(
                rng, n_frames=8, height=h, width=w,
                mouth_center=center, mouth_scale=1.0,
            )
            vf = jnp.asarray(video, jnp.float32)[None]
            box = np.asarray(loc.localize_clip_boxes(params, vf))[0]
            heur = np.array([0.6, 1.0, 0.3, 0.7])  # DataConfig.mouth_crop
            bright = video.max(0) > 150  # mouth pixels

            def retention(b):
                y0, y1 = int(b[0] * h), int(b[1] * h)
                x0, x1 = int(b[2] * w), int(b[3] * w)
                return bright[y0:y1, x0:x1].sum() / max(bright.sum(), 1)

            retained_model.append(retention(box))
            retained_heur.append(retention(heur))
        assert np.mean(retained_model) >= 0.9
        assert np.mean(retained_model) > np.mean(retained_heur) + 0.3


class TestGateBoxes:
    def test_degenerate_box_falls_back(self):
        """A box over a motionless corner is replaced by the fallback; the
        ground-truth mouth box is kept (ADVICE r2: silent bad crops)."""
        rng = np.random.default_rng(5)
        center, scale = (0.6, 0.5), 1.2
        video, _ = synthetic.make_clip(
            rng, n_frames=12, height=120, width=200,
            mouth_center=center, mouth_scale=scale,
        )
        clips = jnp.asarray(video, jnp.float32)[None]
        gt = jnp.asarray(synthetic.mouth_box(center, scale, 120, 200),
                         jnp.float32)
        fallback = jnp.asarray([0.6, 1.0, 0.3, 0.7], jnp.float32)
        bad = jnp.asarray([[0.0, 0.15, 0.0, 0.15]], jnp.float32)  # corner
        out_bad = loc.gate_boxes(clips, bad, fallback)
        np.testing.assert_allclose(np.asarray(out_bad[0]),
                                   np.asarray(fallback))
        out_good = loc.gate_boxes(clips, gt[None], fallback)
        np.testing.assert_allclose(np.asarray(out_good[0]), np.asarray(gt))

    def test_static_clip_keeps_model_box(self):
        clips = jnp.zeros((1, 6, 40, 60), jnp.float32)
        box = jnp.asarray([[0.1, 0.4, 0.2, 0.5]], jnp.float32)
        fallback = jnp.asarray([0.6, 1.0, 0.3, 0.7], jnp.float32)
        out = loc.gate_boxes(clips, box, fallback)
        np.testing.assert_allclose(np.asarray(out), np.asarray(box))

    def test_pipeline_model_roi_mode(self, tmp_path):
        """roi_mode='model' produces training batches whose crops contain the
        mouth (high-intensity pixels survive the crop)."""
        from avsync.config import AvsyncConfig, DataConfig
        from avsync.data import GridDataSource, LipNetBatcher

        corpus = str(tmp_path / "data")
        synthetic.write_corpus(
            corpus, n_speakers=1, clips_per_speaker=2, preprocessed=False,
            n_frames=8, height=24, width=40, seed=5,
        )
        cfg = AvsyncConfig(
            data=DataConfig(
                data_path=corpus, img_height=24, img_width=40,
                max_video_length=8, batch_size=2, roi_mode="model",
            )
        )
        src = GridDataSource(corpus, ["s1"])
        batcher = LipNetBatcher(src, cfg)
        batch = next(iter(batcher.epoch(shuffle=False)))
        assert batch["video"].shape == (2, 8, 24, 40, 1)
        v = np.asarray(batch["video"])
        # mouth pixels are ~0.7-0.86 after /255; the crop must contain them
        assert (v > 0.55).mean() > 0.01
