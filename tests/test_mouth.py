"""Mouth-ROI detection + device-side box crop tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from avsync.data.mouth import FALLBACK_BOX, MouthDetector
from avsync.ops import image


class TestDetector:
    def test_fallback_on_blank_frame(self):
        det = MouthDetector()
        box = det.detect_box(np.zeros((120, 160), np.uint8))
        assert box == FALLBACK_BOX

    def test_boxes_normalized(self):
        det = MouthDetector()
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 255, (90, 120), np.uint8)
        y0, y1, x0, x1 = det.detect_box(frame)
        assert 0.0 <= y0 < y1 <= 1.0
        assert 0.0 <= x0 < x1 <= 1.0

    def test_detect_clip_shape(self):
        det = MouthDetector()
        clip = np.zeros((5, 60, 80), np.uint8)
        boxes = det.detect_clip(clip)
        assert boxes.shape == (5, 4)

    def test_cascade_detection_serialized_across_threads(self):
        # cv2 CascadeClassifier.detectMultiScale is not thread-safe; the
        # serving daemon shares ONE detector across HTTP handler threads
        # (predictor.py), so detect_box must serialize cascade calls.
        import threading
        import time

        det = MouthDetector()
        det.use_cascade = True  # force the locked path (no cv2 needed:
        # _detect_cascade is stubbed below)
        state = {"cur": 0, "max": 0}
        guard = threading.Lock()

        def fake_detect(gray):
            with guard:
                state["cur"] += 1
                state["max"] = max(state["max"], state["cur"])
            time.sleep(0.002)
            with guard:
                state["cur"] -= 1
            return None  # -> FALLBACK_BOX

        det._detect_cascade = fake_detect
        clip = np.zeros((8, 60, 80), np.uint8)
        results = [None] * 4
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(
                    i, det.detect_clip(clip))
            )
            for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert state["max"] == 1  # never two cascade calls in flight
        for r in results:
            np.testing.assert_array_equal(
                r, np.tile(np.float32(FALLBACK_BOX), (8, 1))
            )

    def test_extract_mouth_fallback_matches_reference_fracs(self):
        det = MouthDetector()
        det.use_cascade = False  # force fallback path (`train.py:190-203`)
        frame = np.arange(100 * 200, dtype=np.uint8).reshape(100, 200) % 255
        crop = det.extract_mouth(frame)
        assert crop.shape == (30, 100)  # rows 40..70, cols 50..150


class TestCropResizeBoxes:
    def test_full_frame_box_equals_resize(self):
        rng = np.random.default_rng(1)
        frames = rng.random((2, 3, 40, 60)).astype(np.float32)
        boxes = np.tile(
            np.array([0.0, 1.0, 0.0, 1.0], np.float32), (2, 3, 1)
        )
        out = image.crop_resize_boxes(jnp.asarray(frames), jnp.asarray(boxes), (20, 30))
        ref = image.resize_bilinear(jnp.asarray(frames), (20, 30))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_subbox_matches_manual_crop_resize(self):
        import cv2

        rng = np.random.default_rng(2)
        frame = rng.random((80, 100)).astype(np.float32)
        box = np.array([0.25, 0.75, 0.1, 0.6], np.float32)
        out = np.asarray(
            image.crop_resize_boxes(
                jnp.asarray(frame)[None], jnp.asarray(box)[None], (50, 100)
            )
        )[0]
        # pixel-aligned crop then cv2 resize. Interiors must agree; at box
        # edges the semantics intentionally differ (cv2 replicates the crop
        # edge, crop_resize_boxes samples true frame content ROI-align
        # style), so exclude the 1-px border.
        crop = frame[20:60, 10:60]
        ref = cv2.resize(crop, (100, 50))
        np.testing.assert_allclose(out[1:-1, 1:-1], ref[1:-1, 1:-1], atol=1e-3)

    def test_variance_localizer_finds_active_region(self):
        """Synthetic clip with a flickering patch in the lower-left — the
        on-device variance localizer must box it."""
        rng = np.random.default_rng(5)
        B, T, H, W = 2, 20, 40, 60
        clips = rng.normal(0, 0.01, (B, T, H, W)).astype(np.float32)
        # active "mouth" at rows 28-36, cols 10-25
        flicker = rng.normal(0, 1.0, (B, T, 8, 15)).astype(np.float32)
        clips[:, :, 28:36, 10:25] += flicker
        boxes = np.asarray(image.variance_mouth_boxes(jnp.asarray(clips)))
        for b in range(B):
            y0, y1, x0, x1 = boxes[b] * np.array([H, H, W, W])
            cy, cx = (y0 + y1) / 2, (x0 + x1) / 2
            assert 26 <= cy <= 38, boxes[b]
            assert 8 <= cx <= 27, boxes[b]

    def test_heterogeneous_boxes_per_frame(self):
        rng = np.random.default_rng(3)
        frames = rng.random((1, 2, 30, 30)).astype(np.float32)
        boxes = np.array(
            [[[0.0, 0.5, 0.0, 0.5], [0.5, 1.0, 0.5, 1.0]]], np.float32
        )
        out = np.asarray(
            image.crop_resize_boxes(jnp.asarray(frames), jnp.asarray(boxes), (10, 10))
        )
        assert out.shape == (1, 2, 10, 10)
        # the two crops cover different corners -> different content
        assert not np.allclose(out[0, 0], out[0, 1])
