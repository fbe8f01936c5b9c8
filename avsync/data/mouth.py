"""Mouth-ROI detection on host; cropping happens device-side from the boxes.

The reference's TF stack uses dlib 68-landmark detection (landmarks 48-60 ->
bbox + 30 px padding, `train.py:126-188`) with a fixed-crop fallback (rows
40-70%, cols 25-75%, `train.py:190-203`). dlib is not available in this
environment; the equivalent CPU stage here is OpenCV Haar cascades (frontal
face -> smile cascade inside the lower face half -> padded bbox), which is
also what the repo's legacy `LipNet/Dataset_Building_Operations` scripts used
(`Re-arrange_dataset.py:13-39`). The detector returns normalized boxes; the
actual crop+resize runs on TPU (avsync.ops.image.crop_resize_boxes), so the
host does detection only — no pixel shuffling in Python.
"""

from __future__ import annotations

import os
import threading
from typing import Optional, Tuple

import numpy as np

CASCADE_DIRS = (
    "/usr/share/opencv4/haarcascades",
    "/usr/local/share/opencv4/haarcascades",
)

# Fixed-crop fallback fractions (`train.py:196-199`): rows [0.4, 0.7],
# cols [0.25, 0.75].
FALLBACK_BOX = (0.4, 0.7, 0.25, 0.75)


def _find_cascade(name: str) -> Optional[str]:
    for d in CASCADE_DIRS:
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    return None


class MouthDetector:
    """Per-frame mouth ROI as a normalized (y0, y1, x0, x1) box."""

    def __init__(self, padding_px: int = 30):
        self.padding_px = padding_px
        self._face = None
        self._mouth = None
        # cv2.CascadeClassifier.detectMultiScale is not thread-safe; the
        # serving daemon calls one shared detector from concurrent HTTP
        # handler threads (predictor.py), so detection is serialized here.
        self._lock = threading.Lock()
        face_xml = _find_cascade("haarcascade_frontalface_default.xml")
        mouth_xml = _find_cascade("haarcascade_smile.xml")
        if face_xml and mouth_xml:
            import cv2

            # OpenCV 5.x removed CascadeClassifier from the core wheel; the
            # cascade path activates only where it exists (like the
            # reference's dlib path, gated at `train.py:130-138`).
            if hasattr(cv2, "CascadeClassifier"):
                face = cv2.CascadeClassifier(face_xml)
                mouth = cv2.CascadeClassifier(mouth_xml)
                if not face.empty() and not mouth.empty():
                    self._face, self._mouth = face, mouth
        self.use_cascade = self._face is not None

    def detect_box(self, gray: np.ndarray) -> Tuple[float, float, float, float]:
        """Normalized mouth box for one grayscale frame; falls back to the
        fixed crop when detection fails (`train.py:130-138,190-203`)."""
        H, W = gray.shape[:2]
        if self.use_cascade:
            with self._lock:
                box = self._detect_cascade(gray)
            if box is not None:
                y0, y1, x0, x1 = box
                return (
                    max(0.0, y0 / H),
                    min(1.0, y1 / H),
                    max(0.0, x0 / W),
                    min(1.0, x1 / W),
                )
        return FALLBACK_BOX

    def _detect_cascade(self, gray: np.ndarray):
        faces = self._face.detectMultiScale(gray, 1.1, 4)
        if len(faces) == 0:
            return None
        # largest face, like dlib's first detection on a single-face frame
        fx, fy, fw, fh = max(faces, key=lambda f: f[2] * f[3])
        lower = gray[fy + fh // 2 : fy + fh, fx : fx + fw]
        if lower.size == 0:
            return None
        mouths = self._mouth.detectMultiScale(lower, 1.5, 8)
        pad = self.padding_px
        if len(mouths) == 0:
            # mouth heuristic inside the face box: lower third
            y0 = fy + int(fh * 0.65) - pad
            y1 = fy + fh + pad
            x0 = fx + int(fw * 0.25) - pad
            x1 = fx + int(fw * 0.75) + pad
            return (y0, y1, x0, x1)
        mx, my, mw, mh = max(mouths, key=lambda m: m[2] * m[3])
        # translate back to frame coords + reference-style padding
        y0 = fy + fh // 2 + my - pad
        y1 = fy + fh // 2 + my + mh + pad
        x0 = fx + mx - pad
        x1 = fx + mx + mw + pad
        return (y0, y1, x0, x1)

    def detect_clip(self, frames: np.ndarray) -> np.ndarray:
        """(T, H, W) -> (T, 4) normalized boxes."""
        return np.asarray(
            [self.detect_box(f) for f in frames], dtype=np.float32
        )

    def extract_mouth(self, frame: np.ndarray) -> np.ndarray:
        """Host-side crop for reference-compat callers (`train.py:140-154`)."""
        H, W = frame.shape[:2]
        y0, y1, x0, x1 = self.detect_box(
            frame if frame.ndim == 2 else frame.mean(-1).astype(np.uint8)
        )
        return frame[int(y0 * H) : int(y1 * H), int(x0 * W) : int(x1 * W)]
