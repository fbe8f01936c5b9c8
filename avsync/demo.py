"""Demo export: annotated aligned/misaligned videos with detector scores.

Reference behavior (`misalignment_detection_demo.py:212-278`): for a chosen
video and shift, score the aligned and shifted features, overlay the score as
green text on each frame, optionally upscale 2x, and write
`aligned_demo.*` / `misaligned_demo.*` with the (shifted) audio track.

moviepy is absent here; the mux runs in the native ingest library instead
(avsync/ingest/ingest.cpp `avs_mux_mp4`: libx264 + aac — the reference's
exact artifact format). When the native library is unavailable the fallback
writes cv2.VideoWriter video plus a sibling lossless `.wav`.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from avsync.ops import audio_ref


def annotate_frames(
    frames: np.ndarray,
    text: str,
    scale: int = 1,
) -> np.ndarray:
    """Overlay `text` in green on every frame (uint8 (T,H,W) or (T,H,W,3)).

    Mirrors `annotate_frame_rgb` (`misalignment_detection_demo.py:212-215`):
    cv2.putText, top-left, green.
    """
    import cv2

    out = []
    for f in frames:
        if f.ndim == 2:
            f = cv2.cvtColor(f, cv2.COLOR_GRAY2BGR)
        else:
            f = f.copy()
        if scale != 1:
            f = cv2.resize(
                f, (f.shape[1] * scale, f.shape[0] * scale),
                interpolation=cv2.INTER_NEAREST,
            )
        cv2.putText(
            f, text, (8, 24), cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 255, 0), 2
        )
        out.append(f)
    return np.stack(out)


def write_video(path: str, frames: np.ndarray, fps: float = 25.0) -> str:
    """Write (T,H,W,3) BGR uint8 frames. Container from extension
    (.mp4 -> mp4v, else MJPG .avi). Returns the actual path written."""
    import cv2

    if frames.ndim == 3:
        frames = np.stack([cv2.cvtColor(f, cv2.COLOR_GRAY2BGR) for f in frames])
    h, w = frames.shape[1:3]
    if path.endswith(".mp4"):
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    else:
        if not path.endswith(".avi"):
            path = os.path.splitext(path)[0] + ".avi"
        fourcc = cv2.VideoWriter_fourcc(*"MJPG")
    vw = cv2.VideoWriter(path, fourcc, fps, (w, h))
    if not vw.isOpened():  # container fallback
        path = os.path.splitext(path)[0] + ".avi"
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
    for f in frames:
        vw.write(f)
    vw.release()
    return path


def export_demo(
    video_frames: np.ndarray,
    audio: np.ndarray,
    sample_rate: int,
    fps: float,
    shift_frames: int,
    aligned_score: float,
    misaligned_score: float,
    out_dir: str,
    scale: int = 1,
) -> Tuple[str, str]:
    """Write aligned_demo + misaligned_demo (video + wav pairs).

    Equivalent of `export_demo` (`misalignment_detection_demo.py:241-278`):
    aligned copy keeps original audio; misaligned copy carries the
    zero-fill-shifted audio (`build_shifted_audio_clip`, `:218-228`).
    """
    from avsync.data.video import save_wav
    from avsync.ingest import native

    os.makedirs(out_dir, exist_ok=True)
    aligned = annotate_frames(
        video_frames, f"aligned score={aligned_score:.3f}", scale
    )
    mis = annotate_frames(
        video_frames,
        f"misaligned (shift {shift_frames:+d}) score={misaligned_score:.3f}",
        scale,
    )
    shifted = (
        audio_ref.shift_audio(audio, shift_frames, fps, sample_rate)
        if audio.size
        else audio
    )
    if native.available():
        # one-container artifacts, audio embedded — full reference parity
        p1 = os.path.join(out_dir, "aligned_demo.mp4")
        p2 = os.path.join(out_dir, "misaligned_demo.mp4")
        native.mux_mp4(p1, aligned, fps, audio, sample_rate)
        native.mux_mp4(p2, mis, fps, shifted, sample_rate)
        return p1, p2
    p1 = write_video(os.path.join(out_dir, "aligned_demo.mp4"), aligned, fps)
    p2 = write_video(os.path.join(out_dir, "misaligned_demo.mp4"), mis, fps)
    if audio.size:
        save_wav(os.path.join(out_dir, "aligned_demo.wav"), audio, sample_rate)
        save_wav(
            os.path.join(out_dir, "misaligned_demo.wav"), shifted, sample_rate
        )
    return p1, p2
