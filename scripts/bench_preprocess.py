"""Preprocessing-path benchmark (BASELINE.json scenario #2).

Compares:
  A. reference-style host loop — per-frame cv2 decode -> gray -> heuristic
     crop -> resize -> /255 in Python (`dataset.py:201-236`);
  B. avsync pipeline — C++ libav batch decode to uint8 + one jitted device
     program for crop/resize/normalize.

Writes real MJPG containers at GRID-ish geometry (75 frames, 288x360).
Run from /root/repo: python scripts/bench_preprocess.py [n_clips]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_clips(n, T=75, H=288, W=360):
    import cv2

    d = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    base = (rng.random((H, W)) * 180).astype(np.uint8)
    paths = []
    for i in range(n):
        p = os.path.join(d, f"clip{i}.avi")
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 25.0, (W, H))
        for t in range(T):
            f = np.clip(base.astype(int) + (t + i) % 13, 0, 255).astype(np.uint8)
            vw.write(cv2.cvtColor(f, cv2.COLOR_GRAY2BGR))
        vw.release()
        paths.append(p)
    return paths


def reference_loop(paths, img_w=100, img_h=50):
    """Per-frame Python/cv2 pipeline, as the reference does it."""
    import cv2

    out = []
    for p in paths:
        cap = cv2.VideoCapture(p)
        frames = []
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            h, w = gray.shape
            mouth = gray[int(h * 0.6):, int(w * 0.3): int(w * 0.7)]
            frames.append(cv2.resize(mouth, (img_w, img_h)) / 255.0)
            if len(frames) >= 75:
                break
        cap.release()
        out.append(np.asarray(frames, np.float32))
    return out


def avsync_pipeline(paths):
    import jax
    import jax.numpy as jnp

    from avsync.ingest import native
    from avsync.ops import image

    pre = jax.jit(lambda f: image.preprocess_clips(f.astype(jnp.float32)))
    results = native.decode_batch(paths, max_frames=75)
    raw = np.stack([r[0] for r in results])  # (N, 75, H, W) uint8
    out = pre(jnp.asarray(raw))
    float(jnp.sum(out))  # honest device sync (axon tunnel)
    return out


def avsync_roi_pipeline(paths):
    """Decode-time C++ crop+resize: only 50x100 crops cross the link."""
    import jax
    import jax.numpy as jnp

    from avsync.ingest import native

    norm = jax.jit(lambda f: f.astype(jnp.float32) * (1.0 / 255.0))
    results = native.decode_batch_roi(
        paths, crop=(0.6, 1.0, 0.3, 0.7), out_hw=(50, 100), max_frames=75
    )
    raw = np.stack([r[0] for r in results])
    out = norm(jnp.asarray(raw))
    float(jnp.sum(out))
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    paths = make_clips(n)

    t0 = time.perf_counter()
    ref = reference_loop(paths)
    t_ref = time.perf_counter() - t0

    avsync_pipeline(paths[:2])  # warmup/compile
    t0 = time.perf_counter()
    out = avsync_pipeline(paths)
    t_av = time.perf_counter() - t0

    avsync_roi_pipeline(paths[:2])
    t0 = time.perf_counter()
    out_roi = avsync_roi_pipeline(paths)
    t_roi = time.perf_counter() - t0

    # value sanity: pipelines should agree closely on the same clip
    a = np.asarray(out)[0, : ref[0].shape[0], ..., 0]
    err = float(np.abs(a - ref[0]).max())
    b = np.asarray(out_roi)[0, : ref[0].shape[0]]
    err_roi = float(np.abs(b - ref[0]).max())

    print(json.dumps({
        "metric": "preprocess_clips_per_sec",
        "reference_python_cv2": round(n / t_ref, 2),
        "avsync_fullframe_to_tpu": round(n / t_av, 2),
        "avsync_roi_ingest": round(n / t_roi, 2),
        "speedup_roi_vs_reference": round(t_ref / t_roi, 2),
        "max_abs_diff_fullframe": round(err, 5),
        "max_abs_diff_roi": round(err_roi, 5),
        "cpu_cores": os.cpu_count(),
        "note": (
            "all paths are MJPG-decode-bound on this host; the C++ thread "
            "pool scales with cores (1 here) and the full-frame device path "
            "assumes PCIe-class host->device bandwidth (the axon tunnel "
            "moves ~50 MB/s). roi diff vs cv2 reflects swscale's "
            "anti-aliased downscale vs INTER_LINEAR's aliasing — the "
            "device path (crop_resize_boxes) is the exact-parity route."
        ),
    }))


if __name__ == "__main__":
    main()
