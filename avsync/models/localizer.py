"""Learned mouth-ROI localizer — the TPU-native stand-in for dlib landmarks.

The reference's primary mouth-ROI path is dlib 68-landmark detection
(`train.py:126-188`: landmarks 48-60 -> bbox + 30 px padding) running on the
host CPU per frame. dlib does not exist in this environment, and per-frame
host inference is exactly the kind of Python hot loop the TPU build avoids.
This module replaces it with a ~7k-parameter conv box-regressor that runs
ON DEVICE, batched over clips:

  * input: the clip's temporal mean frame (face position is static within a
    GRID clip), resized to a fixed 48x96 so the program compiles once;
  * output: one normalized (y0, y1, x0, x1) mouth box per clip, consumed by
    the same `crop_resize_boxes` device crop as the detector/variance modes;
  * weights: bundled (localizer_weights.npz), trained on the synthetic
    corpus where the mouth box is known by construction
    (avsync/data/synthetic.py, scripts/train_localizer.py).

Selected with DataConfig.roi_mode = "model".
"""

from __future__ import annotations

import os
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avsync.ops.image import resize_bilinear

# Fixed network input geometry (H, W): clips are resized here before the net.
NET_HW: Tuple[int, int] = (48, 96)

_WEIGHTS_FILE = os.path.join(os.path.dirname(__file__), "localizer_weights.npz")


class MouthLocalizer(nn.Module):
    """(B, 48, 96, 1) f32 in [0,1] -> (B, 4) normalized (y0, y1, x0, x1).

    Soft-argmax head: a 1-channel heatmap over the final conv grid gives the
    box center as an attention-weighted expectation (global pooling would
    discard exactly the spatial information a localizer needs); the box size
    comes from the attention-pooled features.
    """

    widths: Tuple[int, int, int] = (8, 16, 32)
    dense_dim: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (3, 3), strides=(2, 2), name=f"conv{i + 1}")(x)
            x = nn.relu(x)
        B, gh, gw, C = x.shape
        heat = nn.Conv(1, (1, 1), name="heat")(x).reshape(B, gh * gw)
        p = jax.nn.softmax(heat, axis=-1).reshape(B, gh, gw)
        # normalized cell-center coordinates of the feature grid
        ys = (jnp.arange(gh, dtype=x.dtype) + 0.5) / gh
        xs = (jnp.arange(gw, dtype=x.dtype) + 0.5) / gw
        cy = jnp.einsum("bhw,h->b", p, ys)
        cx = jnp.einsum("bhw,w->b", p, xs)
        pooled = jnp.einsum("bhw,bhwc->bc", p, x)  # attention pooling
        z = nn.relu(nn.Dense(self.dense_dim, name="fc1")(pooled))
        size_raw = nn.Dense(2, name="fc2")(z)
        bh = 0.05 + 0.9 * jax.nn.sigmoid(size_raw[..., 0])
        bw = 0.05 + 0.9 * jax.nn.sigmoid(size_raw[..., 1])
        return center_size_to_box(cy, cx, bh, bw)


def center_size_to_box(cy, cx, bh, bw) -> jax.Array:
    """(center, size) -> clipped normalized (y0, y1, x0, x1)."""
    y0 = jnp.clip(cy - bh / 2, 0.0, 1.0)
    y1 = jnp.clip(cy + bh / 2, 0.0, 1.0)
    x0 = jnp.clip(cx - bw / 2, 0.0, 1.0)
    x1 = jnp.clip(cx + bw / 2, 0.0, 1.0)
    return jnp.stack([y0, y1, x0, x1], axis=-1)


def decode_box(raw: jax.Array) -> jax.Array:
    """4 raw logits -> a valid normalized box via (center, size) params.

    cy, cx in (0, 1); box height/width in (0.05, 0.95) — always a non-empty
    box, clipped to the frame.
    """
    return center_size_to_box(
        jax.nn.sigmoid(raw[..., 0]),
        jax.nn.sigmoid(raw[..., 1]),
        0.05 + 0.9 * jax.nn.sigmoid(raw[..., 2]),
        0.05 + 0.9 * jax.nn.sigmoid(raw[..., 3]),
    )


def localize_frames(params, frames: jax.Array) -> jax.Array:
    """(B, H, W) f32 [0, 255] or [0, 1] -> (B, 4) boxes."""
    x = frames
    # normalize scale: works for both uint8-range and unit-range inputs
    x = x / jnp.maximum(x.max(axis=(1, 2), keepdims=True), 1e-6)
    x = resize_bilinear(x, NET_HW)[..., None]
    return MouthLocalizer().apply({"params": params}, x)


def localize_clip_boxes(params, clips: jax.Array) -> jax.Array:
    """(B, T, H, W) f32 -> (B, 4): one box per clip from the temporal mean
    frame (the bundled weights are trained on exactly this statistic)."""
    return localize_frames(params, clips.mean(axis=1))


def gate_boxes(
    clips: jax.Array,
    boxes: jax.Array,
    fallback: jax.Array,
    threshold: float = 1.0,
) -> jax.Array:
    """Per-clip sanity gate on predicted boxes (degenerate-box fallback).

    The bundled weights are trained on the synthetic mouth distribution
    only; on out-of-distribution video a regressed box can be degenerate.
    A correct mouth box captures above-average temporal motion (the mouth is
    what moves in a talking-head clip), so: boxes whose interior mean
    temporal variance falls below `threshold` x the frame-wide mean are
    replaced by `fallback` (the heuristic crop fractions). Fully static
    clips trivially pass (0 >= 0) and keep the model box, which is harmless.

    Padded tail frames (all-zero, appended by the decoder when a clip is
    shorter than max_video_length) are excluded from the variance: without
    the mask the content-to-black transition dominates and the statistic
    becomes a brightness comparator instead of a motion one, mis-gating
    correct boxes over bright regions.

    clips: (B, T, H, W) f32; boxes: (B, 4) normalized; fallback: (4,).
    """
    # valid-frame mask: a padded frame is exactly zero everywhere
    valid = (clips != 0).any(axis=(2, 3))  # (B, T)
    w = valid.astype(clips.dtype)[:, :, None, None]  # (B, T, 1, 1)
    n = jnp.maximum(w.sum(axis=1), 1.0)  # (B, 1, 1)
    mean = (clips * w).sum(axis=1) / n
    motion = (((clips - mean[:, None]) ** 2) * w).sum(axis=1) / n  # (B, H, W)
    B, H, W = motion.shape
    yy = (jnp.arange(H, dtype=motion.dtype) + 0.5) / H
    xx = (jnp.arange(W, dtype=motion.dtype) + 0.5) / W
    inside = (
        (yy[None, :, None] >= boxes[:, 0, None, None])
        & (yy[None, :, None] < boxes[:, 1, None, None])
        & (xx[None, None, :] >= boxes[:, 2, None, None])
        & (xx[None, None, :] < boxes[:, 3, None, None])
    )
    area = jnp.maximum(inside.sum(axis=(1, 2)), 1)
    inbox = (motion * inside).sum(axis=(1, 2)) / area
    overall = motion.mean(axis=(1, 2))
    ok = inbox >= threshold * overall
    return jnp.where(ok[:, None], boxes, fallback[None, :])


def iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise IoU of (..., 4) boxes in (y0, y1, x0, x1) form."""
    iy = jnp.maximum(
        0.0, jnp.minimum(a[..., 1], b[..., 1]) - jnp.maximum(a[..., 0], b[..., 0])
    )
    ix = jnp.maximum(
        0.0, jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 2], b[..., 2])
    )
    inter = iy * ix
    area = lambda z: jnp.maximum(0.0, z[..., 1] - z[..., 0]) * jnp.maximum(
        0.0, z[..., 3] - z[..., 2]
    )
    return inter / jnp.maximum(area(a) + area(b) - inter, 1e-9)


def save_params(params, path: str = _WEIGHTS_FILE) -> None:
    from flax.traverse_util import flatten_dict

    flat = {
        "/".join(k): np.asarray(v)
        for k, v in flatten_dict(jax.device_get(params)).items()
    }
    np.savez(path, **flat)


def load_bundled_params(path: str = _WEIGHTS_FILE):
    """Bundled weights -> flax param tree. Raises FileNotFoundError when the
    bundle is absent (callers fall back to the heuristic crop)."""
    from flax.traverse_util import unflatten_dict

    with np.load(path) as z:
        flat = {tuple(k.split("/")): jnp.asarray(z[k]) for k in z.files}
    return unflatten_dict(flat)


def load_bundled_params_or_none(path: str = _WEIGHTS_FILE):
    """Bundled weights, or None (with a warning) when the bundle is absent —
    the ONE definition of the missing-weights fallback policy, shared by the
    training pipeline and the serving API so the two can't drift."""
    try:
        return load_bundled_params(path)
    except FileNotFoundError:
        import warnings

        warnings.warn(
            "localizer weight bundle missing; roi_mode='model' "
            "falls back to the heuristic crop"
        )
        return None
