"""Device-side video-frame preprocessing: gray, crop, resize, normalize, pad.

The reference does all of this per frame on host CPU with OpenCV
(`dataset.py:201-236`: BGR->gray, heuristic mouth crop = rows [0.6H, H) x
cols [0.3W, 0.7W), `cv2.resize` to 100x50 INTER_LINEAR, /255, pad/truncate to
75 frames; `train.py:224-273` is the TF stack's variant with 140x46 and
per-clip standardization). Here the whole batch is one jitted device program:
static-shape crops, a gather-based bilinear resize with cv2's half-pixel
convention, and masked padding.

cv2.resize on uint8 inputs uses fixed-point arithmetic; this float pipeline
matches cv2's float path to ~1e-6 and the uint8 path to ~1/255 (after /255
normalization that is ~4e-3) — below any effect on CER/WER.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ITU-R BT.601 luma weights, matching cv2.cvtColor BGR2GRAY / RGB2GRAY.
_LUMA_RGB = (0.299, 0.587, 0.114)


def rgb_to_gray(frames: jax.Array) -> jax.Array:
    """(..., 3) RGB -> (...) gray, cv2 BT.601 weights."""
    r, g, b = frames[..., 0], frames[..., 1], frames[..., 2]
    return _LUMA_RGB[0] * r + _LUMA_RGB[1] * g + _LUMA_RGB[2] * b


def bgr_to_gray(frames: jax.Array) -> jax.Array:
    b, g, r = frames[..., 0], frames[..., 1], frames[..., 2]
    return _LUMA_RGB[0] * r + _LUMA_RGB[1] * g + _LUMA_RGB[2] * b


def _linear_coords(out_size: int, in_size: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cv2 INTER_LINEAR sampling: src = (dst + 0.5) * in/out - 0.5, clamped."""
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    x0 = np.floor(src).astype(np.int32)
    frac = (src - x0).astype(np.float32)
    # cv2 clamps the *fractional part* contributions at the borders: replicate
    # edge pixels by clamping indices, and zero the weight where src < 0.
    frac = np.where(x0 < 0, 0.0, frac)
    x0c = np.clip(x0, 0, in_size - 1)
    x1c = np.clip(x0 + 1, 0, in_size - 1)
    return x0c, x1c, frac


def resize_bilinear(frames: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize of (..., H, W) to (..., h, w), cv2 INTER_LINEAR
    half-pixel convention with edge replication. Gather-based; fuses into the
    surrounding jit program."""
    H, W = frames.shape[-2], frames.shape[-1]
    h, w = out_hw
    y0, y1, fy = _linear_coords(h, H)
    x0, x1, fx = _linear_coords(w, W)
    fy = jnp.asarray(fy)[..., :, None]  # (h, 1)
    fx = jnp.asarray(fx)[None, :]  # (1, w)

    rows0 = frames[..., y0, :]
    rows1 = frames[..., y1, :]
    top = rows0[..., x0] * (1 - fx) + rows0[..., x1] * fx
    bot = rows1[..., x0] * (1 - fx) + rows1[..., x1] * fx
    return top * (1 - fy) + bot * fy


def mouth_crop(
    frames: jax.Array, crop: Tuple[float, float, float] = (0.6, 0.3, 0.7)
) -> jax.Array:
    """Heuristic mouth ROI (`dataset.py:216-218`): rows [row0*H, H), cols
    [c0*W, c1*W). Static slice — crop fractions and frame geometry are
    compile-time constants."""
    H, W = frames.shape[-2], frames.shape[-1]
    r0, c0, c1 = int(H * crop[0]), int(W * crop[1]), int(W * crop[2])
    return frames[..., r0:, c0:c1]


def preprocess_clips(
    frames: jax.Array,
    out_hw: Tuple[int, int] = (50, 100),
    crop: Tuple[float, float, float] = (0.6, 0.3, 0.7),
    normalize: bool = True,
) -> jax.Array:
    """Full device-side preprocessing of decoded gray frames.

    (B, T, H, W) raw gray (0..255 float) -> (B, T, h, w, 1) in [0, 1]:
    crop -> bilinear resize -> /255 -> channel dim. One fused XLA program.
    """
    x = mouth_crop(frames, crop)
    x = resize_bilinear(x, out_hw)
    if normalize:
        x = x * (1.0 / 255.0)
    return x[..., None]


def standardize_clips(clips: jax.Array, eps: float = 0.0) -> jax.Array:
    """Per-clip (mean, std) standardization — the TF stack's normalization
    (`train.py:266-273`, which uses tf.math.reduce_std = population std).
    clips: (B, T, H, W[, C]); statistics over all but the batch axis."""
    axes = tuple(range(1, clips.ndim))
    mean = jnp.mean(clips, axis=axes, keepdims=True)
    std = jnp.std(clips, axis=axes, keepdims=True)
    return (clips - mean) / jnp.maximum(std, 1e-8 if eps == 0.0 else eps)


def pad_or_truncate_time(
    clips: jax.Array, max_len: int
) -> Tuple[jax.Array, jax.Array]:
    """(B, T, ...) -> (B, max_len, ...) zero-padded/truncated + valid lengths.

    Matches `dataset.py:245-251` (zero pad at the tail, truncate overflow).
    """
    B, T = clips.shape[0], clips.shape[1]
    if T >= max_len:
        out = clips[:, :max_len]
    else:
        pad_widths = [(0, 0), (0, max_len - T)] + [(0, 0)] * (clips.ndim - 2)
        out = jnp.pad(clips, pad_widths)
    lengths = jnp.full((B,), min(T, max_len), jnp.int32)
    return out, lengths


def crop_resize_boxes(
    frames: jax.Array, boxes: jax.Array, out_hw: Tuple[int, int]
) -> jax.Array:
    """ROI-align-style crop+resize from per-frame normalized boxes, on device.

    frames: (..., H, W); boxes: (..., 4) as (y0, y1, x0, x1) in [0, 1] —
    e.g. host-side mouth detections (avsync.data.mouth.MouthDetector). Each
    frame is bilinearly sampled on an out_hw grid spanning its own box with
    cv2 half-pixel convention, so a full-frame box reproduces
    `resize_bilinear` exactly. One fused XLA program; batch/time dims vmap.
    """
    H, W = frames.shape[-2], frames.shape[-1]
    h, w = out_hw

    def one(frame, box):
        y0, y1, x0, x1 = box[0], box[1], box[2], box[3]
        bh = (y1 - y0) * H
        bw = (x1 - x0) * W
        sy = (jnp.arange(h) + 0.5) * (bh / h) - 0.5 + y0 * H
        sx = (jnp.arange(w) + 0.5) * (bw / w) - 0.5 + x0 * W
        yf = jnp.floor(sy)
        xf = jnp.floor(sx)
        fy = jnp.where(yf < 0, 0.0, sy - yf)[:, None]
        fx = jnp.where(xf < 0, 0.0, sx - xf)[None, :]
        yi0 = jnp.clip(yf.astype(jnp.int32), 0, H - 1)
        yi1 = jnp.clip(yf.astype(jnp.int32) + 1, 0, H - 1)
        xi0 = jnp.clip(xf.astype(jnp.int32), 0, W - 1)
        xi1 = jnp.clip(xf.astype(jnp.int32) + 1, 0, W - 1)
        r0 = frame[yi0, :]
        r1 = frame[yi1, :]
        top = r0[:, xi0] * (1 - fx) + r0[:, xi1] * fx
        bot = r1[:, xi0] * (1 - fx) + r1[:, xi1] * fx
        return top * (1 - fy) + bot * fy

    lead = frames.shape[:-2]
    flat_frames = frames.reshape((-1,) + frames.shape[-2:])
    flat_boxes = boxes.reshape((-1, 4))
    out = jax.vmap(one)(flat_frames, flat_boxes)
    return out.reshape(lead + (h, w))


def variance_mouth_boxes(
    clips: jax.Array,
    box_frac: Tuple[float, float] = (0.35, 0.45),
    lower_half_only: bool = True,
) -> jax.Array:
    """Model-free, fully on-device mouth localization from temporal variance.

    A talking mouth is the highest-temporal-variance region of a lip-reading
    clip. For each clip (B, T, H, W): per-pixel variance over time, blurred
    by a box filter the size of the target ROI (box_frac of H and W),
    restricted to the lower half (where GRID mouths live, cf. the heuristic
    at `dataset.py:216-218`), argmax -> one (y0, y1, x0, x1) normalized box
    per clip. This is the TPU-native replacement for dlib/Haar detection in
    environments without those models — no host work, no weights, jittable.
    """
    B, T, H, W = clips.shape
    bh = max(2, int(H * box_frac[0]))
    bw = max(2, int(W * box_frac[1]))

    var = jnp.var(clips.astype(jnp.float32), axis=1)  # (B, H, W)
    # integral-image box sum -> mean variance inside each candidate box
    ii = jnp.cumsum(jnp.cumsum(var, axis=1), axis=2)
    ii = jnp.pad(ii, ((0, 0), (1, 0), (1, 0)))
    nh, nw = H - bh + 1, W - bw + 1
    score = (
        ii[:, bh : bh + nh, bw : bw + nw]
        - ii[:, bh : bh + nh, :nw]
        - ii[:, :nh, bw : bw + nw]
        + ii[:, :nh, :nw]
    )  # (B, nh, nw): sum of var in box with top-left (y, x)
    if lower_half_only:
        rows = jax.lax.broadcasted_iota(jnp.int32, (nh, nw), 0)
        score = jnp.where(rows[None] + bh // 2 >= H // 2, score, -jnp.inf)
    flat = score.reshape(B, -1)
    idx = jnp.argmax(flat, axis=1)
    y = (idx // nw).astype(jnp.float32)
    x = (idx % nw).astype(jnp.float32)
    return jnp.stack(
        [y / H, (y + bh) / H, x / W, (x + bw) / W], axis=-1
    )  # (B, 4)


def resize_area(frames: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """cv2 INTER_AREA for integer downscale factors (box average) — the TF
    stack resizes with INTER_AREA (`train.py:252`). Non-integer factors fall
    back to bilinear (cv2's INTER_AREA degenerates similarly for upscaling)."""
    H, W = frames.shape[-2], frames.shape[-1]
    h, w = out_hw
    if H % h == 0 and W % w == 0:
        fh, fw = H // h, W // w
        shape = frames.shape[:-2] + (h, fh, w, fw)
        return jnp.mean(frames.reshape(shape), axis=(-3, -1))
    return resize_bilinear(frames, out_hw)
