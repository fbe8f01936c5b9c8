"""Analytic FLOP model for the LipNet train step — drives the MFU number in
bench.py and the component budget in scripts/profile_step.py.

Counts useful model FLOPs (multiply-accumulate = 2 FLOPs): convolutions,
GRU projections + recurrence, and the CTC head. Elementwise/pool/softmax/CTC
dynamic-programming costs are negligible next to the conv stack and are not
counted. Backward is the standard 2x forward (one matmul each for dx and dw),
so a train step = 3x forward; rematerialized recompute is intentionally NOT
counted in MFU (it is overhead, not useful work).
"""

from __future__ import annotations

from typing import Tuple

from avsync.config import ModelConfig


def conv_stack_flops(
    cfg: ModelConfig, T: int, H: int, W: int, in_ch: int = 1
) -> int:
    """Forward FLOPs of the conv stack for one clip (SAME conv + (1,2,2) pool)."""
    total = 0
    c_in = in_ch
    h, w = H, W
    for ch, (kt, kh, kw) in zip(cfg.conv_channels, cfg.conv_kernels):
        total += 2 * T * h * w * ch * (c_in * kt * kh * kw)
        c_in = ch
        h, w = h // 2, w // 2
    return total


def gru_stack_flops(cfg: ModelConfig, T: int, feat_dim: int) -> int:
    """Forward FLOPs of the stacked Bi-GRU for one clip."""
    total = 0
    hdim = cfg.hidden_dim
    d = feat_dim
    for _ in range(cfg.num_gru_layers):
        per_dir = 2 * T * d * 3 * hdim + 2 * T * hdim * 3 * hdim
        total += 2 * per_dir  # both directions
        d = 2 * hdim
    return total


def lipnet_forward_flops(
    cfg: ModelConfig, T: int = 75, H: int = 50, W: int = 100
) -> int:
    """Forward FLOPs of the full LipNet for one clip."""
    h, w = H, W
    for _ in cfg.conv_channels:
        h, w = h // 2, w // 2
    feat = cfg.conv_channels[-1] * h * w
    fc = 2 * T * (2 * cfg.hidden_dim) * cfg.vocab_size
    return conv_stack_flops(cfg, T, H, W) + gru_stack_flops(cfg, T, feat) + fc


def lipnet_train_flops(
    cfg: ModelConfig, T: int = 75, H: int = 50, W: int = 100
) -> int:
    """Useful FLOPs of one train step for one clip (fwd + bwd = 3x fwd)."""
    return 3 * lipnet_forward_flops(cfg, T, H, W)


def v5e_peak_flops(dtype: str = "bfloat16") -> float:
    """Per-chip peak of a TPU v5e: 394 TOPS int8, 197 TFLOP/s bf16."""
    return 394e12 if dtype == "int8" else 197e12


def mfu(
    clips_per_sec: float,
    cfg: ModelConfig,
    shape: Tuple[int, int, int] = (75, 50, 100),
    dtype: str = "bfloat16",
) -> float:
    T, H, W = shape
    return clips_per_sec * lipnet_train_flops(cfg, T, H, W) / v5e_peak_flops(dtype)
