"""Hand-written Pallas TPU kernels for the hot sequential ops."""

from avsync.ops.pallas.gru import pallas_gru_scan

__all__ = ["pallas_gru_scan"]
