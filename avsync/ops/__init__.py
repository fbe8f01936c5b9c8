"""TPU-native compute ops: conv3d/pool, scan-based GRU, CTC, MFCC, image."""

from avsync.ops.conv import conv3d, max_pool3d
from avsync.ops.gru import GRUParams, bigru, gru_scan, init_gru_params
from avsync.ops.ctc import ctc_loss_mean

__all__ = [
    "conv3d",
    "max_pool3d",
    "GRUParams",
    "bigru",
    "gru_scan",
    "init_gru_params",
    "ctc_loss_mean",
]
