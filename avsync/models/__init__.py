"""Flax model definitions: LipNet encoder and misalignment detector."""

from avsync.models.lipnet import BiGRU, LipNet
from avsync.models.detector import MisalignmentDetector

__all__ = ["LipNet", "BiGRU", "MisalignmentDetector"]
