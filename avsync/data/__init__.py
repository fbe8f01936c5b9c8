"""Data layer: GRID corpus discovery, host decode, batching, synthetic data."""

from avsync.data.grid import (
    GridDataSource,
    check_data_structure,
    discover_speakers,
    split_speakers,
    split_videos,
)
from avsync.data.pipeline import LipNetBatcher, prefetch

__all__ = [
    "GridDataSource",
    "check_data_structure",
    "discover_speakers",
    "split_speakers",
    "split_videos",
    "LipNetBatcher",
    "prefetch",
]
