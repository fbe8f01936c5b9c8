"""Host-side utilities: logging, timing, checkpointing."""

from avsync.utils.logging import Logger, format_time
from avsync.utils.checkpoint import CheckpointManager

__all__ = ["Logger", "format_time", "CheckpointManager"]
