"""Native (C++) ingest stage: libav demux/decode behind a ctypes wrapper."""

from avsync.ingest import native

__all__ = ["native"]
