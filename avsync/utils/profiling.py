"""Tracing / profiling / metrics: the observability subsystem.

The reference's observability is a Keras TensorBoard callback
(`train.py:745-748`) plus hand-rolled `time.time()` epoch timing
(`misalignment_detection_train.py:48-60,420-423`). The TPU-native equivalents:

  * `StepTimer` — per-step wall timing with warmup exclusion and p50/p95
    summaries (compile steps would otherwise poison means). Synchronization
    caveat: on the axon tunnel `block_until_ready` returns early, so timers
    here are only honest when the caller fetches a value per step (the
    trainer fetches the loss scalar).
  * `trace` — context manager over `jax.profiler` emitting a TensorBoard-
    loadable trace directory (guarded: profiling may be unsupported on a
    given backend; it degrades to a no-op with a warning).
  * `MetricsWriter` — append-only JSONL of scalar metrics per step/epoch
    (the artifact equivalent of TensorBoard event files; TensorBoard itself
    is not a dependency).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
import warnings
from typing import Any, Dict, List, Optional


class StepTimer:
    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._all: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._all.append(time.perf_counter() - self._t0)

    @property
    def times(self) -> List[float]:
        return self._all[self.warmup :]

    def summary(self) -> Dict[str, float]:
        ts = sorted(self.times)
        if not ts:
            return {"steps": 0}
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p95_s": ts[min(n - 1, int(n * 0.95))],
            "total_s": sum(self._all),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace into `log_dir` (view with TensorBoard's profile
    plugin). No-op with a warning where the backend can't profile."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # backend without profiler support
        warnings.warn(f"jax.profiler unavailable ({e}); tracing disabled")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                warnings.warn(f"stop_trace failed: {e}")


class MetricsWriter:
    """Append-only JSONL metrics log: one {step, tag: value, ...} per line."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._f = open(path, "a")

    def write(self, step: int, **scalars: Any) -> None:
        rec: Dict[str, Any] = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()

    @staticmethod
    def read(path: str) -> List[Dict[str, Any]]:
        with open(path) as f:
            return [json.loads(line) for line in f if line.strip()]
