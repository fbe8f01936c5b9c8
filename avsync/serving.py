"""Production serving: dynamic batching + a stdlib HTTP daemon.

The reference's inference story is one-off scripts that rebuild the model
per invocation (`predict.py:17-105`, `train.py:998-1075`,
`misalignment_detection_demo.py:301-363`). avsync's serving stack layers:

  predictor.LipReader / MisalignmentScorer   (load once, jitted steps)
      -> DynamicBatcher                      (coalesce concurrent requests
                                              into MXU-sized batches)
      -> AvsyncServer (`avsync serve`)       (HTTP surface + /v1/stats)

Why dynamic batching matters on TPU: a single-clip forward leaves the MXU
almost idle — the conv GEMMs at B=1 cannot fill the 128-lane systolic
array, and each dispatch pays a full host->device round trip. Batching
concurrent requests multiplies throughput at near-constant latency until
the step becomes compute-bound (PERF.md's serving table: the same forward
is ~10x cheaper per clip at B=8 than at B=1). Batches are padded up to
power-of-two bucket sizes so XLA compiles O(log max_batch) programs
instead of one per occupancy.

Everything here is stdlib-only (http.server, queue, threading) — no web
framework dependency to pin.
"""

from __future__ import annotations

import io
import json
import threading
import time
from collections import Counter, deque
from concurrent.futures import Future
from dataclasses import dataclass
from queue import Empty, Queue
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

__all__ = [
    "DynamicBatcher",
    "ServingStats",
    "TranscribeService",
    "SyncScoreService",
    "ArtifactTranscribeService",
    "ArtifactSyncScoreService",
    "AvsyncServer",
]


def _decode_frames(video_path: str, max_frames: int) -> np.ndarray:
    """Shared host decode for the *_path endpoints (live + artifact)."""
    from avsync.data.video import decode_video_gray

    frames = decode_video_gray(video_path, max_frames=max_frames)
    if frames.size == 0:
        raise ValueError(f"no frames decoded from {video_path}")
    return frames


def _decode_av(video_path: str, max_frames: int, sample_rate: int,
               default_fps: float):
    """Shared frames+audio+fps decode for the sync-score *_path
    endpoints (live + artifact)."""
    from avsync.data.video import get_video_fps, load_audio_for_video
    from avsync.ops.audio import resample_host

    frames = _decode_frames(video_path, max_frames)
    audio, sr = load_audio_for_video(video_path, sample_rate)
    if sr != sample_rate:
        audio = resample_host(audio, sr, sample_rate)
    fps = get_video_fps(video_path, default_fps)
    return frames, audio, fps


# ---------------------------------------------------------------------------
# stats
# ---------------------------------------------------------------------------


class ServingStats:
    """Thread-safe request/batch counters + latency percentiles.

    Latencies are kept in a bounded deque (last `window` requests) — a
    long-lived daemon must not grow memory with request count.
    """

    def __init__(self, window: int = 4096):
        self._lock = threading.Lock()
        self.requests = 0
        self.errors = 0
        self.batch_sizes: Counter = Counter()
        self._latencies: deque = deque(maxlen=window)
        self.started = time.time()

    def record_batch(self, n_real: int, n_padded: int,
                     latencies_s: Sequence[float]) -> None:
        with self._lock:
            self.requests += n_real
            self.batch_sizes[n_padded] += 1
            self._latencies.extend(latencies_s)

    def record_error(self, n: int = 1) -> None:
        with self._lock:
            self.errors += n

    def snapshot(self) -> Dict[str, Any]:
        with self._lock:
            lat = sorted(self._latencies)
            out = {
                "requests": self.requests,
                "errors": self.errors,
                "uptime_s": round(time.time() - self.started, 1),
                "batches": dict(sorted(self.batch_sizes.items())),
            }
            if lat:
                def pct(p):
                    return round(lat[min(len(lat) - 1,
                                         int(p * (len(lat) - 1)))] * 1e3, 2)

                out["latency_ms"] = {
                    "p50": pct(0.50), "p95": pct(0.95), "p99": pct(0.99),
                    "max": round(lat[-1] * 1e3, 2),
                }
            return out


# ---------------------------------------------------------------------------
# dynamic batcher
# ---------------------------------------------------------------------------


@dataclass
class _Item:
    payload: tuple  # one request row: tuple of arrays, each shape (1, ...)
    single: bool  # submit() got a bare array (unwrap before infer_fn)
    future: Future
    t_enqueue: float


def _bucket(n: int, max_batch: int) -> int:
    """Smallest power of two >= n, capped at max_batch (which is always a
    legal bucket even when it is not a power of two)."""
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class DynamicBatcher:
    """Coalesces concurrent `submit` calls into batched `infer_fn` calls.

    infer_fn: (B, ...) stacked array -> sequence of >= B per-row results.
    A single worker thread owns all inference — JAX dispatch needs no lock,
    and lazy one-time work inside infer_fn (e.g. int8 calibration on the
    first batch) is race-free by construction.

    Batching policy: the batch opens when the first request arrives and
    closes after `max_wait_ms` or at `max_batch` rows, whichever first — a
    lone request pays at most max_wait_ms extra latency, a loaded server
    fills batches immediately. Rows are padded (with zeros) up to
    power-of-two buckets so occupancy changes don't trigger recompiles.
    """

    def __init__(
        self,
        infer_fn: Callable[[np.ndarray], Sequence[Any]],
        max_batch: int = 8,
        max_wait_ms: float = 10.0,
        stats: Optional[ServingStats] = None,
        pad_to_bucket: bool = True,
    ):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self._infer_fn = infer_fn
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.stats = stats or ServingStats()
        self.pad_to_bucket = pad_to_bucket
        self._queue: Queue = Queue()
        self._stop = threading.Event()
        # serializes the submit-side stop-check+put against close(): without
        # it a submit could pass the check, lose the CPU, and enqueue after
        # the worker observed (stopped, empty) and exited — leaving that
        # Future unresolved forever (an infer(timeout=None) would hang)
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(
            target=self._run, name="avsync-batcher", daemon=True
        )
        self._worker.start()

    # -- client side --------------------------------------------------------

    def submit(self, row) -> Future:
        """Enqueue one request row (a (1, ...) array, or a TUPLE of (1, ...)
        arrays for multi-part payloads — e.g. the raw serving transport's
        (frames, boxes)); resolves to its result. Rows batch only with rows
        of matching arity/geometry/dtype (see _run's grouping)."""
        single = not isinstance(row, tuple)
        payload = ((np.asarray(row),) if single
                   else tuple(np.asarray(p) for p in row))
        fut: Future = Future()
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("batcher is closed")
            self._queue.put(_Item(payload, single, fut, time.perf_counter()))
        return fut

    def infer(self, row: np.ndarray, timeout: Optional[float] = None) -> Any:
        return self.submit(row).result(timeout=timeout)

    def close(self) -> None:
        """Drain the queue, then stop the worker. Every Future enqueued
        before close() resolves (the worker drains the queue before it
        honors the stop flag); submits after close() raise instead."""
        with self._submit_lock:
            self._stop.set()
        self._worker.join(timeout=30.0)

    # -- worker side ---------------------------------------------------------

    def _collect(self) -> List[_Item]:
        try:
            first = self._queue.get(timeout=0.05)
        except Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except Empty:
                break
        return batch

    def _run(self) -> None:
        while not (self._stop.is_set() and self._queue.empty()):
            batch = self._collect()
            if not batch:
                continue
            # group by payload arity/geometry/dtype: raw-transport clients
            # may mix frame resolutions; each group is its own batch (one
            # XLA program per geometry — same discipline as the
            # per-geometry preprocess cache)
            groups: Dict[tuple, List[_Item]] = {}
            for it in batch:
                key = (it.single,) + tuple(
                    (p.shape[1:], str(p.dtype)) for p in it.payload
                )
                groups.setdefault(key, []).append(it)
            for items in groups.values():
                self._run_group(items)
            # drop the loop locals: an idle worker must not pin the last
            # batch's payload arrays until the next request arrives
            # (tests/test_serving.py::test_no_per_request_retention)
            batch = items = it = None  # noqa: F841
            groups.clear()

    def _run_group(self, batch: List[_Item]) -> None:
        n = len(batch)
        target = _bucket(n, self.max_batch) if self.pad_to_bucket else n
        parts = []
        for j in range(len(batch[0].payload)):
            rows = np.concatenate([it.payload[j] for it in batch], axis=0)
            if target > n:
                pad = np.zeros((target - n,) + rows.shape[1:], rows.dtype)
                rows = np.concatenate([rows, pad], axis=0)
            parts.append(rows)
        arg = parts[0] if batch[0].single else tuple(parts)
        try:
            results = self._infer_fn(arg)
        except Exception as e:  # noqa: BLE001 — fan the error out
            self.stats.record_error(n)
            for it in batch:
                it.future.set_exception(e)
            return
        done = time.perf_counter()
        for it, res in zip(batch, results):
            it.future.set_result(res)
        self.stats.record_batch(
            n, target, [done - it.t_enqueue for it in batch]
        )


# ---------------------------------------------------------------------------
# services: predictor classes behind a batcher
# ---------------------------------------------------------------------------


class TranscribeService:
    """A `predictor.LipReader` behind a DynamicBatcher.

    Two transports:

      * 'raw' (default): handler threads only pad on host (+ cascade boxes
        in detector mode); the payload stays NATIVE dtype (uint8) and the
        batcher's worker runs the jitted preprocess per BATCH on device
        before the forward. One uint8 upload per request — the same
        transfer discipline as the training pipeline. Through a thin host
        link this is the difference between transfer-bound and
        forward-bound serving (a 75x50x100 clip ships 375 KB instead of
        the f32 path's 4.5 MB of round trips).
      * 'f32': handler threads run the full jitted preprocess per request
        (`prepare_clip`, B=1) and ship the resulting f32 row back through
        host to the batcher. Kept for comparison/debugging.

    Both compute bit-identical results (same get_preprocess_fn programs).
    """

    def __init__(self, reader, max_batch: int = 8, max_wait_ms: float = 10.0,
                 stats: Optional[ServingStats] = None,
                 transport: str = "raw"):
        if transport not in ("raw", "f32"):
            raise ValueError(f"unknown transport: {transport!r}")
        self.reader = reader
        self.stats = stats or ServingStats()
        self.transport = transport

        import jax.numpy as jnp

        if transport == "raw":
            def infer(payload) -> Sequence[str]:
                frames = payload[0]
                boxes = payload[1] if len(payload) > 1 else None
                clips = reader.preprocess_device(frames, boxes)
                return reader._decode(reader._logprobs(clips))
        else:
            def infer(rows: np.ndarray) -> Sequence[str]:
                return reader._decode(reader._logprobs(jnp.asarray(rows)))

        self.batcher = DynamicBatcher(
            infer, max_batch=max_batch, max_wait_ms=max_wait_ms,
            stats=self.stats,
        )

    def transcribe_frames(self, frames: np.ndarray,
                          timeout: Optional[float] = None) -> str:
        if self.transport == "raw":
            payload = self.reader.prepare_raw(frames)
        else:
            payload = np.asarray(self.reader._prepare(frames))
        return self.batcher.infer(payload, timeout=timeout)

    def warmup(self, frames: Optional[np.ndarray] = None) -> None:
        """Compile every batch bucket before taking traffic: one dummy (or
        example) batch per power-of-two bucket through the infer path.
        Call before exposing the daemon (`avsync serve --warmup`) — the
        first REAL request then pays steady-state ms instead of the cold
        XLA compile. Runs on the caller's thread, so call it before
        serving starts (the batcher worker is otherwise idle)."""
        d = self.reader.cfg.data
        if frames is None:
            frames = np.zeros(
                (d.max_video_length, d.img_height, d.img_width), np.uint8
            )
        if self.transport == "raw":
            parts = self.reader.prepare_raw(frames)
        else:
            parts = (np.asarray(self.reader._prepare(frames)),)
        # _warming keeps an uncalibrated int8 reader from adopting these
        # dummy frames as its calibration set (compile still happens; the
        # first real request calibrates on real data and reuses the
        # compiled program). Real example `frames` passed by the caller
        # also stay non-binding — calibrating on ONE clip repeated per
        # bucket would be a worse scale estimate than the first real batch.
        self.reader._warming = True
        try:
            b = 1
            while True:
                stacked = tuple(
                    np.concatenate([p] * b, axis=0) for p in parts
                )
                self.batcher._infer_fn(
                    stacked if self.transport == "raw" else stacked[0]
                )
                if b >= self.batcher.max_batch:
                    return
                b = min(2 * b, self.batcher.max_batch)
        finally:
            self.reader._warming = False

    def transcribe_path(self, video_path: str,
                        timeout: Optional[float] = None) -> str:
        frames = _decode_frames(
            video_path, self.reader.cfg.data.max_video_length
        )
        return self.transcribe_frames(frames, timeout=timeout)

    def close(self) -> None:
        self.batcher.close()


class SyncScoreService:
    """A `predictor.MisalignmentScorer` behind a DynamicBatcher.

    Concurrent requests coalesce into ONE device program (B-bucket x K
    shifts): uint8 frames preprocess per batch, conv visual stats + fused
    shift->MFCC->stats + detector forward run fused on device
    (`MisalignmentScorer.score_payload_batch`) — visual features never
    visit the host. Requests batch with geometry/shift-count-matching
    requests; mixed ones run as their own groups (batcher grouping).
    """

    def __init__(self, scorer, max_batch: int = 8, max_wait_ms: float = 10.0,
                 stats: Optional[ServingStats] = None):
        self.scorer = scorer
        self.stats = stats or ServingStats()
        self.batcher = DynamicBatcher(
            scorer.score_payload_batch, max_batch=max_batch,
            max_wait_ms=max_wait_ms, stats=self.stats,
        )

    def score_arrays(self, frames, audio, fps, shifts=(0,),
                     timeout: Optional[float] = None) -> np.ndarray:
        payload = self.scorer.prepare_raw(frames, audio, fps, tuple(shifts))
        return self.batcher.infer(payload, timeout=timeout)

    def warmup(self, shifts=(0,), frames: Optional[np.ndarray] = None,
               audio: Optional[np.ndarray] = None, fps: float = 25.0) -> None:
        """Compile every batch bucket of the fused scorer before traffic.
        The program is per (bucket, len(shifts), geometry); pass the shift
        count (and optionally example frames/audio at the clients' real
        geometry) clients will use — e.g. the demo's single shift 0."""
        cfg = self.scorer.cfg
        d = cfg.data
        if frames is None:
            frames = np.zeros(
                (d.max_video_length, d.img_height, d.img_width), np.uint8
            )
        if audio is None:
            audio = np.zeros(1024, np.float32)
        parts = self.scorer.prepare_raw(frames, audio, fps, tuple(shifts))
        b = 1
        while True:
            stacked = tuple(
                np.concatenate([p] * b, axis=0) for p in parts
            )
            self.scorer.score_payload_batch(stacked)
            if b >= self.batcher.max_batch:
                return
            b = min(2 * b, self.batcher.max_batch)

    def close(self) -> None:
        self.batcher.close()

    def score_path(self, video_path: str, shifts=(0,)) -> np.ndarray:
        cfg = self.scorer.cfg
        frames, audio, fps = _decode_av(
            video_path, cfg.data.max_video_length, cfg.audio.sample_rate,
            cfg.detector.default_fps,
        )
        return self.score_arrays(frames, audio, fps, shifts)


# ---------------------------------------------------------------------------
# HTTP surface
# ---------------------------------------------------------------------------


class ArtifactTranscribeService:
    """An AOT `ExportedTranscriber` artifact behind a DynamicBatcher.

    `avsync serve --artifact lipnet_serving.npz`: the serving host needs
    the artifact file and jax — no checkpoint, no avsync model code, no
    Python->XLA lowering at startup. Preprocess, forward and CTC decode
    all live INSIDE the StableHLO module (avsync/export.py); handler
    threads only validate/pad uint8 rows, and the batcher's single worker
    runs the module per batch. The module's batch dim is symbolic, so the
    power-of-two buckets each compile once from StableHLO on first use
    (or all up front via `warmup`).

    Same endpoint surface as `TranscribeService` — the daemon can't tell
    live and AOT serving apart.
    """

    def __init__(self, artifact, max_batch: int = 8,
                 max_wait_ms: float = 10.0,
                 stats: Optional[ServingStats] = None):
        from avsync.export import load_exported

        if isinstance(artifact, str):
            artifact = load_exported(artifact)
        if artifact.meta.get("kind", "transcriber") != "transcriber":
            raise ValueError(
                f"not a transcriber artifact: kind="
                f"{artifact.meta.get('kind')!r}"
            )
        self.artifact = artifact
        # static-bucket artifacts can't serve batches beyond their largest
        # exported module — clamp so the batcher never forms one
        if artifact.batch_sizes:
            max_batch = min(max_batch, max(artifact.batch_sizes))
        self.stats = stats or ServingStats()

        def infer(payload) -> Sequence[str]:
            return artifact.transcribe(payload[0])

        self.batcher = DynamicBatcher(
            infer, max_batch=max_batch, max_wait_ms=max_wait_ms,
            stats=self.stats,
        )

    def transcribe_frames(self, frames: np.ndarray,
                          timeout: Optional[float] = None) -> str:
        # ONE clip per request (same contract as TranscribeService): the
        # batcher attributes exactly one result per submitted row, so a
        # (B,T,H,W) upload here would silently return only clip 0's
        # transcript — and misattribute the rest to concurrently batched
        # requests. Batch via `load_exported(...).transcribe` instead.
        frames = np.asarray(frames)
        if frames.ndim != 3:
            raise ValueError(
                f"one (T, H, W) clip per request, got shape "
                f"{frames.shape} — for client-side batches use the "
                "artifact's own batched `call`/`transcribe`"
            )
        return self.batcher.infer(
            (self.artifact.prepare_rows(frames),), timeout=timeout
        )

    def transcribe_path(self, video_path: str,
                        timeout: Optional[float] = None) -> str:
        frames = _decode_frames(
            video_path, self.artifact.meta["frame_shape"][0]
        )
        return self.transcribe_frames(frames, timeout=timeout)

    def warmup(self) -> None:
        """Compile every power-of-two bucket from the StableHLO module
        before taking traffic (`avsync serve --warmup`)."""
        T, H, W = self.artifact.meta["frame_shape"]
        b = 1
        while True:
            self.artifact.transcribe(np.zeros((b, T, H, W), np.uint8))
            if b >= self.batcher.max_batch:
                return
            b = min(2 * b, self.batcher.max_batch)

    def close(self) -> None:
        self.batcher.close()


class ArtifactSyncScoreService:
    """An AOT `ExportedSyncScorer` artifact behind a DynamicBatcher —
    the /v1/sync_score counterpart of `ArtifactTranscribeService`
    (preprocess + conv visual stats + fused shift->MFCC->stats + detector
    head all inside the module). Requests with the artifact's shifts-per-
    request count batch together; the shift VALUES stay per-row inputs.
    """

    def __init__(self, artifact, max_batch: int = 8,
                 max_wait_ms: float = 10.0,
                 stats: Optional[ServingStats] = None):
        from avsync.config import AvsyncConfig
        from avsync.export import load_exported

        if isinstance(artifact, str):
            artifact = load_exported(artifact)
        if artifact.meta.get("kind") != "sync_scorer":
            raise ValueError(
                f"not a sync_scorer artifact: kind="
                f"{artifact.meta.get('kind')!r}"
            )
        self.artifact = artifact
        if artifact.batch_sizes:  # see ArtifactTranscribeService
            max_batch = min(max_batch, max(artifact.batch_sizes))
        # the artifact embeds the full AvsyncConfig — media decode for
        # score_path self-configures from it (sample rate, default fps)
        self.cfg = AvsyncConfig.from_dict(artifact.meta["config"])
        self.stats = stats or ServingStats()

        def infer(payload) -> Sequence[np.ndarray]:
            probs = artifact.call(*payload)
            return [probs[i] for i in range(probs.shape[0])]

        self.batcher = DynamicBatcher(
            infer, max_batch=max_batch, max_wait_ms=max_wait_ms,
            stats=self.stats,
        )

    def score_arrays(self, frames: np.ndarray, audio: np.ndarray,
                     fps: float, shifts=(0,),
                     timeout: Optional[float] = None) -> np.ndarray:
        return self.batcher.infer(
            self.artifact.prepare_row(frames, audio, fps, shifts),
            timeout=timeout,
        )

    def score_path(self, video_path: str, shifts=(0,)) -> np.ndarray:
        frames, audio, fps = _decode_av(
            video_path, self.artifact.meta["frame_shape"][0],
            self.cfg.audio.sample_rate, self.cfg.detector.default_fps,
        )
        return self.score_arrays(frames, audio, fps, shifts)

    def warmup(self) -> None:
        T, H, W = self.artifact.meta["frame_shape"]
        S = self.artifact.meta["max_audio_samples"]
        K = self.artifact.meta["num_shifts"]
        b = 1
        while True:
            self.artifact.call(
                np.zeros((b, T, H, W), np.uint8),
                np.zeros((b, S), np.float32),
                np.full((b,), S, np.int32),
                np.full((b,), 25.0, np.float32),
                np.zeros((b, K), np.int32),
            )
            if b >= self.batcher.max_batch:
                return
            b = min(2 * b, self.batcher.max_batch)

    def close(self) -> None:
        self.batcher.close()


class _BadRequest(ValueError):
    """Request rejected before its body was read (size/header problems)."""

    def __init__(self, message: str, status: int = 400, drain: int = 0):
        super().__init__(message)
        self.status = status
        self.drain = drain  # claimed body bytes left unread (0 if unknown)


def _make_handler(server: "AvsyncServer"):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        # silence the default per-request stderr line
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _send(self, code: int, payload: Dict[str, Any]) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> bytes:
            try:
                n = int(self.headers.get("Content-Length", 0))
            except (TypeError, ValueError):
                raise _BadRequest("malformed Content-Length header")
            if n < 0:
                raise _BadRequest("malformed Content-Length header")
            if n > server.max_body_bytes:
                raise _BadRequest(
                    f"request body {n} bytes exceeds the server limit "
                    f"({server.max_body_bytes}); split the batch",
                    status=413, drain=n,
                )
            return self.rfile.read(n) if n else b""

        def _lingering_drain(self, n: int, limit: int = 64 << 20,
                             chunk: int = 1 << 20) -> None:
            """Discard (bounded) unread body so the client can read our
            response: closing with data still in the receive queue emits
            RST on Linux, which can destroy the client's unread response
            buffer — the 413 this protects would never be seen. Drains at
            most min(claimed, limit) bytes (never reads past the body, so
            no blocking on well-behaved clients) under a socket timeout,
            so a hostile slow/endless stream can't pin the thread."""
            remaining = min(n, limit)
            if remaining <= 0:
                return
            try:
                self.connection.settimeout(5.0)
                while remaining > 0:
                    data = self.rfile.read(min(chunk, remaining))
                    if not data:
                        return
                    remaining -= len(data)
            except OSError:
                pass

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                # drain-gated: an orchestrator's readiness probe on a
                # kept-alive connection must see the instance leave the
                # pool as soon as shutdown() begins, not keep getting 200
                # while every POST on the same connection is refused
                if server._draining:
                    self._send(503, {"status": "draining"})
                else:
                    self._send(200, {"status": "ok"})
            elif self.path == "/v1/stats":
                self._send(200, server.stats_snapshot())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            # drain gate: once shutdown() begins, keep-alive connections
            # must not start NEW work (fresh connections are already shut
            # out — the accept loop has exited); in-flight requests below
            # are counted so shutdown can wait for them
            if not server._begin_request():
                # mirror the 413 path: the request body is still unread
                # here, and closing with data queued in the receive buffer
                # emits RST on Linux, which can destroy the 503 before the
                # client reads it (see _lingering_drain)
                self._send(503, {"error": "server is draining"})
                try:
                    self.wfile.flush()
                except OSError:
                    pass
                try:
                    claimed = int(self.headers.get("Content-Length", 0))
                except (TypeError, ValueError):
                    claimed = 0
                self._lingering_drain(max(0, claimed))
                self.close_connection = True
                return
            try:
                self._do_post_tracked()
            finally:
                server._end_request()

        def _do_post_tracked(self):
            # read the body unconditionally: on HTTP/1.1 keep-alive an
            # unread body would be parsed as the NEXT request line
            try:
                body = self._body()
            except _BadRequest as e:
                # 413 for oversize, 400 for malformed headers; the full
                # body was not read, so the connection can't be reused —
                # send the response, drain a bounded amount so the client
                # can actually read it, then close
                self._send(e.status, {"error": str(e)})
                try:
                    self.wfile.flush()
                except OSError:
                    pass
                self._lingering_drain(e.drain)
                self.close_connection = True
                return
            try:
                if self.path == "/v1/transcribe":
                    self._transcribe(body)
                elif self.path == "/v1/sync_score":
                    self._sync_score(body)
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})
            except ValueError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — daemon must not die
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        # -- endpoints -------------------------------------------------------

        def _transcribe(self, body: bytes):
            svc = server.transcriber
            if svc is None:
                self._send(503, {"error": "no lipnet checkpoint loaded"})
                return
            ctype = self.headers.get("Content-Type", "")
            t0 = time.perf_counter()
            if ctype.startswith("application/x-npy"):
                frames = np.load(io.BytesIO(body), allow_pickle=False)
                text = svc.transcribe_frames(frames)
            else:
                req = json.loads(body or "{}")
                path = req.get("video_path")
                if not path:
                    raise ValueError(
                        "POST application/x-npy frame bytes or JSON "
                        "{'video_path': ...}"
                    )
                text = svc.transcribe_path(path)
            self._send(200, {
                "transcript": text,
                "latency_ms": round((time.perf_counter() - t0) * 1e3, 2),
            })

        def _sync_score(self, body: bytes):
            svc = server.scorer
            if svc is None:
                self._send(503, {"error": "no detector checkpoint loaded"})
                return
            ctype = self.headers.get("Content-Type", "")
            t0 = time.perf_counter()
            if ctype.startswith("application/x-npz"):
                with np.load(io.BytesIO(body),
                             allow_pickle=False) as z:
                    if "frames" not in z or "audio" not in z:
                        raise ValueError("npz needs 'frames' and 'audio' "
                                         "(optional 'fps', 'shifts')")
                    frames, audio = z["frames"], z["audio"]
                    fps = float(z["fps"]) if "fps" in z else 25.0
                    shifts = ([int(s) for s in z["shifts"]]
                              if "shifts" in z else [0])
                probs = svc.score_arrays(frames, audio, fps, tuple(shifts))
            else:
                req = json.loads(body or "{}")
                path = req.get("video_path")
                if not path:
                    raise ValueError(
                        "POST application/x-npz {frames, audio[, fps, "
                        "shifts]} or JSON {'video_path': ..., 'shifts': [...]}"
                    )
                shifts = tuple(int(s) for s in req.get("shifts", [0]))
                probs = svc.score_path(path, shifts)
            self._send(200, {
                "shifts": list(shifts),
                "sync_probs": [round(float(p), 6) for p in probs],
                "latency_ms": round((time.perf_counter() - t0) * 1e3, 2),
            })

    return Handler


class AvsyncServer:
    """The `avsync serve` daemon: ThreadingHTTPServer + the services.

    Endpoints:
      GET  /healthz                 liveness
      GET  /v1/stats                request counters, batch-size histogram,
                                    latency percentiles
      POST /v1/transcribe           application/x-npy (T,H,W) frame bytes,
                                    or JSON {"video_path": ...}
      POST /v1/sync_score           application/x-npz {frames, audio[, fps,
                                    shifts]}, or JSON {"video_path": ...,
                                    "shifts": [...]}
    """

    def __init__(
        self,
        transcriber: Optional[TranscribeService] = None,
        scorer: Optional[SyncScoreService] = None,
        host: str = "127.0.0.1",
        port: int = 8777,
        max_body_bytes: int = 256 * 1024 * 1024,
    ):
        from http.server import ThreadingHTTPServer

        if transcriber is None and scorer is None:
            raise ValueError("need at least one service")
        self.transcriber = transcriber
        self.scorer = scorer
        # one oversized (or lying) Content-Length must not OOM the daemon;
        # 256 MiB covers ~60 full-frame uint8 clips per request
        self.max_body_bytes = int(max_body_bytes)
        self._httpd = ThreadingHTTPServer((host, port), _make_handler(self))
        self._thread: Optional[threading.Thread] = None
        # graceful-drain bookkeeping: POSTs in flight + the drain flag
        self._inflight = 0
        self._inflight_cv = threading.Condition()
        self._draining = False

    # -- drain bookkeeping (handler threads) --------------------------------

    def _begin_request(self) -> bool:
        with self._inflight_cv:
            if self._draining:
                return False
            self._inflight += 1
            return True

    def _end_request(self) -> None:
        with self._inflight_cv:
            self._inflight -= 1
            if self._inflight == 0:
                self._inflight_cv.notify_all()

    @property
    def address(self) -> tuple:
        return self._httpd.server_address

    def stats_snapshot(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        if self.transcriber is not None:
            out["transcribe"] = self.transcriber.stats.snapshot()
            out["transcribe"]["max_batch"] = self.transcriber.batcher.max_batch
        if self.scorer is not None:
            out["sync_score"] = self.scorer.stats.snapshot()
        return out

    def start(self) -> None:
        """Serve on a background thread (tests, embedding)."""
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="avsync-http", daemon=True
        )
        self._thread.start()

    def serve_forever(self) -> None:
        self._httpd.serve_forever()

    def shutdown(self, drain_timeout: float = 30.0) -> None:
        """Graceful drain: stop accepting, let in-flight requests finish
        (bounded by drain_timeout), then tear down.

        Order matters: (1) the accept loop exits and the LISTEN socket
        closes immediately — a client connecting mid-drain gets
        connection-refused (so a load balancer can retry elsewhere at
        once) rather than completing a handshake into the backlog and
        hanging unread until teardown; (2) the drain flag turns away
        keep-alive re-requests with 503 and we wait for the in-flight
        count to reach zero — each of those requests completes its
        batched inference and writes its response; (3) only then do the
        handler sockets close and the batchers stop (batcher.close itself
        drains its queue, so every accepted Future resolves). A request
        stuck past drain_timeout is abandoned rather than pinning
        shutdown forever. The wait runs on the monotonic clock so an NTP
        step can neither truncate nor extend the drain."""
        import time as _time

        self._httpd.shutdown()
        try:
            self._httpd.socket.close()
        except OSError:
            pass
        with self._inflight_cv:
            self._draining = True
            deadline = _time.monotonic() + drain_timeout
            while self._inflight > 0:
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    break
                self._inflight_cv.wait(remaining)
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10.0)
        if self.transcriber is not None:
            self.transcriber.close()
        if self.scorer is not None:
            self.scorer.close()
