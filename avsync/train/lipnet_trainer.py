"""pjit LipNet training: jitted CTC train/eval steps over a device mesh.

Reference semantics reproduced (`trainer.py:9-170`): Adam(1e-4, torch
defaults), CTC loss with blank=0 / mean-over-length reduction /
zero_infinity, global-norm gradient clipping at 1.0, per-epoch train+val
loss averages, periodic checkpoints and a final snapshot, loss-curve plot.

TPU-native execution model (nothing like this exists in the reference):
  * one `jax.jit` train step, donated state, compiled once — batch sharded
    over the mesh 'data' axis, params replicated (or sharded over 'model'
    when tensor parallelism is on); XLA inserts the gradient all-reduce
    over ICI;
  * dropout handled with explicit PRNG keys (folded per step);
  * metrics come back as scalars; the host loop is just data + bookkeeping.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Iterable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from avsync.config import AvsyncConfig
from avsync.models import LipNet
from avsync.ops.ctc import ctc_loss_mean
from avsync.parallel import mesh as meshlib
from avsync.utils.checkpoint import CheckpointManager
from avsync.utils.logging import Logger, format_time


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # scalar int32


def make_optimizer(learning_rate: float, grad_clip_norm: float) -> optax.GradientTransformation:
    """clip-by-global-norm(1.0) -> Adam with torch defaults
    (`trainer.py:23,68`: lr=1e-4, betas=(0.9, 0.999), eps=1e-8).

    The learning rate enters the jitted step as a runtime scalar (the train
    step rescales the unit-lr Adam direction), so LR schedules — the TF
    stack's flat->halving->exponential (`train.py:611-618`) or anything
    else — never trigger recompilation.
    """
    del learning_rate  # applied in the train step; see make_train_step
    return optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
    )


def keras_lr_schedule(epoch: int, lr: float) -> float:
    """The TF stack's LearningRateScheduler (`train.py:611-618`): flat for 30
    epochs, halve each epoch until 60, then exp(-0.1) decay per epoch.
    `epoch` is 0-based as Keras passes it."""
    if epoch < 30:
        return lr
    if epoch < 60:
        return lr * 0.5
    return lr * float(np.exp(-0.1))


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_fn_impl: Optional[Callable] = None,
    remat: bool = False,
) -> Callable:
    """Returns train_step(state, batch, rng, lr) -> (state, metrics).

    batch: {'video': (B,T,H,W,1) f32, 'labels': (B,L) i32,
            'label_lengths': (B,) i32}

    loss_fn_impl(log_probs, labels, label_lengths) defaults to the PyTorch
    stack's length-normalized CTC; the TF family passes its blank-last,
    unnormalized variant.
    """
    if loss_fn_impl is None:
        loss_fn_impl = ctc_loss_mean

    def apply_fn(params, video, rngs):
        return model.apply({"params": params}, video, train=True, rngs=rngs)

    if remat:
        apply_fn = jax.checkpoint(
            apply_fn,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )

    def train_step(
        state: TrainState,
        batch: Dict[str, jax.Array],
        rng: jax.Array,
        lr: jax.Array,
    ):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            log_probs = apply_fn(
                params, batch["video"], {"dropout": step_rng}
            )
            return loss_fn_impl(
                log_probs, batch["labels"], batch["label_lengths"]
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_eval_step(model, loss_fn_impl: Optional[Callable] = None) -> Callable:
    if loss_fn_impl is None:
        loss_fn_impl = ctc_loss_mean

    def eval_step(params, batch):
        log_probs = model.apply({"params": params}, batch["video"], train=False)
        loss = loss_fn_impl(log_probs, batch["labels"], batch["label_lengths"])
        return loss, log_probs

    return eval_step


class LipNetTrainer:
    """Host training loop over jitted device steps.

    Data loaders are any iterables of host batches (numpy dicts); the
    trainer shards them over the mesh 'data' axis.
    """

    def __init__(
        self,
        config: AvsyncConfig,
        mesh: Optional[Mesh] = None,
        log: Optional[Logger] = None,
    ):
        self.config = config
        self.mesh = mesh if mesh is not None else meshlib.make_mesh(
            config.train.mesh_shape
        )
        self.log = log or Logger(None, console=True)
        from avsync.models import make_lipnet

        self.model = make_lipnet(config.model)
        if config.model.family == "tf":
            from avsync.models.lipnet_tf import tf_ctc_loss

            self._loss_fn = lambda lp, labels, lengths: tf_ctc_loss(lp, labels)
        else:
            self._loss_fn = None  # default ctc_loss_mean
        self.optimizer = make_optimizer(
            config.train.learning_rate, config.train.grad_clip_norm
        )
        self.rng = jax.random.PRNGKey(config.train.seed)
        self.current_lr = float(config.train.learning_rate)
        self.train_losses: list = []
        self.val_losses: list = []
        self.lr_history: list = []
        # wall seconds per completed epoch (train + validate), machine-
        # readable in history JSON — epoch 1 includes XLA compile/cache
        # warm-up, epochs 2+ are the steady state measurement scripts read
        self.epoch_seconds: list = []
        self._compiled = None
        self._scan_cache: dict = {}  # whole-epoch programs per gather fn

    # -- initialization ---------------------------------------------------
    def init_state(self, sample_batch: Dict[str, np.ndarray]) -> TrainState:
        init_rng, self.rng = jax.random.split(self.rng)
        video = jnp.zeros_like(jnp.asarray(sample_batch["video"][:1]))
        variables = self.model.init({"params": init_rng}, video, train=False)
        params = variables["params"]
        opt_state = self.optimizer.init(params)
        state = TrainState(params, opt_state, jnp.zeros((), jnp.int32))
        return self.shard_state(state)

    def shard_state(self, state: TrainState) -> TrainState:
        # put_with_sharding == device_put single-process; multi-controller it
        # uploads each process's addressable shards only (params/opt values
        # are identical on every host: same seed, same init program).
        from avsync.parallel.multihost import put_with_sharding as _put

        pshard = meshlib.param_sharding(self.mesh, state.params)
        params = jax.tree.map(_put, state.params, pshard)
        # Adam moments are param-shaped pytrees — they follow the param
        # shardings exactly (tensor-parallel columns included); counters and
        # everything else replicate.
        rep = meshlib.replicated(self.mesh)

        def put_opt(sub):
            if isinstance(sub, optax.ScaleByAdamState):
                return optax.ScaleByAdamState(
                    count=_put(sub.count, rep),
                    mu=jax.tree.map(_put, sub.mu, pshard),
                    nu=jax.tree.map(_put, sub.nu, pshard),
                )
            return jax.tree.map(lambda x: _put(x, rep), sub)

        is_plain_tuple = isinstance(state.opt_state, tuple) and not hasattr(
            state.opt_state, "_fields"
        )  # optax.chain state, not a NamedTuple transform state
        opt_state = (
            tuple(put_opt(s) for s in state.opt_state)
            if is_plain_tuple
            else put_opt(state.opt_state)
        )
        step = jax.device_put(state.step, rep)
        return TrainState(params, opt_state, step)

    # -- compiled steps ---------------------------------------------------
    @property
    def compiled(self):
        if self._compiled is None:
            train_step = make_train_step(
                self.model, self.optimizer, self._loss_fn,
                remat=self.config.train.remat,
            )
            eval_step = make_eval_step(self.model, self._loss_fn)
            data_sh = meshlib.batch_sharding(self.mesh)
            self._compiled = {
                "train": jax.jit(
                    train_step,
                    in_shardings=(None, data_sh, None, None),
                    donate_argnums=(0,),
                ),
                "eval": jax.jit(eval_step, in_shardings=(None, data_sh)),
            }
        return self._compiled

    def _device_batch(self, batch: Dict[str, Any]) -> Dict[str, jax.Array]:
        def cast(x, dt):
            if isinstance(x, jax.Array):
                return x  # already on device (e.g. from LipNetBatcher)
            return np.asarray(x, dt)

        return meshlib.shard_batch(self.mesh, {
            "video": cast(batch["video"], np.float32),
            "labels": cast(batch["labels"], np.int32),
            "label_lengths": cast(batch["label_lengths"], np.int32),
        })

    # -- epoch loops ------------------------------------------------------
    def _scan_program(self, gather_fn):
        """Whole-epoch train program for a device-cached corpus: lax.scan of
        the train step over the (S, B) shuffle plan, the per-row video rows
        gathered from the byte cache INSIDE the program. One tunnel dispatch
        per epoch — through the axon tunnel's 50+ ms RTT, per-batch dispatch
        (not step math) bounds small-batch throughput. Bit-identical to the
        host loop: same batch order, same fold_in(state.step) dropout keys,
        same donated-state update sequence."""
        # Keyed by the function object itself (identity hash): the strong
        # ref pins it against GC, so a recycled id() can never alias a new
        # gather closure to a stale compiled program.
        prog = self._scan_cache.get(gather_fn)
        if prog is not None:
            return prog
        train_step = make_train_step(
            self.model, self.optimizer, self._loss_fn,
            remat=self.config.train.remat,
        )

        def epoch_fn(state, video_bytes, labels, lengths, idx, rng, lr):
            def body(st, row):
                batch = {
                    "video": gather_fn(video_bytes, row),
                    "labels": labels[row],
                    "label_lengths": lengths[row],
                }
                st, m = train_step(st, batch, rng, lr)
                return st, (m["loss"], m["grad_norm"])

            state, (losses, gnorms) = jax.lax.scan(body, state, idx)
            return state, losses, gnorms

        from jax.sharding import NamedSharding, PartitionSpec

        data_sh = meshlib.batch_sharding(self.mesh)
        plan_sh = NamedSharding(
            self.mesh, PartitionSpec(None, *data_sh.spec)
        )
        prog = jax.jit(
            epoch_fn,
            in_shardings=(None, None, None, None, plan_sh, None, None),
            donate_argnums=(0,),
        )
        self._scan_cache[gather_fn] = prog
        return prog

    def train_epoch_scanned(
        self, state: TrainState, plan: Dict[str, Any], metrics_writer=None
    ) -> Tuple[TrainState, float]:
        """One device dispatch for the whole epoch (see _scan_program).
        `plan` comes from LipNetBatcher.scan_plan."""
        import jax.numpy as jnp

        from jax.sharding import NamedSharding, PartitionSpec

        from avsync.parallel.multihost import put_with_sharding

        lr = np.float32(self.current_lr)
        step0 = int(state.step)
        prog = self._scan_program(plan["gather"])
        data_sh = meshlib.batch_sharding(self.mesh)
        plan_sh = NamedSharding(self.mesh, PartitionSpec(None, *data_sh.spec))
        state, losses, gnorms = prog(
            state, plan["video"], plan["labels"], plan["lengths"],
            put_with_sharding(np.asarray(plan["idx"]), plan_sh), self.rng, lr,
        )
        losses = np.asarray(losses)  # the epoch-end device sync
        if metrics_writer is not None:
            gnorms = np.asarray(gnorms)
            for i, (l, g) in enumerate(zip(losses, gnorms)):
                metrics_writer.write(
                    step0 + i + 1, loss=float(l), grad_norm=float(g),
                    lr=float(lr),
                )
        return state, float(losses.astype(np.float64).mean())

    # How often train_epoch polls the stop_check callback (in batches).
    # In a multi-controller run each poll is a tiny collective vote, so
    # per-batch polling would double the dispatch count; every 16 batches
    # bounds preemption latency to ~3 s at bench shapes while costing
    # <1% extra dispatches.
    PREEMPT_CHECK_EVERY = 16

    def train_epoch(
        self,
        state: TrainState,
        loader: Iterable,
        metrics_writer=None,
        stop_check: Optional[Callable[[], bool]] = None,
    ) -> Tuple[TrainState, float]:
        """One pass over the loader.

        Per-step metrics stay ON DEVICE until the epoch ends: a host fetch
        inside the loop would serialize each step against the input
        pipeline's on-device work (cache gathers, preprocess), while
        deferred fetches let XLA's async dispatch overlap them — the same
        discipline bench.py's epoch loop uses. The epoch-end fetch is the
        honest device sync."""
        lr = np.float32(self.current_lr)
        # Bounded-lag pipeline: keep at most LAG steps in flight. Zero
        # backpressure would let the host enqueue the whole epoch and pin
        # every in-flight batch in HBM (~192 MB each at bench shapes — a
        # near-budget corpus would OOM); fetching the loss LAG steps back
        # bounds in-flight memory while still overlapping input-pipeline
        # work with training, and surfaces a failing step within LAG steps.
        LAG = 4
        # one sync at epoch start (the previous epoch already drained), so
        # step numbers are known before the loop and each metrics record can
        # be written the moment its step drains — a mid-epoch crash loses at
        # most LAG records and live TensorBoard lags LAG steps, not an epoch
        step0 = int(state.step)
        pending, losses = [], []

        def drain_one():
            i = len(losses)
            m = pending[i]
            loss = float(m["loss"])  # the LAG-delayed device fetch
            losses.append(loss)
            if metrics_writer is not None:
                # grad_norm rides the same drained metrics dict — no extra
                # device sync beyond the loss fetch
                metrics_writer.write(
                    step0 + i + 1, loss=loss,
                    grad_norm=float(m["grad_norm"]), lr=float(lr),
                )
            pending[i] = None  # release the device buffers promptly

        for batch in loader:
            # Mid-epoch preemption: epochs on big corpora outlast an
            # eviction grace window; polling here lets train() stop at a
            # batch boundary instead of an epoch boundary. All processes
            # poll at the same batch index (lockstep — stop_check votes).
            if (
                stop_check is not None
                # skip batch 0: train() already voted immediately before
                # dispatching this epoch — a second back-to-back collective
                # would waste a dispatch per epoch
                and len(pending)
                and len(pending) % self.PREEMPT_CHECK_EVERY == 0
                and stop_check()
            ):
                if hasattr(loader, "close"):
                    loader.close()  # release the prefetch/decode workers
                break
            state, metrics = self.compiled["train"](
                state, self._device_batch(batch), self.rng, lr
            )
            pending.append(metrics)
            if len(pending) - len(losses) > LAG:
                drain_one()
        while len(losses) < len(pending):  # drain: the epoch-end sync
            drain_one()
        return state, sum(losses) / max(len(losses), 1)

    def validate(self, state: TrainState, loader: Iterable) -> float:
        total, n = 0.0, 0
        for batch in loader:
            loss, _ = self.compiled["eval"](state.params, self._device_batch(batch))
            total += float(loss)
            n += 1
        return total / max(n, 1)

    def train(
        self,
        train_loader_fn: Callable[[], Iterable],
        val_loader_fn: Callable[[], Iterable],
        epochs: Optional[int] = None,
        checkpoint_dir: Optional[str] = None,
        state: Optional[TrainState] = None,
        lr_schedule: Optional[Callable[[int, float], float]] = None,
        early_stopping_patience: Optional[int] = None,
        example_fn: Optional[Callable[[TrainState, int], None]] = None,
        history_path: Optional[str] = None,
        profile_dir: Optional[str] = None,
        start_epoch: int = 0,
    ) -> TrainState:
        """Full training run. Loader fns are called per epoch (fresh iterators).

        Checkpoints every `checkpoint_every` epochs + a final snapshot, both
        carrying the config (`trainer.py:144-156` semantics, Orbax format).
        Supports resume (pass a restored `state`) and the TF stack's training
        features: `lr_schedule` (e.g. keras_lr_schedule, `train.py:611-618`),
        `early_stopping_patience` with best-weights restore
        (`train.py:737-742`), `example_fn` per-epoch qualitative decode (the
        ProduceExample callback, `train.py:552-608`), and `history_path` for
        the history JSON (`train.py:769-771`).
        """
        import json as jsonlib

        from avsync.parallel.multihost import get_global as _get_global
        from avsync.utils.signals import sigterm_flag

        cfg = self.config.train
        epochs = epochs if epochs is not None else cfg.epochs
        ckpt_dir = checkpoint_dir or cfg.checkpoint_dir
        ckpt = CheckpointManager(ckpt_dir)

        # Graceful preemption (TPU pods evict with SIGTERM + a grace
        # window): finish the in-flight epoch/batch, checkpoint, and return
        # — the next invocation resumes with --resume. sigterm_flag scopes
        # the flag-only handler over the loop AND the final grace-window
        # save (repeated SIGTERMs during that save must not kill the write).
        stop_logged = [False]

        def _stop_now() -> bool:
            # In a multi-controller run the stop decision must be taken in
            # LOCKSTEP — a process-local flag lets the signaled host exit
            # the loop while another enters the next collective and
            # deadlocks, burning the grace window with no snapshot.
            from avsync.parallel.multihost import any_process_flagged

            stop = any_process_flagged(self._preempted, self.mesh)
            if stop and not stop_logged[0]:
                stop_logged[0] = True
                self.log.log(
                    "preemption signal observed: checkpointing and stopping"
                )
            return stop

        tb_train = tb_val = None
        if cfg.tensorboard:
            from avsync.utils.tb import SummaryWriter

            stamp = time.strftime("%Y%m%d-%H%M%S")
            tb_train = SummaryWriter(os.path.join(cfg.log_dir, stamp, "train"))
            tb_val = SummaryWriter(
                os.path.join(cfg.log_dir, stamp, "validation")
            )
            self.log.log(f"TensorBoard events -> {cfg.log_dir}/{stamp}")

        if state is None:
            src0 = train_loader_fn()
            if isinstance(src0, dict) and "idx" in src0:
                # scan plan: init_state only needs the video template shape
                # (one gathered row); the plan itself is discarded, exactly
                # as the loop path discards its first-epoch generator
                import jax.numpy as jnp

                row = jnp.asarray(src0["idx"][0][:1])
                first = {"video": np.asarray(src0["gather"](src0["video"],
                                                            row))}
            else:
                gen = iter(src0)
                try:
                    first = next(gen)
                finally:
                    if hasattr(gen, "close"):
                        gen.close()
            state = self.init_state(first)

        # `epochs` is the TOTAL budget; a resumed run passes start_epoch =
        # epochs already completed (CLI --resume auto) so relaunch loops
        # converge instead of each relaunch adding the full budget. Epoch
        # numbering, LR schedule and checkpoint labels stay absolute.
        if start_epoch >= epochs:
            self.log.log(
                f"Epoch budget already met ({start_epoch}/{epochs}); "
                "nothing to train"
            )
        elif start_epoch:
            self.log.log(
                f"Resuming at epoch {start_epoch + 1}/{epochs}..."
            )
        else:
            self.log.log(f"Starting training for {epochs} epochs...")
        if start_epoch and lr_schedule is not None:
            # Fast-forward the STATEFUL schedule: an uninterrupted run
            # applied it once per completed epoch, and keras_lr_schedule is
            # multiplicative — resuming from the initial LR after a deep
            # resume would train at an arbitrarily wrong rate.
            for e in range(1, start_epoch + 1):
                self.current_lr = float(lr_schedule(e - 1, self.current_lr))
        if (
            start_epoch
            and history_path
            and not self.train_losses
            and os.path.exists(history_path)
        ):
            # Auto-resume presents relaunches as ONE continuous run, so the
            # history (and the loss plot built from it) must carry the
            # earlier segments. Truncate to completed epochs: a mid-epoch
            # preemption records a train loss for an epoch it never
            # validated or credited.
            try:
                with open(history_path) as f:
                    h = jsonlib.load(f)
                self.train_losses = list(h.get("loss", []))[:start_epoch]
                self.val_losses = list(h.get("val_loss", []))[:start_epoch]
                self.lr_history = list(h.get("lr", []))[:start_epoch]
                self.epoch_seconds = list(
                    h.get("epoch_seconds", [])
                )[:start_epoch]
                # histories written before epoch_seconds existed (or with
                # fewer entries) would leave this list index-misaligned
                # with loss/val_loss/lr — pad the unknown epochs with None
                # so epoch_seconds[i] is always epoch i+1's wall
                self.epoch_seconds += [None] * (
                    len(self.train_losses) - len(self.epoch_seconds)
                )
            except (OSError, ValueError):
                pass  # unreadable prior history — start the lists fresh
        t0 = time.time()
        best_val, best_snapshot, stall = float("inf"), None, 0
        final_epoch = start_epoch
        # Epochs that ran to COMPLETION — a mid-epoch preemption leaves
        # partial-epoch steps in state.step, so resume accounting must not
        # be inferred from the step counter (it would over-credit the
        # budget); this lands in every checkpoint's metadata instead.
        completed_epochs = start_epoch
        early_stopped = False
        with sigterm_flag(self):
            for epoch in range(start_epoch + 1, epochs + 1):
                if _stop_now():
                    break
                final_epoch = epoch
                if lr_schedule is not None:
                    self.current_lr = float(
                        lr_schedule(epoch - 1, self.current_lr)
                    )
                te = time.time()
                # the loader fn may return a whole-epoch scan plan (a dict
                # from LipNetBatcher.scan_plan — fully device-cached
                # corpora) instead of a host-batch iterable
                src = train_loader_fn()

                def run_epoch_src(st):
                    if isinstance(src, dict) and "idx" in src:
                        # whole-epoch scan: ONE dispatch — cannot stop mid-
                        # flight, but a device epoch is ~1 s at bench shapes
                        return self.train_epoch_scanned(st, src)
                    return self.train_epoch(st, src, stop_check=_stop_now)

                if profile_dir is not None and epoch == start_epoch + 1:
                    # trace the first epoch only (compile + steady steps —
                    # what a perf investigation needs; whole-run traces are
                    # gigabytes). TensorBoard's profile plugin reads it.
                    from avsync.utils.profiling import trace

                    with trace(profile_dir):
                        state, train_loss = run_epoch_src(state)
                    self.log.log(f"profiler trace -> {profile_dir}")
                else:
                    state, train_loss = run_epoch_src(state)
                if _stop_now():
                    # skip validation — spend the grace window on the
                    # snapshot (written by the final save below)
                    self.train_losses.append(train_loss)
                    self.log.log(
                        f"Preempted during epoch {epoch} "
                        f"(train_loss={train_loss:.4f}); checkpointing"
                    )
                    break
                val_loss = self.validate(state, val_loader_fn())
                completed_epochs = epoch
                self.train_losses.append(train_loss)
                self.val_losses.append(val_loss)
                self.lr_history.append(self.current_lr)
                self.epoch_seconds.append(round(time.time() - te, 3))
                self.log.log(
                    f"Epoch {epoch}/{epochs} | train_loss={train_loss:.4f} "
                    f"val_loss={val_loss:.4f} | lr={self.current_lr:.2e} | "
                    f"time={format_time(time.time() - te)}"
                )
                if tb_train is not None:
                    tb_train.add_scalar("epoch_loss", train_loss, epoch)
                    tb_train.add_scalar("epoch_lr", self.current_lr, epoch)
                    tb_train.flush()
                    tb_val.add_scalar("epoch_loss", val_loss, epoch)
                    tb_val.flush()
                if example_fn is not None:
                    example_fn(state, epoch)
                if epoch % cfg.checkpoint_every == 0:
                    ckpt.save(
                        epoch,
                        _get_global(state, self.mesh),
                        config=self.config,
                        metrics={
                            "train_loss": train_loss, "val_loss": val_loss,
                            "epochs_completed": epoch,
                        },
                    )
                    self.log.log(f"Saved checkpoint: epoch_{epoch}")
                if early_stopping_patience is not None:
                    if val_loss < best_val:
                        best_val, stall = val_loss, 0
                        best_snapshot = _get_global(state, self.mesh)
                    else:
                        stall += 1
                        if stall >= early_stopping_patience:
                            self.log.log(
                                f"Early stopping at epoch {epoch} "
                                f"(no val improvement for {stall} epochs); "
                                "restoring best weights"
                            )
                            state = self.shard_state(
                                TrainState(*best_snapshot)
                            )
                            early_stopped = True
                            break
            # Final snapshot labeled one past the epoch actually reached
            # (early stopping included), not past the requested epoch
            # count. Inside the handler scope: a repeated SIGTERM during
            # this grace-window save must set the flag, not kill the write.
            # Markers use AGREED decisions (stop_logged / the lockstep
            # loop), not process-local flags — processes must write
            # identical metadata. A budget-already-met relaunch skips the
            # save entirely: it would park the latest snapshot and rewrite
            # an identical one (minutes of I/O for large params).
            if start_epoch < epochs:
                final_metrics = {"epochs_completed": completed_epochs}
                if stop_logged[0]:
                    final_metrics["preempted"] = True
                if early_stopped:
                    # --resume auto reads this as "run is DONE": a relaunch
                    # must not train the remaining budget from the restored
                    # best weights (undoing what early stopping prevented)
                    final_metrics["early_stopped"] = True
                ckpt.save(
                    final_epoch + 1, _get_global(state, self.mesh),
                    config=self.config,
                    metrics=final_metrics,
                )
            ckpt.close()
        if tb_train is not None:
            tb_train.close()
            tb_val.close()
        if history_path:
            with open(history_path, "w") as f:
                jsonlib.dump(
                    {
                        "loss": self.train_losses,
                        "val_loss": self.val_losses,
                        "lr": self.lr_history,
                        "epoch_seconds": self.epoch_seconds,
                    },
                    f,
                    indent=2,
                )
        self.log.log(
            f"Training completed in {format_time(time.time() - t0)}. Model saved."
        )
        return state

    def plot_losses(self, out_path: str = "training_history.png") -> None:
        """Loss-curve artifact (`trainer.py:159-170`)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(10, 5))
        plt.plot(self.train_losses, label="Training Loss")
        plt.plot(self.val_losses, label="Validation Loss")
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        plt.title("Training and Validation Loss")
        plt.legend()
        plt.grid(True)
        plt.savefig(out_path)
        plt.close()
