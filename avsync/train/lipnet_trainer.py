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
    (`trainer.py:23,68`: lr=1e-4, betas=(0.9, 0.999), eps=1e-8)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
    )


def make_train_step(
    model: LipNet,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch: {'video': (B,T,H,W,1) f32, 'labels': (B,L) i32,
            'label_lengths': (B,) i32}
    """

    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            log_probs = model.apply(
                {"params": params},
                batch["video"],
                train=True,
                rngs={"dropout": step_rng},
            )
            return ctc_loss_mean(
                log_probs, batch["labels"], batch["label_lengths"]
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_eval_step(model: LipNet) -> Callable:
    def eval_step(params, batch):
        log_probs = model.apply({"params": params}, batch["video"], train=False)
        loss = ctc_loss_mean(log_probs, batch["labels"], batch["label_lengths"])
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
        self.model = LipNet(config.model)
        self.optimizer = make_optimizer(
            config.train.learning_rate, config.train.grad_clip_norm
        )
        self.rng = jax.random.PRNGKey(config.train.seed)
        self.train_losses: list = []
        self.val_losses: list = []
        self._compiled = None

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
        pshard = meshlib.param_sharding(self.mesh, state.params)
        params = jax.tree.map(jax.device_put, state.params, pshard)
        # optimizer state mirrors param shardings where shapes match; scalars
        # and counters replicate.
        def put_opt(x):
            if hasattr(x, "ndim") and x.ndim > 0:
                return jax.device_put(x, meshlib.replicated(self.mesh))
            return jax.device_put(x, meshlib.replicated(self.mesh))

        opt_state = jax.tree.map(put_opt, state.opt_state)
        step = jax.device_put(state.step, meshlib.replicated(self.mesh))
        return TrainState(params, opt_state, step)

    # -- compiled steps ---------------------------------------------------
    @property
    def compiled(self):
        if self._compiled is None:
            train_step = make_train_step(self.model, self.optimizer)
            eval_step = make_eval_step(self.model)
            data_sh = meshlib.batch_sharding(self.mesh)
            self._compiled = {
                "train": jax.jit(
                    train_step,
                    in_shardings=(None, data_sh, None),
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
    def train_epoch(self, state: TrainState, loader: Iterable) -> Tuple[TrainState, float]:
        total, n = 0.0, 0
        for batch in loader:
            state, metrics = self.compiled["train"](
                state, self._device_batch(batch), self.rng
            )
            total += float(metrics["loss"])
            n += 1
        return state, total / max(n, 1)

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
    ) -> TrainState:
        """Full training run. Loader fns are called per epoch (fresh iterators).

        Checkpoints every `checkpoint_every` epochs + a final snapshot, both
        carrying the config (`trainer.py:144-156` semantics, Orbax format).
        Supports resume: pass a restored `state`.
        """
        cfg = self.config.train
        epochs = epochs if epochs is not None else cfg.epochs
        ckpt_dir = checkpoint_dir or cfg.checkpoint_dir
        ckpt = CheckpointManager(ckpt_dir)

        if state is None:
            first = next(iter(train_loader_fn()))
            state = self.init_state(first)

        self.log.log(f"Starting training for {epochs} epochs...")
        t0 = time.time()
        for epoch in range(1, epochs + 1):
            te = time.time()
            state, train_loss = self.train_epoch(state, train_loader_fn())
            val_loss = self.validate(state, val_loader_fn())
            self.train_losses.append(train_loss)
            self.val_losses.append(val_loss)
            self.log.log(
                f"Epoch {epoch}/{epochs} | train_loss={train_loss:.4f} "
                f"val_loss={val_loss:.4f} | time={format_time(time.time() - te)}"
            )
            if epoch % cfg.checkpoint_every == 0:
                ckpt.save(
                    epoch,
                    jax.device_get(state),
                    config=self.config,
                    metrics={"train_loss": train_loss, "val_loss": val_loss},
                )
                self.log.log(f"Saved checkpoint: epoch_{epoch}")

        ckpt.save(epochs + 1, jax.device_get(state), config=self.config)
        ckpt.close()
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
