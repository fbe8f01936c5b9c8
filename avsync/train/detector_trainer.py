"""Misalignment-detector training: BCE over shift-contrastive device batches.

Reference semantics (`misalignment_detection_train.py:253-280,345-486`):
Adam(lr=1e-3, weight_decay=1e-5 — torch's coupled L2, not AdamW), BCE with
logits, accuracy@0.5 + ROC-AUC per epoch, best-val-AUC model selection,
periodic checkpoints, final test eval + ROC artifact.

TPU-native: features come from a precomputed FeatureBank (avsync.features);
each step gathers (video_idx, shift) pairs and runs shift->MFCC->stats +
detector forward/backward in ONE jitted program on device.
"""

from __future__ import annotations

import time
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from avsync.config import AvsyncConfig
from avsync.eval import auroc, binary_accuracy
from avsync.features import FeatureBank, gather_features, sample_shift_labels
from avsync.models import MisalignmentDetector
from avsync.utils.logging import Logger, format_time


class DetectorState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jax.Array


def make_detector_optimizer(lr: float, weight_decay: float):
    """torch.optim.Adam(lr, weight_decay=wd): wd couples into the gradient
    BEFORE the Adam moments (`misalignment_detection_train.py:412`) — i.e.
    L2 regularization, not decoupled AdamW."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8),
    )


class DetectorTrainer:
    """Host loop over jitted detector steps.

    With `mesh` given, each step's (video_idx, shifts, labels) batch shards
    over the 'data' axis (params, optimizer state and the FeatureBank
    replicate — the bank is gathered with dynamic indices); XLA inserts the
    gradient all-reduce. Ragged final batches are zero-weight-padded to the
    mesh size, so the weighted loss/gradient math is exact, not approximated.
    """

    def __init__(
        self,
        config: AvsyncConfig,
        log: Optional[Logger] = None,
        mesh=None,
    ):
        self.config = config
        self.log = log or Logger(None, console=True)
        self.mesh = mesh
        self.model = MisalignmentDetector(
            hidden_dim=config.detector.hidden_dim, dropout=config.detector.dropout
        )
        self.optimizer = make_detector_optimizer(
            config.detector.lr, config.detector.weight_decay
        )
        self.rng = jax.random.PRNGKey(config.train.seed)
        self._steps = None
        # test hook: force the per-step host loop (the scanned epoch path
        # must be bit-identical to it — tests/test_misalignment.py)
        self._force_loop = False

    def init_state(self, feature_dim: int) -> DetectorState:
        init_rng, self.rng = jax.random.split(self.rng)
        params = self.model.init(
            {"params": init_rng}, jnp.zeros((1, feature_dim))
        )["params"]
        return DetectorState(
            params, self.optimizer.init(params), jnp.zeros((), jnp.int32)
        )

    # -- jitted steps -----------------------------------------------------
    @property
    def steps(self):
        if self._steps is None:
            model, optimizer = self.model, self.optimizer
            audio_cfg = self.config.audio

            def train_step(state, bank, video_idx, shifts, labels, weights, rng):
                step_rng = jax.random.fold_in(rng, state.step)
                feats = gather_features(bank, video_idx, shifts, audio_cfg)

                def loss_fn(params):
                    logits = model.apply(
                        {"params": params},
                        feats,
                        train=True,
                        rngs={"dropout": step_rng},
                    )
                    bce = optax.sigmoid_binary_cross_entropy(logits, labels)
                    loss = jnp.sum(bce * weights) / jnp.maximum(
                        jnp.sum(weights), 1.0
                    )
                    return loss, logits

                (loss, logits), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params)
                updates, opt_state = optimizer.update(
                    grads, state.opt_state, state.params
                )
                params = optax.apply_updates(state.params, updates)
                probs = jax.nn.sigmoid(logits)
                return (
                    DetectorState(params, opt_state, state.step + 1),
                    loss,
                    probs,
                )

            def eval_step(params, bank, video_idx, shifts, labels, weights):
                feats = gather_features(bank, video_idx, shifts, audio_cfg)
                logits = model.apply({"params": params}, feats, train=False)
                bce = optax.sigmoid_binary_cross_entropy(logits, labels)
                loss = jnp.sum(bce * weights) / jnp.maximum(
                    jnp.sum(weights), 1.0
                )
                return loss, jax.nn.sigmoid(logits)

            # Whole-epoch variants: lax.scan the step over the epoch's
            # pre-padded (S, B) sampling plan in ONE device program. The
            # per-batch host loop costs one tunnel round-trip per step
            # (50+ ms RTT dominates the few-ms step math); the scan costs
            # one dispatch per EPOCH with bit-identical sequential
            # semantics (same batch order, same fold_in(step) dropout keys).
            def train_epoch_scan(state, bank, vi, sh, lb, w, rng):
                def body(st, xs):
                    v, s, l, wt = xs
                    st, loss, probs = train_step(st, bank, v, s, l, wt, rng)
                    return st, (loss, probs)

                state, (losses, probs) = jax.lax.scan(
                    body, state, (vi, sh, lb, w)
                )
                return state, losses, probs

            def eval_epoch_scan(params, bank, vi, sh, lb, w):
                def body(_, xs):
                    v, s, l, wt = xs
                    loss, probs = eval_step(params, bank, v, s, l, wt)
                    return (), (loss, probs)

                _, (losses, probs) = jax.lax.scan(
                    body, (), (vi, sh, lb, w)
                )
                return losses, probs

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                from avsync.parallel.mesh import batch_sharding, replicated

                data_sh = batch_sharding(self.mesh)
                rep = replicated(self.mesh)
                # (S, B) plans shard the BATCH axis (1) the same way a
                # single (B,) batch shards its axis 0
                spec = data_sh.spec
                plan_sh = NamedSharding(
                    self.mesh, PartitionSpec(None, *spec)
                )
                self._steps = {
                    "train": jax.jit(
                        train_step,
                        in_shardings=(
                            rep, rep, data_sh, data_sh, data_sh, data_sh, rep,
                        ),
                        donate_argnums=(0,),
                    ),
                    "eval": jax.jit(
                        eval_step,
                        in_shardings=(
                            rep, rep, data_sh, data_sh, data_sh, data_sh,
                        ),
                    ),
                    "train_epoch": jax.jit(
                        train_epoch_scan,
                        in_shardings=(
                            rep, rep, plan_sh, plan_sh, plan_sh, plan_sh, rep,
                        ),
                        donate_argnums=(0,),
                    ),
                    "eval_epoch": jax.jit(
                        eval_epoch_scan,
                        in_shardings=(
                            rep, rep, plan_sh, plan_sh, plan_sh, plan_sh,
                        ),
                    ),
                }
            else:
                self._steps = {
                    "train": jax.jit(train_step, donate_argnums=(0,)),
                    "eval": jax.jit(eval_step),
                    "train_epoch": jax.jit(
                        train_epoch_scan, donate_argnums=(0,)
                    ),
                    "eval_epoch": jax.jit(eval_epoch_scan),
                }
        return self._steps

    # -- epochs -----------------------------------------------------------
    def run_epoch(
        self,
        state: DetectorState,
        bank: FeatureBank,
        n_videos: int,
        seed: int,
        train: bool = True,
        batch_size: Optional[int] = None,
    ) -> Tuple[DetectorState, Dict[str, float]]:
        """One pass over the shift-contrastive sampling plan — the analogue
        of `run_epoch` (`misalignment_detection_train.py:253-280`)."""
        det = self.config.detector
        B = batch_size or det.batch_size
        rng = np.random.default_rng(seed)
        video_idx, shifts, labels = sample_shift_labels(
            n_videos, det.max_shift_frames, det.num_negative_samples, rng,
            shuffle=train,
        )
        # batches must tile the mesh's batch-sharding axes ('data', jointly
        # with 'slice' on hierarchical meshes); ragged tails pad with
        # zero-weight rows (exact weighted loss, padded probs dropped)
        tile = 1
        if self.mesh is not None:
            tile = int(self.mesh.shape["data"]) * int(
                self.mesh.shape.get("slice", 1)
            )
        total_loss, total_n = 0.0, 0
        all_probs, all_labels = [], []
        # Full-width batches run as ONE scanned device program (one tunnel
        # dispatch per epoch instead of one per step — the 50+ ms RTT, not
        # the step math, dominates the per-batch loop). The scan replays the
        # loop bit-identically: same batch order, same fold_in(state.step)
        # dropout keys, same weighted-loss math. The ragged tail (and any B
        # not divisible by the mesh tile) stays on the per-step path below.
        start = 0
        S = len(video_idx) // B
        if S > 0 and B % tile == 0 and not self._force_loop:
            start = S * B

            def plan(a, dtype=None):
                a = a[:start].reshape(S, B)
                return jnp.asarray(a if dtype is None else a.astype(dtype))

            vi = plan(video_idx)
            sh = plan(shifts)
            lb = plan(labels, np.float32)
            w = jnp.ones((S, B), jnp.float32)
            if train:
                state, losses, probs = self.steps["train_epoch"](
                    state, bank, vi, sh, lb, w, self.rng
                )
            else:
                losses, probs = self.steps["eval_epoch"](
                    state.params, bank, vi, sh, lb, w
                )
            # accumulate exactly as the loop does (f64 per-batch terms), so
            # the reported epoch loss is bit-identical to the step path
            total_loss += sum(float(l) * B for l in np.asarray(losses))
            total_n += S * B
            all_probs.append(np.asarray(probs).reshape(-1))
            all_labels.append(labels[:start])
        for i in range(start, len(video_idx), B):
            vi = video_idx[i : i + B]
            valid = len(vi)
            pad = (-valid) % tile
            w = np.concatenate([np.ones(valid), np.zeros(pad)]).astype(
                np.float32
            )
            vi = jnp.asarray(np.pad(vi, (0, pad)))
            sh = jnp.asarray(np.pad(shifts[i : i + B], (0, pad)))
            lb = jnp.asarray(
                np.pad(labels[i : i + B], (0, pad)).astype(np.float32)
            )
            w = jnp.asarray(w)
            if train:
                state, loss, probs = self.steps["train"](
                    state, bank, vi, sh, lb, w, self.rng
                )
            else:
                loss, probs = self.steps["eval"](
                    state.params, bank, vi, sh, lb, w
                )
            total_loss += float(loss) * valid
            total_n += valid
            all_probs.append(np.asarray(probs)[:valid])
            all_labels.append(labels[i : i + B])
        probs = np.concatenate(all_probs)
        labs = np.concatenate(all_labels)
        metrics = {
            "loss": total_loss / max(total_n, 1),
            "acc": float(binary_accuracy(jnp.asarray(labs), jnp.asarray(probs))),
            "auc": float(auroc(jnp.asarray(labs), jnp.asarray(probs))),
            "labels": labs,
            "probs": probs,
        }
        return state, metrics

    def train(
        self,
        bank: FeatureBank,
        train_videos: int,
        val_bank: FeatureBank,
        val_videos: int,
        epochs: Optional[int] = None,
        save_every: Optional[int] = None,
        save_fn=None,
    ) -> Tuple[DetectorState, Dict[str, float]]:
        """Full run with best-val-AUC selection
        (`misalignment_detection_train.py:418-444`) and periodic snapshots:
        every `save_every` epochs, `save_fn(state, epoch)` is invoked (the
        `--save_every` checkpoints at `:437-440`)."""
        from avsync.utils.signals import sigterm_flag

        det = self.config.detector
        epochs = epochs or det.epochs
        feature_dim = bank.visual.shape[1] + 2 * self.config.audio.n_mfcc
        state = self.init_state(feature_dim)
        best_params, best_auc = None, -1.0
        t0 = time.time()
        # Graceful preemption, as in LipNetTrainer.train (shared flag-only
        # handler, utils/signals.py); the epoch boundary snapshots and
        # stops. Single-controller by scope (parallel/multihost.py), so a
        # plain flag suffices — no vote.
        with sigterm_flag(self):
            for epoch in range(1, epochs + 1):
                te = time.time()
                state, tr = self.run_epoch(
                    state, bank, train_videos,
                    seed=self.config.train.seed + epoch,
                )
                if self._preempted:
                    # skip validation — spend the grace window on the
                    # snapshot (same policy as LipNetTrainer.train)
                    self.log.log(
                        f"preemption signal observed during epoch {epoch}: "
                        "snapshotting and stopping"
                    )
                    if save_fn:
                        save_fn(state, epoch)
                    break
                _, va = self.run_epoch(
                    state, val_bank, val_videos,
                    seed=self.config.train.seed + 10_000 + epoch, train=False,
                )
                self.log.log(
                    f"Epoch {epoch:02d}/{epochs} | "
                    f"train_loss={tr['loss']:.4f} train_acc={tr['acc']:.3f} | "
                    f"val_loss={va['loss']:.4f} val_acc={va['acc']:.3f} "
                    f"val_auc={va['auc']:.3f} | time={time.time() - te:.1f}s"
                )
                # >= (not >): ties go to the LATEST epoch. The reference's
                # `best_state = model.state_dict()` (:432) aliases the live
                # tensors — never deep-copied — so its final
                # `load_state_dict` restores nothing and the last epoch's
                # weights ship. Val AUC saturates at 1.0 within a few
                # epochs here, so strict `>` would freeze a just-saturated
                # (undertrained) model: measured AUROC 0.75 vs 1.0 at
                # 1-frame shifts. Latest-tie selection keeps true best-val
                # semantics while matching the reference's effective
                # operating point.
                if not np.isnan(va["auc"]) and va["auc"] >= best_auc:
                    best_auc = va["auc"]
                    best_params = jax.device_get(state.params)
                    self.log.log(
                        f"  -> New best model (val_auc={best_auc:.3f})"
                    )
                saved = False
                if save_every and save_fn and epoch % save_every == 0:
                    save_fn(state, epoch)
                    self.log.log(f"  -> Checkpoint saved: epoch {epoch}")
                    saved = True
                if self._preempted:
                    self.log.log(
                        f"preemption signal observed after epoch {epoch}: "
                        "snapshotting and stopping"
                    )
                    if save_fn and not saved:
                        save_fn(state, epoch)
                    break
        if best_params is not None:
            state = DetectorState(
                jax.tree.map(jnp.asarray, best_params), state.opt_state, state.step
            )
        self.log.log(f"Training done in {format_time(time.time() - t0)}")
        return state, {"best_val_auc": best_auc}
