"""Training + parallelism tests on the virtual 8-device CPU mesh.

Exercises the pjit train step under real shardings: data-parallel (8,1),
data+tensor-parallel (4,2), checkpoint save/restore/resume, and numerical
consistency of the sharded computation against single-logical-device math.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from avsync.config import AvsyncConfig, ModelConfig, TrainConfig
from avsync.parallel import make_mesh, lipnet_param_spec
from avsync.train import LipNetTrainer
from avsync.utils.checkpoint import CheckpointManager
from avsync.utils.logging import Logger

TINY_MODEL = ModelConfig(
    vocab_size=39,
    hidden_dim=8,
    conv_channels=(2, 3, 4),
    conv_kernels=((3, 5, 5), (3, 5, 5), (3, 3, 3)),
)


def tiny_config(**train_kw) -> AvsyncConfig:
    return AvsyncConfig(
        model=TINY_MODEL,
        train=TrainConfig(learning_rate=1e-3, checkpoint_every=2, **train_kw),
    )


def synth_batch(rng, B=8, T=12, H=16, W=32, L=6):
    labels = rng.integers(1, 37, size=(B, L)).astype(np.int32)
    lengths = rng.integers(2, L + 1, size=(B,)).astype(np.int32)
    for b in range(B):
        labels[b, lengths[b]:] = 0
    return {
        "video": rng.random((B, T, H, W, 1)).astype(np.float32),
        "labels": labels,
        "label_lengths": lengths,
    }


def loader_fn(rng_seed, n_batches=2, **kw):
    def make():
        rng = np.random.default_rng(rng_seed)
        return [synth_batch(rng, **kw) for _ in range(n_batches)]

    return make


class TestMesh:
    def test_mesh_shapes(self):
        m = make_mesh((-1, 1))
        assert m.devices.shape == (8, 1)
        m2 = make_mesh((4, 2))
        assert m2.devices.shape == (4, 2)
        assert m2.axis_names == ("data", "model")

    def test_param_spec_rules(self):
        params = {
            "conv1": {"kernel": np.zeros((3, 5, 5, 1, 2)), "bias": np.zeros(2)},
            "gru1": {"w_ih_fwd": np.zeros((10, 24)), "b_ih_fwd": np.zeros(24)},
            "fc": {"kernel": np.zeros((16, 39)), "bias": np.zeros(39)},
        }
        spec = lipnet_param_spec(params)
        assert spec["conv1"]["kernel"] == P()
        assert spec["gru1"]["w_ih_fwd"] == P(None, "model")
        assert spec["gru1"]["b_ih_fwd"] == P("model")
        assert spec["fc"]["kernel"] == P(None, "model")


class TestTrainStep:
    def test_loss_decreases_dp(self):
        cfg = tiny_config()
        trainer = LipNetTrainer(cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False))
        rng = np.random.default_rng(0)
        batch = synth_batch(rng)
        state = trainer.init_state(batch)
        losses = []
        for _ in range(5):
            state, m = trainer.compiled["train"](
                state, trainer._device_batch(batch), trainer.rng,
                np.float32(trainer.current_lr),
            )
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        assert int(state.step) == 5

    def test_dp_tp_consistent(self):
        """Same params+batch must give the same loss on (8,1) and (4,2)
        meshes — the sharded computation is numerically the same program."""
        cfg = tiny_config()
        rng = np.random.default_rng(1)
        batch = synth_batch(rng)

        losses = {}
        for shape in [(8, 1), (4, 2), (2, 4)]:
            trainer = LipNetTrainer(
                cfg, mesh=make_mesh(shape), log=Logger(None, console=False)
            )
            trainer.rng = jax.random.PRNGKey(7)
            state = trainer.init_state(batch)
            _, m = trainer.compiled["train"](
                state, trainer._device_batch(batch), trainer.rng,
                np.float32(trainer.current_lr),
            )
            losses[shape] = float(m["loss"])
        base = losses[(8, 1)]
        for shape, v in losses.items():
            assert v == pytest.approx(base, rel=1e-4), (shape, losses)

    def test_adam_moments_follow_param_sharding(self):
        """Tensor-parallel runs must shard the optimizer moments like the
        params (not replicate them) — mu/nu are param-shaped."""
        import optax

        cfg = tiny_config()
        trainer = LipNetTrainer(
            cfg, mesh=make_mesh((4, 2)), log=Logger(None, console=False)
        )
        rng = np.random.default_rng(5)
        state = trainer.init_state(synth_batch(rng))
        adam = next(
            s for s in state.opt_state if isinstance(s, optax.ScaleByAdamState)
        )
        p_leaves = jax.tree.leaves(state.params)
        mu_leaves = jax.tree.leaves(adam.mu)
        assert len(p_leaves) == len(mu_leaves)
        shardings = [
            (p.sharding.spec, m.sharding.spec)
            for p, m in zip(p_leaves, mu_leaves)
        ]
        assert all(ps == ms for ps, ms in shardings), shardings
        # at least one leaf actually uses the model axis at tp=2
        assert any("model" in str(ps) for ps, _ in shardings)

    def test_hierarchical_slice_mesh_consistent(self):
        """2-level ('slice','data','model') mesh — the multi-slice DCN
        stand-in — must reproduce the flat (8,1) loss exactly: XLA decomposes
        the gradient all-reduce hierarchically but computes the same sums."""
        from avsync.parallel.mesh import batch_sharding, make_hierarchical_mesh

        cfg = tiny_config()
        rng = np.random.default_rng(3)
        batch = synth_batch(rng)

        flat = LipNetTrainer(
            cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False)
        )
        flat.rng = jax.random.PRNGKey(7)
        fstate = flat.init_state(batch)
        _, fm = flat.compiled["train"](
            fstate, flat._device_batch(batch), flat.rng,
            np.float32(flat.current_lr),
        )

        losses = {}
        for shape in [(2, 4, 1), (2, 2, 2)]:
            hmesh = make_hierarchical_mesh(shape)
            assert hmesh.axis_names == ("slice", "data", "model")
            spec = batch_sharding(hmesh).spec
            assert spec == P(("slice", "data"))
            ht = LipNetTrainer(cfg, mesh=hmesh, log=Logger(None, console=False))
            ht.rng = jax.random.PRNGKey(7)
            hstate = ht.init_state(batch)
            _, hm = ht.compiled["train"](
                hstate, ht._device_batch(batch), ht.rng,
                np.float32(ht.current_lr),
            )
            losses[shape] = float(hm["loss"])
        for shape, v in losses.items():
            assert v == pytest.approx(float(fm["loss"]), rel=1e-4), (
                shape, losses, float(fm["loss"]),
            )

    def test_eval_step(self):
        cfg = tiny_config()
        trainer = LipNetTrainer(cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False))
        rng = np.random.default_rng(2)
        batch = synth_batch(rng)
        state = trainer.init_state(batch)
        loss, log_probs = trainer.compiled["eval"](
            state.params, trainer._device_batch(batch)
        )
        assert np.isfinite(float(loss))
        assert log_probs.shape == (8, 12, 39)


class TestTrainerLoop:
    def test_full_train_with_checkpoints(self, tmp_path):
        cfg = tiny_config()
        trainer = LipNetTrainer(cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False))
        state = trainer.train(
            loader_fn(0),
            loader_fn(1),
            epochs=2,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        assert len(trainer.train_losses) == 2
        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        steps = ckpt.all_steps()
        assert 2 in steps and 3 in steps  # periodic @2 + final (epochs+1)
        restored, meta = ckpt.restore(2, template=jax.device_get(state))
        assert meta["config"]["model"]["hidden_dim"] == 8
        assert meta["metrics"]["train_loss"] > 0
        ckpt.close()

    def test_resume_from_checkpoint(self, tmp_path):
        cfg = tiny_config()
        trainer = LipNetTrainer(cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False))
        state = trainer.train(
            loader_fn(0), loader_fn(1), epochs=2, checkpoint_dir=str(tmp_path / "c")
        )
        ckpt = CheckpointManager(str(tmp_path / "c"))
        restored, _ = ckpt.restore(template=jax.device_get(state))
        ckpt.close()
        state2 = trainer.shard_state(
            type(state)(restored.params, restored.opt_state, restored.step)
        )
        state3 = trainer.train(
            loader_fn(0), loader_fn(1), epochs=1,
            checkpoint_dir=str(tmp_path / "c2"), state=state2,
        )
        assert int(state3.step) > int(restored.step)

    def test_checkpoint_overwrite_same_step_is_crash_safe(self, tmp_path):
        """Re-saving an existing step label must keep the old snapshot on
        disk until the replacement is fully written (the old copy is parked
        as .stale-<step>, removed only after save succeeds), and the new
        content must win."""
        import numpy as np

        root = str(tmp_path / "ow")
        m = CheckpointManager(root)
        m.save(5, {"w": np.zeros(3)})
        m.save(5, {"w": np.ones(3)})
        state, _ = m.restore(5)
        np.testing.assert_array_equal(np.asarray(state["w"]), np.ones(3))
        assert m.all_steps() == [5]
        import os

        leftovers = [d for d in os.listdir(root) if d.startswith(".stale")]
        assert leftovers == []  # cleaned up after the successful save
        m.close()

    def test_plot_losses(self, tmp_path):
        cfg = tiny_config()
        trainer = LipNetTrainer(cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False))
        trainer.train_losses = [3.0, 2.0]
        trainer.val_losses = [3.1, 2.2]
        out = str(tmp_path / "hist.png")
        trainer.plot_losses(out)
        import os

        assert os.path.exists(out)

    def test_sigterm_preemption_checkpoints_and_stops(self, tmp_path):
        """SIGTERM mid-run (TPU pod eviction) finishes the in-flight epoch,
        writes the resume snapshot, restores the prior handler, and
        returns — instead of dying ungracefully."""
        import os
        import signal

        cfg = tiny_config()
        trainer = LipNetTrainer(
            cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False)
        )
        before = signal.getsignal(signal.SIGTERM)

        def preempt_at_2(state, epoch):
            if epoch == 2:
                os.kill(os.getpid(), signal.SIGTERM)

        state = trainer.train(
            loader_fn(0),
            loader_fn(1),
            epochs=50,
            checkpoint_dir=str(tmp_path / "ckpt"),
            example_fn=preempt_at_2,
        )
        # stopped right after epoch 2, long before 50
        assert len(trainer.train_losses) == 2
        assert signal.getsignal(signal.SIGTERM) == before  # restored
        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        assert ckpt.latest_step() == 3  # resume point: one past epoch 2
        _, meta = ckpt.restore(3, template=jax.device_get(state))
        assert meta["metrics"]["preempted"] == 1.0
        # both epochs ran to completion (signal landed in example_fn,
        # after validation) — resume accounting credits them
        assert meta["metrics"]["epochs_completed"] == 2.0
        ckpt.close()

    def test_sigterm_mid_epoch_skips_validation(self, tmp_path):
        """A signal landing DURING an epoch checkpoints at its end without
        running validation (the grace window goes to the snapshot)."""
        import os
        import signal

        cfg = tiny_config()
        trainer = LipNetTrainer(
            cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False)
        )
        rng = np.random.default_rng(0)
        batches = [synth_batch(rng) for _ in range(2)]

        hit = {"n": 0}

        def batches_then_signal():
            for i, b in enumerate(batches):
                if hit["n"] == 1 and i == 1:  # second epoch, second batch
                    os.kill(os.getpid(), signal.SIGTERM)
                yield b
            hit["n"] += 1

        def fail_if_validated():
            if hit["n"] >= 2:
                raise AssertionError("validation ran after preemption")
            return iter(batches)

        state = trainer.train(
            batches_then_signal,
            fail_if_validated,
            epochs=50,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        assert len(trainer.train_losses) == 2  # epoch 2 loss still recorded
        assert len(trainer.val_losses) == 1  # but epoch 2 never validated
        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        assert ckpt.latest_step() == 3
        _, meta = ckpt.restore(3, template=jax.device_get(state))
        # epoch 2 was interrupted — resume accounting must NOT credit it
        # (its steps are in state.step; a step-derived heuristic would
        # over-credit across relaunches)
        assert meta["metrics"]["epochs_completed"] == 1.0
        ckpt.close()

    def test_resume_fast_forwards_stateful_lr_schedule(self, tmp_path):
        """A stateful (multiplicative) schedule must be replayed over the
        epochs a previous segment already completed — resuming at the
        initial LR would train at an arbitrarily wrong rate."""
        cfg = tiny_config()
        trainer = LipNetTrainer(
            cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False)
        )
        rng = np.random.default_rng(0)
        state = trainer.init_state(synth_batch(rng))
        trainer.train(
            loader_fn(0), loader_fn(1), epochs=3,
            checkpoint_dir=str(tmp_path / "ckpt"),
            state=state, start_epoch=2,
            lr_schedule=lambda epoch, lr: lr * 0.5,
        )
        # replayed epochs 1-2, then the loop applied epoch 3: 0.5^3
        assert trainer.current_lr == pytest.approx(
            cfg.train.learning_rate * 0.125
        )
        assert len(trainer.train_losses) == 1  # only epoch 3 ran

    def test_early_stop_marks_run_done_in_metadata(self, tmp_path):
        """Early stopping writes early_stopped into the final checkpoint's
        metadata so an auto-resume relaunch treats the budget as met
        instead of training past the restored best weights."""
        cfg = tiny_config()
        trainer = LipNetTrainer(
            cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False)
        )
        vals = iter([1.0, 2.0, 3.0, 4.0, 5.0])
        trainer.validate = lambda state, loader: next(vals)
        state = trainer.train(
            loader_fn(0), loader_fn(1), epochs=50,
            checkpoint_dir=str(tmp_path / "ckpt"),
            early_stopping_patience=2,
        )
        # best at epoch 1, stall hits 2 at epoch 3
        assert len(trainer.train_losses) == 3
        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        step = ckpt.latest_step()
        _, meta = ckpt.restore(step, template=jax.device_get(state))
        assert meta["metrics"]["early_stopped"] == 1.0
        assert meta["metrics"]["epochs_completed"] == 3.0
        ckpt.close()

    def test_budget_met_relaunch_is_a_noop(self, tmp_path):
        """start_epoch >= epochs (one relaunch too many): no epochs run and
        the existing latest snapshot is NOT parked-and-rewritten."""
        import os

        cfg = tiny_config()
        trainer = LipNetTrainer(
            cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False)
        )
        state = trainer.train(
            loader_fn(0), loader_fn(1), epochs=2,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        latest_dir = str(tmp_path / "ckpt" / "3")
        assert os.path.isdir(latest_dir)
        mtime = os.path.getmtime(latest_dir)
        trainer2 = LipNetTrainer(
            cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False)
        )
        trainer2.train(
            loader_fn(0), loader_fn(1), epochs=2,
            checkpoint_dir=str(tmp_path / "ckpt"),
            state=state, start_epoch=2,
        )
        assert trainer2.train_losses == []  # nothing trained
        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        assert ckpt.latest_step() == 3  # unchanged
        ckpt.close()
        assert os.path.getmtime(latest_dir) == mtime  # not rewritten

    def test_resume_seeds_history_from_prior_segment(self, tmp_path):
        """Auto-resume presents relaunches as one continuous run: the
        history JSON (and loss plot) must carry earlier segments' curves
        instead of being overwritten with only the final segment."""
        import json

        hist_path = str(tmp_path / "history.json")
        with open(hist_path, "w") as f:
            json.dump(
                {"loss": [5.0, 4.0], "val_loss": [5.1, 4.1],
                 "lr": [1e-3, 1e-3]},
                f,
            )
        cfg = tiny_config()
        trainer = LipNetTrainer(
            cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False)
        )
        rng = np.random.default_rng(0)
        state = trainer.init_state(synth_batch(rng))
        trainer.train(
            loader_fn(0), loader_fn(1), epochs=3,
            checkpoint_dir=str(tmp_path / "ckpt"),
            state=state, start_epoch=2, history_path=hist_path,
        )
        with open(hist_path) as f:
            h = json.load(f)
        assert h["loss"][:2] == [5.0, 4.0]  # prior segments preserved
        assert len(h["loss"]) == 3 and len(h["val_loss"]) == 3
        # the prior segment predates epoch_seconds (or lost it): the
        # unknown epochs pad with null so epoch_seconds[i] is always
        # epoch i+1's wall, never the resumed segment's shifted down
        assert len(h["epoch_seconds"]) == 3
        assert h["epoch_seconds"][:2] == [None, None]
        assert isinstance(h["epoch_seconds"][2], float)

    def test_profile_dir_captures_first_epoch_trace(self, tmp_path):
        """--profile_dir plumbing: the first epoch runs under jax.profiler
        and leaves a TensorBoard-profile-plugin-loadable trace."""
        import glob
        import os

        cfg = tiny_config()
        trainer = LipNetTrainer(
            cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False)
        )
        prof = str(tmp_path / "prof")
        trainer.train(
            loader_fn(0), loader_fn(1), epochs=2,
            checkpoint_dir=str(tmp_path / "ckpt"),
            profile_dir=prof,
        )
        assert glob.glob(os.path.join(prof, "plugins", "profile", "*", "*")), (
            "no profiler artifacts written"
        )

    def test_sigterm_mid_epoch_stops_at_batch_boundary(self, tmp_path):
        """On corpora whose epochs outlast the grace window, the signal
        stops training at the next PREEMPT_CHECK_EVERY batch boundary
        instead of running the epoch to completion."""
        import os
        import signal

        cfg = tiny_config()
        trainer = LipNetTrainer(
            cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False)
        )
        rng = np.random.default_rng(0)
        batch = synth_batch(rng)
        N = 64

        def long_epoch():
            for i in range(N):
                if i == 20:  # mid-epoch signal
                    os.kill(os.getpid(), signal.SIGTERM)
                yield batch

        state = trainer.train(
            long_epoch,
            lambda: [batch],
            epochs=3,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        steps = int(np.asarray(jax.device_get(state.step)))
        # signaled during batch 21 -> stopped at the 32-batch poll, long
        # before the 64-batch epoch end (and never started epoch 2)
        assert steps == 32, steps
        assert len(trainer.train_losses) == 1
        ckpt = CheckpointManager(str(tmp_path / "ckpt"))
        assert ckpt.latest_step() == 2  # resume point: one past epoch 1
        ckpt.close()
