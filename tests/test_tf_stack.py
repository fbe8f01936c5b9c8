"""TF/Keras-stack parity tests: LSTM vs torch, TFLipNet architecture,
Keras-convention vocab and CTC loss, trainer LR schedule / early stopping."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from avsync import text
from avsync.models.lipnet_tf import TFLipNet, TFModelConfig, tf_ctc_loss
from avsync.ops.lstm import LSTMParams, bilstm, lstm_scan


def _torch_lstm_to_params(tl: nn.LSTM, suffix: str = "") -> LSTMParams:
    return LSTMParams(
        w_ih=jnp.asarray(getattr(tl, f"weight_ih_l0{suffix}").detach().numpy().T),
        w_hh=jnp.asarray(getattr(tl, f"weight_hh_l0{suffix}").detach().numpy().T),
        b_ih=jnp.asarray(getattr(tl, f"bias_ih_l0{suffix}").detach().numpy()),
        b_hh=jnp.asarray(getattr(tl, f"bias_hh_l0{suffix}").detach().numpy()),
    )


class TestLSTM:
    def test_unidirectional_matches_torch(self, rng):
        D, H, B, T = 6, 5, 3, 9
        tl = nn.LSTM(D, H, batch_first=True)
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        with torch.no_grad():
            ref, _ = tl(torch.from_numpy(x))
        out = lstm_scan(_torch_lstm_to_params(tl), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5, rtol=1e-4)

    def test_bidirectional_matches_torch(self, rng):
        D, H, B, T = 4, 3, 2, 7
        tl = nn.LSTM(D, H, batch_first=True, bidirectional=True)
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        with torch.no_grad():
            ref, _ = tl(torch.from_numpy(x))
        out = bilstm(
            _torch_lstm_to_params(tl), _torch_lstm_to_params(tl, "_reverse"),
            jnp.asarray(x),
        )
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5, rtol=1e-4)


class TestTFVocab:
    def test_sizes_and_blank(self):
        # 26 letters + '?! + space = 30 chars; vocabulary_size()=31 (OOV at 0);
        # model head is 32-wide with blank at 31 (`train.py:106-121,544`)
        assert text.TF_VOCAB_SIZE == 31
        assert text.TF_BLANK_ID == 31
        assert text.TF_CHAR_TO_IDX["a"] == 1
        assert text.TF_CHAR_TO_IDX[" "] == 30

    def test_roundtrip_and_cap(self):
        s = "set green by b six again"
        ids = text.tf_text_to_indices(s)
        assert text.tf_indices_to_text(ids) == s
        long = "a" * 60
        assert len(text.tf_text_to_indices(long)) == 40

    def test_decode_blank_last(self):
        T, V = 6, 32
        lp = np.full((1, T, V), -10.0, np.float32)
        path = [1, 1, 31, 2, 31, 31]  # 'a' 'a' blank 'b' blank blank -> "ab"
        for t, p in enumerate(path):
            lp[0, t, p] = 0.0
        assert text.tf_decode_batch(lp) == ["ab"]


class TestTFLipNet:
    def test_forward_shapes_and_geometry(self):
        cfg = TFModelConfig(conv_channels=(4, 6, 3), hidden_dim=5, dense_dim=7)
        model = TFLipNet(cfg)
        # TF-stack geometry 46x140 -> 5x17 after 3 pools (floor div)
        x = jnp.zeros((2, 10, 46, 140, 1))
        params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
        out = model.apply({"params": params}, x)
        assert out.shape == (2, 10, 32)
        np.testing.assert_allclose(
            np.exp(np.asarray(out)).sum(-1), 1.0, atol=1e-5
        )

    def test_default_config_matches_reference_channels(self):
        cfg = TFModelConfig()
        assert cfg.conv_channels == (128, 256, 64)
        assert cfg.num_lstm_layers == 3
        assert cfg.vocab_size + 1 == 32


class TestTFCTCLoss:
    def test_count_nonzero_label_lengths(self, rng):
        """Zero-padded labels are excluded via count_nonzero
        (`train.py:482-483`) — loss must equal explicitly-masked optax."""
        import optax

        B, T, V, L = 3, 12, 32, 8
        logits = rng.normal(size=(B, T, V)).astype(np.float32)
        lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
        labels = np.zeros((B, L), np.int32)
        lengths = [3, 5, 1]
        for b, n in enumerate(lengths):
            labels[b, :n] = rng.integers(1, 31, n)
        ours = float(tf_ctc_loss(lp, jnp.asarray(labels)))

        pad = (np.arange(L)[None] >= np.array(lengths)[:, None]).astype(np.float32)
        ref = float(
            jnp.mean(
                optax.ctc_loss(
                    lp, jnp.zeros((B, T)), jnp.asarray(labels),
                    jnp.asarray(pad), blank_id=31,
                )
            )
        )
        assert ours == pytest.approx(ref, rel=1e-6)

    def test_not_length_normalized(self, rng):
        """Keras ctc_batch_cost is per-sequence NLL; unlike torch 'mean' it is
        NOT divided by label length — the batch mean of raw per-seq NLLs."""
        import optax

        B, T, V, L = 1, 20, 32, 8
        logits = rng.normal(size=(B, T, V)).astype(np.float32)
        lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
        labels = np.zeros((B, L), np.int32)
        labels[0, :4] = [1, 2, 3, 4]
        per_seq = float(
            optax.ctc_loss(
                lp, jnp.zeros((B, T)), jnp.asarray(labels),
                jnp.asarray((np.arange(L)[None] >= 4).astype(np.float32)),
                blank_id=31,
            )[0]
        )
        ours = float(tf_ctc_loss(lp, jnp.asarray(labels)))
        assert ours == pytest.approx(per_seq, rel=1e-6)  # NOT per_seq / 4


class TestTrainerSchedules:
    def test_keras_lr_schedule(self):
        from avsync.train.lipnet_trainer import keras_lr_schedule

        lr = 1e-4
        assert keras_lr_schedule(0, lr) == lr
        assert keras_lr_schedule(29, lr) == lr
        assert keras_lr_schedule(30, lr) == pytest.approx(lr * 0.5)
        assert keras_lr_schedule(60, lr) == pytest.approx(lr * np.exp(-0.1))

    def test_early_stopping_restores_best(self):
        from avsync.config import AvsyncConfig, ModelConfig, TrainConfig
        from avsync.parallel import make_mesh
        from avsync.train import LipNetTrainer
        from avsync.utils.logging import Logger
        import tempfile

        cfg = AvsyncConfig(
            model=ModelConfig(hidden_dim=4, conv_channels=(2, 2, 2)),
            train=TrainConfig(learning_rate=5e-2, checkpoint_every=100),
        )
        trainer = LipNetTrainer(
            cfg, mesh=make_mesh((8, 1)), log=Logger(None, console=False)
        )
        rng = np.random.default_rng(0)
        batch = {
            "video": rng.random((8, 10, 16, 16, 1)).astype(np.float32),
            "labels": np.pad(rng.integers(1, 37, (8, 3)).astype(np.int32), ((0, 0), (0, 1))),
            "label_lengths": np.full((8,), 3, np.int32),
        }
        with tempfile.TemporaryDirectory() as d:
            trainer.train(
                lambda: [batch], lambda: [batch], epochs=6,
                checkpoint_dir=d, early_stopping_patience=2,
                history_path=f"{d}/history.json",
            )
            import json, os

            hist = json.load(open(f"{d}/history.json"))
            assert "loss" in hist and "lr" in hist
            assert len(hist["loss"]) <= 6
