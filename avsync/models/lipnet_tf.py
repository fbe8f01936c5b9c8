"""The TF/Keras-stack LipNet variant: Conv3D(128/256/64) + 3x Bi-LSTM + MLP head.

Architecture parity with `create_lipnet_model` (`train.py:495-547`):
three [Conv3D(k=3, same, relu) -> MaxPool3D(1,2,2)] blocks with channels
(128, 256, 64), reshape to (T, -1), three Bidirectional LSTM(256) layers each
followed by Dropout(0.5), two Dense(512, relu) layers, and a
Dense(vocab_size + 1) softmax head (Keras CTC blank = last index; see
avsync.text TF_BLANK_ID). Default input geometry is the TF stack's
75 x 46 x 140 x 1 (`train.py:88-90`).

Same TPU design as avsync.models.lipnet: NDHWC, scan LSTM with hoisted input
projection, channel dropout semantics not needed here (Keras used plain
Dropout between LSTMs only).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from avsync.ops.conv import max_pool3d
from avsync.ops.lstm import LSTMParams, lstm_scan


@dataclass(frozen=True)
class TFModelConfig:
    vocab_size: int = 31  # StringLookup vocabulary_size() (`train.py:640`)
    hidden_dim: int = 256
    dropout_rate: float = 0.5
    conv_channels: Tuple[int, int, int] = (128, 256, 64)
    num_lstm_layers: int = 3
    dense_dim: int = 512
    compute_dtype: str = "float32"


class BiLSTM(nn.Module):
    hidden_dim: int
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        input_dim = x.shape[-1]
        H = self.hidden_dim
        k = 1.0 / jnp.sqrt(H)

        def uniform(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        def direction(name: str) -> LSTMParams:
            return LSTMParams(
                w_ih=self.param(f"w_ih_{name}", uniform, (input_dim, 4 * H)),
                w_hh=self.param(f"w_hh_{name}", uniform, (H, 4 * H)),
                b_ih=self.param(f"b_ih_{name}", uniform, (4 * H,)),
                b_hh=self.param(f"b_hh_{name}", uniform, (4 * H,)),
            )

        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        hf = lstm_scan(direction("fwd"), x, reverse=False, compute_dtype=dt)
        hb = lstm_scan(direction("bwd"), x, reverse=True, compute_dtype=dt)
        return jnp.concatenate([hf, hb], axis=-1)


class TFLipNet(nn.Module):
    """(B, T, H, W, 1) -> (B, T, vocab_size + 1) log-probs (blank last)."""

    cfg: TFModelConfig = TFModelConfig()

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
        if dt is not None and x.dtype != dt:
            x = x.astype(dt)
        for i, ch in enumerate(cfg.conv_channels):
            x = nn.Conv(
                features=ch, kernel_size=(3, 3, 3), padding="SAME",
                dtype=dt, param_dtype=jnp.float32, name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
            x = max_pool3d(x)
        B, T = x.shape[0], x.shape[1]
        x = x.reshape(B, T, -1)
        for i in range(cfg.num_lstm_layers):
            x = BiLSTM(cfg.hidden_dim, cfg.compute_dtype, name=f"lstm{i + 1}")(x)
            x = nn.Dropout(
                cfg.dropout_rate, deterministic=not train, name=f"dropout{i + 1}"
            )(x)
        for i in range(2):
            x = nn.Dense(
                cfg.dense_dim, dtype=dt, param_dtype=jnp.float32,
                kernel_init=nn.initializers.he_normal(), name=f"dense{i + 1}",
            )(x)
            x = nn.relu(x)
        x = nn.Dense(
            cfg.vocab_size + 1, dtype=dt, param_dtype=jnp.float32,
            kernel_init=nn.initializers.he_normal(), name="head",
        )(x)
        return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)


def tf_ctc_loss(log_probs: jax.Array, labels: jax.Array) -> jax.Array:
    """Keras CTCLoss parity (`train.py:468-490`): blank = last index, label
    lengths from count_nonzero (the reference's 'FIX'), per-sequence NLL
    (NOT length-normalized, unlike torch 'mean'), averaged over the batch."""
    import optax

    B, T, V = log_probs.shape
    label_lengths = jnp.sum((labels != 0).astype(jnp.int32), axis=1)
    L = labels.shape[1]
    label_paddings = (
        jnp.arange(L)[None, :] >= label_lengths[:, None]
    ).astype(jnp.float32)
    logit_paddings = jnp.zeros((B, T), jnp.float32)
    per_seq = optax.ctc_loss(
        log_probs, logit_paddings, labels, label_paddings, blank_id=V - 1
    )
    return jnp.mean(per_seq)
