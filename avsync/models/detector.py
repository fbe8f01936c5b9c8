"""Misalignment-detector head: MLP over [visual stats || audio MFCC stats].

Parity with `MisalignmentDetector` (`misalignment_detection_train.py:237-250`):
Linear(input_dim -> hidden) -> ReLU -> Dropout(0.3) -> Linear(hidden -> 1),
returning squeezed logits. Default input_dim = 2*6912 + 2*20 = 13864
(`misalignment_detection_train.py:409`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MisalignmentDetector(nn.Module):
    hidden_dim: int = 256
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train, name="drop")(x)
        x = nn.Dense(1, name="fc2")(x)
        return jnp.squeeze(x, axis=-1)
