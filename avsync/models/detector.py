"""Misalignment-detector head: MLP over [visual stats || audio MFCC stats].

Parity with `MisalignmentDetector` (`misalignment_detection_train.py:237-250`):
Linear(input_dim -> hidden) -> ReLU -> Dropout(0.3) -> Linear(hidden -> 1),
returning squeezed logits. Default input_dim = 2*6912 + 2*20 = 13864
(`misalignment_detection_train.py:409`).
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp


def _torch_linear_init(fan_in: int):
    """torch.nn.Linear's reset_parameters: kaiming_uniform(a=sqrt(5)) for the
    weight and uniform(+-1/sqrt(fan_in)) for the bias — both reduce to the
    same +-1/sqrt(fan_in) uniform bound. Training from scratch must start
    from the reference's init family for the 20-epoch trajectory to land at
    a comparable operating point."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MisalignmentDetector(nn.Module):
    hidden_dim: int = 256
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # precision=HIGHEST: the MLP is ~3.5 MFLOP/sample — MXU-trivial —
        # while the logit margins on near-threshold (1-frame-shift) samples
        # sit near bf16's quantization floor. Full f32 lanes cost nothing
        # and keep TPU decisions aligned with the CPU/torch reference.
        hi = jax.lax.Precision.HIGHEST
        init1 = _torch_linear_init(x.shape[-1])
        x = nn.Dense(self.hidden_dim, name="fc1", precision=hi,
                     kernel_init=init1, bias_init=init1)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train, name="drop")(x)
        init2 = _torch_linear_init(self.hidden_dim)
        x = nn.Dense(1, name="fc2", precision=hi,
                     kernel_init=init2, bias_init=init2)(x)
        return jnp.squeeze(x, axis=-1)
