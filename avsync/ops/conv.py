"""3-D convolution and max-pooling for TPU.

The reference uses cuDNN via `nn.Conv3d` / `nn.MaxPool3d` (`model.py:22-32`)
in NCDHW layout. On TPU the MXU wants channels-last, so everything here is
NDHWC (batch, time, height, width, channels) with DHWIO kernels; XLA maps the
convolution onto the MXU as an implicit GEMM. The `.pth` converter
(avsync/compat.py) transposes torch weights into this layout.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

DIMENSION_NUMBERS = ("NDHWC", "DHWIO", "NDHWC")


def conv3d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    padding: str | Sequence[Tuple[int, int]] = "SAME",
    strides: Tuple[int, int, int] = (1, 1, 1),
    compute_dtype=None,
) -> jax.Array:
    """NDHWC conv3d. `padding='SAME'` with stride 1 matches torch's symmetric
    padding (k-1)//2 for odd kernels, which is what LipNet uses
    (`model.py:22-30`: kernels (3,5,5)/(3,3,3) with padding (1,2,2)/(1,1,1)).
    """
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=padding,
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def max_pool3d(
    x: jax.Array,
    window: Tuple[int, int, int] = (1, 2, 2),
    strides: Tuple[int, int, int] | None = None,
) -> jax.Array:
    """NDHWC max pool with VALID padding — floor-division output sizes, same
    as `nn.MaxPool3d(kernel_size=(1,2,2))` (`model.py:23,27,31`):
    50x100 -> 25x50 -> 12x25 -> 6x12.
    """
    if strides is None:
        strides = window
    dims = (1, *window, 1)
    strs = (1, *strides, 1)
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max, dims, strs, "VALID",
    )
