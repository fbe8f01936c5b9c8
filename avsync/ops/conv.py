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
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """NDHWC conv3d. `padding='SAME'` with stride 1 matches torch's symmetric
    padding (k-1)//2 for odd kernels, which is what LipNet uses
    (`model.py:22-30`: kernels (3,5,5)/(3,3,3) with padding (1,2,2)/(1,1,1)).

    preferred_dtype is the conv OUTPUT dtype (MXU accumulation is f32 either
    way). On TPU a post-conv `.astype(bf16)` does NOT fuse into the conv —
    the f32 activation round-trips HBM — so bf16 consumers must ask for bf16
    here, which is also what flax nn.Conv(dtype=bf16) emits.
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
        preferred_element_type=preferred_dtype,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def pack2_kernel(kernel: jax.Array) -> jax.Array:
    """(kt, kh, kw, Cin, Cout) -> (kt, kh, kw+1, Cin, 2*Cout) packed kernel.

    Column block j in {0, 1} computes output position w = 2*w2 + j: block 0
    uses taps 0..kw-1 (zero at tap kw), block 1 uses taps 1..kw (zero at
    tap 0). With window kw+1, stride 2, padding ((kw-1)//2,)*2 this is
    numerically the SAME-padded stride-1 conv with adjacent W outputs packed
    into channels — filling the MXU's 128 lanes that a narrow Cout leaves
    idle (Cout=64 wastes half, Cout=32 three quarters).
    """
    kt, kh, kw, cin, cout = kernel.shape
    z = jnp.zeros((kt, kh, 1, cin, cout), kernel.dtype)
    j0 = jnp.concatenate([kernel, z], axis=2)  # taps 0..kw-1, pad tap kw
    j1 = jnp.concatenate([z, kernel], axis=2)  # pad tap 0, taps 1..kw
    return jnp.concatenate([j0, j1], axis=4)


def conv3d_pack2(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    compute_dtype=None,
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """SAME stride-1 conv3d with W-pairs packed into channels.

    (B, T, H, W, Cin) x (kt, kh, kw, Cin, Cout) -> (B, T, H, W/2, 2*Cout)
    where out[..., w2, j*Cout + c] == conv3d(x, kernel)[..., 2*w2 + j, c].
    Requires even W and odd kw. Compose with `pool_packed2` for the LipNet
    conv->relu->pool(1,2,2) block: the W-pool is then just a max of the two
    lane halves, so the packed layout never needs unpacking.
    """
    kt, kh, kw, cin, cout = kernel.shape
    assert kt % 2 == 1 and kh % 2 == 1 and kw % 2 == 1, (
        "pack2 needs odd kernels (symmetric SAME padding)"
    )
    assert x.shape[3] % 2 == 0, "pack2 needs even W"
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    pw = (kw - 1) // 2
    pt, ph = (kt - 1) // 2, (kh - 1) // 2
    out = lax.conv_general_dilated(
        x,
        pack2_kernel(kernel),
        window_strides=(1, 1, 2),
        padding=((pt, pt), (ph, ph), (pw, pw)),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=preferred_dtype,
    )
    if bias is not None:
        b = bias.astype(out.dtype)
        out = out + jnp.concatenate([b, b])
    return out


def pool_packed2(
    x: jax.Array, window: Tuple[int, int, int] = (1, 2, 2)
) -> jax.Array:
    """MaxPool3D(1, 2, 2) on a pack2 output, staying in standard layout.

    (B, T, H, W/2, 2*C) -> (B, T, H//2, W/2, C): the W-pair max is a max of
    the two channel halves (the packed pairs ARE the pool pairs); the H-pair
    max is a regular reduce_window.
    """
    assert window == (1, 2, 2), "pack2 pooling is specific to (1, 2, 2)"
    C = x.shape[-1] // 2
    x = jnp.maximum(x[..., :C], x[..., C:])
    return max_pool3d(x, window=(1, 2, 1))


def pack4_kernel(kernel: jax.Array) -> jax.Array:
    """(kt, kh, kw, Cin, Cout) -> (kt, kh+1, kw+1, Cin, 4*Cout).

    Column block (jh, jw) in {0,1}^2 computes output position
    (2*h2 + jh, 2*w2 + jw): the original taps shifted by (jh, jw) inside the
    one-larger window, zero elsewhere. Block order along channels is
    jh-major: [(0,0), (0,1), (1,0), (1,1)], each Cout wide.
    """
    kt, kh, kw, cin, cout = kernel.shape
    blocks = []
    for jh in (0, 1):
        for jw in (0, 1):
            k4 = jnp.zeros((kt, kh + 1, kw + 1, cin, cout), kernel.dtype)
            k4 = k4.at[:, jh : jh + kh, jw : jw + kw].set(kernel)
            blocks.append(k4)
    return jnp.concatenate(blocks, axis=4)


def conv3d_pack4(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    compute_dtype=None,
    preferred_dtype=jnp.float32,
) -> jax.Array:
    """SAME stride-1 conv3d with 2x2 (H, W) output tiles packed into channels.

    (B, T, H, W, Cin) x (kt, kh, kw, Cin, Cout) -> (B, T, H/2, W/2, 4*Cout)
    where out[..., h2, w2, (2*jh + jw)*Cout + c]
        == conv3d(x, kernel)[..., 2*h2 + jh, 2*w2 + jw, c].
    Requires even H and W, odd kh/kw. The payoff: a narrow Cout (32) fills
    the MXU's 128 lanes, and MaxPool3D(1,2,2) collapses to a max over the 4
    channel blocks — the un-pooled activation never exists in HBM.
    """
    kt, kh, kw, cin, cout = kernel.shape
    assert kt % 2 == 1 and kh % 2 == 1 and kw % 2 == 1, (
        "pack4 needs odd kernels (symmetric SAME padding)"
    )
    assert x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0, "pack4 needs even H, W"
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        kernel = kernel.astype(compute_dtype)
    pt, ph, pw = (kt - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    out = lax.conv_general_dilated(
        x,
        pack4_kernel(kernel),
        window_strides=(1, 2, 2),
        padding=((pt, pt), (ph, ph), (pw, pw)),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=preferred_dtype,
    )
    if bias is not None:
        b = bias.astype(out.dtype)
        out = out + jnp.tile(b, 4)
    return out


def pool_packed4(x: jax.Array) -> jax.Array:
    """MaxPool3D(1, 2, 2) on a pack4 output: max over the 4 channel blocks.

    (B, T, H/2, W/2, 4*C) -> (B, T, H/2, W/2, C) in standard layout.
    """
    C = x.shape[-1] // 4
    return jnp.maximum(
        jnp.maximum(x[..., :C], x[..., C : 2 * C]),
        jnp.maximum(x[..., 2 * C : 3 * C], x[..., 3 * C :]),
    )


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
