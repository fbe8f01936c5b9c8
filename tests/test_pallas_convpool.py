"""Fused Conv3D+ReLU+MaxPool Pallas kernel vs the XLA composition.

Interpret mode on CPU; real-TPU execution is exercised by the perf sweep.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from avsync.ops.conv import conv3d, max_pool3d
from avsync.ops.pallas.convpool import conv1_pool_block, conv1_pool_fused


def _case(rng, B=2, T=6, H=8, W=12, k=(3, 5, 5), C=4):
    x = jnp.asarray(rng.random((B, T, H, W, 1)).astype(np.float32))
    w = jnp.asarray((rng.random((*k, 1, C)) - 0.5).astype(np.float32))
    b = jnp.asarray(rng.random(C).astype(np.float32))
    return x, w, b


class TestFusedConvPool:
    @pytest.mark.parametrize("k", [(3, 5, 5), (3, 3, 3)])
    def test_matches_xla_block(self, rng, k):
        x, w, b = _case(rng, k=k)
        ref = max_pool3d(jax.nn.relu(conv3d(x, w, b)))
        got = conv1_pool_fused(
            x, w, b, t_chunk=3, out_dtype=jnp.float32, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
        )

    def test_production_channels(self, rng):
        x, w, b = _case(rng, T=5, H=10, W=20, C=32)
        ref = max_pool3d(jax.nn.relu(conv3d(x, w, b)))
        got = conv1_pool_fused(
            x, w, b, t_chunk=5, out_dtype=jnp.float32, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
        )

    def test_gradients_match_xla(self, rng):
        x, w, b = _case(rng)

        def loss_ref(x, w, b):
            return (max_pool3d(jax.nn.relu(conv3d(x, w, b))) ** 2).sum()

        def loss_fused(x, w, b):
            return (
                conv1_pool_block(x, w, b, (3, "float32", True)) ** 2
            ).sum()

        ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
        got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=1e-3, rtol=1e-4
            )

    @pytest.mark.parametrize(
        "shape", [(6, 8, 12, (3, 5, 5), 4, 3), (4, 6, 8, (3, 3, 3), 5, 2)]
    )
    def test_pallas_bwd_kernel_matches_xla(self, rng, shape):
        """The fused backward (recompute-in-VMEM dW/db kernel) must produce
        the XLA composition's gradients."""
        T, H, W, k, C, TT = shape
        x, w, b = _case(rng, T=T, H=H, W=W, k=k, C=C)

        def loss_ref(x, w, b):
            return (max_pool3d(jax.nn.relu(conv3d(x, w, b))) ** 2).sum()

        def loss_fused(x, w, b):
            return (
                conv1_pool_block(x, w, b, (TT, "float32", True)) ** 2
            ).sum()

        ref = jax.grad(loss_ref, argnums=(1, 2))(x, w, b)
        got = jax.grad(loss_fused, argnums=(1, 2))(x, w, b)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=1e-3, rtol=1e-4
            )

    def test_pool_tiebreak_matches_select_and_scatter(self, rng):
        """Equal values inside a pool window must route gradient to the FIRST
        window position (XLA select_and_scatter semantics)."""
        # constant input -> every window is a 4-way tie
        x = jnp.ones((1, 3, 4, 4, 1), jnp.float32)
        w = jnp.asarray(
            (rng.random((3, 3, 3, 1, 2)) - 0.2).astype(np.float32)
        )
        b = jnp.asarray(rng.random(2).astype(np.float32))

        def loss_ref(w):
            return (max_pool3d(jax.nn.relu(conv3d(x, w, b))) ** 2).sum()

        def loss_fused(w):
            return (conv1_pool_block(x, w, b, (3, "float32", True)) ** 2).sum()

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_fused)(w)),
            np.asarray(jax.grad(loss_ref)(w)),
            atol=1e-4, rtol=1e-4,
        )

    def test_model_with_fused_conv1_matches(self):
        """LipNet(fused_conv_pool=True) == standard model (same params; the
        fused path engages only on conv1, Cin=1)."""
        from avsync.config import ModelConfig
        from avsync.models import LipNet

        cfg = ModelConfig(hidden_dim=8, conv_channels=(2, 3, 4))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 6, 16, 32, 1)).astype(np.float32))
        std = LipNet(cfg)
        params = std.init({"params": jax.random.PRNGKey(0)}, x)["params"]
        fused = LipNet(dataclasses.replace(cfg, fused_conv_pool=True))
        ref = std.apply({"params": params}, x)
        got = fused.apply({"params": params}, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )
