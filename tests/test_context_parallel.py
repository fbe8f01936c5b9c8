"""Context-parallel (T-axis) tests on the 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from avsync.ops.gru import init_gru_params
from avsync.parallel import make_mesh
from avsync.parallel.context import cp_gru_recurrence, _chunk_scan


class TestCpGru:
    def test_matches_single_device_scan(self):
        mesh = make_mesh((8, 1))
        key = jax.random.PRNGKey(0)
        B, T, D, H = 4, 16, 12, 8  # T=16 over 8 devices -> 2 frames each
        params = init_gru_params(key, D, H)
        x = jax.random.normal(jax.random.fold_in(key, 1), (B, T, D))
        gi = jnp.einsum("btd,dh->bth", x, params.w_ih) + params.b_ih

        from avsync.ops.gru import gru_scan

        ref = gru_scan(params, x)
        out = cp_gru_recurrence(mesh, gi, params.w_hh, params.b_hh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)

    def test_chunk_scan_carry_chain(self):
        """Splitting one sequence into chunks and chaining carries equals the
        unsplit scan — the invariant cp relies on."""
        key = jax.random.PRNGKey(2)
        B, T, H = 2, 12, 8
        w_hh = jax.random.normal(key, (H, 3 * H)) * 0.1
        b_hh = jax.random.normal(jax.random.fold_in(key, 1), (1, 3 * H)) * 0.1
        gi = jax.random.normal(jax.random.fold_in(key, 2), (B, T, 3 * H))

        _, full = _chunk_scan(jnp.zeros((B, H)), gi, w_hh, b_hh)
        h = jnp.zeros((B, H))
        parts = []
        for c in range(3):
            h, ys = _chunk_scan(h, gi[:, c * 4 : (c + 1) * 4], w_hh, b_hh)
            parts.append(ys)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate(parts, axis=1)), np.asarray(full),
            atol=1e-6,
        )


class TestConvHalo:
    def test_t_sharded_conv3d_matches_replicated(self):
        """Sharding T of an NDHWC conv3d input: XLA inserts the halo exchange
        for the k_t=3 kernel; result must equal the unsharded conv."""
        from avsync.ops.conv import conv3d

        mesh = make_mesh((8, 1))
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 16, 8, 8, 3)).astype(np.float32)
        k = rng.normal(size=(3, 3, 3, 3, 4)).astype(np.float32) * 0.1

        ref = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(k)))

        x_sh = jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P(None, "data"))
        )
        k_rep = jax.device_put(jnp.asarray(k), NamedSharding(mesh, P()))
        out = jax.jit(conv3d)(x_sh, k_rep)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)
