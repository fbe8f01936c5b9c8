"""Pallas fused GRU kernel parity vs the lax.scan implementation.

Runs in interpret mode on CPU (real-TPU execution is exercised by the perf
path and verified in-session on hardware).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from avsync.ops.gru import GRUParams, gru_scan, init_gru_params
from avsync.ops.pallas.gru import pallas_gru_scan


def _case(B=8, T=10, D=12, H=8, seed=0):
    key = jax.random.PRNGKey(seed)
    params = init_gru_params(key, D, H)
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, T, D))
    gi = jnp.einsum("btd,dh->bth", x, params.w_ih) + params.b_ih
    return params, x, gi


class TestPallasGRU:
    @pytest.mark.parametrize("reverse", [False, True])
    def test_matches_lax_scan(self, reverse):
        params, x, gi = _case()
        ref = gru_scan(params, x, reverse=reverse)
        out = pallas_gru_scan(
            gi, params.w_hh, params.b_hh, reverse=reverse, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)

    def test_odd_timesteps(self):
        params, x, gi = _case(T=7, seed=3)
        ref = gru_scan(params, x)
        out = pallas_gru_scan(gi, params.w_hh, params.b_hh, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)

    def test_single_timestep(self):
        params, x, gi = _case(T=1, seed=4)
        ref = gru_scan(params, x)
        out = pallas_gru_scan(gi, params.w_hh, params.b_hh, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)

    def test_production_geometry(self):
        # H=256, 3H=768 lane-aligned; short T keeps CPU interpret fast
        params, x, gi = _case(B=4, T=4, D=32, H=256, seed=5)
        ref = gru_scan(params, x)
        out = pallas_gru_scan(gi, params.w_hh, params.b_hh, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-4)
