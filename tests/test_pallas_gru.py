"""Pallas fused GRU kernel parity vs the lax.scan implementation.

Runs in interpret mode on CPU (real-TPU execution is exercised by the perf
path and verified in-session on hardware).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from avsync.ops.gru import (
    GRUParams,
    _scan_recurrence,
    gru_scan,
    gru_scan_fused,
    init_gru_params,
)
from avsync.ops.pallas.gru import pallas_gru_bwd, pallas_gru_scan


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


class TestPallasGRUBackward:
    """pallas_gru_bwd vs jax.grad through the lax.scan recurrence."""

    def _grads(self, params, gi, g, reverse):
        # reference cotangents via autodiff of the scan implementation
        _, vjp = jax.vjp(
            lambda gi, w, b: _scan_recurrence(gi, w, b, reverse),
            gi, params.w_hh, params.b_hh,
        )
        return vjp(g)

    @pytest.mark.parametrize("reverse", [False, True])
    def test_matches_scan_vjp(self, reverse):
        params, x, gi = _case(B=4, T=6, D=12, H=8, seed=7)
        out = _scan_recurrence(gi, params.w_hh, params.b_hh, reverse)
        g = jax.random.normal(jax.random.PRNGKey(9), out.shape)
        ref_dgi, ref_dw, ref_db = self._grads(params, gi, g, reverse)
        dgi, dw, db = pallas_gru_bwd(
            gi, out, g, params.w_hh, params.b_hh,
            reverse=reverse, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(dgi), np.asarray(ref_dgi),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(ref_dw),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(db), np.asarray(ref_db),
                                   atol=1e-5, rtol=1e-4)

    def test_single_timestep(self):
        params, x, gi = _case(B=3, T=1, D=5, H=8, seed=11)
        out = _scan_recurrence(gi, params.w_hh, params.b_hh, False)
        g = jnp.ones_like(out)
        ref = self._grads(params, gi, g, False)
        got = pallas_gru_bwd(
            gi, out, g, params.w_hh, params.b_hh, interpret=True
        )
        for r, o in zip(ref, got):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=1e-5, rtol=1e-4)

    def test_streaming_variant(self, monkeypatch):
        """Force the DMA-streaming backward (footprint over budget) and check
        the same parity."""
        import avsync.ops.pallas.gru as pg

        monkeypatch.setattr(pg, "_VMEM_BUDGET_BYTES", 0)
        params, x, gi = _case(B=4, T=6, D=12, H=8, seed=13)
        out = _scan_recurrence(gi, params.w_hh, params.b_hh, False)
        g = jax.random.normal(jax.random.PRNGKey(15), out.shape)
        ref = self._grads(params, gi, g, False)
        got = pallas_gru_bwd(
            gi, out, g, params.w_hh, params.b_hh, interpret=True
        )
        for r, o in zip(ref, got):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=1e-5, rtol=1e-4)

    @pytest.mark.parametrize("reverse", [False, True])
    def test_fused_gru_end_to_end_grad(self, reverse):
        """jax.grad through gru_scan_fused (Pallas fwd + Pallas bwd, interpret
        mode) must match jax.grad through gru_scan for the full layer,
        including dx and dW_ih through the hoisted input projection."""
        import avsync.ops.pallas.gru as pg

        params, x, gi = _case(B=3, T=5, D=7, H=8, seed=17)

        def loss_fused(p, x):
            return (gru_scan_fused(p, x, reverse=reverse) ** 2).sum()

        def loss_ref(p, x):
            return (gru_scan(p, x, reverse=reverse) ** 2).sum()

        with _interpret_all():
            got = jax.grad(loss_fused, argnums=(0, 1))(params, x)
        ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
        for r, o in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       atol=1e-4, rtol=1e-3)


def _interpret_all():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()
