"""Numerical parity tests for avsync.ops vs torch CPU reference semantics.

These pin the op-level math to the behaviors the reference model relies on:
`nn.Conv3d`/`nn.MaxPool3d` (`model.py:22-32`), `nn.GRU` bidirectional
(`model.py:39-44`), and `nn.CTCLoss(blank=0, reduction='mean',
zero_infinity=True)` (`trainer.py:24`).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from avsync.ops import conv3d, max_pool3d, bigru, gru_scan, ctc_loss_mean
from avsync.ops.gru import GRUParams


class TestConv3d:
    @pytest.mark.parametrize(
        "in_c,out_c,k,pad", [(1, 4, (3, 5, 5), (1, 2, 2)), (4, 6, (3, 3, 3), (1, 1, 1))]
    )
    def test_matches_torch_conv3d(self, rng, in_c, out_c, k, pad):
        tconv = nn.Conv3d(in_c, out_c, kernel_size=k, padding=pad)
        x = rng.normal(size=(2, in_c, 5, 8, 10)).astype(np.float32)
        with torch.no_grad():
            ref = tconv(torch.from_numpy(x)).numpy()

        # torch weight (O, I, D, H, W) -> DHWIO; input NCDHW -> NDHWC
        w = tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
        b = tconv.bias.detach().numpy()
        x_ndhwc = x.transpose(0, 2, 3, 4, 1)
        out = conv3d(jnp.asarray(x_ndhwc), jnp.asarray(w), jnp.asarray(b))
        out_ncdhw = np.asarray(out).transpose(0, 4, 1, 2, 3)
        np.testing.assert_allclose(out_ncdhw, ref, atol=2e-5, rtol=1e-4)

    def test_maxpool_output_shape_floor_division(self, rng):
        # 50x100 -> 25x50 -> 12x25 -> 6x12 (`model.py:50-55`)
        x = jnp.asarray(rng.normal(size=(1, 3, 50, 100, 2)).astype(np.float32))
        p1 = max_pool3d(x)
        p2 = max_pool3d(p1)
        p3 = max_pool3d(p2)
        assert p1.shape == (1, 3, 25, 50, 2)
        assert p2.shape == (1, 3, 12, 25, 2)
        assert p3.shape == (1, 3, 6, 12, 2)

    def test_maxpool_matches_torch(self, rng):
        x = rng.normal(size=(2, 3, 7, 13, 11)).astype(np.float32)  # NCDHW
        with torch.no_grad():
            ref = nn.MaxPool3d((1, 2, 2))(torch.from_numpy(x)).numpy()
        out = max_pool3d(jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
        np.testing.assert_allclose(np.asarray(out).transpose(0, 4, 1, 2, 3), ref)


def _torch_gru_to_params(tgru: nn.GRU, suffix: str = "") -> GRUParams:
    w_ih = getattr(tgru, f"weight_ih_l0{suffix}").detach().numpy().T  # (in, 3H)
    w_hh = getattr(tgru, f"weight_hh_l0{suffix}").detach().numpy().T
    b_ih = getattr(tgru, f"bias_ih_l0{suffix}").detach().numpy()
    b_hh = getattr(tgru, f"bias_hh_l0{suffix}").detach().numpy()
    return GRUParams(*(jnp.asarray(a) for a in (w_ih, w_hh, b_ih, b_hh)))


class TestPack2Conv:
    """pack2 = SAME stride-1 conv with W-pairs packed into the channel dim
    (avsync/ops/conv.py): must match conv3d exactly, block through pool."""

    @pytest.mark.parametrize(
        "in_c,out_c,k", [(1, 4, (3, 5, 5)), (3, 6, (3, 5, 5)), (4, 5, (3, 3, 3))]
    )
    def test_packed_equals_standard(self, rng, in_c, out_c, k):
        from avsync.ops.conv import conv3d_pack2

        x = jnp.asarray(rng.normal(size=(2, 4, 7, 12, in_c)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(*k, in_c, out_c)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(out_c,)).astype(np.float32))
        ref = np.asarray(conv3d(x, w, b))
        got = np.asarray(conv3d_pack2(x, w, b))
        B, T, H, W, C = ref.shape
        # out[..., w2, j*C + c] == ref[..., 2*w2 + j, c]
        interleaved = np.empty_like(ref)
        interleaved[..., 0::2, :] = got[..., :C]
        interleaved[..., 1::2, :] = got[..., C:]
        np.testing.assert_allclose(interleaved, ref, atol=1e-4, rtol=1e-4)

    def test_block_with_pool_matches(self, rng):
        import jax

        from avsync.ops.conv import conv3d_pack2, pool_packed2

        x = jnp.asarray(rng.normal(size=(2, 3, 10, 16, 3)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 5, 5, 3, 6)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
        ref = max_pool3d(jax.nn.relu(conv3d(x, w, b)))
        got = pool_packed2(jax.nn.relu(conv3d_pack2(x, w, b)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
        )

    @pytest.mark.parametrize("in_c,out_c,k", [(1, 4, (3, 5, 5)), (3, 5, (3, 3, 3))])
    def test_pack4_block_with_pool_matches(self, rng, in_c, out_c, k):
        import jax

        from avsync.ops.conv import conv3d_pack4, pool_packed4

        x = jnp.asarray(rng.normal(size=(2, 3, 10, 16, in_c)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(*k, in_c, out_c)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(out_c,)).astype(np.float32))
        ref = max_pool3d(jax.nn.relu(conv3d(x, w, b)))
        got = pool_packed4(jax.nn.relu(conv3d_pack4(x, w, b)))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
        )

    def test_pack4_gradients_match(self, rng):
        import jax

        from avsync.ops.conv import conv3d_pack4, pool_packed4

        x = jnp.asarray(rng.normal(size=(1, 3, 6, 8, 2)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 5, 2, 4)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

        def loss_std(w, x, b):
            return (max_pool3d(jax.nn.relu(conv3d(x, w, b))) ** 2).sum()

        def loss_pk(w, x, b):
            return (pool_packed4(jax.nn.relu(conv3d_pack4(x, w, b))) ** 2).sum()

        ref = jax.grad(loss_std, argnums=(0, 1, 2))(w, x, b)
        got = jax.grad(loss_pk, argnums=(0, 1, 2))(w, x, b)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=1e-3, rtol=1e-4
            )

    def test_gradients_match(self, rng):
        """Autodiff through the packed formulation equals the standard one
        (dW flows back through the pack2 kernel construction)."""
        import jax

        from avsync.ops.conv import conv3d_pack2, pool_packed2

        x = jnp.asarray(rng.normal(size=(1, 3, 6, 8, 2)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 5, 2, 4)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))

        def loss_std(w, x, b):
            return (max_pool3d(jax.nn.relu(conv3d(x, w, b))) ** 2).sum()

        def loss_pk(w, x, b):
            return (pool_packed2(jax.nn.relu(conv3d_pack2(x, w, b))) ** 2).sum()

        ref = jax.grad(loss_std, argnums=(0, 1, 2))(w, x, b)
        got = jax.grad(loss_pk, argnums=(0, 1, 2))(w, x, b)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), atol=1e-3, rtol=1e-4
            )


class TestGRU:
    def test_unidirectional_matches_torch(self, rng):
        D, H, B, T = 6, 5, 3, 11
        tgru = nn.GRU(D, H, batch_first=True)
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        with torch.no_grad():
            ref, _ = tgru(torch.from_numpy(x))
        out = gru_scan(_torch_gru_to_params(tgru), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5, rtol=1e-4)

    def test_bidirectional_matches_torch(self, rng):
        D, H, B, T = 7, 4, 2, 9
        tgru = nn.GRU(D, H, batch_first=True, bidirectional=True)
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        with torch.no_grad():
            ref, _ = tgru(torch.from_numpy(x))
        out = bigru(
            _torch_gru_to_params(tgru),
            _torch_gru_to_params(tgru, "_reverse"),
            jnp.asarray(x),
        )
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5, rtol=1e-4)

    def test_stacked_bigru_matches_torch(self, rng):
        """Two stacked BiGRUs as used by LipNet (`model.py:39-45`)."""
        D, H, B, T = 6, 4, 2, 8
        g1 = nn.GRU(D, H, batch_first=True, bidirectional=True)
        g2 = nn.GRU(2 * H, H, batch_first=True, bidirectional=True)
        x = rng.normal(size=(B, T, D)).astype(np.float32)
        with torch.no_grad():
            mid, _ = g1(torch.from_numpy(x))
            ref, _ = g2(mid)
        out1 = bigru(
            _torch_gru_to_params(g1), _torch_gru_to_params(g1, "_reverse"), jnp.asarray(x)
        )
        out2 = bigru(
            _torch_gru_to_params(g2), _torch_gru_to_params(g2, "_reverse"), out1
        )
        np.testing.assert_allclose(np.asarray(out2), ref.numpy(), atol=1e-5, rtol=1e-4)


class TestCTCLoss:
    def _case(self, rng, B, T, V, L):
        logits = rng.normal(size=(B, T, V)).astype(np.float32)
        log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1)
        label_lengths = rng.integers(1, L + 1, size=(B,))
        labels = np.zeros((B, L), dtype=np.int64)
        for b in range(B):
            labels[b, : label_lengths[b]] = rng.integers(1, V, size=label_lengths[b])
        return log_probs, labels, label_lengths

    def test_matches_torch_mean_reduction(self, rng):
        B, T, V, L = 4, 20, 10, 6
        log_probs, labels, label_lengths = self._case(rng, B, T, V, L)
        tloss = nn.CTCLoss(blank=0, reduction="mean", zero_infinity=True)
        ref = tloss(
            log_probs.permute(1, 0, 2),
            torch.from_numpy(labels),
            torch.full((B,), T, dtype=torch.long),
            torch.from_numpy(label_lengths),
        ).item()
        ours = ctc_loss_mean(
            jnp.asarray(log_probs.numpy()),
            jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(label_lengths.astype(np.int32)),
        )
        np.testing.assert_allclose(float(ours), ref, atol=1e-4, rtol=1e-4)

    def test_zero_infinity_on_degenerate_alignment(self, rng):
        # T too short for the repeated-label expansion -> inf in torch without
        # zero_infinity; with it, contributes 0.
        B, T, V = 2, 3, 5
        logits = rng.normal(size=(B, T, V)).astype(np.float32)
        log_probs = torch.log_softmax(torch.from_numpy(logits), dim=-1)
        labels = np.array([[1, 1, 1, 1], [2, 0, 0, 0]], dtype=np.int64)
        label_lengths = np.array([4, 1])
        tloss = nn.CTCLoss(blank=0, reduction="mean", zero_infinity=True)
        ref = tloss(
            log_probs.permute(1, 0, 2),
            torch.from_numpy(labels),
            torch.full((B,), T, dtype=torch.long),
            torch.from_numpy(label_lengths),
        ).item()
        ours = ctc_loss_mean(
            jnp.asarray(log_probs.numpy()),
            jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(label_lengths.astype(np.int32)),
        )
        np.testing.assert_allclose(float(ours), ref, atol=1e-4, rtol=1e-4)

    def test_grad_is_finite(self, rng):
        import jax

        B, T, V, L = 2, 12, 8, 4
        log_probs, labels, label_lengths = self._case(rng, B, T, V, L)

        def loss_fn(lp):
            return ctc_loss_mean(
                lp,
                jnp.asarray(labels.astype(np.int32)),
                jnp.asarray(label_lengths.astype(np.int32)),
            )

        g = jax.grad(loss_fn)(jnp.asarray(log_probs.numpy()))
        assert np.isfinite(np.asarray(g)).all()
