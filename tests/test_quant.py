"""int8 post-training quantization (avsync/ops/quant.py).

The reference serves f32 only (`predict.py`); int8 serving is a TPU-native
extra, so the tests here are self-parity (int8 implementation vs its own
fake-quant f32 semantics, packed vs unpacked) plus an end-to-end accuracy
bound against the f32 model.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax import lax

from avsync.config import ModelConfig
from avsync.models.lipnet import LipNet
from avsync.ops.conv import DIMENSION_NUMBERS, max_pool3d
from avsync.ops.quant import (
    QuantConvParams,
    calibrate_conv_input_scales,
    lipnet_int8_apply,
    quant_conv_block,
    quantize_lipnet,
    quantize_symmetric,
)

CFG = ModelConfig(hidden_dim=16, conv_channels=(4, 6, 8))


@pytest.fixture(scope="module")
def tiny():
    model = LipNet(CFG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 6, 8, 16, 1), np.float32))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    return model, params, x


def test_quantize_symmetric_roundtrip_bound(rng):
    x = jnp.asarray(rng.normal(size=(3, 5, 5, 4, 8)).astype(np.float32))
    q, s = quantize_symmetric(x, axes=(0, 1, 2, 3))
    assert q.dtype == jnp.int8 and s.shape == (1, 1, 1, 1, 8)
    # round-to-nearest: dequant error <= half a quantization step
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    assert (err <= np.asarray(s) / 2 + 1e-7).all()


def test_quantize_symmetric_zero_slice_safe():
    x = jnp.zeros((3, 3, 3, 2, 4), jnp.float32)
    q, s = quantize_symmetric(x, axes=(0, 1, 2, 3))
    assert (np.asarray(q) == 0).all() and (np.asarray(s) == 1.0).all()


def _fake_quant_reference(qc: QuantConvParams, x):
    """f32 conv of the DEQUANTIZED operands — the math the int8 block claims
    to compute (modulo f32 accumulation rounding)."""
    xq = jnp.clip(jnp.round(x / qc.x_scale), -127, 127)
    kt, kh, kw = qc.kernel_q.shape[:3]
    pad = tuple(((k - 1) // 2,) * 2 for k in (kt, kh, kw))
    acc = lax.conv_general_dilated(
        xq * qc.x_scale,
        qc.kernel_q.astype(jnp.float32) * qc.k_scale.reshape(-1),
        (1, 1, 1), pad, dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=jnp.float32,
    )
    return max_pool3d(jax.nn.relu(acc + qc.bias))


class TestQuantConvBlock:
    def _block(self, rng, cin=2, cout=6):
        k = jnp.asarray(rng.normal(size=(3, 5, 5, cin, cout)).astype(np.float32))
        kq, ks = quantize_symmetric(k, axes=(0, 1, 2, 3))
        return QuantConvParams(
            kernel_q=kq,
            k_scale=ks.reshape(-1),
            bias=jnp.asarray(rng.normal(size=(cout,)).astype(np.float32)),
            x_scale=jnp.asarray(1.0 / 127.0, jnp.float32),
        )

    def test_matches_fake_quant_reference(self, rng):
        qc = self._block(rng)
        x = jnp.asarray(rng.random((2, 4, 8, 12, 2), np.float32))
        got = quant_conv_block(qc, x, packed=False)
        want = _fake_quant_reference(qc, x)
        # int32 accumulation is exact; the reference accumulates in f32, so
        # the only difference is f32 rounding in the reference itself —
        # a few ulps relative over a few hundred accumulation taps.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6)

    def test_packed_matches_unpacked_bitwise(self, rng):
        qc = self._block(rng)
        x = jnp.asarray(rng.random((2, 4, 8, 12, 2), np.float32))
        a = np.asarray(quant_conv_block(qc, x, packed=True))
        b = np.asarray(quant_conv_block(qc, x, packed=False))
        # both paths: exact int32 accum -> identical dequant epilogue; the
        # pool commutes with the (positive) per-channel scales
        assert np.array_equal(a, b)

    def test_pack4_ineligible_geometry_falls_back(self, rng):
        qc = self._block(rng, cout=40)  # 4*40 > 128 lanes
        x = jnp.asarray(rng.random((1, 4, 8, 12, 2), np.float32))
        out = quant_conv_block(qc, x, packed=True)
        assert out.shape == (1, 4, 4, 6, 40)

    def test_bf16_dequant_shape_and_dtype(self, rng):
        qc = self._block(rng)
        x = jnp.asarray(rng.random((1, 4, 8, 12, 2), np.float32))
        out = quant_conv_block(qc, x, out_dtype=jnp.bfloat16)
        assert out.dtype == jnp.bfloat16


class TestLipNetInt8:
    def test_calibration_scales_cover_inputs(self, tiny):
        _, params, x = tiny
        scales = calibrate_conv_input_scales(params, [x])
        assert scales.shape == (3,) and (scales > 0).all()
        # layer-0 scale is the input absmax / 127
        np.testing.assert_allclose(
            scales[0], float(jnp.max(jnp.abs(x))) / 127.0, rtol=1e-6
        )

    def test_quantize_requires_calibration(self, tiny):
        _, params, _ = tiny
        with pytest.raises(ValueError):
            quantize_lipnet(params, [])

    def test_end_to_end_close_to_f32(self, tiny):
        model, params, x = tiny
        ref = np.asarray(model.apply({"params": params}, x))
        qp = quantize_lipnet(params, [x])
        got = np.asarray(lipnet_int8_apply(qp, x, CFG))
        assert got.shape == ref.shape
        # 8-bit conv stack under an f32 GRU/FC: log-probs stay close and
        # the per-frame argmax (what greedy CTC consumes) agrees
        assert np.abs(got - ref).mean() < 0.05
        agree = (got.argmax(-1) == ref.argmax(-1)).mean()
        assert agree >= 0.95

    def test_explicit_input_scales_skip_calibration(self, tiny):
        _, params, x = tiny
        scales = calibrate_conv_input_scales(params, [x])
        qp = quantize_lipnet(params, [], input_scales=scales)
        out = lipnet_int8_apply(qp, x, CFG)
        assert np.isfinite(np.asarray(out)).all()

    def test_jit_compatible(self, tiny):
        _, params, x = tiny
        qp = quantize_lipnet(params, [x])
        fn = jax.jit(lambda q, v: lipnet_int8_apply(q, v, CFG))
        out = fn(qp, x)
        ref = lipnet_int8_apply(qp, x, CFG)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class TestTFLipNetInt8:
    """TF-family (Keras-stack) int8 serving: same conv-block shape, so the
    quantizer applies unchanged; the LSTM/dense tail stays float."""

    @pytest.fixture(scope="class")
    def tf_tiny(self):
        from avsync.models.lipnet_tf import TFLipNet, TFModelConfig

        cfg = TFModelConfig(hidden_dim=8, conv_channels=(3, 4, 6),
                            dense_dim=16)
        model = TFLipNet(cfg)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((2, 6, 8, 16, 1), np.float32))
        params = model.init({"params": jax.random.PRNGKey(2)}, x)["params"]
        return model, cfg, params, x

    def test_end_to_end_close_to_f32(self, tf_tiny):
        from avsync.ops.quant import tflipnet_int8_apply

        model, cfg, params, x = tf_tiny
        ref = np.asarray(model.apply({"params": params}, x))
        qp = quantize_lipnet(params, [x])
        got = np.asarray(tflipnet_int8_apply(qp, x, cfg))
        assert got.shape == ref.shape
        assert np.abs(got - ref).mean() < 0.05
        assert (got.argmax(-1) == ref.argmax(-1)).mean() >= 0.95

    def test_jit_compatible(self, tf_tiny):
        from avsync.ops.quant import tflipnet_int8_apply

        _, cfg, params, x = tf_tiny
        qp = quantize_lipnet(params, [x])
        fn = jax.jit(lambda q, v: tflipnet_int8_apply(q, v, cfg))
        np.testing.assert_allclose(
            np.asarray(fn(qp, x)),
            np.asarray(tflipnet_int8_apply(qp, x, cfg)),
            atol=1e-6,
        )
