"""int8 post-training quantization for the LipNet serving path.

The reference has no quantized inference (`predict.py` runs the f32 torch
model); this is a TPU-native extra. The v5e MXU multiplies s8xs8 -> s32 at
2x its bf16 FLOP rate, and the conv stack is ~99% of a LipNet step
(PERF.md), so an int8 conv stack roughly doubles serving throughput AND
halves the HBM bytes of the bandwidth-bound conv1 activation.

Scheme (standard static PTQ, no novel math):
  * weights: symmetric per-output-channel int8 (scale = absmax/127 over
    (kt, kh, kw, cin) per cout);
  * activations: symmetric per-tensor int8 with STATIC scales from a
    calibration pass (per-layer input absmax over calibration batches) —
    static scales make the quantize step a pure elementwise op that XLA
    fuses into the previous layer's dequant/ReLU/pool epilogue, instead of
    a dynamic reduce-then-requantize round-trip through HBM;
  * accumulation: int32 on the MXU (exact), dequantized in the epilogue
    as acc * (x_scale * k_scale[cout]) + bias, then ReLU + pool;
  * the GRU recurrence and FC head stay in compute_dtype (bf16 on TPU) —
    they are ~1% of the step and carry the numerically-sensitive state.

pack4 composes: `pack4_kernel` on the int8 kernel is exact (zero padding
taps are exact in int8), the 4 packed blocks share per-cout scales tiled
4x, and the pool is a max over channel blocks — positive per-channel
scales commute with max, so pooling after dequant+ReLU is the same math
as the unpacked path (tested bit-exactly in tests/test_quant.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from avsync.config import ModelConfig
from avsync.ops.conv import (
    DIMENSION_NUMBERS,
    max_pool3d,
    pack4_kernel,
    pool_packed4,
)
from avsync.ops.gru import GRUParams, gru_scan


class QuantConvParams(NamedTuple):
    """One quantized Conv3D+ReLU+Pool block."""

    kernel_q: jax.Array  # int8 (kt, kh, kw, cin, cout)
    k_scale: jax.Array  # f32 (cout,) — symmetric per-output-channel
    bias: jax.Array  # f32 (cout,)
    x_scale: jax.Array  # f32 () — static scale of this block's INPUT


class QuantLipNetParams(NamedTuple):
    """int8 conv stack + the original float tree for GRUs/FC.

    `float_params` is the unmodified Flax param tree; the quantized forward
    reads its gru*/fc subtrees, so any checkpoint the f32 model accepts
    (Orbax or converted .pth) quantizes without re-export.
    """

    convs: Tuple[QuantConvParams, ...]
    float_params: dict


def quantize_symmetric(
    x: jax.Array, axes: Sequence[int]
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization: q = round(x / s), s = absmax/127 over
    `axes` (kept axes get their own scale). Zero slices get scale 1 so the
    divide is safe and q is exactly 0."""
    amax = jnp.max(jnp.abs(x), axis=tuple(axes), keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quantize_activation(x: jax.Array, scale: jax.Array) -> jax.Array:
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _pack4_ok(x_shape, kernel_shape) -> bool:
    kt, kh, kw, _, cout = kernel_shape
    return (
        x_shape[2] % 2 == 0
        and x_shape[3] % 2 == 0
        and kt % 2 == 1
        and kh % 2 == 1
        and kw % 2 == 1
        and 4 * cout <= 128
    )


def quant_conv_block(
    qc: QuantConvParams,
    x: jax.Array,
    out_dtype=jnp.float32,
    packed: bool = True,
) -> jax.Array:
    """int8 Conv3D -> dequant -> ReLU -> MaxPool3D(1,2,2).

    `x` is the float input (the quantize-to-int8 step lives here so XLA can
    fuse it with whatever produced x). `out_dtype` is the dequantized
    activation dtype — bf16 on TPU halves the HBM bytes of the pooled
    activation; the int32->float convert + scale is epilogue math either way.
    """
    xq = _quantize_activation(x, qc.x_scale)
    kt, kh, kw, _, cout = qc.kernel_q.shape
    pt, ph, pw = (kt - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    scale = (qc.x_scale * qc.k_scale.reshape(-1)).astype(out_dtype)
    bias = qc.bias.astype(out_dtype)
    if packed and _pack4_ok(x.shape, qc.kernel_q.shape):
        acc = lax.conv_general_dilated(
            xq,
            pack4_kernel(qc.kernel_q),
            window_strides=(1, 2, 2),
            padding=((pt, pt), (ph, ph), (pw, pw)),
            dimension_numbers=DIMENSION_NUMBERS,
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(out_dtype) * jnp.tile(scale, 4) + jnp.tile(bias, 4)
        return pool_packed4(jax.nn.relu(out))
    acc = lax.conv_general_dilated(
        xq,
        qc.kernel_q,
        window_strides=(1, 1, 1),
        padding=((pt, pt), (ph, ph), (pw, pw)),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(out_dtype) * scale + bias
    return max_pool3d(jax.nn.relu(out))


def _conv_subtrees(params: dict) -> list:
    names = sorted(k for k in params if k.startswith("conv"))
    return [params[n] for n in names]


def calibrate_conv_input_scales(
    params: dict, batches: Sequence[np.ndarray | jax.Array]
) -> np.ndarray:
    """Per-layer input absmax/127 over calibration batches, running the f32
    conv stack (eval mode — dropout is identity). Returns (n_layers,) f32.

    A handful of representative batches is enough: LipNet inputs are
    normalized frames and every later activation is post-ReLU with stable
    range; the end-to-end parity test bounds the resulting error."""
    convs = _conv_subtrees(params)

    @jax.jit
    def absmaxes(x):
        out = []
        for c in convs:
            out.append(jnp.max(jnp.abs(x)))
            k, b = c["kernel"], c["bias"]
            kt, kh, kw = k.shape[:3]
            pad = ((kt - 1) // 2, (kh - 1) // 2, (kw - 1) // 2)
            y = lax.conv_general_dilated(
                x, k, (1, 1, 1), tuple((p, p) for p in pad),
                dimension_numbers=DIMENSION_NUMBERS,
                preferred_element_type=jnp.float32,
            ) + b
            x = max_pool3d(jax.nn.relu(y))
        return jnp.stack(out)

    amax = np.zeros(len(convs), np.float32)
    for b in batches:
        amax = np.maximum(amax, np.asarray(absmaxes(jnp.asarray(b, jnp.float32))))
    return np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)


def quantize_lipnet(
    params: dict,
    calibration_batches: Sequence[np.ndarray | jax.Array],
    input_scales: Optional[np.ndarray] = None,
) -> QuantLipNetParams:
    """f32 LipNet param tree -> int8 serving params.

    `calibration_batches`: a few (B, T, H, W, 1) preprocessed batches —
    the SAME preprocessing serving will run (prepare_clip / the training
    pipeline). Pass `input_scales` to skip calibration (e.g. reloading a
    previously calibrated deployment)."""
    if input_scales is None:
        if not calibration_batches:
            raise ValueError(
                "quantize_lipnet needs calibration batches or input_scales"
            )
        input_scales = calibrate_conv_input_scales(params, calibration_batches)
    input_scales = np.asarray(input_scales, np.float32)
    qconvs = []
    for i, c in enumerate(_conv_subtrees(params)):
        kq, ks = quantize_symmetric(jnp.asarray(c["kernel"]), axes=(0, 1, 2, 3))
        qconvs.append(
            QuantConvParams(
                kernel_q=kq,
                k_scale=ks.reshape(-1),
                bias=jnp.asarray(c["bias"], jnp.float32),
                x_scale=jnp.asarray(input_scales[i], jnp.float32),
            )
        )
    return QuantLipNetParams(convs=tuple(qconvs), float_params=params)


def tflipnet_int8_apply(
    qp: QuantLipNetParams,
    x: jax.Array,
    cfg,
    compute_dtype: Optional[str] = None,
    packed: bool = True,
) -> jax.Array:
    """Quantized TF-family forward: (B, T, H, W, 1) -> (B, T, vocab+1)
    blank-last log-probs.

    Mirrors TFLipNet.__call__ eval mode (models/lipnet_tf.py, the Keras
    stack of `train.py:495-547`) with the conv stack in int8 — the TF
    blocks are the same Conv3D+ReLU+Pool(1,2,2) shape as the pytorch
    family, so `quantize_lipnet` / `calibrate_conv_input_scales` apply
    unchanged (both read the conv{i} subtrees). LSTMs, the two Dense
    layers and the head run from `qp.float_params` in `compute_dtype`;
    dropout is eval-identity. `cfg` is a TFModelConfig.
    """
    from avsync.ops.lstm import LSTMParams, lstm_scan

    dt = jnp.dtype(compute_dtype or cfg.compute_dtype or "float32")
    act_dt = dt if dt != jnp.float32 else jnp.float32
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    for qc in qp.convs:
        x = quant_conv_block(qc, x, out_dtype=act_dt, packed=packed)
    B, T = x.shape[0], x.shape[1]
    x = x.reshape(B, T, -1)
    p = qp.float_params
    cdt = None if dt == jnp.float32 else dt
    for i in range(cfg.num_lstm_layers):
        sub = p[f"lstm{i + 1}"]

        def lp(d):
            return LSTMParams(
                w_ih=sub[f"w_ih_{d}"], w_hh=sub[f"w_hh_{d}"],
                b_ih=sub[f"b_ih_{d}"], b_hh=sub[f"b_hh_{d}"],
            )

        hf = lstm_scan(lp("fwd"), x, reverse=False, compute_dtype=cdt)
        hb = lstm_scan(lp("bwd"), x, reverse=True, compute_dtype=cdt)
        x = jnp.concatenate([hf, hb], axis=-1)
    for i in range(2):
        d = p[f"dense{i + 1}"]
        x = jax.nn.relu(
            x.astype(dt) @ d["kernel"].astype(dt) + d["bias"].astype(dt)
        )
    h = p["head"]
    logits = x.astype(dt) @ h["kernel"].astype(dt) + h["bias"].astype(dt)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def _gru_params(sub: dict, direction: str) -> GRUParams:
    return GRUParams(
        w_ih=sub[f"w_ih_{direction}"],
        w_hh=sub[f"w_hh_{direction}"],
        b_ih=sub[f"b_ih_{direction}"],
        b_hh=sub[f"b_hh_{direction}"],
    )


def lipnet_int8_apply(
    qp: QuantLipNetParams,
    x: jax.Array,
    cfg: ModelConfig,
    compute_dtype: Optional[str] = None,
    packed: bool = True,
) -> jax.Array:
    """Quantized LipNet forward: (B, T, H, W, 1) -> (B, T, vocab) log-probs.

    Mirrors LipNet.__call__ eval mode (models/lipnet.py) with the conv
    stack in int8; GRUs/FC run from `qp.float_params` in `compute_dtype`
    (defaults to cfg.compute_dtype). log_softmax is f32, like the f32 model.
    """
    dt = jnp.dtype(compute_dtype or cfg.compute_dtype or "float32")
    act_dt = dt if dt != jnp.float32 else jnp.float32
    if x.dtype != jnp.float32 and not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    for qc in qp.convs:
        x = quant_conv_block(qc, x, out_dtype=act_dt, packed=packed)
    B, T = x.shape[0], x.shape[1]
    x = x.reshape(B, T, -1)
    p = qp.float_params
    cdt = None if dt == jnp.float32 else dt
    for i in range(cfg.num_gru_layers):
        sub = p[f"gru{i + 1}"]
        hf = gru_scan(_gru_params(sub, "fwd"), x, reverse=False, compute_dtype=cdt)
        hb = gru_scan(_gru_params(sub, "bwd"), x, reverse=True, compute_dtype=cdt)
        x = jnp.concatenate([hf, hb], axis=-1)
    fc = p["fc"]
    logits = x.astype(dt) @ fc["kernel"].astype(dt) + fc["bias"].astype(dt)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def make_int8_forward(model, model_cfg):
    """Jitted int8 forward `qfwd(qparams, video) -> log_probs` for either
    model family — the single family switch shared by eval (`cli._evaluate`),
    infer (`cli.cmd_infer`) and serving (`predictor.LipReader`), so a change
    to the int8 entry points cannot silently diverge between them.

    `model` is the constructed Flax module (for family 'tf' its resolved
    `TFModelConfig` rides on `model.cfg`); `model_cfg` is the AvsyncConfig's
    ModelConfig carrying `.family`.
    """
    if model_cfg.family == "tf":
        tcfg = model.cfg  # the resolved TFModelConfig
        return jax.jit(lambda qp, v: tflipnet_int8_apply(qp, v, tcfg))
    return jax.jit(lambda qp, v: lipnet_int8_apply(qp, v, model_cfg))
