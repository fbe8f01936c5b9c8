"""LipNet encoder in Flax: Conv3D stack + stacked Bi-GRU + CTC head.

Architecture parity with the reference PyTorch model (`model.py:7-97`):
three [Conv3D -> ReLU -> MaxPool3D(1,2,2) -> channel Dropout3d] blocks with
channels (32, 64, 96) and kernels (3,5,5)/(3,5,5)/(3,3,3), flatten to
(B, T, 96*6*12=6912), two bidirectional GRU(256) layers each followed by
dropout, a Linear(512 -> vocab) head, and log_softmax.

TPU-native differences (not a translation):
  * NDHWC layout throughout — channels-last is what the MXU wants; the
    flattened per-frame feature ordering is therefore (H, W, C) rather than
    torch's (C, H, W). avsync/compat.py permutes the first GRU's input
    weights when importing `.pth` checkpoints so activations match exactly.
  * The GRU input projection for all timesteps is hoisted out of the
    `lax.scan` as a single MXU matmul (avsync/ops/gru.py).
  * Dropout3d == Flax Dropout with broadcast over (T, H, W); GRU dropout is
    plain elementwise, as in torch.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from avsync.config import ModelConfig
from avsync.ops.conv import conv3d, conv3d_pack4, max_pool3d, pool_packed4
from avsync.ops.gru import GRUParams, gru_scan


class BiGRU(nn.Module):
    """Bidirectional GRU layer (torch-GRU cell semantics, [fwd, bwd] concat)."""

    hidden_dim: int
    compute_dtype: Optional[str] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        input_dim = x.shape[-1]
        H = self.hidden_dim
        k = 1.0 / jnp.sqrt(H)

        def uniform(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        def direction(name: str) -> GRUParams:
            return GRUParams(
                w_ih=self.param(f"w_ih_{name}", uniform, (input_dim, 3 * H)),
                w_hh=self.param(f"w_hh_{name}", uniform, (H, 3 * H)),
                b_ih=self.param(f"b_ih_{name}", uniform, (3 * H,)),
                b_hh=self.param(f"b_hh_{name}", uniform, (3 * H,)),
            )

        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        fwd, bwd = direction("fwd"), direction("bwd")
        scan = gru_scan
        if self.use_pallas:
            from avsync.ops.gru import gru_scan_fused

            def scan(p, x, reverse=False, compute_dtype=None):
                return gru_scan_fused(p, x, reverse=reverse, compute_dtype=compute_dtype)

        hf = scan(fwd, x, reverse=False, compute_dtype=dt)
        hb = scan(bwd, x, reverse=True, compute_dtype=dt)
        return jnp.concatenate([hf, hb], axis=-1)


class ConvPoolBlock(nn.Module):
    """One Conv3D -> ReLU -> MaxPool3D(1,2,2) block.

    Param layout (kernel: (kt,kh,kw,Cin,Cout), bias) and initialization match
    nn.Conv exactly, so checkpoints are interchangeable. When `packed` is on
    and the geometry allows (even H/W, odd kernels, 4*Cout <= 128 lanes), the
    block computes the pack4 formulation (avsync.ops.conv): the 2x2 pool
    window is packed into output channels so the conv fills the MXU lanes and
    the un-pooled activation is 4x smaller in HBM. Identical math either way.
    """

    features: int
    kernel_size: tuple
    compute_dtype: Optional[str] = None
    packed: bool = False
    pallas_fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else x.dtype
        kt, kh, kw = self.kernel_size
        even_hw = x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0
        # pack4/fused pad the T axis symmetrically with (kt-1)//2 — only
        # valid for odd temporal kernels too
        odd_k = kt % 2 == 1 and kh % 2 == 1 and kw % 2 == 1
        if (
            self.pallas_fused
            and cin == 1
            and even_hw
            and odd_k
            and 4 * self.features <= 128
        ):
            # fully fused Conv3D+ReLU+Pool Pallas kernel: the pre-pool
            # activation never leaves VMEM (ops/pallas/convpool.py)
            from avsync.ops.pallas.convpool import conv1_pool_block

            T = x.shape[1]
            t_chunk = next(c for c in (15, 5, 3, 1) if T % c == 0)
            # Mosaic kernels only compile for TPU; interpret elsewhere
            interpret = jax.default_backend() != "tpu"
            return conv1_pool_block(
                x.astype(dt), kernel.astype(dt), bias,
                (t_chunk, jnp.dtype(dt).name, interpret),
            )
        packable = self.packed and even_hw and odd_k and 4 * self.features <= 128
        if packable:
            out = conv3d_pack4(
                x, kernel, bias, compute_dtype=dt, preferred_dtype=dt
            )
            return pool_packed4(nn.relu(out))
        out = conv3d(x, kernel, bias, compute_dtype=dt, preferred_dtype=dt)
        return max_pool3d(nn.relu(out))


class LipNet(nn.Module):
    """LipNet: (B, T, H, W, 1) grayscale clips -> (B, T, vocab) log-probs."""

    cfg: ModelConfig = ModelConfig()

    def setup(self):
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
        self._dt = dt
        self.convs = [
            ConvPoolBlock(
                features=ch,
                kernel_size=tuple(kern),
                compute_dtype=cfg.compute_dtype,
                packed=cfg.packed_conv,
                pallas_fused=cfg.fused_conv_pool,
                name=f"conv{i + 1}",
            )
            for i, (ch, kern) in enumerate(zip(cfg.conv_channels, cfg.conv_kernels))
        ]
        # torch Dropout3d zeroes whole channels: broadcast over T, H, W.
        self.conv_dropouts = [
            nn.Dropout(
                rate=cfg.dropout_rate,
                broadcast_dims=(1, 2, 3),
                name=f"dropout{i + 1}",
            )
            for i in range(len(cfg.conv_channels))
        ]
        self.grus = [
            BiGRU(
                cfg.hidden_dim,
                compute_dtype=cfg.compute_dtype,
                use_pallas=cfg.use_pallas_gru,
                name=f"gru{i + 1}",
            )
            for i in range(cfg.num_gru_layers)
        ]
        self.gru_dropouts = [
            nn.Dropout(rate=cfg.dropout_rate, name=f"dropout_gru{i + 1}")
            for i in range(cfg.num_gru_layers)
        ]
        self.fc = nn.Dense(
            cfg.vocab_size, dtype=self._dt, param_dtype=jnp.float32, name="fc"
        )

    def _conv_stack(self, x: jax.Array, train: bool) -> jax.Array:
        """conv1..pool3(+dropout) -> (B, T, H*W*C) — mirrors
        `extract_visual_embeddings` (`misalignment_detection_train.py:130-144`).
        Feature ordering is (H, W, C); see module docstring."""
        if self._dt is not None and x.dtype != self._dt:
            x = x.astype(self._dt)
        for conv, drop in zip(self.convs, self.conv_dropouts):
            x = conv(x)  # Conv3D + ReLU + MaxPool3D, possibly pack4-fused
            x = drop(x, deterministic=not train)
        B, T = x.shape[0], x.shape[1]
        return x.reshape(B, T, -1)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = self._conv_stack(x, train)
        for gru, drop in zip(self.grus, self.gru_dropouts):
            x = gru(x)
            x = drop(x, deterministic=not train)
        x = self.fc(x)
        return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)

    def conv_features(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Conv-stack-only forward used by the misalignment feature extractor."""
        return self._conv_stack(x, train).astype(jnp.float32)

    @property
    def conv_output_dim(self) -> int:
        """96 * 6 * 12 = 6912 for the default 50x100 input (`model.py:50-55`)."""
        h, w = 50, 100
        for _ in self.cfg.conv_channels:
            h, w = h // 2, w // 2
        return self.cfg.conv_channels[-1] * h * w
