"""Full-model forward parity: Flax LipNet vs the reference PyTorch LipNet.

The torch model below re-declares the published reference architecture
(`model.py:7-97`) as a test fixture/spec; the Flax model must reproduce its
eval-mode activations exactly (up to f32 accumulation noise) after `.pth`
conversion through avsync.compat.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from avsync.compat import (
    detector_flax_to_torch,
    detector_torch_to_flax,
    lipnet_flax_to_torch,
    lipnet_torch_to_flax,
)
from avsync.config import ModelConfig
from avsync.models import LipNet, MisalignmentDetector


class TorchLipNet(nn.Module):
    """Reference architecture spec (`model.py:7-97`), eval-mode fixture."""

    def __init__(self, vocab_size=39, hidden_dim=256, dropout_rate=0.5):
        super().__init__()
        self.conv1 = nn.Conv3d(1, 32, (3, 5, 5), padding=(1, 2, 2))
        self.conv2 = nn.Conv3d(32, 64, (3, 5, 5), padding=(1, 2, 2))
        self.conv3 = nn.Conv3d(64, 96, (3, 3, 3), padding=(1, 1, 1))
        self.pool = nn.MaxPool3d((1, 2, 2))
        self.gru1 = nn.GRU(96 * 6 * 12, hidden_dim, batch_first=True, bidirectional=True)
        self.gru2 = nn.GRU(2 * hidden_dim, hidden_dim, batch_first=True, bidirectional=True)
        self.fc = nn.Linear(2 * hidden_dim, vocab_size)

    def forward(self, x):
        x = self.pool(F.relu(self.conv1(x)))
        x = self.pool(F.relu(self.conv2(x)))
        x = self.pool(F.relu(self.conv3(x)))
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).contiguous().view(b, t, -1)
        x, _ = self.gru1(x)
        x, _ = self.gru2(x)
        return F.log_softmax(self.fc(x), dim=-1)

    def conv_features(self, x):
        x = self.pool(F.relu(self.conv1(x)))
        x = self.pool(F.relu(self.conv2(x)))
        x = self.pool(F.relu(self.conv3(x)))
        b, c, t, h, w = x.shape
        return x.permute(0, 2, 1, 3, 4).contiguous().view(b, t, -1)

    def state_dict_with_gru_keys(self):
        sd = {}
        for name in ("conv1", "conv2", "conv3"):
            m = getattr(self, name)
            sd[f"{name}.weight"] = m.weight
            sd[f"{name}.bias"] = m.bias
        for name in ("gru1", "gru2"):
            m = getattr(self, name)
            for suffix in ("", "_reverse"):
                for p in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0"):
                    sd[f"{name}.{p}{suffix}"] = getattr(m, f"{p}{suffix}")
        sd["fc.weight"] = self.fc.weight
        sd["fc.bias"] = self.fc.bias
        return sd


@pytest.fixture(scope="module")
def torch_lipnet():
    torch.manual_seed(0)
    m = TorchLipNet()
    m.eval()
    return m


@pytest.fixture(scope="module")
def clip(rng=None):
    r = np.random.default_rng(1)
    # T=15 keeps the single-CPU test fast; spatial dims must be the real
    # 50x100 so the 6912-dim flatten geometry is exercised.
    return r.random((2, 15, 50, 100, 1)).astype(np.float32)


class TestLipNetParity:
    def test_forward_matches_torch(self, torch_lipnet, clip):
        with torch.no_grad():
            # torch wants (B, C, T, H, W)
            ref = torch_lipnet(
                torch.from_numpy(clip.transpose(0, 4, 1, 2, 3))
            ).numpy()

        params = lipnet_torch_to_flax(torch_lipnet.state_dict_with_gru_keys())
        params = jax.tree.map(jnp.asarray, params)
        model = LipNet(ModelConfig())
        out = model.apply({"params": params}, jnp.asarray(clip))
        np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5, rtol=1e-4)

    def test_decoded_text_matches(self, torch_lipnet, clip):
        from avsync import text

        with torch.no_grad():
            ref = torch_lipnet(
                torch.from_numpy(clip.transpose(0, 4, 1, 2, 3))
            ).numpy()
        params = jax.tree.map(
            jnp.asarray, lipnet_torch_to_flax(torch_lipnet.state_dict_with_gru_keys())
        )
        out = LipNet(ModelConfig()).apply({"params": params}, jnp.asarray(clip))
        assert text.decode_batch(out) == text.decode_batch(ref)

    def test_conv_features_match_with_permutation(self, torch_lipnet, clip):
        """conv_features ordering differs (H,W,C) vs (C,H,W); values must be a
        permutation mapped by compat's index map."""
        from avsync.compat import _chw_to_hwc_perm

        with torch.no_grad():
            ref = torch_lipnet.conv_features(
                torch.from_numpy(clip.transpose(0, 4, 1, 2, 3))
            ).numpy()
        params = jax.tree.map(
            jnp.asarray, lipnet_torch_to_flax(torch_lipnet.state_dict_with_gru_keys())
        )
        ours = LipNet(ModelConfig()).apply(
            {"params": params}, jnp.asarray(clip), method=LipNet.conv_features
        )
        perm = _chw_to_hwc_perm((96, 6, 12))
        np.testing.assert_allclose(
            np.asarray(ours), ref[..., perm], atol=2e-5, rtol=1e-4
        )

    def test_roundtrip_torch_flax_torch(self, torch_lipnet):
        sd = {
            k: v.detach().numpy()
            for k, v in torch_lipnet.state_dict_with_gru_keys().items()
        }
        back = lipnet_flax_to_torch(lipnet_torch_to_flax(sd))
        for k in sd:
            np.testing.assert_array_equal(back[k], sd[k])

    def test_wrapped_checkpoint_layout(self, torch_lipnet):
        """Both `.pth` layouts load (`predict.py:90-95`)."""
        sd = torch_lipnet.state_dict_with_gru_keys()
        wrapped = {"epoch": 10, "model_state_dict": sd, "train_loss": 1.0}
        p1 = lipnet_torch_to_flax(sd)
        p2 = lipnet_torch_to_flax(wrapped)
        np.testing.assert_array_equal(p1["fc"]["kernel"], p2["fc"]["kernel"])

    def test_param_count_matches_reference(self, torch_lipnet):
        n_torch = sum(p.numel() for p in torch_lipnet.parameters())
        params = lipnet_torch_to_flax(torch_lipnet.state_dict_with_gru_keys())
        n_ours = sum(np.asarray(v).size for v in jax.tree.leaves(params))
        assert n_ours == n_torch  # ~12.5M


class TestPackedConvModel:
    def test_packed_model_matches_standard(self):
        """packed_conv=True (pack4 conv blocks where geometry allows) is the
        same function: identical params tree, identical outputs."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from avsync.config import ModelConfig
        from avsync.models import LipNet

        cfg = ModelConfig(hidden_dim=8, conv_channels=(2, 3, 4))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((2, 6, 16, 32, 1)).astype(np.float32))
        std = LipNet(cfg)
        params = std.init({"params": jax.random.PRNGKey(0)}, x)["params"]
        packed = LipNet(dataclasses.replace(cfg, packed_conv=True))
        p2 = packed.init({"params": jax.random.PRNGKey(0)}, x)["params"]
        assert jax.tree.structure(params) == jax.tree.structure(p2)
        ref = std.apply({"params": params}, x)
        got = packed.apply({"params": params}, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


class TorchDetector(nn.Module):
    """Reference detector spec (`misalignment_detection_train.py:237-250`)."""

    def __init__(self, input_dim=13864, hidden_dim=256):
        super().__init__()
        self.classifier = nn.Sequential(
            nn.Linear(input_dim, hidden_dim),
            nn.ReLU(),
            nn.Dropout(0.3),
            nn.Linear(hidden_dim, 1),
        )

    def forward(self, x):
        return self.classifier(x).squeeze(-1)


class TestDetectorParity:
    def test_forward_matches_torch(self):
        torch.manual_seed(2)
        tdet = TorchDetector()
        tdet.eval()
        r = np.random.default_rng(4)
        # torch-ordered feature: [vis mean (C,H,W) | vis std | audio 40]
        feat_torch = r.normal(size=(3, 13864)).astype(np.float32)
        with torch.no_grad():
            ref = tdet(torch.from_numpy(feat_torch)).numpy()

        from avsync.compat import _chw_to_hwc_perm

        perm = _chw_to_hwc_perm((96, 6, 12))
        full_perm = np.concatenate([perm, perm + 6912, np.arange(13824, 13864)])
        feat_ours = feat_torch[:, full_perm]

        params = detector_torch_to_flax({"model_state_dict": tdet.state_dict()})
        params = jax.tree.map(jnp.asarray, params)
        out = MisalignmentDetector(256).apply({"params": params}, jnp.asarray(feat_ours))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-4)

    def test_roundtrip(self):
        torch.manual_seed(3)
        tdet = TorchDetector(hidden_dim=64)
        sd = {k: v.detach().numpy() for k, v in tdet.state_dict().items()}
        back = detector_flax_to_torch(detector_torch_to_flax(sd))
        for k in sd:
            np.testing.assert_array_equal(back[k], sd[k])
