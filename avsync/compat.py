"""Reference-checkpoint compatibility: `.pth` <-> Flax param conversion.

The reference ships/loads PyTorch checkpoints in two layouts — a bare
state_dict and a wrapped dict with 'model_state_dict' (+ epoch/optimizer,
`trainer.py:144-156`); loaders accept both (`predict.py:90-95`,
`misalignment_detection_train.py:301-305`). This module converts both
directions so avsync can consume reference checkpoints and emit
reference-readable ones.

Layout mapping (see avsync/models/lipnet.py for why):
  * Conv3d weight (O, I, kt, kh, kw)  <->  Flax kernel (kt, kh, kw, I, O)
  * GRU weight_ih/hh (3H, D)          <->  (D, 3H); same [r, z, n] gate order
  * The FIRST GRU's input features are flattened conv maps: torch orders
    them (C, H, W), avsync orders them (H, W, C) — rows are permuted.
  * Linear weight (out, in)           <->  Dense kernel (in, out)
  * The misalignment detector's first Linear consumes
    [visual mean | visual std | audio stats]; the two visual blocks get the
    same (C,H,W)->(H,W,C) column permutation.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

# Conv-output geometry for the default 50x100 input (`model.py:50-55`).
DEFAULT_CONV_SHAPE: Tuple[int, int, int] = (96, 6, 12)  # (C, H, W)


def _chw_to_hwc_perm(conv_shape: Tuple[int, int, int]) -> np.ndarray:
    """Index array p with new[i] = old[p[i]] mapping (C,H,W)-flat -> (H,W,C)-flat."""
    C, H, W = conv_shape
    idx = np.arange(C * H * W).reshape(C, H, W)  # value = torch flat index
    return idx.transpose(1, 2, 0).reshape(-1)  # position = avsync flat index


def _unwrap_state_dict(ckpt: Mapping[str, Any]) -> Mapping[str, Any]:
    if "model_state_dict" in ckpt:
        return ckpt["model_state_dict"]
    return ckpt


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


# ---------------------------------------------------------------------------
# LipNet
# ---------------------------------------------------------------------------

def lipnet_torch_to_flax(
    state_dict: Mapping[str, Any],
    num_conv: int = 3,
    num_gru: int = 2,
    conv_shape: Tuple[int, int, int] = DEFAULT_CONV_SHAPE,
) -> Dict[str, Any]:
    """Convert a reference LipNet state_dict (possibly wrapped) to Flax params."""
    sd = _unwrap_state_dict(state_dict)
    params: Dict[str, Any] = {}

    for i in range(1, num_conv + 1):
        w = _np(sd[f"conv{i}.weight"])  # (O, I, kt, kh, kw)
        params[f"conv{i}"] = {
            "kernel": w.transpose(2, 3, 4, 1, 0),
            "bias": _np(sd[f"conv{i}.bias"]),
        }

    perm = _chw_to_hwc_perm(conv_shape)
    for g in range(1, num_gru + 1):
        layer: Dict[str, np.ndarray] = {}
        for suffix, name in (("", "fwd"), ("_reverse", "bwd")):
            w_ih = _np(sd[f"gru{g}.weight_ih_l0{suffix}"])  # (3H, D)
            if g == 1:
                w_ih = w_ih[:, perm]  # reorder conv features (C,H,W)->(H,W,C)
            layer[f"w_ih_{name}"] = w_ih.T
            layer[f"w_hh_{name}"] = _np(sd[f"gru{g}.weight_hh_l0{suffix}"]).T
            layer[f"b_ih_{name}"] = _np(sd[f"gru{g}.bias_ih_l0{suffix}"])
            layer[f"b_hh_{name}"] = _np(sd[f"gru{g}.bias_hh_l0{suffix}"])
        params[f"gru{g}"] = layer

    params["fc"] = {
        "kernel": _np(sd["fc.weight"]).T,
        "bias": _np(sd["fc.bias"]),
    }
    return params


def lipnet_flax_to_torch(
    params: Mapping[str, Any],
    num_conv: int = 3,
    num_gru: int = 2,
    conv_shape: Tuple[int, int, int] = DEFAULT_CONV_SHAPE,
) -> Dict[str, np.ndarray]:
    """Convert Flax LipNet params to a reference-layout state_dict (numpy).

    Use `save_lipnet_pth` to write a torch-loadable file.
    """
    sd: Dict[str, np.ndarray] = {}
    for i in range(1, num_conv + 1):
        k = np.asarray(params[f"conv{i}"]["kernel"])  # (kt,kh,kw,I,O)
        sd[f"conv{i}.weight"] = k.transpose(4, 3, 0, 1, 2)
        sd[f"conv{i}.bias"] = np.asarray(params[f"conv{i}"]["bias"])

    perm = _chw_to_hwc_perm(conv_shape)
    inv_perm = np.argsort(perm)
    for g in range(1, num_gru + 1):
        layer = params[f"gru{g}"]
        for suffix, name in (("", "fwd"), ("_reverse", "bwd")):
            w_ih = np.asarray(layer[f"w_ih_{name}"]).T  # (3H, D)
            if g == 1:
                w_ih = w_ih[:, inv_perm]
            sd[f"gru{g}.weight_ih_l0{suffix}"] = w_ih
            sd[f"gru{g}.weight_hh_l0{suffix}"] = np.asarray(
                layer[f"w_hh_{name}"]
            ).T
            sd[f"gru{g}.bias_ih_l0{suffix}"] = np.asarray(layer[f"b_ih_{name}"])
            sd[f"gru{g}.bias_hh_l0{suffix}"] = np.asarray(layer[f"b_hh_{name}"])

    sd["fc.weight"] = np.asarray(params["fc"]["kernel"]).T
    sd["fc.bias"] = np.asarray(params["fc"]["bias"])
    return sd


# ---------------------------------------------------------------------------
# Misalignment detector
# ---------------------------------------------------------------------------

def detector_torch_to_flax(
    ckpt: Mapping[str, Any],
    conv_shape: Tuple[int, int, int] = DEFAULT_CONV_SHAPE,
    n_audio_feats: int = 40,
) -> Dict[str, Any]:
    """Convert a detector checkpoint (`misalignment_detection_train.py:312-318`
    layout: model_state_dict + input_dim/hidden_dim/config) to Flax params.

    Permutes the visual-feature columns of the first Linear to the avsync
    (H,W,C) ordering for both the mean and std blocks.
    """
    sd = _unwrap_state_dict(ckpt)
    w1 = _np(sd["classifier.0.weight"])  # (hidden, input_dim)
    b1 = _np(sd["classifier.0.bias"])
    w2 = _np(sd["classifier.3.weight"])  # (1, hidden)
    b2 = _np(sd["classifier.3.bias"])

    vis = np.prod(conv_shape)
    perm = _chw_to_hwc_perm(conv_shape)
    full_perm = np.concatenate(
        [perm, perm + vis, np.arange(2 * vis, 2 * vis + n_audio_feats)]
    )
    assert w1.shape[1] == 2 * vis + n_audio_feats, (
        f"detector input_dim {w1.shape[1]} != {2 * vis + n_audio_feats}"
    )
    w1 = w1[:, full_perm]
    return {
        "fc1": {"kernel": w1.T, "bias": b1},
        "fc2": {"kernel": w2.T, "bias": b2},
    }


def detector_flax_to_torch(
    params: Mapping[str, Any],
    conv_shape: Tuple[int, int, int] = DEFAULT_CONV_SHAPE,
    n_audio_feats: int = 40,
) -> Dict[str, np.ndarray]:
    w1 = np.asarray(params["fc1"]["kernel"]).T
    vis = np.prod(conv_shape)
    perm = _chw_to_hwc_perm(conv_shape)
    full_perm = np.concatenate(
        [perm, perm + vis, np.arange(2 * vis, 2 * vis + n_audio_feats)]
    )
    inv = np.argsort(full_perm)
    return {
        "classifier.0.weight": w1[:, inv],
        "classifier.0.bias": np.asarray(params["fc1"]["bias"]),
        "classifier.3.weight": np.asarray(params["fc2"]["kernel"]).T,
        "classifier.3.bias": np.asarray(params["fc2"]["bias"]),
    }


# ---------------------------------------------------------------------------
# File I/O (torch is an optional host-side dependency; gated import)
# ---------------------------------------------------------------------------

def load_pth(path: str) -> Dict[str, Any]:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def load_lipnet_pth(path: str, **kw) -> Dict[str, Any]:
    """Load a reference LipNet `.pth` (either layout) as Flax params."""
    return lipnet_torch_to_flax(load_pth(path), **kw)


def save_lipnet_pth(params: Mapping[str, Any], path: str, **kw) -> None:
    """Write Flax LipNet params as a reference-loadable bare state_dict."""
    import torch

    sd = {
        k: torch.from_numpy(np.array(v, dtype=np.float32, copy=True))
        for k, v in lipnet_flax_to_torch(params, **kw).items()
    }
    torch.save(sd, path)


def load_detector_pth(path: str, **kw) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a detector `.pth`; returns (flax_params, metadata) where metadata
    carries input_dim/hidden_dim/config as saved by the reference."""
    ckpt = load_pth(path)
    meta = {k: ckpt[k] for k in ("input_dim", "hidden_dim", "config") if k in ckpt}
    return detector_torch_to_flax(ckpt, **kw), meta


def save_detector_pth(
    params: Mapping[str, Any],
    path: str,
    input_dim: int,
    hidden_dim: int,
    config: Mapping[str, Any],
    **kw,
) -> None:
    """Write a detector checkpoint in the reference's self-describing layout
    (`misalignment_detection_train.py:312-318`)."""
    import torch

    sd = {
        k: torch.from_numpy(np.array(v, dtype=np.float32, copy=True))
        for k, v in detector_flax_to_torch(params, **kw).items()
    }
    torch.save(
        {
            "model_state_dict": sd,
            "input_dim": input_dim,
            "hidden_dim": hidden_dim,
            "config": dict(config),
        },
        path,
    )
