"""Flax model definitions: LipNet encoder and misalignment detector."""

from avsync.models.lipnet import BiGRU, LipNet
from avsync.models.detector import MisalignmentDetector


def make_lipnet(model_cfg):
    """Family-dispatching LipNet constructor.

    'pytorch' -> Conv3D(32/64/96)+BiGRU encoder, blank=0 CTC (`model.py:7-97`);
    'tf' -> Conv3D(128/256/64)+3xBiLSTM encoder, blank-last CTC
    (`train.py:495-547`). Every consumer (trainer, CLI, predictor) must build
    the model through this so decode/loss dispatch stays consistent.
    """
    if model_cfg.family == "tf":
        from avsync.models.lipnet_tf import TFLipNet, TFModelConfig

        channels = tuple(model_cfg.conv_channels)
        if channels == (32, 64, 96):
            # the PyTorch stack's widths on a tf-family config means the
            # field was left at the ModelConfig default — use the reference
            # TF widths (`train.py:505-521`), not a 32/64/96 TF stack
            channels = (128, 256, 64)
        return TFLipNet(
            TFModelConfig(
                hidden_dim=model_cfg.hidden_dim,
                dropout_rate=model_cfg.dropout_rate,
                conv_channels=channels,
            )
        )
    return LipNet(model_cfg)


__all__ = ["LipNet", "BiGRU", "MisalignmentDetector", "make_lipnet"]
