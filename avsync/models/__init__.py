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

        # ModelConfig resolves conv_channels=None to the family's reference
        # widths at construction, so whatever is here is what the user asked
        # for — no sentinel-matching (an explicit (32, 64, 96) TF stack is
        # representable).
        channels = tuple(model_cfg.conv_channels)
        return TFLipNet(
            TFModelConfig(
                hidden_dim=model_cfg.hidden_dim,
                dropout_rate=model_cfg.dropout_rate,
                conv_channels=channels,
            )
        )
    return LipNet(model_cfg)


__all__ = ["LipNet", "BiGRU", "MisalignmentDetector", "make_lipnet"]
