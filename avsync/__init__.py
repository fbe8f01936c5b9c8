"""avsync — TPU-native audio-visual speech alignment framework.

A from-scratch JAX/Flax/Pallas/pjit framework with the capabilities of the
reference PyTorch/TensorFlow stack (Hu-xiao-max/Alignment-Between-Speech-and-
Visual-Mouth-Movements): GRID-corpus lipreading (LipNet encoder: Conv3D stack
+ bidirectional GRU + CTC head, greedy decoding, CER/WER eval) and an
audio-visual misalignment detector (frozen visual embeddings + MFCC audio
statistics, shift-contrastive training, AUROC eval, demo export).

Design: functional core (pure jitted steps), device-side preprocessing,
explicit `jax.sharding.Mesh` parallelism, Orbax checkpoints carrying the full
config, and host-side C++ ingest for codec decode.
"""

__version__ = "0.1.0"

from avsync.config import (
    AvsyncConfig,
    DataConfig,
    DetectorConfig,
    ModelConfig,
    TrainConfig,
)

__all__ = [
    "AvsyncConfig",
    "DataConfig",
    "DetectorConfig",
    "ModelConfig",
    "TrainConfig",
    "LipReader",
    "MisalignmentScorer",
    "AvsyncServer",
    "DynamicBatcher",
    "TranscribeService",
    "SyncScoreService",
    "__version__",
]


def __getattr__(name):
    # lazy serving-API exports: importing avsync stays cheap (no jax pull-in)
    if name in ("LipReader", "MisalignmentScorer"):
        from avsync import predictor

        return getattr(predictor, name)
    if name in ("AvsyncServer", "DynamicBatcher", "TranscribeService",
                "SyncScoreService"):
        from avsync import serving

        return getattr(serving, name)
    raise AttributeError(f"module 'avsync' has no attribute {name!r}")
