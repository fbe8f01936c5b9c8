"""Training loops: pjit LipNet CTC training and misalignment-detector training."""

from avsync.train.lipnet_trainer import LipNetTrainer, TrainState, make_train_step

__all__ = ["LipNetTrainer", "TrainState", "make_train_step"]
