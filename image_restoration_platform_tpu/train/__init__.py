from .data import synthetic_batch, DataConfig
from .trainer import Trainer, TrainConfig, make_train_step

__all__ = ["synthetic_batch", "DataConfig", "Trainer", "TrainConfig", "make_train_step"]
