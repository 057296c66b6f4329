from adsr_tpu.train.losses import LossFn, make_loss
from adsr_tpu.train.trainer import Trainer, TrainState, make_train_step

__all__ = ["LossFn", "make_loss", "Trainer", "TrainState", "make_train_step"]
