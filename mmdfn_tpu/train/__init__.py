from mmdfn_tpu.train.optim import torch_adam
from mmdfn_tpu.train.trainer import (EpochMetrics, FitResult, Trainer,
                                     TrainState, prepare_inputs)

__all__ = ["torch_adam", "Trainer", "TrainState", "EpochMetrics",
           "FitResult", "prepare_inputs"]
