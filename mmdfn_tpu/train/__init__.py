from mmdfn_tpu.train.optim import torch_adam
from mmdfn_tpu.train.trainer import (EpochMetrics, FitResult, Trainer,
                                     TrainState, prepare_inputs)

__all__ = ["torch_adam", "Trainer", "TrainState", "EpochMetrics",
           "FitResult", "prepare_inputs", "DailyTrainer"]


def __getattr__(name):
    # lazy: daily_trainer pulls in the model zoo; most imports of this
    # package (bench, serve) never touch the DailyDialogue path
    if name == "DailyTrainer":
        from mmdfn_tpu.train.daily_trainer import DailyTrainer
        return DailyTrainer
    raise AttributeError(name)
