from .ema import EMAConfig, EMAState, ema_init, ema_update
from .trainer import State, TrainConfig, Trainer, make_lr_schedule, make_optimizer

__all__ = [
    "EMAConfig",
    "EMAState",
    "State",
    "TrainConfig",
    "Trainer",
    "ema_init",
    "ema_update",
    "make_lr_schedule",
    "make_optimizer",
]
