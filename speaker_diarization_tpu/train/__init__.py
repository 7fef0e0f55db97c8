from .schedules import noam_schedule, polynomial_decay_schedule  # noqa: F401
from .trainer import Trainer, TrainerConfig, TrainState  # noqa: F401
