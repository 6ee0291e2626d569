from deeplip_tpu.train.schedules import multistep_schedule, cosine_annealing_schedule
from deeplip_tpu.train.state import TrainState, build_optimizer
from deeplip_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    average_checkpoints,
    latest_checkpoint,
)
from deeplip_tpu.train.audio import AudioTrainer

__all__ = [
    "multistep_schedule",
    "cosine_annealing_schedule",
    "TrainState",
    "build_optimizer",
    "save_checkpoint",
    "load_checkpoint",
    "average_checkpoints",
    "latest_checkpoint",
    "AudioTrainer",
]
