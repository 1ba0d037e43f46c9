"""Training: optimizer, sharded train step, checkpointing."""

from ctrl_sim_tpu.training.trainer import (
    CTGTrainer,
    TrainState,
    Trainer,
    make_optimizer,
)

__all__ = ["CTGTrainer", "Trainer", "TrainState", "make_optimizer"]
