"""Training: optimizer, sharded train step, checkpointing."""

from ctrl_sim_tpu.training.trainer import TrainState, Trainer, make_optimizer

__all__ = ["Trainer", "TrainState", "make_optimizer"]
