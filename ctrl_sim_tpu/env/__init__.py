"""Pure-JAX vectorized driving environment — the TPU-native replacement for
the Nocturne C++/Box2D scenario engine."""

from ctrl_sim_tpu.env.dynamics import (
    freecar_step,
    inverse_bicycle_action,
    kinematic_bicycle_step,
)
from ctrl_sim_tpu.env.env import EnvState, WaymoEnv

__all__ = [
    "kinematic_bicycle_step",
    "freecar_step",
    "inverse_bicycle_action",
    "WaymoEnv",
    "EnvState",
]
