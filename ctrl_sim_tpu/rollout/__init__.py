"""Batched closed-loop rollout: policy decode fused with the env step."""

from ctrl_sim_tpu.rollout.policy import sample_actions, sample_tilted_rtgs
from ctrl_sim_tpu.rollout.groups import GroupSpec, build_focal_groups
from ctrl_sim_tpu.rollout.rollout import RolloutOutput, run_closed_loop
from ctrl_sim_tpu.rollout.streaming import run_streaming

__all__ = [
    "GroupSpec",
    "build_focal_groups",
    "sample_tilted_rtgs",
    "sample_actions",
    "run_closed_loop",
    "run_streaming",
    "RolloutOutput",
]
