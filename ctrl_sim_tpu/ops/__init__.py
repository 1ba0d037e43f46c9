"""Compute-path building blocks: masks, attention, fused kernels."""

from ctrl_sim_tpu.ops.masks import multi_agent_causal_mask

__all__ = ["multi_agent_causal_mask"]
