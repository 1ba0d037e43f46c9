"""Evaluation: closed-loop policy metrics and planner-vs-adversary metrics."""

from ctrl_sim_tpu.evals.metrics import compute_policy_metrics

__all__ = ["compute_policy_metrics"]
