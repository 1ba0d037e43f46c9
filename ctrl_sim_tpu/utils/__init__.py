"""Shared utilities: profiling/metering."""

from ctrl_sim_tpu.utils.profiling import StepMeter, trace_annotation

__all__ = ["StepMeter", "trace_annotation"]
