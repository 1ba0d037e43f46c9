"""Scenario arrays, dataset generation, and training transforms."""

from ctrl_sim_tpu.data.scenario import (
    Scenario,
    ScenarioBatch,
    load_scenario_json,
    pad_scenarios,
    stack_scenarios,
)
from ctrl_sim_tpu.data.synthetic import synthetic_scenario

__all__ = [
    "Scenario",
    "ScenarioBatch",
    "load_scenario_json",
    "stack_scenarios",
    "pad_scenarios",
    "synthetic_scenario",
]
