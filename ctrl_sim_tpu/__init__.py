"""ctrl_sim_tpu — a TPU-native framework for controllable, reactive,
closed-loop multi-agent driving simulation via offline RL.

Re-designed from scratch for JAX/XLA/Pallas/pjit with the capabilities of
CtRL-Sim (CoRL 2024, montrealrobotics/ctrl-sim):

- ``ctrl_sim_tpu.env``      — pure-JAX vectorized driving environment (replaces
  the Nocturne C++/Box2D engine): kinematic-bicycle and FreeCar-physics
  dynamics, OBB/segment collision, multi-component rewards, batched over
  thousands of scenarios in lockstep under ``jit``.
- ``ctrl_sim_tpu.data``     — scenario arrays, offline-RL dataset generation,
  return-to-go pipeline and on-device training transforms.
- ``ctrl_sim_tpu.models``   — return-conditioned autoregressive transformer
  (CtRL-Sim) with DT / IL / trajeglish variants and the CTG++ diffusion
  baseline, in flax.linen.
- ``ctrl_sim_tpu.rollout``  — batched closed-loop policy rollout fused with the
  env step in one jitted loop, with incremental KV-cached decoding.
- ``ctrl_sim_tpu.parallel`` — GSPMD meshes/shardings for multi-chip scaling.
- ``ctrl_sim_tpu.evals``    — policy / planner-adversary evaluators and the
  Table-1 metric suite.
"""

from ctrl_sim_tpu.config import Config, load_config

__version__ = "0.1.0"

__all__ = ["Config", "load_config", "__version__"]
