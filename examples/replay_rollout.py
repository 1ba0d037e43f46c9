"""Canonical end-to-end slice: synthetic scenarios -> batched env -> jitted
90-step replay-through-physics rollout (the data-generation semantics of
reference data/generate_offline_rl_dataset.py, here as one lax.scan).

Run on CPU:  PYTHONPATH=. JAX_PLATFORMS=cpu python examples/replay_rollout.py
"""

import dataclasses
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ctrl_sim_tpu.config import load_config  # noqa: E402
from ctrl_sim_tpu.data import stack_scenarios, synthetic_scenario  # noqa: E402
from ctrl_sim_tpu.data.datagen import generate_offline_data  # noqa: E402
from ctrl_sim_tpu.data.scenario import Scenario  # noqa: E402


def main():
    cfg = load_config({})
    scenes = [
        synthetic_scenario(cfg, seed=s, num_agents=4, arena_half=120.0, num_lanes=2)
        for s in range(4)
    ]
    batch = Scenario(
        **{
            k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
            for k, v in dataclasses.asdict(stack_scenarios(scenes, cfg)).items()
        }
    )

    run = jax.jit(lambda b: generate_offline_data(cfg, b))
    out = jax.block_until_ready(run(batch))  # compile + first run
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(batch))
    dt = time.perf_counter() - t0

    # replay-through-physics fidelity: simulated positions vs GT log
    gt = np.asarray(batch.traj_position)[:, :, : cfg.sim.steps]
    sim = np.asarray(out.states)[..., :2]  # [E, A, T, 2]
    valid = np.asarray(batch.traj_valid)[:, :, : cfg.sim.steps] & (
        np.asarray(out.states)[..., 7] > 0
    )
    ade = float(np.sqrt(((sim - gt) ** 2).sum(-1))[valid].mean())

    rew = np.asarray(out.rewards8)  # [E, A, T, 8]
    pos_achieved = rew[..., 0].sum()
    veh_veh = rew[..., 6].sum()
    veh_edge = rew[..., 7].sum()

    print(f"steady-state 90-step scan over 4 envs: {dt * 1e3:.1f} ms")
    print(f"replay ADE vs GT: {ade:.4f} m")
    print(f"sticky position_achieved count: {pos_achieved:.0f}")
    print(f"veh_veh events: {veh_veh:.0f}  veh_edge events: {veh_edge:.0f}")

    assert ade < 0.15, "replay drift too large"
    assert pos_achieved > 0, "no goals achieved during replay"
    assert dt < 1.0, "steady-state scan too slow"
    print("OK")


if __name__ == "__main__":
    main()
