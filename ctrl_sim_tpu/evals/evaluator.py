"""Closed-loop policy evaluator: the eval_sim.py / PolicyEvaluator
equivalent driving the batched rollout.

Replaces the reference's serial per-scene Python loop
(evaluators/policy_evaluator.py:426-595) with: host-side agent selection per
scene (seeded, mirroring the reference's modes), scenes stacked into lanes,
one jitted rollout per lane batch, metric aggregation over everything.

Agent-selection modes (policy_evaluator.py:450-464):

- ``multi_agent``: <=8 random moving vehicles per scene (random.sample)
- ``one_agent``: a random "interesting" vehicle — goal within 10 m of
  another's, goal timesteps within 2 s, both trajectories >= 60 steps
- ``two_agent``: an interesting *pair* by the same criteria
"""

from __future__ import annotations

import dataclasses
import random as pyrandom

import jax
import jax.numpy as jnp
import numpy as np

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.data.scenario import Scenario, stack_scenarios
from ctrl_sim_tpu.data.transforms import get_tilt_logits
from ctrl_sim_tpu.evals.metrics import PolicyMetricsAccumulator
from ctrl_sim_tpu.rollout.groups import build_focal_groups, pad_groups
from ctrl_sim_tpu.rollout.rollout import run_closed_loop
from ctrl_sim_tpu.rollout.streaming import run_streaming


def check_streaming_normalization(cfg: Config) -> None:
    """Refuse a streaming eval whose model was trained with window-anchored
    frames: the streaming rollout normalizes at episode start, so the model
    would see a different input distribution than training. Shared by
    PolicyEvaluator and PlannerAdversaryEvaluator."""
    if (
        cfg.eval.rollout_mode == "streaming"
        and not cfg.waymo.episode_start_normalization
        and not cfg.eval.allow_normalization_mismatch
    ):
        raise ValueError(
            "eval.rollout_mode='streaming' evaluates with an "
            "episode-start normalization frame, but this config "
            "trains with window-anchored frames "
            "(waymo.episode_start_normalization=False) — the model "
            "would see a different input distribution than it was "
            "trained on. Either train/evaluate with "
            "waymo.episode_start_normalization=True, use "
            "eval.rollout_mode='exact', or acknowledge the mismatch "
            "with eval.allow_normalization_mismatch=True."
        )


def check_checkpoint_normalization(cfg: Config, ckpt_dir: str) -> None:
    """Cross-check a checkpoint's snapshotted training config against the
    eval config's normalization frame (the snapshot, not the eval-time flag,
    defines the distribution the model was trained on)."""
    from ctrl_sim_tpu.training.checkpoint import CheckpointManager

    try:
        train_cfg = CheckpointManager.load_config(ckpt_dir)
    except FileNotFoundError:
        print("[eval] warning: checkpoint has no config.json snapshot")
        return
    trained_esn = bool(
        train_cfg.get("waymo", {}).get("episode_start_normalization", False)
    )
    if trained_esn != cfg.waymo.episode_start_normalization:
        raise SystemExit(
            f"checkpoint {ckpt_dir} was trained with "
            f"waymo.episode_start_normalization={trained_esn} but the "
            f"eval config sets {cfg.waymo.episode_start_normalization}"
            " — pass the matching -o waymo.episode_start_normalization"
            " override (the streaming rollout requires True)."
        )


def _moving_vehicle_ids(scene: Scenario) -> list[int]:
    """getObjectsThatMoved equivalent (scenario.cc:940-951)."""
    return [int(i) for i in np.where(scene.moving & scene.agent_valid)[0]]


def _interesting_candidates(cfg: Config, scene: Scenario, moving: list[int]):
    """The goal-proximity pair mask (policy_evaluator.py:308-414)."""
    steps = cfg.sim.steps
    hist = cfg.eval.history_steps
    goals, goal_ts, long_enough = [], [], []
    for a in moving:
        valid = scene.traj_valid[a]
        idx_goal = steps - 1
        goal_pos = scene.goal_position[a].copy()
        invalid = np.where(~valid)[0]
        if len(invalid) > 0:
            idx_goal = invalid[0] - 1
        goal_ts.append(idx_goal - hist)
        goals.append(goal_pos)
        long_enough.append(
            1 if valid[hist:].sum() >= cfg.eval.interesting_traj_len_threshold else 0
        )
    goals = np.array(goals)
    goal_ts = np.array(goal_ts)
    long_enough = np.array(long_enough)
    if len(moving) == 0:
        return []
    dists = np.linalg.norm(goals[None] - goals[:, None], axis=-1)
    mask = (
        (dists < cfg.eval.interesting_goal_dist_threshold)
        & (dists > 0)
        & (long_enough[:, None] > 0)
        & (long_enough[None, :] > 0)
        & (
            np.abs(goal_ts[:, None] - goal_ts[None, :])
            < cfg.eval.interesting_timestep_diff_threshold
        )
    )
    ii, jj = np.where(mask)
    return [(moving[i], moving[j]) for i, j in zip(ii, jj)]


def select_vehicles_to_evaluate(
    cfg: Config, scene: Scenario, rng: pyrandom.Random
) -> list[int]:
    moving = _moving_vehicle_ids(scene)
    mode = cfg.eval.eval_mode
    if mode == "multi_agent":
        k = cfg.eval.multi_agent_eval_threshold
        if len(moving) > k:
            return rng.sample(moving, k)
        return moving
    pairs = _interesting_candidates(cfg, scene, moving)
    if not pairs:
        return []
    pair = rng.choice(pairs)
    if mode == "one_agent":
        return [pair[0]]
    return list(pair)


class PolicyEvaluator:
    """Batched closed-loop evaluation over a scene set."""

    def __init__(self, cfg: Config, model, params, lane_batch: int = 32):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.lane_batch = lane_batch
        tc = cfg.policy.tilt
        self.tilt_logits = jnp.asarray(
            get_tilt_logits(
                tc.goal_tilt if tc.tilt else 0.0,
                tc.veh_veh_tilt if tc.tilt else 0.0,
                tc.veh_edge_tilt if tc.tilt else 0.0,
                cfg.waymo,
            )
        )
        if cfg.model.ctg_plus_plus:
            # CTG++ closed-loop policy (policy_evaluator.py:466-593 +
            # eval_sim.py:19-32): diffusion replanning at 2 Hz, no RTG
            # tilting; scenes must fit one <=max_num_agents crop (the
            # reference's CTG++ eval partitions scenes externally the same
            # way — run_ctg_closed_loop has no focal-group path)
            from ctrl_sim_tpu.rollout.ctg_rollout import run_ctg_closed_loop

            self._rollout = jax.jit(
                lambda sb, p, c, r, t, g: run_ctg_closed_loop(cfg, model, p, sb, c, r)
            )
        else:
            check_streaming_normalization(cfg)
            run_fn = (
                run_streaming
                if cfg.eval.rollout_mode == "streaming"
                else run_closed_loop
            )
            # tilt logits are an ARGUMENT, not a closure: a closed-over
            # device array becomes an MLIR constant, so every tilt value
            # would compile (and remote-compile-cache) a separate program —
            # a tilt sweep paid ~4 min per point until round 5 moved it
            self._rollout = jax.jit(
                lambda sb, p, c, r, t, g: run_fn(
                    cfg, model, p, sb, c, r, t, groups=g
                )
            )

    def evaluate(self, scenes: list[Scenario]) -> dict:
        cfg = self.cfg
        rng = pyrandom.Random(cfg.eval.seed)
        key = jax.random.PRNGKey(cfg.eval.seed)

        # host-side agent selection, scene filtering
        selected: list[tuple[Scenario, list[int]]] = []
        for scene in scenes:
            vehicles = select_vehicles_to_evaluate(cfg, scene, rng)
            if vehicles:
                selected.append((scene, vehicles))
        if not selected:
            return {}

        # running statistics pooled over every chunk: each JSD is computed
        # once over the full per-vehicle stream population, matching the
        # reference's update_running_statistics/compute_metrics split
        # (policy_evaluator.py:251-303) — never a mean of per-chunk JSDs
        acc = PolicyMetricsAccumulator(cfg)

        # pre-build focal groups per chunk, then pad every chunk to the same
        # group count so all chunks share one compiled rollout graph
        chunks = []
        for i in range(0, len(selected), self.lane_batch):
            chunk = selected[i : i + self.lane_batch]
            batch = stack_scenarios([s for s, _ in chunk], cfg)
            A = batch.traj_position.shape[1]
            controlled = np.zeros((len(chunk), A), dtype=bool)
            for e, (_, vehicles) in enumerate(chunk):
                controlled[e, vehicles] = True
            # packed agent slots (eval.agent_slots, streaming only): narrower
            # crops cut the KV-cache DMA that dominates streaming rollouts
            crop = (
                cfg.eval.agent_slots
                if cfg.eval.rollout_mode == "streaming" and cfg.eval.agent_slots
                else None
            )
            groups = build_focal_groups(
                cfg,
                np.asarray(batch.traj_position),
                np.asarray(batch.traj_valid).astype(bool),
                np.asarray(batch.agent_valid).astype(bool),
                controlled,
                crop_size=crop,
            )
            chunks.append((batch, controlled, groups))
        max_g = max(g.num_groups for _, _, g in chunks)

        for batch, controlled, groups in chunks:
            if groups.num_groups < max_g:
                groups = pad_groups(groups, max_g)
            d = {
                k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                for k, v in dataclasses.asdict(batch).items()
            }
            d["name"] = ""  # static metadata: keep the jit cache warm
            sb = Scenario(**d)
            key, sub = jax.random.split(key)
            rollout = self._rollout(
                sb,
                self.params,
                jnp.asarray(controlled),
                sub,
                self.tilt_logits,
                jax.tree.map(jnp.asarray, groups),
            )
            acc.update(jax.tree.map(np.asarray, rollout), batch)

        return acc.compute()
