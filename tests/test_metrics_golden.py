"""Golden test of the eval metric pipeline against a LITERAL numpy port of
the reference's PolicyEvaluator.update_running_statistics/compute_metrics
(evaluators/policy_evaluator.py:162-305) fed identical synthetic streams.

Also pins the pooling property: accumulating in several chunks equals one
chunk (the JSDs are computed once over pooled streams, never averaged
across chunks).
"""

import numpy as np
import pytest

from ctrl_sim_tpu.config import load_config
from ctrl_sim_tpu.evals.metrics import PolicyMetricsAccumulator
from ctrl_sim_tpu.rollout.rollout import RolloutOutput

STEPS = 20
HIST = 4
DT = 0.1


# ---------------------------------------------------------------------------
# Literal reference port (policy_evaluator.py / evaluator.py / dataset.py)
# ---------------------------------------------------------------------------


def ref_jensenshannon(p, q):
    """scipy.spatial.distance.jensenshannon, base e."""
    p = np.asarray(p, float)
    q = np.asarray(q, float)
    p = p / p.sum()
    q = q / q.sum()
    m = (p + q) / 2.0

    def rel_entr(a, b):
        out = np.zeros_like(a)
        mask = a > 0
        out[mask] = a[mask] * np.log(a[mask] / b[mask])
        return out

    js = rel_entr(p, m).sum() / 2.0 + rel_entr(q, m).sum() / 2.0
    return np.sqrt(max(js, 0.0))


def ref_compute_dist_to_nearest_vehicle_rewards(ag_data, normalize=True):
    """dataset.py:200-236, verbatim semantics."""
    num_timesteps = ag_data.shape[1]
    ag_positions = ag_data[:, :, :2].copy()
    ag_existence = ag_data[:, :, -1]
    mask = np.repeat(ag_existence[:, :, np.newaxis], repeats=2, axis=-1).astype(bool)
    ag_positions[~mask] = np.inf
    with np.errstate(invalid="ignore"):
        diff = ag_positions[:, np.newaxis] - ag_positions[np.newaxis, :]
        squared_dist = np.sum(diff**2, axis=-1)
        for i in range(num_timesteps):
            np.fill_diagonal(squared_dist[:, :, i], np.inf)
        dist_nearest = np.sqrt(np.nanmin(np.where(np.isnan(squared_dist), np.inf, squared_dist), axis=1))
        dist_nearest[dist_nearest == np.inf] = np.nan
        if normalize:
            dist_nearest = np.clip(dist_nearest * ag_existence, 0.0, 15.0) / 15.0
        else:
            dist_nearest = dist_nearest * ag_existence
    return np.nan_to_num(dist_nearest, nan=0.0)


class RefPolicyEvaluatorMetrics:
    """update_running_statistics + compute_metrics, ported line by line."""

    def __init__(self, wc):
        self.wc = wc
        self.steps, self.history_steps, self.dt = STEPS, HIST, DT
        self.goal_achieved_all = []
        self.collision_rate_scenario = []
        self.offroad_rate_scenario = []
        self.ades_all = []
        self.fdes_all = []
        self.lin_speed_sim_all, self.lin_speed_gt_all = [], []
        self.ang_speed_sim_all, self.ang_speed_gt_all = [], []
        self.accel_sim_all, self.accel_gt_all = [], []
        self.nearest_dist_sim_all, self.nearest_dist_gt_all = [], []

    def update_running_statistics(self, data_dict, veh_ids):
        collisions_scenario = []
        offroads_scenario = []
        for v in veh_ids:
            mask = np.array(data_dict[v]["existence"]).astype(bool)
            future_mask = np.zeros(self.steps + 1).astype(bool)
            future_mask[self.history_steps :] = True
            mask = mask * future_mask

            if mask.sum() != 0:
                rew = np.array(data_dict[v]["reward"])[mask]
                goal_achieved = np.any(np.sum(rew[:, :1], axis=1) == 1)
                self.goal_achieved_all.append(float(goal_achieved))
                collisions_scenario.append(float(np.any(rew[:, 6] == 1)))
                offroads_scenario.append(float(np.any(rew[:, 7] == 1)))

            simulated_positions = np.array(data_dict[v]["position"])
            gt_positions = np.array(data_dict[v]["gt_position"])

            if mask.sum() != 0:
                ade = np.linalg.norm(
                    simulated_positions[mask] - gt_positions[mask], axis=1
                ).mean()
                self.ades_all.append(ade)
                last_position = np.where(mask == 1)[-1][-1]
                fde = np.linalg.norm(
                    simulated_positions[last_position] - gt_positions[last_position]
                )
                self.fdes_all.append(fde)

                sim_velocities = np.array(data_dict[v]["velocity"])[mask]
                sim_lin_speeds = np.linalg.norm(sim_velocities, axis=1)
                gt_lin_speeds = np.array(data_dict[v]["gt_speed"])[mask]
                self.lin_speed_sim_all.append(sim_lin_speeds[:, None])
                self.lin_speed_gt_all.append(gt_lin_speeds[:, None])

                sim_ang_speeds = np.array(data_dict[v]["heading"])[mask] / self.dt
                gt_ang_speeds = np.array(data_dict[v]["gt_heading"])[mask] / self.dt
                self.ang_speed_sim_all.append(sim_ang_speeds[:, None])
                self.ang_speed_gt_all.append(gt_ang_speeds[:, None])

                gt_accels = np.array(data_dict[v]["gt_acceleration"])[mask]
                sim_accels = np.array(data_dict[v]["acceleration"])[mask]
                accel_mask = np.ones(gt_accels.shape).astype(bool)
                accel_mask[0] = False
                accel_mask[-1] = False
                self.accel_sim_all.append(sim_accels[accel_mask][:, None])
                self.accel_gt_all.append(gt_accels[accel_mask][:, None])

                gt_nearest_dists = np.array(data_dict[v]["gt_nearest_dist"])[mask]
                sim_nearest_dists = np.array(data_dict[v]["nearest_dist"])[mask]
                self.nearest_dist_gt_all.append(gt_nearest_dists[:, None])
                self.nearest_dist_sim_all.append(sim_nearest_dists[:, None])

        if len(collisions_scenario) > 0:
            self.collision_rate_scenario.append(np.array(collisions_scenario).mean())
            self.offroad_rate_scenario.append(np.array(offroads_scenario).mean())

    def compute_metrics(self):
        wc = self.wc
        metrics = {
            "goal": np.array(self.goal_achieved_all).mean(),
            "collision_rate": np.array(self.collision_rate_scenario).mean(),
            "offroad_rate": np.array(self.offroad_rate_scenario).mean(),
            "fde": np.array(self.fdes_all).mean(),
            "ade": np.array(self.ades_all).mean(),
        }
        lin_gt = np.clip(np.concatenate(self.lin_speed_gt_all, axis=0), 0, 30)
        lin_sim = np.clip(np.concatenate(self.lin_speed_sim_all, axis=0), 0, 30)
        bin_edges = np.arange(201) * 0.5 * (100 / 30)
        P = np.histogram(lin_sim, bins=bin_edges)[0] / len(lin_sim)
        Q = np.histogram(lin_gt, bins=bin_edges)[0] / len(lin_gt)
        metrics["lin_speed_jsd"] = ref_jensenshannon(P, Q)

        ang_gt = np.clip(np.concatenate(self.ang_speed_gt_all, axis=0), -50, 50)
        ang_sim = np.clip(np.concatenate(self.ang_speed_sim_all, axis=0), -50, 50)
        bin_edges = np.arange(201) * 0.5 - 50
        P = np.histogram(ang_sim, bins=bin_edges)[0] / len(ang_sim)
        Q = np.histogram(ang_gt, bins=bin_edges)[0] / len(ang_gt)
        metrics["ang_speed_jsd"] = ref_jensenshannon(P, Q)

        accels_gt = np.concatenate(self.accel_gt_all, axis=0)
        accels_gt = (
            np.clip(accels_gt, wc.min_accel, wc.max_accel) - wc.min_accel
        ) / (wc.max_accel - wc.min_accel)
        accels_gt = np.round(accels_gt * (wc.accel_discretization - 1))
        accels_gt /= wc.accel_discretization - 1
        accels_gt = accels_gt * (wc.max_accel - wc.min_accel) + wc.min_accel
        accels_sim = np.concatenate(self.accel_sim_all, axis=0)
        bin_edges = np.arange(wc.accel_discretization + 1) * 2 - wc.accel_discretization
        P = np.histogram(accels_sim, bins=bin_edges)[0] / len(accels_sim)
        Q = np.histogram(accels_gt, bins=bin_edges)[0] / len(accels_gt)
        metrics["accel_jsd"] = ref_jensenshannon(P, Q)

        nd_gt = np.clip(np.concatenate(self.nearest_dist_gt_all, axis=0), 0, 40)
        nd_sim = np.clip(np.concatenate(self.nearest_dist_sim_all, axis=0), 0, 40)
        bin_edges = np.arange(201) * 0.5 * (100 / 40)
        P = np.histogram(nd_sim, bins=bin_edges)[0] / len(nd_sim)
        Q = np.histogram(nd_gt, bins=bin_edges)[0] / len(nd_gt)
        metrics["nearest_dist_jsd"] = ref_jensenshannon(P, Q)
        return metrics


# ---------------------------------------------------------------------------
# Synthetic streams
# ---------------------------------------------------------------------------


class FakeScenario:
    def __init__(self, tp, th, ts):
        self.traj_position = tp
        self.traj_heading = th
        self.traj_speed = ts


def make_chunk(rng, E, A):
    """One lane chunk of plausible rollout streams (time-major)."""
    T1 = STEPS + 1
    pos = np.cumsum(rng.normal(scale=1.0, size=(T1, E, A, 2)), axis=0) + rng.uniform(
        -40, 40, size=(1, E, A, 2)
    )
    vel = rng.normal(scale=4.0, size=(T1, E, A, 2))
    heading = rng.uniform(-np.pi, np.pi, size=(T1, E, A))
    speed = np.linalg.norm(vel, axis=-1)
    exist = (rng.uniform(size=(T1, E, A)) > 0.1).astype(float)
    # contiguous existence from t=0 (reference agents exist then vanish)
    first_gone = np.argmin(exist, axis=0)
    alive_forever = exist.min(axis=0) > 0
    tgrid = np.arange(T1)[:, None, None]
    exist = ((tgrid < first_gone[None]) | alive_forever[None]).astype(float)
    reward8 = np.zeros((T1, E, A, 8))
    reward8[..., 0] = (rng.uniform(size=(T1, E, A)) < 0.05).astype(float)
    reward8[..., 6] = (rng.uniform(size=(T1, E, A)) < 0.08).astype(float)
    reward8[..., 7] = (rng.uniform(size=(T1, E, A)) < 0.06).astype(float)
    accel = rng.normal(scale=3.0, size=(STEPS, E, A))
    steering = rng.normal(scale=0.2, size=(STEPS, E, A))
    controlled = rng.uniform(size=(E, A)) < 0.6
    controlled[:, 0] = True  # at least one per scene

    gt_pos = pos.transpose(1, 2, 0, 3) + rng.normal(scale=0.5, size=(E, A, T1, 2))
    gt_heading = heading.transpose(1, 2, 0) + rng.normal(scale=0.1, size=(E, A, T1))
    gt_speed = np.abs(speed.transpose(1, 2, 0) + rng.normal(scale=0.5, size=(E, A, T1)))

    # sim nearest-dist stream exactly as the rollout computes it
    nd = np.zeros((T1, E, A))
    for e in range(E):
        ag = np.concatenate(
            [pos[:, e].transpose(1, 0, 2), exist[:, e].T[..., None]], axis=-1
        )  # [A, T1, 3]
        nd[:, e] = ref_compute_dist_to_nearest_vehicle_rewards(ag, normalize=False).T

    rollout = RolloutOutput(
        position=pos,
        velocity=vel,
        heading=heading,
        speed=speed,
        existence=exist,
        reward8=reward8,
        acceleration=accel,
        steering=steering,
        nearest_dist=nd,
        rtgs=np.zeros((STEPS, E, A, 3)),
        controlled_mask=controlled,
    )
    scen = FakeScenario(gt_pos, gt_heading, gt_speed)
    return rollout, scen


def to_data_dicts(rollout, scen):
    """Per-scene reference vehicle_data_dict structures."""
    T1 = STEPS + 1
    exist = rollout.existence.transpose(1, 2, 0)
    pos = rollout.position.transpose(1, 2, 0, 3)
    vel = rollout.velocity.transpose(1, 2, 0, 3)
    heading = rollout.heading.transpose(1, 2, 0)
    reward8 = rollout.reward8.transpose(1, 2, 0, 3)
    accel = rollout.acceleration.transpose(1, 2, 0)
    nd = rollout.nearest_dist.transpose(1, 2, 0)
    gt_speed = scen.traj_speed
    gt_accel = np.zeros_like(gt_speed)
    gt_accel[:, :, 1:STEPS] = (gt_speed[:, :, 2:] - gt_speed[:, :, :-2]) / (2 * DT)

    E, A = exist.shape[:2]
    dicts = []
    for e in range(E):
        # gt nearest dist via the reference's compute_nearest_dist_all:
        # gt positions with sim existence (evaluator.py:94-101)
        gt_ag = np.concatenate(
            [scen.traj_position[e], exist[e][..., None]], axis=-1
        )  # [A, T1, 3]
        gt_nd = ref_compute_dist_to_nearest_vehicle_rewards(gt_ag, normalize=False)
        gt_nd = gt_nd * exist[e]
        dd = {}
        for a in range(A):
            dd[a] = {
                "existence": exist[e, a],
                "reward": reward8[e, a],
                "position": pos[e, a],
                "gt_position": scen.traj_position[e, a],
                "velocity": vel[e, a],
                "gt_speed": gt_speed[e, a],
                "heading": heading[e, a],
                "gt_heading": scen.traj_heading[e, a],
                "acceleration": np.concatenate([accel[e, a], [0.0]]),
                "gt_acceleration": gt_accel[e, a],
                "nearest_dist": nd[e, a],
                "gt_nearest_dist": gt_nd[a],
            }
        dicts.append(dd)
    return dicts


@pytest.fixture(scope="module")
def cfg():
    return load_config(
        {"sim.steps": STEPS, "sim.history_steps": HIST, "sim.max_agents": 6,
         "waymo.max_num_agents": 6}
    )


def test_metrics_match_reference_port(cfg):
    rng = np.random.default_rng(7)
    chunks = [make_chunk(rng, E=3, A=6) for _ in range(3)]

    acc = PolicyMetricsAccumulator(cfg)
    ref = RefPolicyEvaluatorMetrics(cfg.waymo)
    for rollout, scen in chunks:
        acc.update(rollout, scen)
        for e, dd in enumerate(to_data_dicts(rollout, scen)):
            veh_ids = [a for a in range(6) if rollout.controlled_mask[e, a]]
            ref.update_running_statistics(dd, veh_ids)

    ours = acc.compute()
    theirs = ref.compute_metrics()
    assert set(theirs) <= set(ours)
    for k, v in theirs.items():
        np.testing.assert_allclose(ours[k], v, rtol=1e-10, atol=1e-12, err_msg=k)


def test_chunked_equals_pooled(cfg):
    """Accumulating chunk-by-chunk == accumulating everything at once."""
    rng = np.random.default_rng(3)
    chunks = [make_chunk(rng, E=2, A=6) for _ in range(4)]

    acc_chunked = PolicyMetricsAccumulator(cfg)
    for rollout, scen in chunks:
        acc_chunked.update(rollout, scen)

    # one big chunk: concatenate along the scene axis
    big_ro = RolloutOutput(
        *[
            np.concatenate([getattr(r, f) for r, _ in chunks],
                           axis=0 if f == "controlled_mask" else 1)
            for f in RolloutOutput._fields
        ]
    )
    big_scen = FakeScenario(
        np.concatenate([s.traj_position for _, s in chunks], axis=0),
        np.concatenate([s.traj_heading for _, s in chunks], axis=0),
        np.concatenate([s.traj_speed for _, s in chunks], axis=0),
    )
    acc_pooled = PolicyMetricsAccumulator(cfg)
    acc_pooled.update(big_ro, big_scen)

    a, b = acc_chunked.compute(), acc_pooled.compute()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-10, err_msg=k)


def test_eval_mode_agent_selection():
    """one_agent / two_agent / multi_agent selection semantics
    (policy_evaluator.py:308-459): one_agent picks the ego of an
    interesting pair, two_agent both, multi_agent caps at the threshold."""
    import random as pyrandom

    from ctrl_sim_tpu.config import load_config
    from ctrl_sim_tpu.data.synthetic import synthetic_scenario
    from ctrl_sim_tpu.evals.evaluator import select_vehicles_to_evaluate

    base = {
        "sim.max_agents": 8, "waymo.max_num_agents": 8, "sim.steps": 40,
        # synthetic goals never cluster at Waymo-scale thresholds
        "eval.interesting_goal_dist_threshold": 1000.0,
        "eval.interesting_traj_len_threshold": 20,
        "eval.interesting_timestep_diff_threshold": 5,
        "eval.multi_agent_eval_threshold": 3,
    }
    scene = synthetic_scenario(load_config(base), seed=1, num_agents=6)

    one = select_vehicles_to_evaluate(
        load_config({**base, "eval.eval_mode": "one_agent"}),
        scene, pyrandom.Random(0),
    )
    assert len(one) == 1

    two = select_vehicles_to_evaluate(
        load_config({**base, "eval.eval_mode": "two_agent"}),
        scene, pyrandom.Random(0),
    )
    assert len(two) == 2 and two[0] != two[1]
    # seeded: one_agent's pick is the ego of the same seeded pair
    assert one[0] == two[0]

    multi = select_vehicles_to_evaluate(
        load_config({**base, "eval.eval_mode": "multi_agent"}),
        scene, pyrandom.Random(0),
    )
    assert len(multi) == 3  # capped at the threshold
