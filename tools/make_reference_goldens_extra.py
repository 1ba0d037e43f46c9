"""Executed-reference goldens for the remaining pure-numpy surface.

Extends tests/goldens/reference_transforms.npz (tools/make_reference_goldens.py)
with a second fixture, tests/goldens/reference_extra.npz, produced by
EXECUTING the reference's own code in place:

  - _compute_signed_distance_to_polyline + compute_distance_to_road_edge
    (/root/reference/utils/data.py:152-290)
  - compute_reward with stub vehicle objects (/root/reference/utils/sim.py:83-141)
  - BicycleModel.backward (/root/reference/nocturne/bicycle_model.py:51-109)
  - RLWaymoDataset.get_roads chunking (/root/reference/datasets/rl_waymo/dataset.py:73-110)
  - CTG++ dataset methods: _prepare_relative_encodings,
    _get_agents_local_frame, select_indiv_agent_roads
    (/root/reference/datasets/rl_waymo/dataset_ctg_plus_plus.py:76-247)

No reference code is copied — the fixture holds inputs and numeric outputs.

Run (CPU, repo root):
    PYTHONPATH=. JAX_PLATFORMS=cpu python tools/make_reference_goldens_extra.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_reference_goldens import _Cfg, _import_reference_dataset  # noqa: E402

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                   "reference_extra.npz")


class _Vec:
    def __init__(self, x, y):
        self.x, self.y = x, y


class _CollisionType:
    """Mirror of nocturne CollisionType for the stub vehicles."""

    UNCOLLIDED = 0
    VEHICLE_VEHICLE = 1
    VEHICLE_ROAD = 2


class _StubVehicle:
    """Duck-types the pybind Vehicle attributes compute_reward reads."""

    def __init__(self, vid, x, y, speed, heading, cveh, cedge):
        self._id = vid
        self.position = _Vec(x, y)
        self.speed = speed
        self.heading = heading
        self.collision_type_veh = (
            _CollisionType.VEHICLE_VEHICLE if cveh else _CollisionType.UNCOLLIDED
        )
        self.collision_type_edge = (
            _CollisionType.VEHICLE_ROAD if cedge else _CollisionType.UNCOLLIDED
        )
        # merged-flag semantics: UpdateCollision checks edges AFTER
        # vehicles and collision_type_ is last-write-wins
        # (scenario.cc:294-327, object_base.h:55-63) -> edge wins
        if cedge:
            self.collision_type = _CollisionType.VEHICLE_ROAD
        elif cveh:
            self.collision_type = _CollisionType.VEHICLE_VEHICLE
        else:
            self.collision_type = _CollisionType.UNCOLLIDED

    def getID(self):
        return self._id


REW_CFG = {
    # cfgs/config.yaml nocturne.rew_cfg
    "shared_reward": False,
    "goal_tolerance": 0.5,
    "reward_scaling": 1.0,
    "collision_penalty": 0,
    "shaped_goal_distance_scaling": 0.2,
    "shaped_goal_distance": True,
    "goal_distance_penalty": False,
    "position_target": True,
    "position_target_tolerance": 1.0,
    "speed_target": True,
    "speed_target_tolerance": 1.0,
    "heading_target": True,
    "heading_target_tolerance": 0.3,
}


def golden_signed_distance(out, rng):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_utils_data", os.path.join(REF, "utils/data.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # open polyline (CCW-ish), cyclic polyline, queries straddling both
    open_poly = np.array(
        [[-30.0, -5.0], [-10.0, -4.0], [0.0, 0.0], [15.0, 2.0], [30.0, 10.0]]
    )
    theta = np.linspace(0, 2 * np.pi, 17)[:-1]
    cyclic = np.stack([20 * np.cos(theta), 20 * np.sin(theta)], axis=-1)
    cyclic = np.concatenate([cyclic, cyclic[:1] + 1e-4], axis=0)  # closes
    xys = rng.uniform(-35, 35, (40, 2))
    # include points near vertices/endpoints (the convexity-aware sign branch)
    xys = np.concatenate([xys, open_poly + 0.3, open_poly - 0.3], axis=0)

    out["sd_open_poly"] = open_poly
    out["sd_cyclic_poly"] = cyclic
    out["sd_xys"] = xys
    out["sd_open"] = mod._compute_signed_distance_to_polyline(xys, open_poly)
    out["sd_cyclic"] = mod._compute_signed_distance_to_polyline(xys, cyclic)

    # full wrapper over multiple polylines: [num_objects, num_steps]
    cx = rng.uniform(-35, 35, (3, 7))
    cy = rng.uniform(-35, 35, (3, 7))
    polys = [open_poly, cyclic, open_poly[::-1] + np.array([5.0, 40.0])]
    out["sd_cx"], out["sd_cy"] = cx, cy
    out["sd_edge_multi"] = mod.compute_distance_to_road_edge(cx, cy, polys)
    # keep the third polyline (reversed winding) for the test
    out["sd_poly3"] = polys[2]


def golden_compute_reward(out, rng):
    # utils.sim reads nocturne.CollisionType at call time; swap the stubbed
    # enum for a real one on the already-imported package module
    sys.modules["nocturne"].CollisionType = _CollisionType
    import importlib

    sim_mod = importlib.import_module("utils.sim")

    n = 24
    states = rng.uniform(-40, 40, (n, 2))
    speeds = rng.uniform(0, 20, n)
    headings = rng.uniform(-np.pi, np.pi, n)
    goal_pos = states + rng.normal(0, 2.0, (n, 2))  # some within 1 m tolerance
    goal_speed = speeds + rng.normal(0, 1.0, n)
    goal_heading = headings + rng.normal(0, 0.4, n)
    normalizers = rng.uniform(0, 60, n)
    normalizers[0] = 0.0  # the ==0 -> 1.0 branch
    cveh = rng.integers(0, 2, n)
    cedge = rng.integers(0, 2, n)
    prev_achieved = rng.integers(0, 2, n)

    rewards = []
    rewards_old = []
    for i in range(n):
        veh = _StubVehicle(
            i, states[i, 0], states[i, 1], speeds[i], headings[i],
            cveh[i], cedge[i],
        )
        goal_dict = {
            "pos": goal_pos[i], "speed": goal_speed[i],
            "heading": goal_heading[i],
        }
        vdd = {i: {"reward": [[float(prev_achieved[i])]]}}
        rewards.append(
            sim_mod.compute_reward(
                REW_CFG, veh, goal_dict, normalizers[i], vdd, collision_fix=True
            )
        )
        rewards_old.append(
            sim_mod.compute_reward(
                REW_CFG, veh, goal_dict, normalizers[i], vdd,
                collision_fix=False,
            )
        )
    out["rew_states"] = states
    out["rew_speeds"] = speeds
    out["rew_headings"] = headings
    out["rew_goal_pos"] = goal_pos
    out["rew_goal_speed"] = goal_speed
    out["rew_goal_heading"] = goal_heading
    out["rew_normalizers"] = normalizers
    out["rew_cveh"] = cveh
    out["rew_cedge"] = cedge
    out["rew_prev_achieved"] = prev_achieved
    out["rew_reward8"] = np.array(rewards, dtype=np.float64)
    out["rew_reward8_nofix"] = np.array(rewards_old, dtype=np.float64)


def golden_bicycle_backward(out, rng):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_bicycle", os.path.join(REF, "nocturne/bicycle_model.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n = 64
    dt = 0.1
    prev_pos = rng.uniform(-50, 50, (n, 2))
    prev_theta = rng.uniform(-np.pi, np.pi, n)
    prev_vel = rng.uniform(0, 25, n)
    next_pos = prev_pos + rng.normal(0, 1.5, (n, 2))
    next_theta = prev_theta + rng.normal(0, 0.3, n)
    next_vel = np.abs(prev_vel + rng.normal(0, 2.0, n))
    # include the C^2 >= 4 NaN branch: a huge heading jump at tiny speed
    next_theta[0] = prev_theta[0] + 3.0
    prev_vel[0] = next_vel[0] = 0.01
    lengths = rng.uniform(3.5, 5.5, n)

    accels, steers = [], []
    for i in range(n):
        bm = mod.BicycleModel(
            x=next_pos[i, 0], y=next_pos[i, 1], theta=next_theta[i],
            vel=next_vel[i], L=lengths[i], dt=dt,
        )
        a, s, _, _ = bm.backward(
            prev_pos=prev_pos[i], prev_theta=prev_theta[i], prev_vel=prev_vel[i]
        )
        accels.append(a)
        steers.append(s)
    out["bm_prev_pos"] = prev_pos
    out["bm_prev_theta"] = prev_theta
    out["bm_prev_vel"] = prev_vel
    out["bm_next_pos"] = next_pos
    out["bm_next_theta"] = next_theta
    out["bm_next_vel"] = next_vel
    out["bm_lengths"] = lengths
    out["bm_dt"] = np.float64(dt)
    out["bm_accel"] = np.array(accels)
    out["bm_steer"] = np.array(steers)


def golden_get_roads(out, rng, ds):
    L = ds.cfg_dataset.max_num_road_pts_per_polyline  # 100 default? (we set small)
    # build a roads_data list: a long lane (2.5 chunks), a road_edge,
    # a stop sign (dict geometry), a crosswalk shorter than one chunk
    def pts(n, ox, oy):
        return [
            {"x": float(ox + i), "y": float(oy + np.sin(i / 3.0))} for i in range(n)
        ]

    roads_data = [
        {"type": "lane", "geometry": pts(int(L * 2.5), 0, 0)},
        {"type": "road_edge", "geometry": pts(L + 3, -10, 5)},
        {"type": "stop_sign", "geometry": {"x": 3.0, "y": -7.0}},
        {"type": "crosswalk", "geometry": pts(4, 8, 8)},
    ]
    final_roads, final_types, edges = ds.get_roads({"roads": roads_data})
    out["roads_final"] = final_roads
    out["roads_types"] = final_types
    out["roads_edge0"] = edges[0]
    out["roads_num_edges"] = np.int64(len(edges))
    # stash the generator params so the test can rebuild roads_data
    out["roads_L"] = np.int64(L)


def golden_ctg(out, rng, base_mod):
    """CTG++ dataset methods on synthetic 10-d agent arrays.

    State layout (dataset_ctg_plus_plus.py): [..., 10] with vel at 2:4,
    pos at 5:7, yaw at 9 (indices read by the methods under test).
    """
    import importlib.util

    # dataset_ctg_plus_plus imports datasets.rl_waymo.dataset; alias the
    # already-loaded base module under that name (the installed HuggingFace
    # `datasets` package would otherwise shadow the reference's directory)
    pkg = types.ModuleType("datasets")
    pkg.__path__ = []
    sys.modules["datasets"] = pkg
    rlw = types.ModuleType("datasets.rl_waymo")
    rlw.__path__ = []
    sys.modules["datasets.rl_waymo"] = rlw
    sys.modules["datasets.rl_waymo.dataset"] = base_mod
    rlw.dataset = base_mod
    pkg.rl_waymo = rlw

    spec = importlib.util.spec_from_file_location(
        "_ref_ctg_dataset",
        os.path.join(REF, "datasets/rl_waymo/dataset_ctg_plus_plus.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ds = mod.RLWaymoDatasetCTGPlusPlus.__new__(mod.RLWaymoDatasetCTGPlusPlus)
    cfg = _Cfg()
    cfg.max_num_road_polylines = 6
    cfg.max_num_road_pts_per_polyline = 10
    ds.cfg_dataset = cfg

    A, T = 5, 8
    agents = np.zeros((A, T, 10))
    agents[..., 2:4] = rng.uniform(-10, 10, (A, T, 2))
    agents[..., 5:7] = rng.uniform(-50, 50, (A, T, 2))
    agents[..., 9] = rng.uniform(-np.pi, np.pi, (A, T))
    present = agents[:, -1:].copy()  # "present" = last input step

    out["ctg_agents"] = agents
    out["ctg_present"] = present
    out["ctg_rel_enc"] = ds._prepare_relative_encodings(agents, present)

    # per-agent road crops, both branches (P > cap and P <= cap)
    P_big, P_small, L = 9, 3, cfg.max_num_road_pts_per_polyline
    road_points = np.concatenate(
        [rng.uniform(-60, 60, (P_big, L, 2)), np.ones((P_big, L, 1))], axis=-1
    )
    road_points[-1, 4:, -1] = 0.0
    road_types = np.eye(8)[rng.integers(0, 8, P_big)]
    ag_last = np.zeros((A, T, 8))
    ag_last[..., :2] = agents[..., 5:7]
    ag_last[..., -1] = 1.0
    ag_last[3, :, -1] = 0.0  # one dead agent exercises the existence mask
    fr, ft = ds.select_indiv_agent_roads(ag_last, road_points, road_types)
    out["ctg_roads_in"] = road_points
    out["ctg_road_types_in"] = road_types
    out["ctg_ag_last"] = ag_last
    out["ctg_roads_big"] = fr
    out["ctg_road_types_big"] = ft
    fr2, ft2 = ds.select_indiv_agent_roads(
        ag_last, road_points[:P_small], road_types[:P_small]
    )
    out["ctg_roads_small"] = fr2
    out["ctg_road_types_small"] = ft2


def golden_split(out):
    """The reference's seeded val/test split recipe, executed literally
    (data/split_val_test.py:24-39): random.seed(2024); shuffle indices of
    the sorted filename list; first 2500 (here 7) are the test set."""
    import random as _random

    files = sorted(f"scene_{i:04d}.json" for i in range(23))
    _random.seed(2024)
    file_ids = list(np.arange(len(files)))
    _random.shuffle(file_ids)
    test_ids = file_ids[:7]
    val_ids = file_ids[7:]
    out["split_files"] = np.array(files)
    out["split_test"] = np.array([files[i] for i in test_ids])
    out["split_val"] = np.array([files[i] for i in val_ids])


def main() -> None:
    mod = _import_reference_dataset()
    ds = mod.RLWaymoDataset.__new__(mod.RLWaymoDataset)
    cfg = _Cfg()
    cfg.max_num_road_pts_per_polyline = 12  # small chunks exercise the loop
    ds.cfg_dataset = cfg
    ds.split_name = "eval"

    rng = np.random.default_rng(4321)
    out: dict[str, np.ndarray] = {}
    golden_signed_distance(out, rng)
    golden_compute_reward(out, rng)
    golden_bicycle_backward(out, rng)
    golden_get_roads(out, rng, ds)
    golden_ctg(out, rng, mod)
    golden_split(out)

    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {os.path.abspath(OUT)} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
