"""Generate artifact-level parity goldens by EXECUTING the reference's own
numpy transform code (/root/reference/datasets/rl_waymo/dataset.py:186-428)
on deterministic synthetic inputs, and recording its outputs to
tests/goldens/reference_transforms.npz.

This imports the reference module in place (read-only) with its heavy
dependencies stubbed (torch_geometric/hydra/etc. are only needed for the
Dataset base class, not for the pure-numpy methods under test). NO reference
code is copied into this repository — the fixture file holds inputs and the
reference's numeric outputs only.

Run (CPU, repo root):
    PYTHONPATH=. JAX_PLATFORMS=cpu python tools/make_reference_goldens.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                   "reference_transforms.npz")


def _stub(name: str, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _import_reference_dataset():
    # stub the imports dataset.py pulls in but the numpy methods never use
    hy = _stub("hydra", compose=lambda *a, **k: None,
               initialize=lambda *a, **k: None,
               main=lambda *a, **k: (lambda f: f))
    hy.__path__ = []
    _stub("hydra.core")
    sys.modules["hydra.core"].__path__ = []
    _stub(
        "hydra.core.global_hydra",
        GlobalHydra=type("GlobalHydra", (), {
            "instance": classmethod(lambda cls: type("GH", (), {
                "clear": staticmethod(lambda: None)
            })())
        }),
    )
    _stub("torch_scatter")
    _stub("omegaconf", OmegaConf=type("OmegaConf", (), {}))
    _stub("pyvirtualdisplay", Display=type("Display", (), {}))
    _stub("moviepy")
    sys.modules["moviepy"].__path__ = []
    _stub("moviepy.editor", ImageSequenceClip=object)
    tg = _stub("torch_geometric")
    tg.__path__ = []
    tg_data = _stub("torch_geometric.data", Dataset=object, HeteroData=object)
    tg_data.__path__ = []
    _stub(
        "torch_geometric.data.storage",
        BaseStorage=object, EdgeStorage=object, NodeStorage=object,
    )
    tg_loader = _stub("torch_geometric.loader", DataLoader=object)
    tg.data = tg_data
    tg.loader = tg_loader

    # utils/__init__.py drags in utils.sim -> nocturne -> the compiled
    # nocturne_cpp extension; stub it (never touched by the numpy methods)
    class _AnyModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            return type(name, (), {})

    sys.modules["nocturne_cpp"] = _AnyModule("nocturne_cpp")
    sys.path.insert(0, REF)
    # load by file path: the installed HuggingFace `datasets` package shadows
    # the reference's (init-less) datasets/ directory
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_rl_waymo_dataset", os.path.join(REF, "datasets/rl_waymo/dataset.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Cfg:
    """cfgs/dataset/waymo/base.yaml constants (must mirror the repo's
    WaymoDatasetConfig defaults — asserted by the golden test)."""

    max_veh_veh_distance = 15.0
    dist_to_road_edge_scaling_factor = 15.0
    remove_shaped_goal = True
    remove_shaped_veh_reward = False
    remove_shaped_edge_reward = False
    pos_target_achieved_rew_multiplier = 10.0
    pos_goal_shaped_min = 0.0
    pos_goal_shaped_max = 0.2
    veh_veh_collision_rew_multiplier = 10.0
    veh_edge_collision_rew_multiplier = 10.0
    agent_dist_threshold = 60.0
    max_num_agents = 4
    max_num_road_polylines = 6
    accel_discretization = 20
    steer_discretization = 50
    rtg_discretization = 350
    min_accel, max_accel = -10.0, 10.0
    min_steer, max_steer = -0.7, 0.7
    min_rtg_pos, max_rtg_pos = 0.0, 10.0
    min_rtg_veh, max_rtg_veh = -10.0, 90.0
    min_rtg_road, max_rtg_road = -10.0, 90.0
    goal_dim = 5


def main() -> None:
    mod = _import_reference_dataset()
    ds = mod.RLWaymoDataset.__new__(mod.RLWaymoDataset)
    ds.cfg_dataset = _Cfg()
    ds.split_name = "eval"  # no shuffle: deterministic slot order

    rng = np.random.default_rng(1234)
    A, T, L, P = 5, 12, 8, 9  # P > max_num_road_polylines exercises the crop

    # agent states (x, y, vx, vy, yaw, L, W, existence)
    ag = np.zeros((A, T, 8))
    ag[..., :2] = rng.uniform(-50, 50, (A, T, 2))
    ag[..., 2:4] = rng.uniform(-10, 10, (A, T, 2))
    ag[..., 4] = rng.uniform(-np.pi, np.pi, (A, T))
    ag[..., 5] = rng.uniform(3, 5, (A, T))
    ag[..., 6] = rng.uniform(1.5, 2.5, (A, T))
    exist = np.ones((A, T))
    exist[3, 8:] = 0.0  # one agent dies
    exist[4, :] = 0.0  # one agent never exists
    ag[..., 7] = exist

    rewards8 = rng.uniform(-1, 1, (A, T, 8))
    rewards8[..., 0] = rng.integers(0, 2, (A, T))  # pos achieved bit
    rewards8[..., 6] = rng.integers(0, 2, (A, T))  # veh-veh collision bit
    rewards8[..., 7] = rng.integers(0, 2, (A, T))  # veh-edge collision bit
    veh_edge_dist = rng.uniform(-2, 2, (A, T))

    actions = rng.uniform(-12, 12, (A, T, 2))
    actions[..., 1] = rng.uniform(-0.9, 0.9, (A, T))
    rtgs_norm = rng.uniform(0, 1, (A, T, 3))
    action_bins = rng.integers(0, 1000, (A, T))
    rtg_bins = rng.integers(0, 350, (A, T, 3))

    road_points = np.concatenate(
        [rng.uniform(-80, 80, (P, L, 2)), np.ones((P, L, 1))], axis=-1
    )
    road_points[-2:, 5:, -1] = 0.0  # some invalid points
    road_types = np.eye(8)[rng.integers(0, 8, P)]
    goals = rng.uniform(-50, 50, (A, 5))

    out = {}
    # --- nearest-vehicle distance reward streams (dataset.py:202-238) ------
    out["veh_veh_dist"] = ds.compute_dist_to_nearest_vehicle_rewards(
        ag.copy(), normalize=True
    )
    out["veh_veh_dist_raw"] = ds.compute_dist_to_nearest_vehicle_rewards(
        ag.copy(), normalize=False
    )
    # --- 5-component reward aggregation (dataset.py:240-275) ---------------
    out["rewards5"] = ds.compute_rewards(
        ag.copy(), rewards8.copy(), veh_edge_dist.copy(), out["veh_veh_dist"].copy()
    )
    cfg2 = _Cfg()
    cfg2.remove_shaped_goal = False
    cfg2.remove_shaped_veh_reward = True
    cfg2.remove_shaped_edge_reward = True
    ds.cfg_dataset = cfg2
    out["rewards5_shaped_goal"] = ds.compute_rewards(
        ag.copy(), rewards8.copy(), veh_edge_dist.copy(), out["veh_veh_dist"].copy()
    )
    ds.cfg_dataset = _Cfg()

    # --- action / rtg (un)discretization (dataset.py:322-387) --------------
    out["disc_actions"] = ds.discretize_actions(actions.copy())
    out["undisc_actions"] = ds.undiscretize_actions(action_bins.copy())
    out["disc_rtgs"] = ds.discretize_rtgs(rtgs_norm.copy())
    out["undisc_rtgs"] = ds.undiscretize_rtgs(rtg_bins.copy())
    out["tilt_logits"] = ds.get_tilt_logits(1.5, -2.0, 0.5)

    # --- normalize_scene, P > cap branch (dataset.py:390-428) --------------
    n_ag, n_rp, n_rt, n_goals = ds.normalize_scene(
        ag.copy(), road_points.copy(), road_types.copy(), goals.copy(),
        origin_agent_idx=1,
    )
    out["norm_agent_states"] = n_ag
    out["norm_road_points"] = n_rp
    out["norm_road_types"] = n_rt
    out["norm_goals"] = n_goals
    # P <= cap branch (zero/-1 padding)
    n_ag2, n_rp2, n_rt2, n_goals2 = ds.normalize_scene(
        ag.copy(), road_points[:3].copy(), road_types[:3].copy(), goals.copy(),
        origin_agent_idx=0,
    )
    out["norm_road_points_small"] = n_rp2
    out["norm_road_types_small"] = n_rt2

    # --- select_relevant_agents, eval mode (dataset.py:278-319) ------------
    types_oh = np.eye(5)[rng.integers(0, 5, A)]
    moving = rng.integers(0, 2, A).astype(float)
    (s_states, s_types, s_actions, s_rtgs, s_goals, s_moving, new_origin) = (
        ds.select_relevant_agents(
            ag.copy(), types_oh.copy(), actions.copy(), rtgs_norm.copy(),
            goals.copy(), origin_agent_idx=1, timestep=0,
            moving_agent_mask=moving.copy(),
        )
    )
    out["sel_states"] = s_states
    out["sel_types"] = s_types
    out["sel_actions"] = s_actions
    out["sel_rtgs"] = s_rtgs
    out["sel_goals"] = s_goals
    out["sel_moving"] = s_moving
    out["sel_new_origin"] = np.asarray(new_origin)

    inputs = dict(
        ag=ag, rewards8=rewards8, veh_edge_dist=veh_edge_dist, actions=actions,
        rtgs_norm=rtgs_norm, action_bins=action_bins, rtg_bins=rtg_bins,
        road_points=road_points, road_types=road_types, goals=goals,
        types_oh=types_oh, moving=moving,
    )
    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    np.savez_compressed(OUT, **{f"in_{k}": v for k, v in inputs.items()},
                        **{f"out_{k}": v for k, v in out.items()})
    print(f"wrote {os.path.abspath(OUT)} ({len(inputs)} inputs, {len(out)} outputs)")


if __name__ == "__main__":
    main()
