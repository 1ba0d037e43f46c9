"""Parity vs EXECUTED reference code: the remaining numpy surface.

tests/goldens/reference_extra.npz was produced by running the reference's
own code in place (tools/make_reference_goldens_extra.py):
signed-distance-to-polyline (utils/data.py:152-290), compute_reward with
stub vehicles (utils/sim.py:83-141), BicycleModel.backward
(nocturne/bicycle_model.py:51-109), get_roads chunking
(datasets/rl_waymo/dataset.py:73-110), and the CTG++ dataset methods
(dataset_ctg_plus_plus.py:76-141). These tests pin our vectorized JAX/numpy
ports to those executed outputs.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu import geometry
from ctrl_sim_tpu.config import load_config
from ctrl_sim_tpu.data.ctg_pipeline import relative_encodings, select_agent_roads
from ctrl_sim_tpu.data.scenario import _chunk_roads
from ctrl_sim_tpu.env.dynamics import inverse_bicycle_action
from ctrl_sim_tpu.env.rewards import compute_reward8

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "reference_extra.npz")


@pytest.fixture(scope="module")
def g():
    if not os.path.exists(GOLDENS):
        pytest.skip("reference_extra.npz not generated")
    return np.load(GOLDENS)


# ---------------------------------------------------------------------------
# signed distance to polyline (utils/data.py:220-290)
# ---------------------------------------------------------------------------


def test_signed_distance_open_polyline(g):
    poly = g["sd_open_poly"]
    ours = geometry.signed_distance_to_polyline(
        jnp.asarray(g["sd_xys"]), jnp.asarray(poly), jnp.ones(len(poly), bool)
    )
    np.testing.assert_allclose(np.asarray(ours), g["sd_open"], atol=1e-6)


def test_signed_distance_cyclic_polyline(g):
    poly = g["sd_cyclic_poly"]
    ours = geometry.signed_distance_to_polyline(
        jnp.asarray(g["sd_xys"]), jnp.asarray(poly), jnp.ones(len(poly), bool)
    )
    np.testing.assert_allclose(np.asarray(ours), g["sd_cyclic"], atol=1e-6)


def test_signed_distance_multi_polyline(g):
    """compute_distance_to_road_edge: nearest-|d| signed distance over
    several polylines, [num_objects, num_steps] layout."""
    polys = [g["sd_open_poly"], g["sd_cyclic_poly"], g["sd_poly3"]]
    P = max(len(p) for p in polys)
    padded = np.zeros((len(polys), P, 2))
    valid = np.zeros((len(polys), P), bool)
    for i, p in enumerate(polys):
        padded[i, : len(p)] = p
        valid[i, : len(p)] = True
    xys = np.stack([g["sd_cx"], g["sd_cy"]], axis=-1).reshape(-1, 2)
    ours = geometry.signed_distance_to_polylines(
        jnp.asarray(xys), jnp.asarray(padded), jnp.asarray(valid)
    )
    # the reference wrapper returns the flattened per-query distances
    np.testing.assert_allclose(np.asarray(ours), g["sd_edge_multi"], atol=1e-5)


# ---------------------------------------------------------------------------
# compute_reward (utils/sim.py:83-141)
# ---------------------------------------------------------------------------


def test_compute_reward8_matches_executed_reference(g):
    reward8, achieved = compute_reward8(
        jnp.asarray(g["rew_states"]),
        jnp.asarray(g["rew_speeds"]),
        jnp.asarray(g["rew_headings"]),
        jnp.asarray(g["rew_goal_pos"]),
        jnp.asarray(g["rew_goal_speed"]),
        jnp.asarray(g["rew_goal_heading"]),
        jnp.asarray(g["rew_normalizers"]),
        jnp.asarray(g["rew_prev_achieved"]).astype(bool),
        jnp.asarray(g["rew_cveh"]).astype(bool),
        jnp.asarray(g["rew_cedge"]).astype(bool),
    )
    np.testing.assert_allclose(np.asarray(reward8), g["rew_reward8"], atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(achieved), g["rew_reward8"][:, 0] > 0
    )


# ---------------------------------------------------------------------------
# BicycleModel.backward (nocturne/bicycle_model.py:51-109)
# ---------------------------------------------------------------------------


def test_inverse_bicycle_matches_executed_reference(g):
    accel, steer = inverse_bicycle_action(
        jnp.asarray(g["bm_next_pos"]),
        jnp.asarray(g["bm_next_theta"]),
        jnp.asarray(g["bm_next_vel"]),
        jnp.asarray(g["bm_prev_pos"]),
        jnp.asarray(g["bm_prev_theta"]),
        jnp.asarray(g["bm_prev_vel"]),
        jnp.asarray(g["bm_lengths"]),
        float(g["bm_dt"]),
    )
    np.testing.assert_allclose(np.asarray(accel), g["bm_accel"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(steer), g["bm_steer"], atol=1e-5)
    # the C^2 >= 4 NaN branch resolved to steer = 0 in both
    assert g["bm_steer"][0] == 0.0


# ---------------------------------------------------------------------------
# get_roads chunking (datasets/rl_waymo/dataset.py:73-110)
# ---------------------------------------------------------------------------


def test_chunk_roads_matches_executed_reference(g):
    L = int(g["roads_L"])
    cfg = load_config({"waymo.max_num_road_pts_per_polyline": L})

    def pts(n, ox, oy):
        return [
            {"x": float(ox + i), "y": float(oy + np.sin(i / 3.0))}
            for i in range(n)
        ]

    roads_data = [
        {"type": "lane", "geometry": pts(int(L * 2.5), 0, 0)},
        {"type": "road_edge", "geometry": pts(L + 3, -10, 5)},
        {"type": "stop_sign", "geometry": {"x": 3.0, "y": -7.0}},
        {"type": "crosswalk", "geometry": pts(4, 8, 8)},
    ]
    final, types, edges = _chunk_roads(roads_data, cfg)
    np.testing.assert_allclose(final, g["roads_final"], atol=0)
    np.testing.assert_allclose(types, g["roads_types"], atol=0)
    assert len(edges) == int(g["roads_num_edges"])
    np.testing.assert_allclose(edges[0], g["roads_edge0"], atol=0)


# ---------------------------------------------------------------------------
# CTG++ dataset methods (dataset_ctg_plus_plus.py:76-141)
# ---------------------------------------------------------------------------


def _to13(agents10: np.ndarray) -> np.ndarray:
    """The reference methods read vel at 2:4, global pos at 5:7, yaw at 9 —
    our 13-d layout has local vel at 2:4 (same norm), global pos at 5:7,
    global yaw at 9. Build a 13-d array with those columns populated."""
    A, T, _ = agents10.shape
    out = np.zeros((A, T, 13))
    out[..., 2:4] = agents10[..., 2:4]
    out[..., 5:7] = agents10[..., 5:7]
    out[..., 9] = agents10[..., 9]
    return out


def test_ctg_relative_encodings(g):
    ours = relative_encodings(
        jnp.asarray(_to13(g["ctg_agents"])),
        jnp.asarray(_to13(g["ctg_present"])[:, 0]),
    )
    np.testing.assert_allclose(np.asarray(ours), g["ctg_rel_enc"], atol=1e-4)


def test_ctg_agent_road_crops(g):
    ag_last = g["ctg_ag_last"]
    road_points = g["ctg_roads_in"]
    road_types = g["ctg_road_types_in"]
    cap = 6

    rp, rt = select_agent_roads(
        jnp.asarray(ag_last[:, -1, :2]),
        jnp.asarray(ag_last[:, -1, -1]),
        jnp.asarray(road_points),
        jnp.asarray(road_types),
        jnp.ones(len(road_points), bool),
        cap,
    )
    np.testing.assert_allclose(np.asarray(rp), g["ctg_roads_big"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(rt), g["ctg_road_types_big"], atol=1e-6)

    # P <= cap branch: zero/-1 padding
    small = road_points[:3]
    rp2, rt2 = select_agent_roads(
        jnp.asarray(ag_last[:, -1, :2]),
        jnp.asarray(ag_last[:, -1, -1]),
        jnp.asarray(np.concatenate([small, np.zeros((cap - 3,) + small.shape[1:])])),
        jnp.asarray(
            np.concatenate([road_types[:3], np.zeros((cap - 3, 8))])
        ),
        jnp.asarray([True] * 3 + [False] * (cap - 3)),
        cap,
    )
    np.testing.assert_allclose(np.asarray(rp2), g["ctg_roads_small"], atol=1e-4)
    np.testing.assert_allclose(np.asarray(rt2), g["ctg_road_types_small"], atol=1e-6)


def test_split_matches_executed_reference(g):
    """split_val_test reproduces the reference's seeded shuffle bitwise
    (data/split_val_test.py:24-39: random.seed(2024) over sorted names)."""
    from ctrl_sim_tpu.data.export import split_val_test

    files = [str(x) for x in g["split_files"]]
    val, test = split_val_test(files, seed=2024, num_test=7)
    assert test == [str(x) for x in g["split_test"]]
    assert val == [str(x) for x in g["split_val"]]


def test_compute_reward8_legacy_collision_fix_off(g):
    """collision_fix=False merged-flag semantics (utils/sim.py:137-139 over
    the last-write-wins collision_type_, scenario.cc:294-327): an edge
    collision masks the veh-veh report. Our env applies veh_veh & ~veh_edge
    before compute_reward8 (env/env.py)."""
    if "rew_reward8_nofix" not in g.files:
        pytest.skip("regenerate reference_extra.npz")
    veh = jnp.asarray(g["rew_cveh"]).astype(bool)
    edge = jnp.asarray(g["rew_cedge"]).astype(bool)
    reward8, _ = compute_reward8(
        jnp.asarray(g["rew_states"]),
        jnp.asarray(g["rew_speeds"]),
        jnp.asarray(g["rew_headings"]),
        jnp.asarray(g["rew_goal_pos"]),
        jnp.asarray(g["rew_goal_speed"]),
        jnp.asarray(g["rew_goal_heading"]),
        jnp.asarray(g["rew_normalizers"]),
        jnp.asarray(g["rew_prev_achieved"]).astype(bool),
        veh & ~edge,  # the env's collision_fix=False transform
        edge,
    )
    np.testing.assert_allclose(
        np.asarray(reward8), g["rew_reward8_nofix"], atol=1e-6
    )
