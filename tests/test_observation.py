"""Visibility cone / ego observation tests."""

import jax.numpy as jnp
import numpy as np

from ctrl_sim_tpu.env.observation import (
    ego_state,
    flattened_visible_state,
    visible_objects_mask,
)


def _scene():
    # ego at origin facing +x; one car ahead, one behind, one far,
    # one hidden directly behind the first
    positions = jnp.asarray(
        [[0.0, 0.0], [20.0, 0.0], [-20.0, 0.0], [500.0, 0.0], [40.0, 0.0]],
        jnp.float32,
    )
    headings = jnp.zeros(5)
    lengths = jnp.full(5, 4.5)
    widths = jnp.full(5, 2.0)
    exists = jnp.ones(5, bool)
    return positions, headings, lengths, widths, exists


def test_cone_and_occlusion():
    positions, headings, lengths, widths, exists = _scene()
    vis = visible_objects_mask(
        positions, headings, lengths, widths, exists, ego_index=0,
        view_dist=80.0, view_angle=np.pi * 2 / 3,
    )
    vis = np.asarray(vis)
    assert vis[1]  # ahead, in cone
    assert not vis[2]  # behind: outside the 120deg cone
    assert not vis[3]  # beyond view_dist
    # car 4 sits directly behind car 1: center line of sight blocked, but
    # outer corners may peek — accept either, just require ego invisible
    assert not vis[0]


def test_occlusion_blocks_fully_hidden():
    # wide truck right in front; small car exactly behind it
    positions = jnp.asarray([[0.0, 0.0], [10.0, 0.0], [15.0, 0.0]], jnp.float32)
    headings = jnp.asarray([0.0, jnp.pi / 2, 0.0])  # truck sideways
    lengths = jnp.asarray([4.0, 20.0, 1.0])  # long truck spans laterally
    widths = jnp.asarray([2.0, 2.0, 0.5])
    exists = jnp.ones(3, bool)
    vis = np.asarray(
        visible_objects_mask(
            positions, headings, lengths, widths, exists, ego_index=0,
            view_dist=80.0, view_angle=np.pi,
        )
    )
    assert vis[1]
    assert not vis[2]  # fully occluded by the sideways truck


def test_ego_state_and_flattened():
    positions, headings, lengths, widths, exists = _scene()
    es = np.asarray(
        ego_state(
            positions[0], headings[0], jnp.float32(5.0), lengths[0], widths[0],
            jnp.asarray([10.0, 10.0]),
        )
    )
    assert abs(es[0] - 5.0) < 1e-6
    assert abs(es[1] - np.sqrt(200.0)) < 1e-4
    assert abs(es[2] - np.pi / 4) < 1e-5

    vis = visible_objects_mask(
        positions, headings, lengths, widths, exists, ego_index=0
    )
    speeds = jnp.asarray([5.0, 3.0, 2.0, 1.0, 4.0])
    feats = np.asarray(
        flattened_visible_state(
            positions, headings, speeds, lengths, widths, vis, 0,
            max_visible_objects=4,
        )
    )
    assert feats.shape == (4, 8)
    valid_rows = feats[:, 0] > 0
    # nearest visible first
    if valid_rows.sum() >= 2:
        d = feats[valid_rows, 1]
        assert np.all(np.diff(d) >= -1e-5)
    # invalid rows zeroed
    assert np.allclose(feats[~valid_rows], 0.0)


def test_observation_replay_stream():
    """observation_replay: the product consumer of WaymoEnv.observe — a
    jitted GT-replay scan emitting the fixed-shape observation stream."""
    import dataclasses

    import jax

    from ctrl_sim_tpu.config import load_config
    from ctrl_sim_tpu.data import stack_scenarios, synthetic_scenario
    from ctrl_sim_tpu.data.scenario import Scenario
    from ctrl_sim_tpu.env.gym import observation_replay

    cfg = load_config({
        "sim.steps": 10, "sim.max_agents": 5,
        "waymo.max_num_agents": 5,
        "waymo.max_num_road_polylines": 12,
        "waymo.max_num_road_pts_per_polyline": 20,
    })
    scenes = [synthetic_scenario(cfg, seed=s, num_agents=4, arena_half=40.0,
              num_lanes=2) for s in range(2)]
    d = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in dataclasses.asdict(stack_scenarios(scenes, cfg)).items()}
    d["name"] = ""
    sb = Scenario(**d)

    ego = jnp.zeros(2, jnp.int32)
    obs, traj = jax.jit(
        lambda s, e: observation_replay(cfg, s, e, max_visible_objects=4,
                                        max_visible_road_points=24)
    )(sb, ego)

    assert obs["ego_state"].shape == (10, 2, 5)
    assert obs["visible_objects"].shape == (10, 2, 4, 13)
    assert obs["road_points"].shape == (10, 2, 24, 13)
    assert obs["stop_signs"].shape == (10, 2, 4, 3)
    assert obs["visible_mask"].shape == (10, 2, 5)
    assert np.isfinite(np.asarray(obs["ego_state"])).all()
    assert np.isfinite(np.asarray(traj["position"])).all()
    # the ego always sees itself excluded but some neighbor at t=0
    assert np.asarray(obs["visible_mask"])[0].sum() > 0
