"""Rasterized feature images (viz.feature_image — the numpy analog of
Scenario::Image / EgoVehicleFeaturesImage, scenario.cc:742-780/:849-886)."""

import numpy as np

from ctrl_sim_tpu.config import load_config
from ctrl_sim_tpu.data import synthetic_scenario
from ctrl_sim_tpu.viz import feature_image


def _scene():
    cfg = load_config({
        "sim.max_agents": 6, "waymo.max_num_agents": 6,
        "waymo.max_num_road_polylines": 12,
        "waymo.max_num_road_pts_per_polyline": 20,
    })
    return synthetic_scenario(cfg, seed=0, num_agents=4, arena_half=60.0,
                              num_lanes=3)


def test_whole_scene_image():
    sc = _scene()
    pos = sc.traj_position[:, 0]
    hd = sc.traj_heading[:, 0]
    alive = sc.agent_valid & sc.traj_valid[:, 0]
    img = feature_image(sc, pos, hd, alive, ego_index=None, img_size=128)
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    # roads and vehicles drew something
    assert (img > 0).any()
    assert (img == 235).any()  # vehicle fill


def test_ego_centric_rotation():
    """The ego box sits at the canvas center and, with rotate_with_ego, its
    heading points up — the image content must be heading-invariant up to
    that rotation (sample: the ego pixel block is centered either way)."""
    sc = _scene()
    pos = sc.traj_position[:, 0].copy()
    hd = sc.traj_heading[:, 0].copy()
    alive = sc.agent_valid & sc.traj_valid[:, 0]
    size = 160
    for ang in (0.0, 1.3):
        hd2 = hd.copy()
        hd2[0] = ang
        img = feature_image(sc, pos, hd2, alive, ego_index=0, img_size=size,
                            view_dist=40.0, rotate_with_ego=True)
        blue = np.argwhere((img[..., 2] > 200) & (img[..., 0] < 100))
        assert len(blue) > 0, "ego box missing"
        center = blue.mean(0)
        assert np.abs(center - (size - 1) / 2).max() < 3.0, center
        # rotated view: the ego box is longer vertically than horizontally
        h_extent = blue[:, 0].max() - blue[:, 0].min()
        w_extent = blue[:, 1].max() - blue[:, 1].min()
        assert h_extent > w_extent


def test_goals_drawn():
    sc = _scene()
    pos = sc.traj_position[:, 0]
    hd = sc.traj_heading[:, 0]
    alive = sc.agent_valid & sc.traj_valid[:, 0]
    a = feature_image(sc, pos, hd, alive, ego_index=None, draw_goals=False)
    b = feature_image(sc, pos, hd, alive, ego_index=None, draw_goals=True)
    assert (a != b).any()
