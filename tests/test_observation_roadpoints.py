"""Road-point + stop-sign visible-state blocks vs a literal numpy port of
the C++ logic (scenario.cc:49-143 VisibleRoadPoints/NearestKRoadPoints,
:165-182 ExtractRoadPointFeature, :196-203 ExtractStopSignFeature,
view_field.cc:172-202 FilterVisiblePoints/FilterVisibleNonblockingObjects).

The port below follows the C++ control flow point-by-point (cone test,
sight-segment occlusion against visible blockers, road-edge-first
partition, nearest-K) on explicit Python loops; the vectorized jax
implementation must produce the same feature rows.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ctrl_sim_tpu.env.observation import (
    ROAD_EDGE_TYPE,
    STOP_SIGN_TYPE,
    road_point_features,
    stop_sign_features,
)
from ctrl_sim_tpu.geometry import obb_corners


def _normalize(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def _seg_rect_intersects(corners, p0, p1, n=64):
    """Segment-vs-OBB test by dense sampling + point-in-polygon — slow but
    unambiguous for the port (the jax side uses exact segment clipping; the
    fixtures avoid grazing contacts so both agree)."""
    ts = np.linspace(0.0, 1.0, n)
    pts = p0[None] * (1 - ts[:, None]) + p1[None] * ts[:, None]
    # point in convex quad via cross products
    c = np.asarray(corners)
    inside = np.ones(len(pts), bool)
    for i in range(4):
        a, b = c[i], c[(i + 1) % 4]
        cross = (b[0] - a[0]) * (pts[:, 1] - a[1]) - (b[1] - a[1]) * (
            pts[:, 0] - a[0]
        )
        inside &= cross >= 0
    if not inside.any():
        # winding might be clockwise
        inside = np.ones(len(pts), bool)
        for i in range(4):
            a, b = c[i], c[(i + 1) % 4]
            cross = (b[0] - a[0]) * (pts[:, 1] - a[1]) - (b[1] - a[1]) * (
                pts[:, 0] - a[0]
            )
            inside &= cross <= 0
    return bool(inside.any())


def _port_road_points(
    road_points, road_types, ego_pos, ego_heading, blockers, k,
    road_edge_first, view_dist, view_angle,
):
    """Literal port: collect (point, neighbor, type), filter, partition."""
    P, L, _ = road_points.shape
    entries = []
    for p in range(P):
        if road_types[p].max() <= 0:
            continue
        rtype = int(np.argmax(road_types[p]))
        if rtype == STOP_SIGN_TYPE:
            continue  # stop signs are static objects, not road points
        for i in range(L):
            if road_points[p, i, 2] <= 0:
                continue
            pos = road_points[p, i, :2]
            if i + 1 < L and road_points[p, i + 1, 2] > 0:
                nbr = road_points[p, i + 1, :2]
            else:
                nbr = pos  # last point neighbors itself (road.cc:58-59)
            entries.append((pos, nbr, rtype))

    visible = []
    for pos, nbr, rtype in entries:
        rel = pos - ego_pos
        dist = float(np.hypot(*rel))
        azim = _normalize(np.arctan2(rel[1], rel[0]) - ego_heading)
        if dist > view_dist or abs(azim) > view_angle / 2.0:
            continue  # FilterVisiblePoints: cone containment
        blocked = any(
            _seg_rect_intersects(bc, ego_pos, pos) for bc in blockers
        )
        if blocked:
            continue  # VisibleRoadPoints: sight segment crosses a blocker
        nvec = nbr - pos
        feat = np.zeros(13, np.float32)
        feat[0] = 1.0
        feat[1] = dist
        feat[2] = azim
        feat[3] = float(np.hypot(*nvec))
        feat[4] = _normalize(np.arctan2(nvec[1], nvec[0]) - ego_heading)
        feat[5 + rtype] = 1.0
        visible.append((dist, rtype, feat))

    if road_edge_first:
        edges = sorted(
            [v for v in visible if v[1] == ROAD_EDGE_TYPE], key=lambda v: v[0]
        )
        others = sorted(
            [v for v in visible if v[1] != ROAD_EDGE_TYPE], key=lambda v: v[0]
        )
        ordered = edges + others
    else:
        ordered = sorted(visible, key=lambda v: v[0])
    out = np.zeros((k, 13), np.float32)
    for j, (_, _, feat) in enumerate(ordered[:k]):
        out[j] = feat
    return out


def _scene():
    rng = np.random.default_rng(5)
    P, L = 6, 5
    road_points = np.zeros((P, L, 3), np.float32)
    road_types = np.zeros((P, 8), np.float32)
    # polyline 0: road edge crossing the cone
    road_points[0, :, 0] = np.linspace(5, 45, L)
    road_points[0, :, 1] = 3.0
    road_points[0, :, 2] = 1.0
    road_types[0, ROAD_EDGE_TYPE] = 1.0
    # polyline 1: lane, nearer than the edge
    road_points[1, :, 0] = np.linspace(2, 30, L)
    road_points[1, :, 1] = -1.0
    road_points[1, :, 2] = 1.0
    road_types[1, 1] = 1.0
    # polyline 2: lane behind the ego (outside the cone)
    road_points[2, :, 0] = np.linspace(-40, -10, L)
    road_points[2, :, 1] = 0.0
    road_points[2, :, 2] = 1.0
    road_types[2, 1] = 1.0
    # polyline 3: stop sign (degenerate, single valid point)
    road_points[3, 0] = [20.0, -6.0, 1.0]
    road_types[3, STOP_SIGN_TYPE] = 1.0
    # polyline 4: road line partially valid (pad tail)
    road_points[4, :3, 0] = np.linspace(10, 18, 3)
    road_points[4, :3, 1] = 8.0
    road_points[4, :3, 2] = 1.0
    road_types[4, 2] = 1.0
    # polyline 5: fully padded
    road_types[5, :] = -1.0
    return road_points, road_types


def test_road_points_match_numpy_port():
    road_points, road_types = _scene()
    ego_pos = np.zeros(2, np.float32)
    ego_heading = 0.0
    # one blocking vehicle between ego and the far end of the edge line
    bpos = jnp.asarray([[30.0, 3.0]])
    bhead = jnp.asarray([0.0])
    blen = jnp.asarray([6.0])
    bwid = jnp.asarray([3.0])
    corners = obb_corners(bpos, bhead, blen, bwid)  # [1, 4, 2]

    got = np.asarray(
        road_point_features(
            jnp.asarray(road_points), jnp.asarray(road_types),
            jnp.asarray(ego_pos), jnp.asarray(ego_heading),
            corners, jnp.asarray([True]),
            max_visible_road_points=12, road_edge_first=True,
        )
    )
    want = _port_road_points(
        road_points, road_types, ego_pos, ego_heading,
        [np.asarray(corners[0])], 12, True,
        view_dist=80.0, view_angle=np.pi * (120.0 / 180.0),
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    # sanity: the vehicle occludes at least one point — the visible SET
    # changes even when both fill all K slots
    all_vis = _port_road_points(
        road_points, road_types, ego_pos, ego_heading, [], 30, True,
        view_dist=80.0, view_angle=np.pi * (120.0 / 180.0),
    )
    assert all_vis[:, 0].sum() > want[:, 0].sum()


def test_road_points_edge_first_ordering():
    road_points, road_types = _scene()
    got = np.asarray(
        road_point_features(
            jnp.asarray(road_points), jnp.asarray(road_types),
            jnp.zeros(2), jnp.asarray(0.0),
            jnp.zeros((1, 4, 2)), jnp.asarray([False]),
            max_visible_road_points=20, road_edge_first=True,
        )
    )
    valid = got[:, 0] > 0
    types = np.argmax(got[valid, 5:], axis=-1)
    # every road-edge row before every non-edge row
    is_edge = types == ROAD_EDGE_TYPE
    if is_edge.any() and (~is_edge).any():
        assert is_edge[: is_edge.sum()].all()
    # nearest-first within each group
    d_edge = got[valid][is_edge, 1]
    d_other = got[valid][~is_edge, 1]
    assert np.all(np.diff(d_edge) >= -1e-5)
    assert np.all(np.diff(d_other) >= -1e-5)

    # road_edge_first=False: pure nearest-K
    got2 = np.asarray(
        road_point_features(
            jnp.asarray(road_points), jnp.asarray(road_types),
            jnp.zeros(2), jnp.asarray(0.0),
            jnp.zeros((1, 4, 2)), jnp.asarray([False]),
            max_visible_road_points=20, road_edge_first=False,
        )
    )
    d = got2[got2[:, 0] > 0, 1]
    assert np.all(np.diff(d) >= -1e-5)


def test_stop_signs():
    road_points, road_types = _scene()
    got = np.asarray(
        stop_sign_features(
            jnp.asarray(road_points), jnp.asarray(road_types),
            jnp.zeros(2), jnp.asarray(0.0), max_visible_stop_signs=4,
        )
    )
    assert got.shape == (4, 3)
    assert got[0, 0] == 1.0  # the one sign, in cone
    np.testing.assert_allclose(got[0, 1], np.hypot(20.0, 6.0), atol=1e-5)
    np.testing.assert_allclose(got[0, 2], np.arctan2(-6.0, 20.0), atol=1e-5)
    assert np.allclose(got[1:], 0.0)

    # facing away: sign leaves the cone
    got2 = np.asarray(
        stop_sign_features(
            jnp.asarray(road_points), jnp.asarray(road_types),
            jnp.zeros(2), jnp.asarray(np.pi), max_visible_stop_signs=4,
        )
    )
    assert np.allclose(got2, 0.0)
