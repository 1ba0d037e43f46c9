"""Geometry kernel tests.

Golden values come from re-implementing the reference formulas in numpy
(the same approach the reference's C++ tests use — e.g. object_test.cc:24-33
re-implements the bicycle model inside the test)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu import geometry as geo


def _np_angle_sub(current, target):
    # reference: utils/geometry.py:3-12
    diff = (target - current) % (2 * np.pi)
    if diff > np.pi:
        diff = -(2 * np.pi - diff)
    return diff


class TestAngles:
    @pytest.mark.parametrize(
        "cur,tgt",
        [(0.0, 0.1), (3.0, -3.0), (-3.1, 3.1), (0.5, 0.5), (np.pi, -np.pi), (2.0, 5.0)],
    )
    def test_angle_sub_matches_reference(self, cur, tgt):
        got = float(geo.angle_sub(jnp.float32(cur), jnp.float32(tgt)))
        want = _np_angle_sub(cur, tgt)
        assert abs(got - want) < 1e-5

    def test_normalize_angle_range(self):
        angles = jnp.linspace(-10, 10, 101)
        out = geo.normalize_angle(angles)
        assert jnp.all(out <= jnp.pi + 1e-6)
        assert jnp.all(out > -jnp.pi - 1e-6)
        # equivalence mod 2pi
        assert jnp.allclose(jnp.cos(out), jnp.cos(angles), atol=1e-5)
        assert jnp.allclose(jnp.sin(out), jnp.sin(angles), atol=1e-5)


class TestSE2:
    def test_apply_se2_matches_reference(self):
        # reference: utils/geometry.py:36-47
        rng = np.random.default_rng(0)
        coords = rng.normal(size=(5, 7, 2)).astype(np.float32)
        translation = rng.normal(size=(1, 1, 2)).astype(np.float32)
        yaw = 0.7

        def np_apply(coordinates, translation, yaw):
            coordinates = coordinates - translation
            c, s = np.cos(yaw), np.sin(yaw)
            transform = np.array([[c, -s], [s, c]])
            shape = coordinates.shape
            return np.dot(transform, coordinates.reshape(-1, 2).T).T.reshape(shape)

        want = np_apply(coords, translation, yaw)
        got = geo.apply_se2(jnp.asarray(coords), jnp.asarray(translation), jnp.float32(yaw))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


class TestOBB:
    def test_corners_ccw(self):
        c = geo.obb_corners(
            jnp.array([1.0, 2.0]), jnp.float32(0.3), jnp.float32(4.0), jnp.float32(2.0)
        )
        assert c.shape == (4, 2)
        # CCW: positive polygon area via shoelace
        x, y = c[:, 0], c[:, 1]
        area = 0.5 * jnp.sum(x * jnp.roll(y, -1) - jnp.roll(x, -1) * y)
        assert float(area) > 0
        assert abs(float(area) - 8.0) < 1e-4

    def test_obb_obb_overlap_cases(self):
        mk = lambda px, py, h, l, w: geo.obb_corners(
            jnp.array([px, py]), jnp.float32(h), jnp.float32(l), jnp.float32(w)
        )
        a = mk(0, 0, 0.0, 4, 2)
        # overlapping
        assert bool(geo.obb_obb_intersects(a, mk(1.0, 0.5, 0.3, 4, 2)))
        # far apart
        assert not bool(geo.obb_obb_intersects(a, mk(10.0, 0.0, 0.0, 4, 2)))
        # close but separated diagonally
        assert not bool(geo.obb_obb_intersects(a, mk(4.0, 2.5, 0.0, 4, 2)))
        # touching edge-to-edge counts as colliding (strict separation test)
        assert bool(geo.obb_obb_intersects(a, mk(4.0, 0.0, 0.0, 4, 2)))
        # rotated corner overlap
        assert bool(geo.obb_obb_intersects(a, mk(2.6, 1.2, 0.8, 4, 2)))

    def test_obb_obb_randomized_vs_shapely_free_sat(self):
        # brute-force SAT reference in numpy with strict separation
        rng = np.random.default_rng(1)

        def np_sat(ca, cb):
            def separates(edges_from, other):
                for i in range(4):
                    e0 = edges_from[i]
                    d = edges_from[(i + 1) % 4] - e0
                    cross = (other[:, 0] - e0[0]) * d[1] - (other[:, 1] - e0[1]) * d[0]
                    if np.all(cross > 0):
                        return True
                return False

            return not (separates(ca, cb) or separates(cb, ca))

        for _ in range(200):
            pa, pb = rng.normal(scale=3.0, size=(2, 2))
            ha, hb = rng.uniform(-np.pi, np.pi, size=2)
            ca = np.asarray(
                geo.obb_corners(jnp.asarray(pa, dtype=jnp.float32), jnp.float32(ha), jnp.float32(4.5), jnp.float32(2.0))
            )
            cb = np.asarray(
                geo.obb_corners(jnp.asarray(pb, dtype=jnp.float32), jnp.float32(hb), jnp.float32(4.5), jnp.float32(2.0))
            )
            got = bool(geo.obb_obb_intersects(jnp.asarray(ca), jnp.asarray(cb)))
            assert got == np_sat(ca, cb)


class TestSegmentIntersection:
    def test_polygon_segment(self):
        corners = geo.obb_corners(
            jnp.array([0.0, 0.0]), jnp.float32(0.0), jnp.float32(4.0), jnp.float32(2.0)
        )
        seg = lambda a, b: geo.obb_segment_intersects(
            corners, jnp.asarray(a, dtype=jnp.float32), jnp.asarray(b, dtype=jnp.float32)
        )
        assert bool(seg([0, -5], [0, 5]))  # crossing through
        assert bool(seg([0, 0], [10, 10]))  # endpoint inside
        assert not bool(seg([5, -5], [5, 5]))  # fully to the right
        assert not bool(seg([-5, 3], [5, 3]))  # passes above
        assert bool(seg([-5, 1], [5, 1]))  # along the top edge (touching)
        # degenerate segment = point containment
        assert bool(seg([1.0, 0.5], [1.0, 0.5]))
        assert not bool(seg([3.0, 0.5], [3.0, 0.5]))


class TestSignedDistance:
    def _np_reference(self, xys, polyline):
        # direct port of utils/data.py:220-290
        def dot2(a, b):
            return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]

        def cross2(a, b):
            return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]

        is_cyclic = np.square(polyline[0] - polyline[-1]).sum() < 1.0
        xy_starts = polyline[None, :-1, :2]
        xy_ends = polyline[None, 1:, :2]
        start_to_point = xys[:, None, :2] - xy_starts
        start_to_end = xy_ends - xy_starts
        rel_t = np.nan_to_num(
            dot2(start_to_point, start_to_end) / dot2(start_to_end, start_to_end)
        )
        n = np.sign(cross2(start_to_point, start_to_end))
        distance_to_segment = np.linalg.norm(
            start_to_point - (start_to_end * np.clip(rel_t, 0.0, 1.0)[..., None]),
            axis=-1,
        )
        start_to_end_padded = np.concatenate(
            [start_to_end[:, -1:], start_to_end, start_to_end[:, :1]], axis=1
        )
        is_locally_convex = (
            cross2(start_to_end_padded[:, :-1], start_to_end_padded[:, 1:]) > 0.0
        )
        n_prior = np.concatenate(
            [np.where(is_cyclic, n[:, -1:], n[:, :1]), n[:, :-1]], axis=-1
        )
        n_next = np.concatenate(
            [n[:, 1:], np.where(is_cyclic, n[:, :1], n[:, -1:])], axis=-1
        )
        sign_if_before = np.where(
            is_locally_convex[:, :-1], np.maximum(n, n_prior), np.minimum(n, n_prior)
        )
        sign_if_after = np.where(
            is_locally_convex[:, 1:], np.maximum(n, n_next), np.minimum(n, n_next)
        )
        sign_to_segment = np.where(
            rel_t < 0.0, sign_if_before, np.where(rel_t < 1.0, n, sign_if_after)
        )
        distance_sign = np.take_along_axis(
            sign_to_segment, np.argmin(distance_to_segment, axis=-1)[:, None], axis=1
        )[:, 0]
        return distance_sign * np.min(distance_to_segment, axis=-1)

    def test_matches_reference_open_polyline(self):
        rng = np.random.default_rng(2)
        polyline = np.cumsum(rng.normal(scale=2.0, size=(12, 2)), axis=0).astype(np.float32)
        xys = rng.normal(scale=6.0, size=(50, 2)).astype(np.float32)
        want = self._np_reference(xys.astype(np.float64), polyline.astype(np.float64))
        got = geo.signed_distance_to_polyline(
            jnp.asarray(xys), jnp.asarray(polyline), jnp.ones(12, dtype=bool)
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_matches_reference_cyclic_boundary(self):
        # counterclockwise square boundary: inside must be negative
        t = np.linspace(0, 2 * np.pi, 41)
        polyline = np.stack([10 * np.cos(t), 10 * np.sin(t)], axis=-1).astype(np.float32)
        xys = np.array([[0.0, 0.0], [5.0, 0.0], [15.0, 0.0], [0.0, -12.0]], dtype=np.float32)
        want = self._np_reference(xys.astype(np.float64), polyline.astype(np.float64))
        got = geo.signed_distance_to_polyline(
            jnp.asarray(xys), jnp.asarray(polyline), jnp.ones(len(t), dtype=bool)
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
        assert float(got[0]) < 0  # center is inside (on-road)
        assert float(got[2]) > 0  # outside is positive (off-road)

    def test_padding_invariance(self):
        rng = np.random.default_rng(3)
        polyline = np.cumsum(rng.normal(scale=2.0, size=(9, 2)), axis=0).astype(np.float32)
        xys = rng.normal(scale=5.0, size=(20, 2)).astype(np.float32)
        unpadded = geo.signed_distance_to_polyline(
            jnp.asarray(xys), jnp.asarray(polyline), jnp.ones(9, dtype=bool)
        )
        padded_poly = np.zeros((16, 2), dtype=np.float32)
        padded_poly[:9] = polyline
        valid = np.zeros(16, dtype=bool)
        valid[:9] = True
        padded = geo.signed_distance_to_polyline(
            jnp.asarray(xys), jnp.asarray(padded_poly), jnp.asarray(valid)
        )
        np.testing.assert_allclose(np.asarray(unpadded), np.asarray(padded), atol=1e-5)

    def test_multi_polyline_selects_nearest_by_abs(self):
        rng = np.random.default_rng(4)
        polys = np.stack(
            [
                np.cumsum(rng.normal(scale=2.0, size=(8, 2)), axis=0) + 20 * k
                for k in range(3)
            ]
        ).astype(np.float32)
        valids = np.ones((3, 8), dtype=bool)
        xys = rng.normal(scale=15.0, size=(10, 2)).astype(np.float32)
        per = np.stack(
            [
                self._np_reference(xys.astype(np.float64), polys[k].astype(np.float64))
                for k in range(3)
            ],
            axis=-1,
        )
        want = np.take_along_axis(
            per, np.argmin(np.abs(per), axis=-1)[:, None], axis=1
        )[:, 0]
        got = geo.signed_distance_to_polylines(
            jnp.asarray(xys), jnp.asarray(polys), jnp.asarray(valids)
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_obb_segment_hits_matches_corner_form():
    """The support-function rectangle-vs-segment path (the env collision hot
    path) must agree with the general corner-based predicate everywhere,
    including degenerate segments and near-touching configurations."""
    import numpy as np
    from ctrl_sim_tpu.geometry import (
        obb_corners,
        obb_segment_hits,
        obb_segment_intersects,
    )

    rng = np.random.default_rng(0)
    A, S = 32, 200
    pos = jnp.asarray(rng.uniform(-20, 20, (A, 2)), jnp.float32)
    hd = jnp.asarray(rng.uniform(-np.pi, np.pi, A), jnp.float32)
    ln = jnp.asarray(rng.uniform(1.0, 8.0, A), jnp.float32)
    wd = jnp.asarray(rng.uniform(0.5, 3.0, A), jnp.float32)
    p0 = jnp.asarray(rng.uniform(-25, 25, (S, 2)), jnp.float32)
    p1 = jnp.asarray(rng.uniform(-25, 25, (S, 2)), jnp.float32)
    # degenerate segments + exact-duplicate endpoints sprinkled in
    p1 = p1.at[:20].set(p0[:20])
    corners = obb_corners(pos, hd, ln, wd)
    ref = obb_segment_intersects(corners[:, None], p0[None, :], p1[None, :])
    fast = obb_segment_hits(pos, hd, ln, wd, p0, p1)
    ref_n, fast_n = np.asarray(ref), np.asarray(fast)
    # fp reassociation can flip exact-boundary cases; none exist in this
    # random draw, so demand equality
    np.testing.assert_array_equal(fast_n, ref_n)
    assert ref_n.any() and not ref_n.all()
