"""Minimal Box2D-style contact resolution for vehicle-vehicle collisions.

The reference steps a zero-gravity ``b2World`` with 8 velocity and 3 position
iterations (nocturne/cpp/src/physics/PhysicsSimulation.cpp:16-25); every car
is a dynamic box fixture with density 20 and Box2D's default material
(friction 0.2, restitution 0 — FreeCar.cpp:34-41, ExpertControlCar.cpp:11-17).
So when two vehicles touch, the reference does NOT let them pass through: a
sequential-impulse solver zeroes the approaching normal velocity (perfectly
inelastic), applies Coulomb friction along the tangent, and a Baumgarte
positional pass removes the residual overlap.

This module replicates that response with a TPU-native all-pairs Jacobi
impulse solver over the dense [A, A] contact matrix:

- contact geometry from the same SAT the collision detector uses: penetration
  normal = the minimum-overlap axis of the 4 box axes, depth = that overlap;
  the 2-point manifold mirrors b2CollidePolygons (incident-edge endpoints
  clipped to the reference face, skin-filtered separations, world points at
  the b2WorldManifold midpoints);
- mass/inertia from the fixture: m = rho * L * W, I = m (L^2 + W^2) / 12
  (b2PolygonShape::ComputeMass for SetAsBox);
- velocity pass: ``velocity_iterations`` sweeps; within each sweep every
  pair's 2-point normal LCP is solved EXACTLY in closed form (the same 2x2
  block solver b2ContactSolver uses, vectorized over the four active-set
  cases), then friction per point (|lambda_t| <= mu lambda_n) — pairs are
  Jacobi w.r.t. each other (Box2D is Gauss-Seidel across contacts; at the
  1-2 contacts/vehicle these scenes produce the fixed points agree);
- position pass: ``position_iterations`` sweeps of Box2D's sequential
  per-point pseudo-impulse correction (beta * (separation + slop), clamped),
  applied with BOTH translation and rotation — the rotational part is what
  the deep-penetration fixtures needed (round 4's linear-only pass left
  2.35 m on the oblique fixture; with rotation it is 0.03 m).

Simulation order matches b2World::Step: FreeCar sets velocities, the velocity
constraints are solved, THEN positions integrate with the corrected
velocities, then overlap is corrected. ``resolve_contacts`` therefore takes
the pre-step poses plus the FreeCar-proposed velocities and returns the
re-integrated bodies.

Enabled with ``sim.resolve_contacts`` (default ON — the reference always
simulates contacts). The solver is pinned against EXECUTED Box2D collision
streams in tests/test_physics_goldens.py over four fixtures (final
deviation vs 14-26 m pass-through: head-on 0.010 m, t-bone 0.54 m, 3-car
pileup 0.14 m, oblique/glancing 0.03 m); solver-internal
invariants (momentum, inelasticity) live in tests/test_contacts.py, with
deviation numbers in COMPONENTS.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ctrl_sim_tpu.config import PhysicsConfig
from ctrl_sim_tpu.env.dynamics import BodyState
from ctrl_sim_tpu.geometry import angle_add, obb_corners

Array = jax.Array

# Box2D fixture/material constants (FreeCar.cpp:40, b2_settings defaults)
DENSITY = 20.0
FRICTION = 0.2
VELOCITY_ITERATIONS = 8
POSITION_ITERATIONS = 3
BAUMGARTE = 0.2  # b2_baumgarte
LINEAR_SLOP = 0.005  # b2_linearSlop
MAX_CORRECTION = 0.2  # b2_maxLinearCorrection


def _cross2(a: Array, b: Array) -> Array:
    """z-component of the 2-D cross product (broadcasts on leading dims)."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _contact_geometry(
    position: Array,  # [A, 2]
    heading: Array,  # [A]
    length: Array,  # [A]
    width: Array,  # [A]
    active: Array,  # [A] bool
):
    """All-pairs SAT contact manifold.

    Returns (touching [A, A] bool on i<j, normal [A, A, 2] from i to j,
    depth [A, A], points [A, A, 2, 2] world manifold points, point_valid
    [A, A, 2] skin filter, sep [A, A, 2] per-point separations) — the
    vectorized b2CollidePolygons manifold; see the block comments below.
    """
    A = position.shape[0]
    corners = obb_corners(position, heading, length, width)  # [A, 4, 2]
    c, s = jnp.cos(heading), jnp.sin(heading)
    axes_own = jnp.stack(
        [jnp.stack([c, s], -1), jnp.stack([-s, c], -1)], axis=1
    )  # [A, 2(axes), 2]

    # candidate axes per pair: i's two + j's two -> [A, A, 4, 2]
    ax_i = jnp.broadcast_to(axes_own[:, None], (A, A, 2, 2))
    ax_j = jnp.broadcast_to(axes_own[None, :], (A, A, 2, 2))
    axes = jnp.concatenate([ax_i, ax_j], axis=2)  # [A, A, 4, 2]

    # project both boxes' corners on every candidate axis
    proj_i = jnp.einsum("icm,ijkm->ijkc", corners, axes)  # [A, A, 4, 4]
    proj_j = jnp.einsum("jcm,ijkm->ijkc", corners, axes)
    overlap = jnp.minimum(proj_i.max(-1), proj_j.max(-1)) - jnp.maximum(
        proj_i.min(-1), proj_j.min(-1)
    )  # [A, A, 4]

    touching = jnp.all(overlap > 0.0, axis=-1)
    # min-overlap axis via one-hot select: argsort/argmin + take_along_axis
    # gathers lowered pathologically on TPU inside the rollout scan (the
    # contact path measured 59x slower than the pass-through env; batched
    # 4-wide sorts + dynamic gathers were the cost)
    depth = jnp.min(overlap, axis=-1)  # [A, A]
    kidx = jnp.arange(4)
    is_min = overlap == depth[..., None]  # [A, A, 4] (>=1 True)
    # first minimum wins (argmin tie-breaking): mask out later duplicates
    first_min = is_min & (jnp.cumsum(is_min, axis=-1) == 1)
    kmin = jnp.sum(first_min * kidx, axis=-1)  # [A, A]
    normal = jnp.sum(axes * first_min[..., None], axis=2)  # [A, A, 2]
    # orient from i toward j
    d_ij = position[None, :] - position[:, None]  # [A, A, 2]
    flip = jnp.sum(normal * d_ij, axis=-1) < 0.0
    normal = jnp.where(flip[..., None], -normal, normal)

    # 2-point manifold, mirroring b2CollidePolygons: the incident box is
    # the one NOT owning the min-overlap axis (axes 0-1 belong to i, 2-3
    # to j); the manifold points are the INCIDENT EDGE's endpoints (the
    # incident-box face most anti-parallel to the contact normal,
    # b2FindIncidentEdge), clipped to the reference face's tangent extent,
    # and kept only while their separation is within Box2D's polygon skin.
    # (Round 4 used "the two deepest incident corners, always both
    # active" — on glancing corner impacts that fed the solver a phantom
    # second point Box2D never creates, whose spurious impulse + torque
    # was the dominant oblique-fixture error: 0.13 rad of heading
    # divergence in the first contact step, compounding to 2.35 m.)
    inc_is_j = kmin < 2  # [A, A]
    corners_i = jnp.broadcast_to(corners[:, None], (A, A, 4, 2))
    corners_j = jnp.broadcast_to(corners[None, :], (A, A, 4, 2))
    inc_corners = jnp.where(inc_is_j[..., None, None], corners_j, corners_i)
    ref_corners = jnp.where(inc_is_j[..., None, None], corners_i, corners_j)
    inc_axes = jnp.where(inc_is_j[..., None, None], ax_j, ax_i)  # [A, A, 2, 2]

    # outward reference-face normal: normal is oriented i -> j, so it
    # points out of i's face; out of j's face is its negation
    n_out = jnp.where(inc_is_j[..., None], normal, -normal)  # [A, A, 2]

    # incident edge normal = -sign(d) * (incident axis with max |d|),
    # d = axis . n_out (b2FindIncidentEdge's min-dot edge)
    d_ax = jnp.einsum("ijkm,ijm->ijk", inc_axes, n_out)  # [A, A, 2]
    pick1 = jnp.abs(d_ax[..., 1]) > jnp.abs(d_ax[..., 0])
    ax_pick = jnp.where(pick1[..., None], inc_axes[:, :, 1], inc_axes[:, :, 0])
    d_pick = jnp.where(pick1, d_ax[..., 1], d_ax[..., 0])
    e_n = -jnp.sign(d_pick)[..., None] * ax_pick  # [A, A, 2]

    # the edge with outward normal e_n = the two corners extremal along it;
    # two smallest keys, sort-free: rank by pairwise comparison with index
    # tie-breaks (stable), then one-hot select — no TPU sort in the scan
    key = -jnp.einsum("ijcm,ijm->ijc", inc_corners, e_n)  # [A, A, 4]
    lt = (key[..., :, None] > key[..., None, :]) | (
        (key[..., :, None] == key[..., None, :])
        & (kidx[:, None] > kidx[None, :])
    )  # [A, A, 4, 4]: key[c'] sorts before key[c]
    rank = jnp.sum(lt, axis=-1)  # [A, A, 4] in 0..3
    sel0 = (rank == 0)[..., None]
    sel1 = (rank == 1)[..., None]
    edge2 = jnp.stack(
        [
            jnp.sum(inc_corners * sel0, axis=2),
            jnp.sum(inc_corners * sel1, axis=2),
        ],
        axis=2,
    )  # [A, A, 2, 2]

    # clip the incident edge to the reference face's tangent extent (for
    # rectangles the face corners span the box's full tangent extent, so
    # this equals b2ClipSegmentToLine against both side planes)
    tangent = jnp.stack([-normal[..., 1], normal[..., 0]], axis=-1)
    ref_t = jnp.einsum("ijcm,ijm->ijc", ref_corners, tangent)  # [A, A, 4]
    t_lo, t_hi = ref_t.min(-1), ref_t.max(-1)
    pt_t = jnp.einsum("ijpm,ijm->ijp", edge2, tangent)  # [A, A, 2]
    pt_t_cl = jnp.clip(pt_t, t_lo[..., None], t_hi[..., None])
    points = edge2 + (pt_t_cl - pt_t)[..., None] * tangent[..., None, :]

    # separation filter: keep clip points within the polygon skin
    # (b2CollidePolygons keeps separation <= totalRadius; b2_polygonRadius
    # = 2 * linearSlop per polygon -> 4 * linearSlop total)
    ref_face = jnp.einsum("ijcm,ijm->ijc", ref_corners, n_out).max(-1)
    sep = jnp.einsum("ijpm,ijm->ijp", points, n_out) - ref_face[..., None]
    point_valid = sep <= 4.0 * LINEAR_SLOP

    # world manifold point = midpoint of the clip point and its projection
    # onto the reference face (b2WorldManifold::Initialize: 0.5*(cA + cB),
    # the equal polygon radii cancel) — i.e. the clip point slid HALF the
    # separation back out along the normal. The solver's torque arms come
    # from these world points; using the raw incident corners instead
    # under-rotated the deep first-impact step (t-bone: our w -1.6 rad/s
    # vs the executed engine's -2.5 at 0.46 m depth).
    points = points - 0.5 * sep[..., None] * n_out[:, :, None, :]

    upper = jnp.arange(A)[:, None] < jnp.arange(A)[None, :]
    touching = touching & upper & active[:, None] & active[None, :]
    return touching, normal, depth, points, point_valid, sep


def _solve_velocities(
    velocity: Array,  # [A, 2]
    angular_velocity: Array,  # [A]
    position: Array,  # [A, 2] (pre-integration, = contact frame)
    inv_m: Array,  # [A]
    inv_i: Array,  # [A]
    touching: Array,  # [A, A] (i<j)
    normal: Array,  # [A, A, 2]
    points: Array,  # [A, A, P, 2] — 2-point manifold
    point_valid: Array,  # [A, A, P] — separation-filtered manifold points
    iterations: int,
) -> tuple[Array, Array]:
    """Accumulated-impulse Jacobi solve over the 2-point manifolds,
    restitution 0 + Coulomb friction."""
    r_i = points - position[:, None, None]  # [A, A, P, 2]
    r_j = points - position[None, :, None]
    tangent = jnp.stack([-normal[..., 1], normal[..., 0]], axis=-1)
    n_p = normal[..., None, :]  # broadcast over the point axis
    t_p = tangent[..., None, :]

    rin = _cross2(r_i, n_p)  # [A, A, P]
    rjn = _cross2(r_j, n_p)
    rit = _cross2(r_i, t_p)
    rjt = _cross2(r_j, t_p)
    inv_m2 = inv_m[:, None, None] + inv_m[None, :, None]
    kn = inv_m2 + rin**2 * inv_i[:, None, None] + rjn**2 * inv_i[None, :, None]
    kt = inv_m2 + rit**2 * inv_i[:, None, None] + rjt**2 * inv_i[None, :, None]
    # off-diagonal normal coupling between the two manifold points
    # (b2ContactSolver::b2ContactSolver K(0,1))
    k12 = (
        inv_m2[..., 0]
        + rin[..., 0] * rin[..., 1] * inv_i[:, None]
        + rjn[..., 0] * rjn[..., 1] * inv_i[None, :]
    )  # [A, A]
    solvable = touching[..., None] & (kn > 0.0) & point_valid
    kn = jnp.where(kn > 0.0, kn, 1.0)
    kt = jnp.where(kt > 0.0, kt, 1.0)
    # block solve only when K is well-conditioned (Box2D
    # k_maxConditionNumber = 1000); degenerate manifolds (coincident
    # points) fall back to the relaxed per-point update
    det = kn[..., 0] * kn[..., 1] - k12 * k12
    well_cond = (
        jnp.all(solvable, axis=-1)
        & (kn[..., 0] * kn[..., 0] < 1000.0 * det)
    )
    det_safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)

    def apply_points(v, w, imp_n_delta, imp_t_delta):
        # impulse P[i,j,p] acts +P on j, -P on i; both points applied at once
        P = (
            imp_n_delta[..., None] * n_p + imp_t_delta[..., None] * t_p
        )  # [A, A, P, 2]
        Ps = jnp.sum(P, axis=2)  # summed over the manifold points
        dv = (
            jnp.sum(Ps, axis=0) * inv_m[:, None]  # body as j
            - jnp.sum(Ps, axis=1) * inv_m[:, None]  # body as i
        )
        dw = (
            jnp.sum(_cross2(r_j, P), axis=(0, 2))
            - jnp.sum(_cross2(r_i, P), axis=(1, 2))
        ) * inv_i
        return v + dv, w + dw

    perp_ri = jnp.stack([-r_i[..., 1], r_i[..., 0]], -1)  # w x r = w * perp(r)
    perp_rj = jnp.stack([-r_j[..., 1], r_j[..., 0]], -1)

    def vrel(v, w):
        # relative velocity at every manifold point [A, A, P, 2]
        return (
            v[None, :, None]
            + perp_rj * w[None, :, None, None]
            - v[:, None, None]
            - perp_ri * w[:, None, None, None]
        )

    def body(_, carry):
        v, w, acc_n, acc_t = carry
        # ---- friction FIRST, sequentially per manifold point (Box2D's
        # SolveVelocityConstraints order: "solve tangent constraints first
        # because non-penetration is more important than friction"),
        # |acc_t| <= mu * acc_n against the PREVIOUS sweep's normals -------
        for sel in (jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, 1.0])):
            vt = jnp.sum(vrel(v, w) * t_p, axis=-1)
            dt_ = jnp.where(solvable, -vt / kt, 0.0) * sel
            hi = FRICTION * acc_n
            new_t = jnp.clip(acc_t + dt_, -hi, hi)
            dt_ = jnp.where(sel > 0, new_t - acc_t, 0.0)
            acc_t = jnp.where(sel > 0, new_t, acc_t)
            v, w = apply_points(v, w, jnp.zeros_like(dt_), dt_)

        # ---- normal impulses: exact 2x2 block LCP per pair ---------------
        # Box2D's block solver (b2ContactSolver::SolveVelocityConstraints):
        # find x >= 0 with vn' = K x + b complementarity, b = vn - K a.
        # Solved in closed form over the four active-set cases and selected
        # by mask — one exact solve per pair per sweep instead of the
        # 0.5-relaxed per-point update (which cost the t-bone fixture
        # 0.42 -> 0.97 m vs executed Box2D). Pairs remain Jacobi w.r.t.
        # each other.
        vn = jnp.sum(vrel(v, w) * n_p, axis=-1)  # [A, A, P]
        Ka = jnp.stack(
            [
                kn[..., 0] * acc_n[..., 0] + k12 * acc_n[..., 1],
                k12 * acc_n[..., 0] + kn[..., 1] * acc_n[..., 1],
            ],
            axis=-1,
        )
        b = vn - Ka  # [A, A, 2]
        # case 1: both points active, x = -K^-1 b
        x1_0 = (-kn[..., 1] * b[..., 0] + k12 * b[..., 1]) / det_safe
        x1_1 = (k12 * b[..., 0] - kn[..., 0] * b[..., 1]) / det_safe
        ok1 = well_cond & (x1_0 >= 0.0) & (x1_1 >= 0.0)
        # case 2: point 0 active only
        x2_0 = -b[..., 0] / kn[..., 0]
        ok2 = (x2_0 >= 0.0) & (k12 * x2_0 + b[..., 1] >= 0.0)
        # case 3: point 1 active only
        x3_1 = -b[..., 1] / kn[..., 1]
        ok3 = (x3_1 >= 0.0) & (k12 * x3_1 + b[..., 0] >= 0.0)
        # case 4: separating at both points
        ok4 = (b[..., 0] >= 0.0) & (b[..., 1] >= 0.0)
        pick1 = ok1
        pick2 = ~pick1 & ok2
        pick3 = ~pick1 & ~pick2 & ok3
        pick4 = ~pick1 & ~pick2 & ~pick3 & ok4
        # no case valid (rare numeric corner): relaxed per-point fallback
        fallback = ~(pick1 | pick2 | pick3 | pick4)
        xf = jnp.maximum(acc_n - 0.5 * vn / kn, 0.0)
        x0 = jnp.where(
            pick1, x1_0,
            jnp.where(pick2, x2_0, jnp.where(pick3 | pick4, 0.0, xf[..., 0])),
        )
        x1 = jnp.where(
            pick1, x1_1,
            jnp.where(pick3, x3_1, jnp.where(pick2 | pick4, 0.0, xf[..., 1])),
        )
        new_n = jnp.stack([x0, x1], axis=-1)
        new_n = jnp.where(solvable, new_n, 0.0)
        # degenerate manifolds (ill-conditioned K): relaxed per-point update
        deg = ~well_cond[..., None] & solvable
        new_n = jnp.where(deg, jnp.maximum(acc_n - 0.5 * vn / kn, 0.0), new_n)
        del fallback
        dn = new_n - acc_n
        acc_n = new_n
        v, w = apply_points(v, w, dn, jnp.zeros_like(dn))
        return v, w, acc_n, acc_t

    zeros = jnp.zeros_like(kn)
    # TPU: unrolled — a nested while-loop inside the rollout scan costs
    # ~2 ms PER ITERATION there (measured: 8 velocity + 3 position
    # iterations made the contact path 59x slower than the whole
    # pass-through env); the per-iteration math is tiny, so full unroll is
    # the right trade. CPU keeps the rolled loop (the unrolled program is
    # ~2.5x slower to compile and run there).
    v, w, _, _ = jax.lax.fori_loop(
        0, iterations, body, (velocity, angular_velocity, zeros, zeros),
        unroll=jax.default_backend() == "tpu",
    )
    return v, w


def _correct_positions(
    position: Array,
    heading: Array,
    length: Array,
    width: Array,
    active: Array,
    inv_m: Array,
    inv_i: Array,
    iterations: int,
) -> tuple[Array, Array]:
    """Box2D-style positional correction WITH rotation.

    b2ContactSolver::SolvePositionConstraints corrects each manifold point
    sequentially: a pseudo-impulse -C/K along the normal applied at the
    point moves AND rotates both bodies (C = beta * (separation + slop)
    clamped to b2_maxLinearCorrection). Round 4's linear-only pass left the
    post-impact headings uncorrected, which is exactly where the deep-
    penetration fixtures diverged (the executed engine's first t-bone step
    rotates ~1.5x more than the velocity solve alone: the remainder IS the
    rotational position pass).

    Geometry (SAT manifold, world points, per-point separations) is
    computed ONCE at the integrated pose and frozen across the
    ``iterations``; each correction analytically advances both points'
    separations through the pair's K-coupling instead of re-colliding.
    Box2D re-collides every iteration — the difference only matters for
    multi-body pileups where one pair's push re-deepens another pair
    within the same step; the executed-Box2D deviation bounds
    (tests/test_physics_goldens.py) cover it. The re-collide form tripled
    the contact path's per-step SAT cost inside the rollout scan.
    """
    touching, normal, _, points, point_valid, sep0 = _contact_geometry(
        position, heading, length, width, active
    )
    r_i = points - position[:, None, None]  # [A, A, P, 2] (frozen arms)
    r_j = points - position[None, :, None]
    n_p = normal[..., None, :]
    rin = _cross2(r_i, n_p)  # [A, A, P]
    rjn = _cross2(r_j, n_p)
    inv_m2 = inv_m[:, None, None] + inv_m[None, :, None]
    kp = inv_m2 + rin**2 * inv_i[:, None, None] + rjn**2 * inv_i[None, :, None]
    # cross-coupling: how much point q separates when point p is pushed
    k_cross = (
        inv_m2[..., 0]
        + rin[..., 0] * rin[..., 1] * inv_i[:, None]
        + rjn[..., 0] * rjn[..., 1] * inv_i[None, :]
    )  # [A, A]
    ok = touching[..., None] & point_valid & (kp > 0.0)
    kp_safe = jnp.where(kp > 0.0, kp, 1.0)

    def body(_, carry):
        pos, hd, sep = carry
        for p_idx in (0, 1):
            q_idx = 1 - p_idx
            # C = beta * (sep + slop) clamped to [-maxCorrection, 0]
            C = jnp.clip(
                BAUMGARTE * (sep[..., p_idx] + LINEAR_SLOP),
                -MAX_CORRECTION,
                0.0,
            )
            lam = jnp.where(
                ok[..., p_idx], -C / kp_safe[..., p_idx], 0.0
            )  # [A, A] >= 0
            P = lam[..., None] * normal  # [A, A, 2]
            dpos = (
                jnp.sum(P, axis=0) * inv_m[:, None]
                - jnp.sum(P, axis=1) * inv_m[:, None]
            )
            # rotation: body as j gets +inv_i*cross(r_j, P), as i gets -
            dhd = (
                jnp.sum(rjn[..., p_idx] * lam, axis=0)
                - jnp.sum(rin[..., p_idx] * lam, axis=1)
            ) * inv_i
            # analytic separation advance through the pair coupling
            dsep_p = lam * kp[..., p_idx]
            dsep_q = lam * k_cross
            dsep = jnp.zeros_like(sep)
            dsep = dsep.at[..., p_idx].add(dsep_p)
            dsep = dsep.at[..., q_idx].add(dsep_q)
            pos = pos + dpos
            hd = angle_add(hd, dhd)
            sep = sep + dsep
        return pos, hd, sep

    position, heading, _ = jax.lax.fori_loop(
        0, iterations, body, (position, heading, sep0),
        unroll=jax.default_backend() == "tpu",
    )
    return position, heading


def resolve_contacts(
    pre: BodyState,  # bodies at the start of the step ([A] leading axis)
    proposed: BodyState,  # FreeCar-stepped bodies (velocities to correct)
    length: Array,  # [A]
    width: Array,  # [A]
    dynamic: Array,  # [A] bool — finite-mass bodies (alive, policy/replay)
    kinematic: Array,  # [A] bool — infinite-mass participants (expert teleport)
    dt: float,
    cfg: PhysicsConfig = PhysicsConfig(),
) -> BodyState:
    """b2World::Step-ordered contact response for one scene (vmap over envs).

    Takes the velocities FreeCar proposed for this step, solves the contact
    constraints against the pre-step poses, and re-integrates. Non-active
    bodies (dead/padding) pass through untouched.
    """
    active = dynamic | kinematic
    mass = DENSITY * length * width
    inv_m = jnp.where(dynamic, 1.0 / jnp.maximum(mass, 1e-6), 0.0)
    inv_i = jnp.where(
        dynamic, 12.0 / jnp.maximum(mass * (length**2 + width**2), 1e-6), 0.0
    )

    touching, normal, depth, point, point_valid, _ = _contact_geometry(
        pre.position, pre.heading, length, width, active
    )
    any_contact = jnp.any(touching)

    def solve(vel_w):
        v0, w0 = vel_w
        return _solve_velocities(
            v0, w0, pre.position, inv_m, inv_i, touching, normal, point,
            point_valid, VELOCITY_ITERATIONS,
        )

    v, w = jax.lax.cond(
        any_contact,
        solve,
        lambda vw: vw,
        (proposed.velocity, proposed.angular_velocity),
    )

    position = pre.position + v * dt
    heading = angle_add(pre.heading, w * dt)

    def correct(ph):
        p, h = ph
        return _correct_positions(
            p, h, length, width, active, inv_m, inv_i, POSITION_ITERATIONS
        )

    position, heading = jax.lax.cond(
        any_contact, correct, lambda ph: ph, (position, heading)
    )

    speed = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 0.0))
    changed = dynamic
    return BodyState(
        position=jnp.where(changed[..., None], position, proposed.position),
        heading=jnp.where(changed, heading, proposed.heading),
        speed=jnp.where(changed, speed, proposed.speed),
        velocity=jnp.where(changed[..., None], v, proposed.velocity),
        angular_velocity=jnp.where(changed, w, proposed.angular_velocity),
        throttle_accel=proposed.throttle_accel,
        brake_accel=proposed.brake_accel,
    )
