"""Focal-group decomposition for scenes with more agents than the model crop.

The reference evaluates scenes with arbitrarily many vehicles by splitting the
controlled set into focal groups of <= ``max_num_agents`` (24) agents, one
model call per group per step, with cross-group RTG dedup
(policies/autoregressive_policy.py:88-137,176-207):

- vehicles_to_evaluate sorted by GT trajectory length, descending;
- greedily pop the longest as *focal*, crop the <=24 agents nearest to it
  within 60 m (select_relevant_agents, dataset.py:278-319), assign every
  still-unaccounted evaluated vehicle inside the crop to this group;
- repeat until every evaluated vehicle is accounted;
- membership is *sticky*: fixed at t=0, shrinking only by the 60 m rule
  (autoregressive_policy.py:129-137);
- per step, each agent's RTG is sampled once — in the first group (by
  construction order) containing it — and the sampled value is written into
  every other group's model input (:185-207); actions are taken from the
  agent's assigned group.

TPU re-formulation: the env holds the full scene (``sim.max_agents`` agent
slots, A_sim >= 24); groups are fixed-shape index maps [E, G, Am] built
host-side at t=0 (``build_focal_groups``) and carried through the jitted
rollout. Model passes batch over E*G crop lanes; the dedup becomes a
rank-ordered scatter into an [E, A_sim] table (``scatter_by_rank``: lower
group rank wins) followed by ONE sample per (scene, agent) — equivalent to
the reference's sample-in-first-group-then-copy, since the winning sample is
drawn from the winning group's logits with the agent's own tilt.

Documented deviations:
- the reference mutates ``unaccounted_veh_ids`` while iterating over it
  (autoregressive_policy.py:126-129), skipping the element after each hit —
  an iterator bug that spuriously spills some vehicles into their own
  singleton groups; we assign every contained vehicle (each vehicle is still
  evaluated/tilted exactly once either way);
- when a focal dies the reference re-forms groups from scratch for its
  remaining vehicles (same sticky membership, next-longest focal); we keep
  the group and re-elect the origin among its assigned vehicles by the same
  GT-length key, which yields the same membership and the same new center.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ctrl_sim_tpu.config import Config

Array = jax.Array


class GroupSpec(NamedTuple):
    """Fixed-shape focal groups. Pad slots carry ``members == A_sim``
    (an out-of-range sentinel consumed by mode='drop' scatters)."""

    members: Array  # [E, G, Am] int32 — original agent index per slot, sorted
    member_valid: Array  # [E, G, Am] bool
    assigned: Array  # [E, G, Am] bool — evaluated vehicles owned by the group
    group_valid: Array  # [E, G] bool
    gt_length: Array  # [E, A_sim] float32 — GT existence length (origin key)

    @property
    def num_groups(self) -> int:
        return self.members.shape[1]

    @property
    def crop_size(self) -> int:
        return self.members.shape[2]


def build_focal_groups(
    cfg: Config,
    traj_position: np.ndarray,  # [E, A_sim, T+1, 2]
    traj_valid: np.ndarray,  # [E, A_sim, T+1]
    agent_valid: np.ndarray,  # [E, A_sim]
    controlled: np.ndarray,  # [E, A_sim] bool
    min_groups: int = 1,
    crop_size: int | None = None,
) -> GroupSpec:
    """Host-side greedy construction at t=0 (autoregressive_policy.py:88-137).

    Group membership depends only on initial GT state (positions at t=0,
    trajectory lengths), so it is computed exactly once, in numpy, before
    the jitted rollout. ``crop_size`` < max_num_agents builds PACKED crops
    for the streaming rollout (eval.agent_slots): the same <=crop closest
    selection, fewer model slots.
    """
    wc = cfg.waymo
    Am = crop_size or wc.max_num_agents
    E, A_sim = controlled.shape
    lengths = traj_valid.sum(axis=2).astype(np.float32)  # [E, A_sim]

    per_scene: list[list[tuple[np.ndarray, list[int]]]] = []
    for e in range(E):
        pos0 = traj_position[e, :, 0]
        exist0 = traj_valid[e, :, 0] & agent_valid[e]
        evaluated = [int(i) for i in np.where(controlled[e])[0]]
        # sort in decreasing order by GT length (:88-94); np.argsort is
        # stable ascending, reversed — ties break toward higher index first,
        # matching the reference
        order = np.argsort(np.array([lengths[e, v] for v in evaluated]))[::-1]
        unaccounted = [evaluated[i] for i in order]
        groups: list[tuple[np.ndarray, list[int]]] = []
        while unaccounted:
            focal = unaccounted.pop(0)
            if not exist0[focal]:
                # dead focal at t=0: never acts (reference dead_agent_veh_ids)
                continue
            # select_relevant_agents with empty sticky set (dataset.py:289-293):
            # <=24 closest agents within 60 m, sorted by original index
            dist = np.linalg.norm(pos0 - pos0[focal][None], axis=-1)
            in_range = (dist < wc.agent_dist_threshold) & exist0
            closest = np.argsort(dist, kind="stable")[:Am]
            members = np.intersect1d(closest, np.where(in_range)[0])
            assigned = [focal] + [v for v in unaccounted if v in set(members)]
            unaccounted = [v for v in unaccounted if v not in set(assigned)]
            groups.append((members.astype(np.int32), assigned))
        per_scene.append(groups)

    G = max(min_groups, max((len(g) for g in per_scene), default=1))
    members = np.full((E, G, Am), A_sim, dtype=np.int32)
    member_valid = np.zeros((E, G, Am), dtype=bool)
    assigned_m = np.zeros((E, G, Am), dtype=bool)
    group_valid = np.zeros((E, G), dtype=bool)
    for e, groups in enumerate(per_scene):
        for g, (mem, assigned) in enumerate(groups):
            n = len(mem)
            members[e, g, :n] = mem
            member_valid[e, g, :n] = True
            group_valid[e, g] = True
            aset = set(assigned)
            for s in range(n):
                if int(mem[s]) in aset:
                    assigned_m[e, g, s] = True
    return GroupSpec(
        members=members,
        member_valid=member_valid,
        assigned=assigned_m,
        group_valid=group_valid,
        gt_length=lengths,
    )


def pad_groups(spec: GroupSpec, num_groups: int) -> GroupSpec:
    """Pad the group axis to ``num_groups`` with invalid groups (so chunks
    of different group counts share one compiled rollout graph)."""
    E, G, Am = spec.members.shape
    if G >= num_groups:
        return spec
    pad = num_groups - G
    A_sim = spec.gt_length.shape[1]

    def padg(x, fill):
        extra = np.full((E, pad) + x.shape[2:], fill, dtype=x.dtype)
        return np.concatenate([np.asarray(x), extra], axis=1)

    return GroupSpec(
        members=padg(spec.members, A_sim),
        member_valid=padg(spec.member_valid, False),
        assigned=padg(spec.assigned, False),
        group_valid=padg(spec.group_valid, False),
        gt_length=spec.gt_length,
    )


def trivial_groups(
    cfg: Config,
    origin_idx: Array,  # [E]
    relevant0: Array,  # [E, A] bool — <=Am in-range agents at t=0
    controlled_mask: Array,  # [E, A] bool
    gt_length: Array,  # [E, A]
) -> GroupSpec:
    """Single-group spec for scenes already at the model crop size
    (A_sim == max_num_agents): members are the identity map, membership is
    the t=0 relevant set. Traceable (used when no host-built spec is given)."""
    E, A = controlled_mask.shape
    idx = jnp.broadcast_to(jnp.arange(A, dtype=jnp.int32)[None, None], (E, 1, A))
    mv = relevant0[:, None, :]
    members = jnp.where(mv, idx, A)
    return GroupSpec(
        members=members,
        member_valid=mv,
        assigned=(controlled_mask & relevant0)[:, None, :],
        group_valid=jnp.any(controlled_mask, axis=1, keepdims=True),
        gt_length=gt_length.astype(jnp.float32),
    )


def packed_trivial_groups(
    cfg: Config,
    origin_idx: Array,  # [E]
    relevant0: Array,  # [E, A] bool — in-range agents at t=0
    controlled_mask: Array,  # [E, A] bool
    gt_length: Array,  # [E, A]
    dist0: Array,  # [E, A] — distance to the origin at t=0
    crop_size: int,
) -> GroupSpec:
    """Single-group spec PACKED into ``crop_size`` <= max_num_agents slots.

    The KV-cache DMA of the streaming rollout scales with model *slots*, not
    real agents (BENCH_NOTES.md: 24- vs 12-agent scenes cost 0.4%), so
    scenes whose in-range agent count fits a smaller crop shouldn't pay
    full-width dead-slot traffic. Selection mirrors select_relevant_agents
    (dataset.py:289-319): the ``crop_size`` *closest* in-range agents,
    packed into the leading slots in original-index order — each kept agent
    gets exactly the slot (and agent-id embedding) it would have had in a
    full-width crop of the same scene. Traceable.

    When every in-range agent fits the crop, the ONLY deviation vs a
    full-width crop is the unattended pad-slot phantom keys. OVERFLOW
    semantics (more in-range agents than ``crop_size``, ADVICE r4): agents
    beyond the crop_size closest are dropped from the group — controlled
    ones silently fall back to GT log replay, and kept agents' packed slots
    (hence slot/agent-id embeddings) shift relative to the full-width crop.
    That matches the reference's own crop rule (it also drops all but the
    closest max_num_agents), but with a smaller cap; size ``crop_size`` so
    the expected in-range count fits, or use build_focal_groups (the
    evaluator path), which partitions overflow scenes into multiple groups
    instead of dropping agents."""
    E, A = controlled_mask.shape
    # keep the crop_size closest relevant agents (ties: lower index first —
    # np.argsort stable ascending, matching the reference's crop)
    rank = jnp.argsort(jnp.where(relevant0, dist0, jnp.inf), axis=1, stable=True)
    keep = (
        jnp.zeros((E, A), bool)
        .at[jnp.arange(E)[:, None], rank[:, :crop_size]]
        .set(True)
        & relevant0
    )
    # pack kept agents into leading slots, original-index order
    idx = jnp.arange(A, dtype=jnp.int32)
    key = jnp.where(keep, idx[None, :], A + idx[None, :])
    order = jnp.argsort(key, axis=1)[:, :crop_size]  # [E, crop]
    valid = jnp.take_along_axis(keep, order, axis=1)
    members = jnp.where(valid, order.astype(jnp.int32), A)[:, None, :]
    assigned = jnp.take_along_axis(controlled_mask & keep, order, axis=1)
    return GroupSpec(
        members=members,
        member_valid=valid[:, None, :],
        assigned=assigned[:, None, :],
        group_valid=jnp.any(controlled_mask, axis=1, keepdims=True),
        gt_length=gt_length.astype(jnp.float32),
    )


def gather_members(x: Array, members: Array) -> Array:
    """Gather per-agent data [E, A_sim, ...] into group slots [E, G, Am, ...].
    Pad slots (members == A_sim) read row 0; callers mask with member_valid."""
    E, G, Am = members.shape
    safe = jnp.minimum(members, x.shape[1] - 1)
    flat = jnp.take_along_axis(
        x, safe.reshape(E, G * Am).reshape(E, G * Am, *(1,) * (x.ndim - 2)), axis=1
    )
    return flat.reshape((E, G, Am) + x.shape[2:])


def scatter_by_rank(
    values: Array,  # [E, G, Am, ...]
    members: Array,  # [E, G, Am] int32 (A_sim = drop sentinel)
    contrib: Array,  # [E, G, Am] bool — slot contributes to the table
    num_agents: int,
) -> tuple[Array, Array]:
    """Resolve the cross-group dedup: scatter group values into an
    [E, num_agents, ...] table with LOWER group rank winning (the reference
    processes groups in construction order and skips already-processed
    agents, autoregressive_policy.py:185-207). Returns (table, covered)."""
    E, G, Am = members.shape
    table = jnp.zeros((E, num_agents) + values.shape[3:], values.dtype)
    covered = jnp.zeros((E, num_agents), bool)
    # later scatters win -> iterate ranks high to low so rank 0 lands last
    for g in range(G - 1, -1, -1):
        idx = jnp.where(contrib[:, g], members[:, g], num_agents)  # [E, Am]
        table = table.at[
            jnp.arange(E)[:, None], idx
        ].set(values[:, g], mode="drop")
        covered = covered.at[jnp.arange(E)[:, None], idx].set(
            True, mode="drop"
        )
    return table, covered
