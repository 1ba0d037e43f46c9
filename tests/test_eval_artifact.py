"""Regression checks on the committed end-to-end quality artifact (round 4).

artifacts/eval_r04_*.json are produced by tools/make_eval_artifact.py —
8k-step training -> closed-loop eval on 256 synthetic scenes -> Table-1
metrics, through the repo's own CLIs (the reference's deliverable shape:
evaluators/policy_evaluator.py:578-593). Beyond key/range checks, these
tests pin TOLERANCE BANDS around the committed values (committed round-4
numbers in parentheses), so regenerating the artifact after a silent
quality regression fails CI.

eval_r04_passes_ab.json is the fused-2-pass vs sequential-3-pass streaming
A/B (two eval seeds x both modes, same checkpoint): the action-deferral
deviation must stay well inside cross-seed noise — the committed run
measured within-seed deltas <= 0.004 on every metric vs ~0.02 cross-seed
spread.
"""

from __future__ import annotations

import json
import math
import os

import pytest

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts")

POLICY_KEYS = {
    "goal", "collision_rate", "offroad_rate", "ade", "fde",
    "lin_speed_jsd", "ang_speed_jsd", "accel_jsd", "nearest_dist_jsd",
}
# Jensen-Shannon *distance* (sqrt of divergence, base e) is bounded by
# sqrt(ln 2) ~ 0.8326
JSD_MAX = math.sqrt(math.log(2.0)) + 1e-9


def _load(name: str) -> dict:
    path = os.path.join(ART, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not generated (tools/make_eval_artifact.py)")
    with open(path) as f:
        return json.load(f)


@pytest.mark.parametrize(
    "name", ["eval_r04_exact.json", "eval_r04_streaming.json"]
)
def test_policy_eval_artifact(name):
    m = _load(name)
    missing = POLICY_KEYS - set(m)
    assert not missing, f"{name} missing metric keys: {sorted(missing)}"
    for k in ("goal", "collision_rate", "offroad_rate"):
        assert 0.0 <= m[k] <= 1.0, f"{name}: {k}={m[k]} out of [0,1]"
    for k in POLICY_KEYS:
        if k.endswith("_jsd"):
            assert 0.0 <= m[k] <= JSD_MAX, f"{name}: {k}={m[k]}"
    # tolerance bands around the committed 8k-step / 256-scene values
    # (exact: goal 0.512, CR 0.032, ADE 0.840, FDE 2.04, JSDs 0.018-0.053;
    #  streaming: goal 0.471, CR 0.029, ADE 0.931, FDE 2.33)
    assert 0.30 <= m["goal"] <= 0.70, f"{name}: goal {m['goal']}"
    assert m["collision_rate"] <= 0.10, f"{name}: CR {m['collision_rate']}"
    assert m["offroad_rate"] <= 0.05, f"{name}: OR {m['offroad_rate']}"
    assert m["ade"] <= 1.6, f"{name}: ADE {m['ade']}"
    assert m["fde"] <= 4.0, f"{name}: FDE {m['fde']}"
    for k in ("lin_speed_jsd", "ang_speed_jsd", "accel_jsd",
              "nearest_dist_jsd"):
        assert m[k] <= 0.15, f"{name}: {k}={m[k]}"


def test_planner_adversary_artifact():
    """32-scene planner-vs-adversary table (committed: ego_goal 0.469,
    ego_cr 0.0, ego_ade 0.90).

    Adversary-JSD sanity: the adversary runs a veh_veh_tilt=-10
    collision-seeking policy, so its behavior SHOULD diverge from the
    GT-replay bins the JSDs are computed against — the committed 0.14-0.39
    adversary JSDs are the tilt doing its job (an adversary with near-zero
    JSD would mean the tilt had no effect), while the ego planner's own
    displacement errors stay at the policy-eval level."""
    m = _load("eval_r04_planner.json")
    for k in ("ego_goal", "ego_cr", "ego_cr_w_adv", "ego_or"):
        assert k in m, f"missing {k} in planner artifact: {sorted(m)}"
        assert 0.0 <= m[k] <= 1.0, f"{k}={m[k]}"
    for k in ("ego_ade", "ego_fde", "ego_prog", "ego_accel", "ego_jerk",
              "ego_steer_rate"):
        assert k in m, f"missing {k} in planner artifact: {sorted(m)}"
        assert math.isfinite(m[k]), f"{k}={m[k]}"
    jsds = [k for k in m if k.endswith("_jsd")]
    assert jsds, f"no adversary JSDs in planner artifact: {sorted(m)}"
    for k in jsds:
        assert 0.0 <= m[k] <= JSD_MAX, f"{k}={m[k]}"
    # bands around the committed values
    assert m["ego_ade"] <= 1.8, f"ego_ade {m['ego_ade']}"
    assert m["ego_cr"] <= 0.2, f"ego_cr {m['ego_cr']}"


def test_streaming_passes_ab_within_seed_noise():
    """The fused action deferral's metric-level cost: within each seed, the
    2-pass vs 3-pass delta must be (a) tiny in absolute terms and (b) no
    larger than the cross-seed spread of the same metric — i.e. the
    deferral deviation is statistically invisible next to eval-seed noise.
    Committed run: max within-seed delta 0.004 (collision_rate, seed 0)
    vs cross-seed spreads ~0.02."""
    ab = _load("eval_r04_passes_ab.json")
    need = {f"seed{s}_passes{p}" for s in (0, 1) for p in (2, 3)}
    assert need <= set(ab), f"AB combos missing: {sorted(need - set(ab))}"

    metrics = ["goal", "collision_rate", "offroad_rate", "ade", "fde",
               "lin_speed_jsd", "ang_speed_jsd", "accel_jsd",
               "nearest_dist_jsd"]
    for k in metrics:
        deltas = [
            abs(ab[f"seed{s}_passes2"][k] - ab[f"seed{s}_passes3"][k])
            for s in (0, 1)
        ]
        seed_spread = max(
            abs(ab["seed0_passes2"][k] - ab["seed1_passes2"][k]),
            abs(ab["seed0_passes3"][k] - ab["seed1_passes3"][k]),
        )
        # absolute bound: ~3x the committed worst case
        assert max(deltas) <= 0.015 + 0.02 * abs(ab["seed0_passes2"][k]), (
            f"{k}: 2-vs-3-pass delta {max(deltas):.4f} too large"
        )
        # relative bound: within (a small multiple of) seed noise; the +1e-3
        # floor keeps metrics that are seed-stable (e.g. offroad 0.0) from
        # tripping on epsilon differences
        assert max(deltas) <= 2.0 * seed_spread + 1e-3, (
            f"{k}: deferral delta {max(deltas):.4f} exceeds seed noise "
            f"{seed_spread:.4f}"
        )


def test_packed_slots_ab_within_seed_noise():
    """The packed-crop deviation (pad slots' phantom keys are not attended)
    at the metric level, on a TRAINED 16-slot model evaluated on 6-agent
    scenes with an 8-slot packed crop vs full-width (two eval seeds, same
    checkpoint — artifacts/eval_r04_slots_ab.json, run C of
    tools/make_eval_artifact-style pipeline). Committed run: within-seed
    deltas <= 0.019 (ADE) / 0.015 (goal), comparable to the ~0.01-0.04
    cross-seed spreads — the deviation is at seed-noise level."""
    ab = _load("eval_r04_slots_ab.json")
    need = {f"seed{s}_slots{v}" for s in (0, 1) for v in ("8", "full")}
    assert need <= set(ab), f"combos missing: {sorted(need - set(ab))}"

    metrics = ["goal", "collision_rate", "offroad_rate", "ade", "fde",
               "lin_speed_jsd", "ang_speed_jsd", "accel_jsd",
               "nearest_dist_jsd"]
    for k in metrics:
        deltas = [
            abs(ab[f"seed{s}_slots8"][k] - ab[f"seed{s}_slotsfull"][k])
            for s in (0, 1)
        ]
        seed_spread = max(
            abs(ab["seed0_slots8"][k] - ab["seed1_slots8"][k]),
            abs(ab["seed0_slotsfull"][k] - ab["seed1_slotsfull"][k]),
        )
        assert max(deltas) <= 0.03 + 0.05 * abs(ab["seed0_slotsfull"][k]), (
            f"{k}: packed-vs-full delta {max(deltas):.4f} too large"
        )
        assert max(deltas) <= 2.0 * seed_spread + 2e-3, (
            f"{k}: packed delta {max(deltas):.4f} exceeds seed noise "
            f"{seed_spread:.4f}"
        )


# ---------------------------------------------------------------------------
# round-5 artifacts (tools/make_r05_artifacts.py): controllability,
# adversary, mode A/B, learning curve
# ---------------------------------------------------------------------------


def _sweep_series(sweep: dict, axis: str, seed: int) -> list[tuple[float, dict]]:
    pts = []
    pfx = f"seed{seed}_tilt"
    for k, v in sweep[axis].items():
        if k.startswith(pfx):
            pts.append((float(k[len(pfx):]), v))
    return sorted(pts)


def test_tilt_sweep_artifact_monotone_response():
    """The Fig-4 analog (policies/policy.py:108-142): negative veh-veh
    tilts must DEGRADE driving (higher ADE, lower goal rate) and positive
    tilts improve or hold it — checked as an ordering between the strong
    ends of the sweep for BOTH eval seeds on BOTH corpora, with the middle
    allowed seed-level noise. Goal tilt: the positive end must not reach a
    lower goal rate than the negative end (its marginal is near-bimodal, so
    the response is small but signed)."""
    sw = _load("eval_r05_tilt_sweep.json")
    for axis in ("veh_conflict", "veh_normal"):
        for seed in (0, 1):
            pts = dict(_sweep_series(sw, axis, seed))
            assert pts[-50.0]["ade"] > pts[0.0]["ade"] > pts[10.0]["ade"], (
                axis, seed, {t: p["ade"] for t, p in pts.items()})
            assert pts[-50.0]["goal"] < pts[10.0]["goal"], (
                axis, seed, {t: p["goal"] for t, p in pts.items()})
            # the extreme end keeps degrading (allow a small tolerance for
            # saturation noise between -50 and -100)
            assert pts[-100.0]["ade"] > pts[0.0]["ade"], (axis, seed)
    # goal axis: the response is GRADED AND MONOTONE in ADE across the
    # whole grid for both seeds — conditioning demonstrably steers the
    # policy — but the goal-RATE sign is INVERTED on this corpus: the goal
    # reward is sparse (+10 only at achievement) and episodes are 40 steps,
    # so high goal-RTG bins correlate with BEING NEAR the goal in training;
    # conditioning on them far away produces premature-arrival behavior
    # (committed: goal 0.379 -> 0.338 and ADE 2.08 -> 2.76 over tilt
    # 0 -> +10, both seeds). The veh axis above carries the paper-semantics
    # direction; this pin keeps the goal-axis response (and its documented
    # sign) from silently changing.
    for seed in (0, 1):
        pts = _sweep_series(sw, "goal_conflict", seed)
        ades = [p["ade"] for _, p in pts]
        assert all(a <= b + 0.05 for a, b in zip(ades, ades[1:])), (
            seed, ades)
        d = dict(pts)
        assert d[10.0]["ade"] > d[-10.0]["ade"] + 0.3, (seed, ades)
        assert d[10.0]["goal"] < d[0.0]["goal"], (
            seed, {t: p["goal"] for t, p in pts})


def test_planner_adversary_r05_collides():
    """Rounds 3-4 shipped planner artifacts whose adversary never produced
    one collision (ego_cr_w_adv = adv_coll_speed = 0). The round-5 setting
    — crossing-course conflict scenes + a model trained on a
    collision-diverse corpus — must show the adversary actually biting at
    the REFERENCE's own tilts (planner_adversary_evaluator.py:134-152)."""
    m = _load("eval_r05_planner.json")
    for key in ("reference_tilts", "strong_adversary"):
        assert m[key]["ego_cr_w_adv"] > 0.1, (key, m[key])
        assert m[key]["adv_coll_speed"] > 1.0, (key, m[key])


def test_mode_ab_exact_vs_streaming_bounded():
    """VERDICT r4 item 4: the one deviation pair that matters for trusting
    streaming evals. Same checkpoint, same scenes, 2 eval seeds: the
    exact-vs-streaming gap on goal/CR must stay within ~2x the cross-seed
    spread of the same metric (i.e. mode deviation is not large relative
    to ordinary eval noise), and the 2-pass vs 3-pass streaming gap must
    stay within the cross-seed spread itself."""
    ab = _load("eval_r05_mode_ab.json")

    def spread(keys, metric):
        vals = [ab[k][metric] for k in keys]
        return max(vals) - min(vals)

    for metric, floor in (("goal", 0.04), ("collision_rate", 0.02)):
        seed_noise = max(
            spread(("seed0_exact", "seed1_exact"), metric),
            spread(("seed0_streaming2", "seed1_streaming2"), metric),
            floor,  # quantization floor at the artifact's scene count
        )
        for seed in (0, 1):
            mode_gap = abs(
                ab[f"seed{seed}_exact"][metric]
                - ab[f"seed{seed}_streaming2"][metric]
            )
            assert mode_gap <= 2.0 * seed_noise, (
                metric, seed, mode_gap, seed_noise)
            passes_gap = abs(
                ab[f"seed{seed}_streaming2"][metric]
                - ab[f"seed{seed}_streaming3"][metric]
            )
            assert passes_gap <= 1.5 * seed_noise, (
                metric, seed, passes_gap, seed_noise)


def test_learning_curve_artifact():
    """26k-step x 2-seed learning curve. What the committed curves show:
    the ZERO-TILT closed-loop metrics saturate within ~2k steps on the
    64-scene corpus (goal ~0.46-0.48, ADE ~1.0-1.3 throughout, seed noise
    ~0.05 goal / ~0.3 ADE) and NEVER collapse, while the training losses
    keep falling (total 12.9 -> 2.0; the veh-veh RTG term 3.5 -> 0.5 is
    what round 4's 8k run had not yet learned, and what the tilt response
    rides on). The pins: full 26k run, no late-training quality collapse,
    cross-seed endpoint agreement, decreasing losses."""
    c = _load("curve_r05.json")
    ev = c["eval"]
    for s in (0, 1):
        steps = sorted(
            int(k.split("_step")[1]) for k in ev if k.startswith(f"seed{s}_")
        )
        assert steps[-1] >= 25000, steps
        series = [ev[f"seed{s}_step{st}"] for st in steps]
        last = series[-1]
        assert last["goal"] >= max(p["goal"] for p in series) - 0.08, (
            s, [p["goal"] for p in series])
        assert last["ade"] <= min(p["ade"] for p in series) + 0.5, (
            s, [p["ade"] for p in series])
    e0 = ev["seed0_step26000"]
    e1 = ev["seed1_step26000"]
    assert abs(e0["goal"] - e1["goal"]) < 0.15, (e0["goal"], e1["goal"])
    for s in (0, 1):
        tl = c["train_loss"][f"seed{s}"]
        assert tl[0]["total"] > 4.0 * tl[-1]["total"], (
            tl[0]["total"], tl[-1]["total"])
        assert tl[0]["loss_rtg_veh"] > 3.0 * tl[-1]["loss_rtg_veh"]
