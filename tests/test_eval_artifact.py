"""Regression checks on the committed end-to-end quality artifact.

artifacts/eval_r03_*.json are produced by tools/make_eval_artifact.py —
train -> closed-loop eval -> Table-1 metrics, small-scale, through the
repo's own CLIs (the reference's deliverable shape:
evaluators/policy_evaluator.py:578-593). These tests pin their keys and
value ranges so a change that breaks the closed loop, or silently degrades
its metrics, fails CI.
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


@pytest.mark.parametrize("name", ["eval_r03_exact.json", "eval_r03_streaming.json"])
def test_policy_eval_artifact(name):
    m = _load(name)
    missing = POLICY_KEYS - set(m)
    assert not missing, f"{name} missing metric keys: {sorted(missing)}"
    for k in ("goal", "collision_rate", "offroad_rate"):
        assert 0.0 <= m[k] <= 1.0, f"{name}: {k}={m[k]} out of [0,1]"
    for k in ("ade", "fde"):
        assert math.isfinite(m[k]) and 0.0 <= m[k] < 200.0, f"{name}: {k}={m[k]}"
    for k in POLICY_KEYS:
        if k.endswith("_jsd"):
            assert 0.0 <= m[k] <= JSD_MAX, f"{name}: {k}={m[k]}"
    # a trained model on the tiny synthetic corpus must do far better than
    # random driving: ADE under tens of meters over a 4 s horizon
    assert m["ade"] < 60.0, f"{name}: ADE {m['ade']} looks untrained"


def test_planner_adversary_artifact():
    m = _load("eval_r03_planner.json")
    # the ego planner block (planner_adversary_evaluator.py:370-429)
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
