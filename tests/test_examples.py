"""The committed examples/ scripts keep running end-to-end.

Each example is a user-facing drive of the library on the committed round-5
checkpoint; a silent break (config drift, checkpoint layout change, API
rename) would rot the first thing a new user runs. Slow-marked: each takes
a few minutes of CPU rollout.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str) -> str:
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


@pytest.mark.slow
def test_replay_rollout_example():
    out = _run("replay_rollout.py")
    assert "OK" in out
    assert "replay ADE vs GT" in out


@pytest.mark.slow
def test_tilt_control_example():
    out = _run("tilt_control.py")
    assert "restored step" in out
    # the dose-response table: one row per tilt setting, negative tilt
    # degrades (higher ADE than positive)
    rows = {}
    for line in out.splitlines():
        parts = line.split()
        if len(parts) == 4 and parts[0].lstrip("-").isdigit():
            rows[float(parts[0])] = float(parts[3])  # tilt -> ADE
    assert set(rows) == {-50.0, 0.0, 10.0}, out
    assert rows[-50.0] > rows[10.0], rows


@pytest.mark.slow
def test_adversarial_scenarios_example():
    out = _run("adversarial_scenarios.py")
    assert "restored step" in out
    assert "adversary tilt" in out
