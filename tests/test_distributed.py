"""Real multi-process distributed training test (VERDICT item 7).

Spawns 2 OS processes, each with 4 virtual CPU devices, that initialize
``jax.distributed`` against a local coordinator and run ONE GSPMD train step
over the global 8-device ``data`` mesh — the code path of
``train.py --distributed`` that a single-process virtual mesh cannot
exercise. Asserts:

- both processes complete and report the SAME loss and updated-parameter
  fingerprint (the gradient psum crossed the process boundary coherently);
- the loss matches a single-process 8-virtual-device run of the identical
  batch (cross-process == in-process collectives).

Skipped when local port binding is unavailable.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(n_local: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    env["PYTHONPATH"] = _REPO
    # drop the axon site hook (tunneled TPU backend) if present
    env.pop("JAX_PLATFORM_NAME", None)
    return env


def _parse(out: str) -> tuple[float, float]:
    m = re.search(r"RESULT pid=\d+ loss=([-\d.]+) pnorm=([-\d.]+)", out)
    assert m, f"worker produced no RESULT line:\n{out[-3000:]}"
    return float(m.group(1)), float(m.group(2))


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    try:
        port = _free_port()
    except OSError:
        pytest.skip("local port binding unavailable")
    coordinator = f"127.0.0.1:{port}"

    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(pid)],
            env=_worker_env(4),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker rc={p.returncode}:\n{out[-4000:]}"

    (loss0, pn0), (loss1, pn1) = _parse(outs[0]), _parse(outs[1])
    assert loss0 == pytest.approx(loss1, abs=1e-9)
    assert pn0 == pytest.approx(pn1, rel=1e-7)

    # single-process reference: same worker logic, 1 process x 8 devices
    sp = subprocess.run(
        [sys.executable, _WORKER, f"127.0.0.1:{_free_port()}", "1", "0"],
        env=_worker_env(8),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=600,
    )
    assert sp.returncode == 0, sp.stdout[-4000:]
    loss_sp, pn_sp = _parse(sp.stdout)
    assert loss0 == pytest.approx(loss_sp, abs=1e-5)
    assert pn0 == pytest.approx(pn_sp, rel=1e-5)
