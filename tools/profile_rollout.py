"""Profile the streaming rollout on TPU and aggregate device-op durations.

Usage (TPU env, repo root):
    python tools/profile_rollout.py [--envs 64] [--mode streaming]

Traces ONE jitted rollout call with jax.profiler, then parses the resulting
.trace.json.gz and prints the top op categories by total device time —
the quickest way to see whether the step is bound by the decode kernel,
cache copies, projections, or host gaps.
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import gzip
import json
import os
import sys
import time


def aggregate_trace(trace_dir: str, top: int = 25) -> None:
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        print(f"no trace files under {trace_dir}", file=sys.stderr)
        return
    path = files[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device lanes: TensorFlow-style XLA op events carry 'dur' in us
    by_name = collections.Counter()
    by_cat = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        dur = ev.get("dur", 0) / 1e3  # ms
        name = ev.get("name", "?")
        args = ev.get("args") or {}
        # keep only device-stream events (XLA ops have 'run_id'/'correlation
        # id' args; host python events have 'group_id' or long names)
        pid_name = ev.get("pid")
        if "tid" not in ev:
            continue
        if not any(k in args for k in ("run_id", "correlation_id", "queue_id")) and (
            "long_name" not in args and "kind" not in args
        ):
            # fall back: keep everything, classification below filters noise
            pass
        key = name.split(".")[0].split("(")[0]
        by_name[key] += dur
        cat = "other"
        for tag in (
            "fusion", "copy", "dynamic-update-slice", "dynamic-slice",
            "custom-call", "convolution", "dot", "reduce", "scatter",
            "gather", "transpose", "slice", "broadcast", "select",
            "all-reduce", "infeed", "outfeed",
        ):
            if tag in key:
                cat = tag
                break
        by_cat[cat] += dur
        total += dur
    print(f"trace: {path}")
    print(f"total traced op time: {total:.1f} ms")
    print("\nby category (ms):")
    for k, v in by_cat.most_common():
        print(f"  {k:28s} {v:10.2f}")
    print(f"\ntop {top} ops (ms):")
    for k, v in by_name.most_common(top):
        print(f"  {k:60.60s} {v:10.2f}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--mode", default="streaming")
    ap.add_argument("--slots", type=int, default=0,
                    help="eval.agent_slots (0 = full-width crops)")
    ap.add_argument("--bench-config", action="store_true",
                    help="mirror bench.py's deployment overrides (bf16 "
                    "cross scores) so the compile cache is shared")
    ap.add_argument("--trace-dir", default="/tmp/jaxtrace")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        aggregate_trace(args.trace_dir)
        return

    import jax

    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ctrl_sim_tpu.config import load_config
    from ctrl_sim_tpu.data import stack_scenarios, synthetic_scenario
    from ctrl_sim_tpu.data.scenario import Scenario
    from ctrl_sim_tpu.data.datagen import generate_offline_data
    from ctrl_sim_tpu.data.pipeline import build_train_batch
    from ctrl_sim_tpu.data.transforms import get_tilt_logits
    from ctrl_sim_tpu.models.ctrl_sim import CtRLSim
    from ctrl_sim_tpu.rollout.rollout import run_closed_loop
    from ctrl_sim_tpu.rollout.streaming import run_streaming

    over = {}
    if args.slots:
        over["eval.agent_slots"] = args.slots
    if args.bench_config:
        over["model.cross_score_dtype"] = "bfloat16"
    cfg = load_config(over)
    chunk = args.envs
    scenes = [
        synthetic_scenario(cfg, seed=s, num_agents=12, arena_half=300.0)
        for s in range(chunk)
    ]
    sb = stack_scenarios(scenes, cfg)
    sb = Scenario(
        **{
            k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
            for k, v in dataclasses.asdict(sb).items()
        }
    )
    model = CtRLSim(cfg)
    offline = jax.jit(lambda s: generate_offline_data(cfg, s))(sb)
    tb = jax.jit(lambda s, o: build_train_batch(cfg, jax.random.PRNGKey(0), s, o))(
        sb, offline
    )
    params = jax.jit(lambda b: model.init({"params": jax.random.PRNGKey(0)}, b))(tb)
    controlled = jnp.asarray(sb.moving) & jnp.asarray(sb.agent_valid)
    tilt = jnp.asarray(get_tilt_logits(0.0, 0.0, 0.0, cfg.waymo))
    run_fn = run_streaming if args.mode == "streaming" else run_closed_loop
    rollout = jax.jit(lambda s, p, c, r, t: run_fn(cfg, model, p, s, c, r, t))

    def _materialize(o):
        return float(np.asarray(o.reward8[-1]).sum())

    print("[profile] compiling ...", file=sys.stderr)
    t0 = time.time()
    _materialize(rollout(sb, params, controlled, jax.random.PRNGKey(1), tilt))
    print(f"[profile] compile+run {time.time()-t0:.1f}s", file=sys.stderr)

    jax.profiler.start_trace(args.trace_dir)
    t0 = time.time()
    _materialize(rollout(sb, params, controlled, jax.random.PRNGKey(2), tilt))
    wall = time.time() - t0
    jax.profiler.stop_trace()
    print(f"[profile] traced run: {wall:.3f}s wall", file=sys.stderr)
    aggregate_trace(args.trace_dir)


if __name__ == "__main__":
    main()
