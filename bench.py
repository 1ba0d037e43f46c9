"""Benchmark: closed-loop policy rollout throughput (BASELINE config 3).

Measures env-steps/s for the full CtRL-Sim policy rollout — two transformer
passes + tilted RTG sampling + action sampling + FreeCar dynamics + collision
+ rewards per step — batched over parallel Waymo-format scenarios on one
chip. Prints ONE JSON line:

  {"metric": "env_steps_per_sec", "value": N, "unit": "env-steps/s/chip",
   "vs_baseline": N / 100000}

Baseline target (BASELINE.md): >= 100,000 env-steps/s/host at 1024 parallel
scenarios.

Knobs via env vars: BENCH_ENVS (default 1024), BENCH_CHUNK (lanes per jitted
rollout call, default 256 streaming / 32 exact), BENCH_MODE
(exact|streaming), BENCH_AGENTS/BENCH_LANES (scene density),
BENCH_SLOTS (packed agent slots, default auto), BENCH_PASSES (2|3),
BENCH_CONTACTS, BENCH_KV (bfloat16|int8), BENCH_XSCORE.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np


def main() -> None:
    import jax

    # persistent compilation cache: the tunneled remote compiler takes many
    # minutes for transformer-sized rollout graphs; cache the executable so
    # repeat bench runs skip it
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ctrl_sim_tpu.config import load_config
    from ctrl_sim_tpu.data import stack_scenarios, synthetic_scenario
    from ctrl_sim_tpu.data.scenario import Scenario
    from ctrl_sim_tpu.data.transforms import get_tilt_logits
    from ctrl_sim_tpu.models.ctrl_sim import CtRLSim
    from ctrl_sim_tpu.rollout.rollout import run_closed_loop
    from ctrl_sim_tpu.rollout.streaming import run_streaming

    mode = os.environ.get("BENCH_MODE", "streaming")
    total_envs = int(os.environ.get("BENCH_ENVS", "1024"))
    # chunk (lanes per jitted call): round-4 sweep at 16 packed slots —
    # 128: 16.4k, 192: 17.3k, 256: 17.5k (best), 384: 17.1k. (Round 3's
    # chunk-256 collapse was specific to the 24-slot shapes; it does not
    # occur at the packed layout.) 1024 envs = 4 x 256 lanes
    chunk = int(os.environ.get("BENCH_CHUNK", "256" if mode == "streaming" else "32"))
    # scene realism knobs: default 12 agents / 4 lanes matches rounds 1-2;
    # BENCH_AGENTS=24 fills every model slot, BENCH_LANES raises the
    # road-edge segment count the collision/reward path scans
    bench_agents = int(os.environ.get("BENCH_AGENTS", "12"))
    bench_lanes = int(os.environ.get("BENCH_LANES", "4"))
    kv_dtype = os.environ.get("BENCH_KV", "bfloat16")  # bfloat16 | int8
    # deployment-throughput config: bf16 cross-attention scores (halves the
    # cross-attn HBM traffic; reductions stay f32, ~0.5% relative rounding on
    # attention weights — models/layers.py). BENCH_XSCORE=float32 for the
    # bit-parity configuration.
    xscore = os.environ.get("BENCH_XSCORE", "bfloat16")
    # BENCH_PASSES=3 measures the faithful sequential decode
    # (eval.streaming_passes — reference pass order, 1.5x cache traffic)
    passes = int(os.environ.get("BENCH_PASSES", "2"))
    # rollout RNG implementation. The samplers draw ~12M random logit
    # perturbations per env step (gumbel over 1000 action + 3x350 RTG bins
    # per agent); threefry generates them in pure VPU arithmetic, while
    # "rbg" uses the TPU's hardware RngBitGenerator — measured +3.8%
    # end-to-end (round 5). Identical sampling DISTRIBUTION, different
    # stream; threefry remains the default everywhere else (evaluators,
    # training) for cross-backend bitwise reproducibility.
    rng_impl = os.environ.get("BENCH_RNG", "rbg")
    # default ON (reference parity: the reference always simulates contacts);
    # BENCH_CONTACTS=0 measures the pass-through configuration (+8-10%)
    contacts = os.environ.get("BENCH_CONTACTS", "1") != "0"
    # packed agent slots (round 4): the KV-cache DMA scales with model
    # slots, not real agents, so the bench packs scenes into the smallest
    # 8-multiple crop that fits every agent (eval.agent_slots; multiples of
    # 8 keep the cache's agent dim sublane-tile-aligned — a 12-slot cache
    # measured SLOWER than 24 because every update-slice misaligned).
    # BENCH_SLOTS=0 restores full-width 24-slot crops; BENCH_SLOTS=N pins N.
    slots_env = os.environ.get("BENCH_SLOTS", "auto")

    cfg = load_config(
        {
            "model.kv_cache_dtype": kv_dtype,
            "model.cross_score_dtype": xscore,
            "sim.resolve_contacts": contacts,
            "eval.streaming_passes": passes,
        }
    )
    if slots_env == "auto":
        agent_slots = min(
            cfg.waymo.max_num_agents, ((bench_agents + 7) // 8) * 8
        )
        if agent_slots >= cfg.waymo.max_num_agents:
            agent_slots = 0
    else:
        agent_slots = int(slots_env)
    if agent_slots:
        cfg = load_config(
            {
                "model.kv_cache_dtype": kv_dtype,
                "model.cross_score_dtype": xscore,
                "sim.resolve_contacts": contacts,
                "eval.streaming_passes": passes,
                "eval.agent_slots": agent_slots,
            }
        )
    steps = cfg.sim.steps

    # one chunk of synthetic scenes, reused for every chunk (same shapes; the
    # timing is shape-driven, content-independent)
    print(f"[bench] building {chunk} scenarios ...", file=sys.stderr)
    scenes = [
        synthetic_scenario(
            cfg, seed=s, num_agents=bench_agents, arena_half=300.0,
            num_lanes=bench_lanes,
        )
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
    # init params from a minimal rollout-shaped batch
    from ctrl_sim_tpu.data.datagen import generate_offline_data
    from ctrl_sim_tpu.data.pipeline import build_train_batch

    print("[bench] initializing model ...", file=sys.stderr)
    offline = jax.jit(lambda s: generate_offline_data(cfg, s))(sb)
    tb = jax.jit(lambda s, o: build_train_batch(cfg, jax.random.PRNGKey(0), s, o))(
        sb, offline
    )
    # jitted init: eager init through the tunneled TPU pays a network
    # roundtrip per op
    params = jax.jit(
        lambda b: model.init({"params": jax.random.PRNGKey(0)}, b)
    )(tb)

    controlled = jnp.asarray(sb.moving) & jnp.asarray(sb.agent_valid)
    tilt = jnp.asarray(get_tilt_logits(0.0, 0.0, 0.0, cfg.waymo))

    run_fn = run_streaming if mode == "streaming" else run_closed_loop
    # every array passed as an argument (NOT closed over: closures embed
    # device arrays as MLIR constants, forcing device->host transfers at
    # lowering time and bloating the program)
    rollout = jax.jit(lambda s, p, c, r, t: run_fn(cfg, model, p, s, c, r, t))

    def _materialize(o):
        # force a real device->host transfer: through the tunneled device,
        # block_until_ready alone does not guarantee execution completed
        return float(np.asarray(o.reward8[-1]).sum())

    print("[bench] compiling rollout ...", file=sys.stderr)
    t0 = time.time()
    out = rollout(sb, params, controlled, jax.random.key(1, impl=rng_impl), tilt)
    _materialize(out)
    compile_s = time.time() - t0
    print(f"[bench] compile+first run: {compile_s:.1f}s", file=sys.stderr)

    n_chunks = max(total_envs // chunk, 1)
    # repeated measurement laps, median reported: the tunneled dispatch path
    # adds occasional latency spikes (round 4's driver run recorded 16.2k
    # against back-to-back repeats of 17.3k at the identical config — a 7%
    # one-lap outlier, reconciled in BENCH_NOTES round 5); the median of
    # three in-process laps is robust to one bad lap and costs ~11 s
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    laps = []
    checksum = 0.0
    for lap in range(repeats):
        t0 = time.time()
        # dispatch every chunk before materializing any: device execution is
        # in-order, so the final transfers complete only after ALL rollouts
        # ran — the elapsed window still covers every chunk's device time,
        # but the per-call tunnel round-trip (dispatch + host sync) no
        # longer serializes into the measurement
        outs = [
            rollout(
                sb, params, controlled,
                jax.random.key(2 + lap * n_chunks + i, impl=rng_impl), tilt,
            )
            for i in range(n_chunks)
        ]
        checksum = sum(_materialize(o) for o in outs)
        elapsed = time.time() - t0
        laps.append(n_chunks * chunk * steps / elapsed)
        print(
            f"[bench] lap {lap}: {laps[-1]:.0f} env-steps/s ({elapsed:.2f}s)",
            file=sys.stderr,
        )
    print(f"[bench] checksum {checksum:.3f}", file=sys.stderr)

    laps.sort()
    eps = laps[len(laps) // 2]
    elapsed = n_chunks * chunk * steps / eps
    result = {
        "metric": "env_steps_per_sec",
        "value": round(eps, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(eps / 100_000.0, 4),
        "detail": {
            "mode": mode, "cross_score_dtype": xscore,
            "kv_dtype": kv_dtype, "rng": rng_impl,
            "envs": n_chunks * chunk,
            "chunk": chunk,
            "agents": bench_agents,
            "agent_slots": agent_slots or cfg.waymo.max_num_agents,
            "lanes": bench_lanes,
            "contacts": contacts,
            "passes": passes,
            "steps": steps,
            "elapsed_s": round(elapsed, 2),
            "laps": [round(x, 1) for x in laps],
            "compile_s": round(compile_s, 1),
            "device": str(jax.devices()[0]),
            "note": (
                "default simulates vehicle contacts (reference parity); "
                "bit-parity configuration (BENCH_XSCORE=float32 cross-attn "
                "scores) measured 15.3k env-steps/s/chip round 5; the "
                "contacts-off / chunk-sweep / kernel-race / "
                "measured-bandwidth-roofline matrix lives in BENCH_NOTES.md"
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
