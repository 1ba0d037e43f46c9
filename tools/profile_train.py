"""Training-throughput forensics on TPU (VERDICT r4 item 8).

Measures the full-size train step (reference configuration: 256-d, 2+4
layers, 24 agents, 32-step context, global batch 64 — cfgs/train/base.yaml)
the way the rollout was profiled: wall-time matrix over the live levers
(gradient-accumulation split, remat, flash-attention block, compute dtype)
plus an MFU estimate from the analytic FLOP count.

Usage (TPU env, repo root):
    python tools/profile_train.py [--levers] [--trace]

The default run times the shipped configuration only; --levers sweeps the
matrix (each cell pays a fresh remote compile, minutes); --trace writes a
profiler trace for one step and aggregates device-op categories.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--levers", action="store_true")
    p.add_argument("--trace", action="store_true")
    p.add_argument("--steps", type=int, default=5)
    args = p.parse_args()

    import jax

    cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from ctrl_sim_tpu.config import load_config
    from ctrl_sim_tpu.data.store import ScenarioStore
    from ctrl_sim_tpu.data.synthetic import synthetic_scenario
    from ctrl_sim_tpu.training import Trainer

    def measure(name: str, overrides: dict) -> float | None:
        cfg = load_config(overrides)
        try:
            scenes = [
                synthetic_scenario(cfg, seed=s, num_agents=12)
                for s in range(4)
            ]
            store = ScenarioStore.from_scenes(cfg, scenes)
            batch = store.sample_batch(
                jax.random.PRNGKey(0), cfg.train.global_batch_size
            )
            tr = Trainer(cfg)
            state = tr.init_state(jax.random.PRNGKey(0), batch)
            step_fn = tr.make_train_step()
            rng = jax.random.PRNGKey(1)
            t0 = time.time()
            state, metrics = step_fn(state, batch, rng)
            float(np.asarray(metrics.total))  # forced transfer
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.steps):
                state, metrics = step_fn(state, batch, rng)
            loss = float(np.asarray(metrics.total))
            dt = (time.time() - t0) / args.steps
            print(
                f"{name:42s} {dt * 1e3:8.1f} ms/step  "
                f"({cfg.train.global_batch_size / dt:6.1f} samples/s, "
                f"compile {compile_s:.0f}s, loss {loss:.3f})",
                flush=True,
            )
            return dt
        except Exception as e:  # OOM cells are data, not failures
            print(f"{name:42s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            return None

    base: dict = {}  # full-size defaults ARE the reference config
    shipped = {"train.accum_steps": 4, "model.remat": True}

    dt = measure("shipped (accum 4x16, remat, flash)", shipped)

    if dt is not None:
        # analytic FLOPs: 3x forward cost for fwd+bwd, forward ~= token and
        # memory matmuls. Decoder tokens N = T*A*K = 32*24*3 = 2304 per
        # sample; per layer ~ (qkv+out: 4*N*D^2) + (cross: 2*N*D^2 +
        # 2*N*M*D) + (ff: 2*N*D*F) MACs; encoder over M=~600 memory tokens;
        # attention scores ~ N^2*D self + N*M*D cross. Rough but
        # order-correct — the point is the MFU ballpark.
        D, F, NTOK, M, LYR = 256, 1024, 2304, 624, 4
        per_layer = (4 + 2) * NTOK * D * D + 2 * NTOK * M * D + 2 * NTOK * D * F
        attn = NTOK * NTOK * D * 2  # qk + av
        enc = 2 * (4 * M * D * D + 2 * M * D * F + 2 * M * M * D)
        fwd_macs = LYR * (per_layer + attn) + enc
        flops = 3 * 2 * fwd_macs * 64  # bwd ~= 2x fwd, global batch 64
        print(
            f"analytic ~{flops / 1e12:.2f} TFLOP/step -> "
            f"MFU ~{flops / dt / 197e12 * 100:.1f}% of v5e bf16 peak "
            f"(197 TFLOP/s)"
        )

    if args.levers:
        measure("accum 2x32", {"train.accum_steps": 2, "model.remat": True})
        measure("accum 1x64", {"train.accum_steps": 1, "model.remat": True})
        measure("accum 4x16, no remat",
                {"train.accum_steps": 4, "model.remat": False})
        measure("accum 2x32, no remat",
                {"train.accum_steps": 2, "model.remat": False})
        measure("accum 1x64, no remat",
                {"train.accum_steps": 1, "model.remat": False})
        measure("accum 4x16, flash block 256",
                {"train.accum_steps": 4, "model.flash_block_q": 256})
        measure("accum 4x16, no flash (einsum attn)",
                {"train.accum_steps": 4, "model.use_flash_attention": False})

    if args.trace:
        cfg = load_config(shipped)
        scenes = [synthetic_scenario(cfg, seed=s, num_agents=12) for s in range(4)]
        store = ScenarioStore.from_scenes(cfg, scenes)
        batch = store.sample_batch(
            jax.random.PRNGKey(0), cfg.train.global_batch_size
        )
        tr = Trainer(cfg)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        step_fn = tr.make_train_step()
        rng = jax.random.PRNGKey(1)
        state, m = step_fn(state, batch, rng)
        float(np.asarray(m.total))
        trace_dir = "/tmp/jaxtrace_train"
        jax.profiler.start_trace(trace_dir)
        state, m = step_fn(state, batch, rng)
        float(np.asarray(m.total))
        jax.profiler.stop_trace()
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_rollout import aggregate_trace

        aggregate_trace(trace_dir)


if __name__ == "__main__":
    main()
