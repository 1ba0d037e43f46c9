"""Produce the committed end-to-end quality artifact (VERDICT item 6).

Runs the full closed loop the reference's deliverable embodies
(train -> closed-loop eval -> Table-1 metrics dict, mirroring
evaluators/policy_evaluator.py:426-595's pipeline and :578-593's metric
dumps), small-scale on the synthetic corpus, entirely through the repo's
own CLIs:

  run A (reference semantics, window-anchored frames):
    train -> eval_sim --rollout exact -> artifacts/eval_r04_exact.json
          -> eval_planner              -> artifacts/eval_r04_planner.json
  run B (streaming deployment semantics, episode-start frames):
    train (waymo.episode_start_normalization=True)
          -> eval_sim streaming        -> artifacts/eval_r04_streaming.json

tests/test_eval_artifact.py regression-checks the committed JSONs' keys and
ranges, so a change that breaks the closed loop (or silently degrades its
metrics) fails CI.

Round 4 scale-up (VERDICT r3 item 7): 8k training steps, 256-scene
exact/streaming evals, a 32-scene planner table, and the fused-2-pass vs
sequential-3-pass streaming A/B over two eval seeds
(eval_r04_passes_ab.json) that bounds the action-deferral deviation at the
metric level (VERDICT r3 item 6).

Run (CPU, repo root; several hours at the round-4 defaults — set
ARTIFACT_STEPS/ARTIFACT_SCENES/ARTIFACT_EVAL_SCENES smaller for a smoke):
    python tools/make_eval_artifact.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts")

# small-but-real shapes: full tokenization (1000 action bins, 350 RTG bins),
# reduced width/depth/context so CPU training converges in minutes
SMALL = [
    "-o", "model.hidden_dim=64",
    "-o", "model.dim_feedforward=128",
    "-o", "model.num_heads=4",
    "-o", "model.num_transformer_encoder_layers=1",
    "-o", "model.num_decoder_layers=2",
    "-o", "model.compute_dtype=float32",
    "-o", "waymo.train_context_length=8",
    "-o", "waymo.max_num_agents=8",
    "-o", "waymo.max_num_road_polylines=24",
    "-o", "waymo.max_num_road_pts_per_polyline=20",
    "-o", "sim.steps=40",
    "-o", "sim.max_agents=8",
    "-o", "train.global_batch_size=8",
    "-o", "train.warmup_steps=100",
]


def run(mod: str, *args: str) -> None:
    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    cmd = [sys.executable, "-m", mod, *args]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, env=env, cwd=REPO)


def main() -> None:
    os.makedirs(ART, exist_ok=True)
    steps = os.environ.get("ARTIFACT_STEPS", "8000")
    scenes = os.environ.get("ARTIFACT_SCENES", "48")
    eval_scenes = os.environ.get("ARTIFACT_EVAL_SCENES", "256")
    ab_scenes = os.environ.get("ARTIFACT_AB_SCENES", "128")
    only = os.environ.get("ARTIFACT_ONLY", "")  # e.g. "planner" to redo one leg
    ckpt_a = os.path.join(ART, "ckpt_a")  # gitignored; kept for leg reruns
    ckpt_b = os.path.join(ART, "ckpt_b")

    # the 40-step episodes need relaxed "interesting pair" thresholds
    # (eval.interesting_traj_len_threshold defaults to 60 — longer than the
    # whole episode — which selects no planner/adversary pair at all)
    # synthetic scenes spread goals over the arena, so the Waymo-scale
    # goal-proximity criterion selects nothing; accept any long-enough
    # moving pair (the artifact exercises the pipeline, not pair realism)
    planner_sel = [
        "-o", "eval.interesting_traj_len_threshold=20",
        "-o", "eval.interesting_timestep_diff_threshold=5",
        "-o", "eval.interesting_goal_dist_threshold=1000.0",
    ]

    if not only or only == "a":
        # ---- run A: reference semantics -------------------------------
        if os.path.exists(ckpt_a):
            shutil.rmtree(ckpt_a)
        run(
            "ctrl_sim_tpu.train", *SMALL,
            "--synthetic", scenes, "--synthetic_agents", "6",
            "--steps", steps, "--save_dir", ckpt_a, "--log_every", "200",
        )
    if not only or only in ("a", "exact"):
        run(
            "ctrl_sim_tpu.eval_sim", *SMALL,
            "-o", "eval.rollout_mode=exact",
            "-o", f"eval.num_files_to_evaluate={eval_scenes}",
            "--ckpt", ckpt_a, "--synthetic", eval_scenes, "--lane_batch", "32",
            "--out", os.path.join(ART, "eval_r04_exact.json"),
        )
    if not only or only in ("a", "planner"):
        run(
            "ctrl_sim_tpu.eval_planner", *SMALL, *planner_sel,
            "-o", "eval.rollout_mode=exact",
            "--ckpt", ckpt_a, "--synthetic", "32", "--synthetic_agents", "6",
            "--lane_batch", "16",
            "--out", os.path.join(ART, "eval_r04_planner.json"),
        )

    if not only or only == "b":
        # ---- run B: streaming deployment semantics --------------------
        if os.path.exists(ckpt_b):
            shutil.rmtree(ckpt_b)
        run(
            "ctrl_sim_tpu.train", *SMALL,
            "-o", "waymo.episode_start_normalization=true",
            "--synthetic", scenes, "--synthetic_agents", "6",
            "--steps", steps, "--save_dir", ckpt_b, "--log_every", "200",
        )
    if not only or only in ("b", "streaming"):
        run(
            "ctrl_sim_tpu.eval_sim", *SMALL,
            "-o", "waymo.episode_start_normalization=true",
            "-o", "eval.rollout_mode=streaming",
            "-o", f"eval.num_files_to_evaluate={eval_scenes}",
            "--ckpt", ckpt_b, "--synthetic", eval_scenes, "--lane_batch", "32",
            "--out", os.path.join(ART, "eval_r04_streaming.json"),
        )

    if not only or only == "ab":
        # ---- fused 2-pass vs sequential 3-pass streaming A/B ----------
        ab: dict = {}
        for seed in (0, 1):
            for passes in (2, 3):
                out = os.path.join(ART, f"_ab_s{seed}_p{passes}.json")
                run(
                    "ctrl_sim_tpu.eval_sim", *SMALL,
                    "-o", "waymo.episode_start_normalization=true",
                    "-o", "eval.rollout_mode=streaming",
                    "-o", f"eval.streaming_passes={passes}",
                    "-o", f"eval.seed={seed}",
                    "-o", f"eval.num_files_to_evaluate={ab_scenes}",
                    "--ckpt", ckpt_b, "--synthetic", ab_scenes,
                    "--lane_batch", "32", "--out", out,
                )
                with open(out) as f:
                    ab[f"seed{seed}_passes{passes}"] = json.load(f)
                os.remove(out)
        with open(os.path.join(ART, "eval_r04_passes_ab.json"), "w") as f:
            json.dump(ab, f, indent=2)

    for name in ("eval_r04_exact", "eval_r04_planner", "eval_r04_streaming"):
        path = os.path.join(ART, name + ".json")
        if not os.path.exists(path):
            print(f"[artifact] {name}: (not generated in this invocation)")
            continue
        with open(path) as f:
            m = json.load(f)
        print(f"[artifact] {name}: {sorted(m)[:6]} ...")


if __name__ == "__main__":
    main()
