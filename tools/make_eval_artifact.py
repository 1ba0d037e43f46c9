"""Produce the committed end-to-end quality artifact (VERDICT item 6).

Runs the full closed loop the reference's deliverable embodies
(train -> closed-loop eval -> Table-1 metrics dict, mirroring
evaluators/policy_evaluator.py:426-595's pipeline and :578-593's metric
dumps), small-scale on the synthetic corpus, entirely through the repo's
own CLIs:

  run A (reference semantics, window-anchored frames):
    train -> eval_sim --rollout exact -> artifacts/eval_r03_exact.json
          -> eval_planner              -> artifacts/eval_r03_planner.json
  run B (streaming deployment semantics, episode-start frames):
    train (waymo.episode_start_normalization=True)
          -> eval_sim streaming        -> artifacts/eval_r03_streaming.json

tests/test_eval_artifact.py regression-checks the committed JSONs' keys and
ranges, so a change that breaks the closed loop (or silently degrades its
metrics) fails CI.

Run (CPU, repo root; ~10-20 min):
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
    steps = os.environ.get("ARTIFACT_STEPS", "1500")
    scenes = os.environ.get("ARTIFACT_SCENES", "24")
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
            "-o", "eval.num_files_to_evaluate=12",
            "--ckpt", ckpt_a, "--synthetic", "12", "--lane_batch", "12",
            "--out", os.path.join(ART, "eval_r03_exact.json"),
        )
    if not only or only in ("a", "planner"):
        run(
            "ctrl_sim_tpu.eval_planner", *SMALL, *planner_sel,
            "-o", "eval.rollout_mode=exact",
            "--ckpt", ckpt_a, "--synthetic", "8", "--synthetic_agents", "6",
            "--lane_batch", "8",
            "--out", os.path.join(ART, "eval_r03_planner.json"),
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
            "-o", "eval.num_files_to_evaluate=12",
            "--ckpt", ckpt_b, "--synthetic", "12", "--lane_batch", "12",
            "--out", os.path.join(ART, "eval_r03_streaming.json"),
        )

    for name in ("eval_r03_exact", "eval_r03_planner", "eval_r03_streaming"):
        path = os.path.join(ART, name + ".json")
        with open(path) as f:
            m = json.load(f)
        print(f"[artifact] {name}: {sorted(m)[:6]} ...")


if __name__ == "__main__":
    main()
