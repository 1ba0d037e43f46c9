"""Round-5 quality artifacts: controllability, adversary, mode A/B, curve.

Everything runs on the round-5 committed checkpoints
(artifacts/r05/ckpt_s{0,1}): the SMALL-shape CtRL-Sim family trained 26k
steps on a COLLISION-DIVERSE corpus (64 synthetic scenes, 2 crossing-course
conflict pairs each, --synthetic_conflict 2) with episode-start
normalization, train seeds 0 and 1, checkpoints every 2000 steps. The
conflict corpus is what gives the veh-veh RTG marginal real support below
the "no collision" bin — on round 4's conflict-free corpus, exponential
tilts of +-10 had ZERO behavioral effect (the RTG head was a near-delta at
"nobody ever collides", so there was nothing for the tilt to re-weight).

Legs (ARTIFACT_ONLY selects one):

  tilt    — the Fig-4 analog (VERDICT r4 item 1): veh-veh and goal tilt
            sweeps on held-out scenes, 2 eval seeds, streaming rollouts ->
            artifacts/eval_r05_tilt_sweep.json. Reference semantics:
            policies/policy.py:108-142 (tilt-logit injection), paper Fig 4.
  planner — planner-vs-adversary on CONFLICT scenes (ego and adversary on
            crossing courses, the CAT-like setting) at the reference
            default tilts AND a stronger adversary ->
            artifacts/eval_r05_planner.json. Reference:
            evaluators/planner_adversary_evaluator.py:134-152, 322-358.
  modeab  — exact vs streaming vs streaming-3-pass on the SAME checkpoint
            and scenes, 2 eval seeds each (VERDICT r4 item 4) ->
            artifacts/eval_r05_mode_ab.json.
  curve   — learning curve (VERDICT r4 item 5): every saved checkpoint
            step x both training seeds on held-out scenes ->
            artifacts/curve_r05.json (+ train-loss streams).

Library-mode on purpose: one process per leg builds the store/params ONCE
(~5 min of device-side setup through the tunneled TPU) and then every eval
point costs ~12 s — the jitted rollout takes tilt logits as an ARGUMENT, so
the whole sweep shares one compiled program. The CLI path
(ctrl_sim_tpu.eval_sim) computes identical metrics (same PolicyEvaluator).

Run (TPU env, repo root):    python tools/make_r05_artifacts.py
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts")
CKPT = {s: os.path.join(ART, "r05", f"ckpt_s{s}") for s in (0, 1)}

# must match the training invocation (see module docstring / git history)
SMALL = {
    "model.hidden_dim": 64,
    "model.dim_feedforward": 128,
    "model.num_heads": 4,
    "model.num_transformer_encoder_layers": 1,
    "model.num_decoder_layers": 2,
    "model.compute_dtype": "float32",
    "waymo.train_context_length": 8,
    "waymo.max_num_agents": 8,
    "waymo.max_num_road_polylines": 24,
    "waymo.max_num_road_pts_per_polyline": 20,
    "sim.steps": 40,
    "sim.max_agents": 8,
    "waymo.episode_start_normalization": True,
}
HELD_OUT_SEED0 = 1000  # training corpus used scene seeds 0..63


def _setup(extra: dict, ckpt: str, step: int | None = None):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ctrl_sim_tpu.config import load_config
    from ctrl_sim_tpu.data.store import ScenarioStore
    from ctrl_sim_tpu.data.synthetic import synthetic_scenario
    from ctrl_sim_tpu.training import Trainer
    from ctrl_sim_tpu.training.checkpoint import CheckpointManager

    cfg = load_config({**SMALL, **extra})
    store_scenes = [
        synthetic_scenario(cfg, seed=s, num_agents=8) for s in range(4)
    ]
    store = ScenarioStore.from_scenes(cfg, store_scenes)
    sample = store.sample_batch(jax.random.PRNGKey(0), 2)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0), sample)
    mgr = CheckpointManager(cfg, ckpt)
    state = mgr.restore(state, step=step)
    print(f"[r05] restored step {int(state.step)} from {ckpt}", flush=True)
    return cfg, tr, state, mgr


def _scenes(cfg, n, conflict=0, seed0=HELD_OUT_SEED0):
    from ctrl_sim_tpu.data.synthetic import synthetic_scenario

    return [
        synthetic_scenario(
            cfg, seed=seed0 + s, num_agents=8, conflict_pairs=conflict
        )
        for s in range(n)
    ]


def leg_tilt() -> None:
    import jax.numpy as jnp

    from ctrl_sim_tpu.config import _set_dotted
    from ctrl_sim_tpu.data.transforms import get_tilt_logits
    from ctrl_sim_tpu.evals.evaluator import PolicyEvaluator

    n = int(os.environ.get("ARTIFACT_EVAL_SCENES", "256"))
    cfg, tr, state, _ = _setup({"eval.rollout_mode": "streaming"}, CKPT[0])
    # ONE conflict pair per eval scene: a controlled agent on a collision
    # course is what makes the veh-veh tilt response measurable as a
    # collision rate (conflict-free scenes offer nothing to collide with;
    # the smoke run showed ADE/goal responding but CR flat at the
    # no-opportunity baseline)
    corpora = {
        "conflict": _scenes(cfg, n, conflict=1),
        "normal": _scenes(cfg, n),
    }
    ev = PolicyEvaluator(cfg, tr.model, state.params, lane_batch=32)
    sweep: dict = {"meta": {
        "ckpt": CKPT[0], "scenes": n, "scene_seed0": HELD_OUT_SEED0,
        "mode": "streaming",
    }}
    # veh axis on both corpora (conflict scenes put controlled agents on
    # crossing courses — collision opportunities the tilt modulates);
    # goal-RTG marginals are near-bimodal (bins 0/349), so the goal
    # response saturates by |tilt|~10 — its grid samples the transition
    plan = (
        ("veh_conflict", "conflict", "veh", (-100, -50, -10, 0, 10, 50)),
        ("veh_normal", "normal", "veh", (-100, -50, -10, 0, 10, 50)),
        ("goal_conflict", "conflict", "goal", (-10, -3, -1, 0, 1, 3, 10)),
    )
    for key, corpus, axis, values in plan:
        sweep[key] = {}
        for seed in (0, 1):
            for t in values:
                ev.cfg = _set_dotted(cfg, "eval.seed", seed)
                gt, vt = (t, 0.0) if axis == "goal" else (0.0, t)
                ev.tilt_logits = jnp.asarray(
                    get_tilt_logits(gt, vt, 0.0, cfg.waymo)
                )
                m = ev.evaluate(corpora[corpus])
                sweep[key][f"seed{seed}_tilt{t}"] = m
                print(f"[tilt] {key} seed{seed} tilt{t}: "
                      f"goal={m['goal']:.3f} cr={m['collision_rate']:.4f} "
                      f"ade={m['ade']:.3f}", flush=True)
    with open(os.path.join(ART, "eval_r05_tilt_sweep.json"), "w") as f:
        json.dump(sweep, f, indent=2)
    print("[artifact] tilt sweep written", flush=True)


def leg_planner() -> None:
    from ctrl_sim_tpu.config import TiltConfig
    from ctrl_sim_tpu.evals.planner_adversary import PlannerAdversaryEvaluator

    n = int(os.environ.get("ARTIFACT_PLANNER_SCENES", "64"))
    sel = {
        "eval.rollout_mode": "streaming",
        # 40-step conflict scenes need relaxed "interesting pair"
        # thresholds (defaults are Waymo-episode-scale)
        "eval.interesting_traj_len_threshold": 20,
        "eval.interesting_timestep_diff_threshold": 5,
        "eval.interesting_goal_dist_threshold": 1000.0,
    }
    cfg, tr, state, _ = _setup(sel, CKPT[0])
    scenes = _scenes(cfg, n, conflict=2)
    results: dict = {"meta": {"ckpt": CKPT[0], "scenes": n,
                              "conflict_pairs": 2,
                              "scene_seed0": HELD_OUT_SEED0}}
    for name, adv in (("reference_tilts", TiltConfig(veh_veh_tilt=-10.0)),
                      ("strong_adversary", TiltConfig(veh_veh_tilt=-50.0))):
        ev = PlannerAdversaryEvaluator(
            cfg, tr.model, state.params, adversary_tilt=adv, lane_batch=32,
        )
        m = ev.evaluate(scenes)
        results[name] = m
        print(f"[planner] {name}: cr_w_adv={m.get('ego_cr_w_adv')} "
              f"adv_coll_speed={m.get('adv_coll_speed')}", flush=True)
    with open(os.path.join(ART, "eval_r05_planner.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("[artifact] planner written", flush=True)


def leg_modeab() -> None:
    from ctrl_sim_tpu.config import _set_dotted
    from ctrl_sim_tpu.evals.evaluator import PolicyEvaluator

    n = int(os.environ.get("ARTIFACT_AB_SCENES", "128"))
    ab: dict = {"meta": {"ckpt": CKPT[0], "scenes": n,
                         "scene_seed0": HELD_OUT_SEED0}}
    cfg0, tr, state, _ = _setup({}, CKPT[0])
    scenes = _scenes(cfg0, n)
    for mode, passes in (("exact", 2), ("streaming", 2), ("streaming", 3)):
        cfg = _set_dotted(cfg0, "eval.rollout_mode", mode)
        cfg = _set_dotted(cfg, "eval.streaming_passes", passes)
        ev = PolicyEvaluator(
            cfg, tr.model, state.params,
            lane_batch=32 if mode == "streaming" else 16,
        )
        for seed in (0, 1):
            ev.cfg = _set_dotted(cfg, "eval.seed", seed)
            key = f"seed{seed}_{mode}{passes if mode == 'streaming' else ''}"
            m = ev.evaluate(scenes)
            ab[key] = m
            print(f"[modeab] {key}: goal={m['goal']:.3f} "
                  f"cr={m['collision_rate']:.4f}", flush=True)
    with open(os.path.join(ART, "eval_r05_mode_ab.json"), "w") as f:
        json.dump(ab, f, indent=2)
    print("[artifact] mode A/B written", flush=True)


def leg_curve() -> None:
    from ctrl_sim_tpu.evals.evaluator import PolicyEvaluator

    n = int(os.environ.get("ARTIFACT_CURVE_SCENES", "64"))
    curve: dict = {"eval": {}, "train_loss": {}, "meta": {
        "scenes": n, "scene_seed0": HELD_OUT_SEED0, "mode": "streaming",
    }}
    for s in (0, 1):
        steps = sorted(int(d) for d in os.listdir(CKPT[s]) if d.isdigit())
        cfg, tr, state, mgr = _setup(
            {"eval.rollout_mode": "streaming"}, CKPT[s], step=steps[0]
        )
        scenes = _scenes(cfg, n)
        ev = PolicyEvaluator(cfg, tr.model, state.params, lane_batch=32)
        for step in steps:
            state = mgr.restore(state, step=step)
            ev.params = state.params
            m = ev.evaluate(scenes)
            curve["eval"][f"seed{s}_step{step}"] = m
            print(f"[curve] seed{s} step{step}: goal={m['goal']:.3f} "
                  f"cr={m['collision_rate']:.4f} ade={m['ade']:.3f}",
                  flush=True)
        with open(os.path.join(CKPT[s], "metrics.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        curve["train_loss"][f"seed{s}"] = [
            {"step": r["step"], "total": r["total"],
             "loss_rtg_veh": r.get("loss_rtg_veh")}
            for r in rows if "total" in r
        ]
    with open(os.path.join(ART, "curve_r05.json"), "w") as f:
        json.dump(curve, f, indent=2)
    print("[artifact] curve written", flush=True)


def main() -> None:
    only = os.environ.get("ARTIFACT_ONLY", "")
    legs = {"tilt": leg_tilt, "planner": leg_planner,
            "modeab": leg_modeab, "curve": leg_curve}
    for name, fn in legs.items():
        if not only or only == name:
            fn()


if __name__ == "__main__":
    main()
