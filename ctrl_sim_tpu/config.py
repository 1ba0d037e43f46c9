"""Layered configuration for ctrl_sim_tpu.

Plain frozen dataclasses instead of Hydra. Every constant that defines
bit-exactness of the reference pipeline is pinned here with the same value
as the reference config tree:

- reward/goal tolerances ................ /root/reference/cfgs/config.yaml (rew_cfg)
- discretization/normalization .......... /root/reference/cfgs/dataset/waymo/base.yaml
- model dims ............................ /root/reference/cfgs/model/*.yaml
- training scale ........................ /root/reference/cfgs/train/*.yaml
- eval setup ............................ /root/reference/cfgs/eval/*.yaml

Overrides compose through ``dataclasses.replace`` / ``load_config(**updates)``
and a minimal dotted-key override parser for CLI use.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Tuple


# ---------------------------------------------------------------------------
# Simulator / environment
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RewardConfig:
    """Reward shaping constants (reference: cfgs/config.yaml `nocturne.rew_cfg`)."""

    shared_reward: bool = False
    goal_tolerance: float = 0.5
    reward_scaling: float = 1.0
    collision_penalty: float = 0.0
    shaped_goal_distance_scaling: float = 0.2
    shaped_goal_distance: bool = True
    goal_distance_penalty: bool = False
    position_target: bool = True
    position_target_tolerance: float = 1.0
    speed_target: bool = True
    speed_target_tolerance: float = 1.0
    heading_target: bool = True
    heading_target_tolerance: float = 0.3


@dataclass(frozen=True)
class PhysicsConfig:
    """FreeCar physics constants (reference: nocturne/cpp/include/physics/defines.h)."""

    max_speed: float = 50.0
    max_reverse_speed: float = -5.0
    max_throttle_accel: float = 1.0
    max_throttle_reverse_accel: float = 0.0
    max_brake_accel: float = 1.0
    side_speed_damping: float = 25.0
    angular_damping: float = 10.0
    brake_deadband: float = 0.001  # FreeCar::Brake ignores |value|<0.001


@dataclass(frozen=True)
class SimConfig:
    """Environment stepping constants (reference: cfgs/config.yaml `nocturne`)."""

    steps: int = 90
    dt: float = 0.1
    history_steps: int = 10
    collision_fix: bool = True  # use split veh/edge collision flags
    allow_non_vehicles: bool = False
    moving_threshold: float = 0.2  # goal at least this far from initial position
    speed_threshold: float = 0.05  # or speed above this at some point
    # dynamics contract: 'kinematic' replicates Object::KinematicBicycleStep
    # (object.cc:126); 'physics' replicates the Box2D FreeCar velocity-level
    # model (FreeCar.cpp:98-181) used by the reference eval / data-gen path.
    dynamics: str = "physics"
    # Box2D-style impulse contact resolution between vehicles
    # (env/contacts.py; PhysicsSimulation.cpp:16-25 b2World::Step(dt, 8, 3)).
    # ON by default: the reference always simulates contacts (every vehicle
    # is physics_simulated, evaluators/evaluator.py:33-41), and the solver is
    # pinned to executed Box2D streams (tests/test_physics_goldens.py).
    # Switching off is a perf knob for pure collision-as-reward rollouts.
    resolve_contacts: bool = True
    max_agents: int = 24  # padded agent axis of the batched env
    max_road_edge_segments: int = 1024  # padded road-edge segment soup
    rewards: RewardConfig = field(default_factory=RewardConfig)
    physics: PhysicsConfig = field(default_factory=PhysicsConfig)


# ---------------------------------------------------------------------------
# Dataset / tokenization
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class WaymoDatasetConfig:
    """All tokenization / normalization constants
    (reference: cfgs/dataset/waymo/base.yaml)."""

    train_context_length: int = 32
    num_agent_types: int = 5
    num_road_types: int = 8
    map_attr: int = 2
    k_attr: int = 7
    agent_dist_threshold: float = 60.0
    map_dist_threshold: float = 100.0
    max_timestep: int = 90
    parked_car_velocity_threshold: float = 0.05
    max_accel: float = 10.0
    min_accel: float = -10.0
    max_steer: float = 0.7
    min_steer: float = -0.7

    max_veh_veh_distance: float = 15.0
    dist_to_road_edge_scaling_factor: float = 15.0
    veh_veh_collision_rew_multiplier: float = 10.0
    veh_edge_collision_rew_multiplier: float = 10.0
    pos_goal_shaped_min: float = 0.0
    pos_goal_shaped_max: float = 0.2
    pos_target_achieved_rew_multiplier: float = 10.0
    moving_threshold: float = 0.05

    min_rtg_pos: float = 0.0
    max_rtg_pos: float = 10.0
    min_rtg_veh: float = -10.0
    max_rtg_veh: float = 90.0
    min_rtg_road: float = -10.0
    max_rtg_road: float = 90.0

    max_num_agents: int = 24
    max_num_road_polylines: int = 200
    max_num_road_pts_per_polyline: int = 100
    accel_discretization: int = 20
    steer_discretization: int = 50
    rtg_discretization: int = 350

    goal_dim: int = 5
    remove_shaped_goal: bool = True
    remove_shaped_veh_reward: bool = False
    remove_shaped_edge_reward: bool = False

    # CTG++ additions (cfgs/dataset/waymo/ctg_plus_plus.yaml)
    input_horizon: int = 10
    ctg_action_dim: int = 2  # continuous (accel, steer)
    future_relative_encoding: bool = False
    pos_div: float = 100.0  # state_normalizer.pos_div
    vel_div: float = 40.0  # state_normalizer.vel_div

    # finetuning (cfgs/dataset/waymo/ctrl_sim_finetuning.yaml)
    replay_ratio: float = 0.5
    center_on_focal_agent: bool = True
    supervise_focal_agent: bool = True

    # TPU extension (no reference counterpart): anchor the training sample's
    # SE(2) frame + relevant-agent crop at EPISODE start (t=0) instead of the
    # random window start. This matches the streaming rollout's fixed
    # per-episode frame (rollout/streaming.py), closing the train/eval
    # distribution gap for streaming-mode evaluation. The reference-parity
    # ("paper") configuration keeps this False and evaluates in exact mode,
    # which re-anchors at each window start like
    # datasets/rl_waymo/dataset.py:390-428.
    episode_start_normalization: bool = False

    @property
    def action_dim(self) -> int:
        return self.accel_discretization * self.steer_discretization


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelConfig:
    """CtRL-Sim transformer config (reference: cfgs/model/{base,ctrl_sim}.yaml)."""

    hidden_dim: int = 256
    map_attr: int = 3  # note: the reference model reads its own map_attr=3
    num_road_types: int = 8
    no_actions: bool = False
    num_heads: int = 8
    num_reward_components: int = 3
    dim_feedforward: int = 1024
    dropout: float = 0.1
    state_dim: int = 12  # 7 kinematic features + 5 agent-type one-hot
    use_map: bool = True
    goal_dropout: float = 0.1
    supervise_moving: bool = True
    predict_rtg: bool = True
    attend_own_return_action: bool = False
    # model-family flags (DT / IL / trajeglish are token-layout variants)
    trajeglish: bool = False
    il: bool = False
    ctg_plus_plus: bool = False
    decision_transformer: bool = False

    num_transformer_encoder_layers: int = 2
    num_decoder_layers: int = 4
    predict_future_states: bool = True
    local_frame_predictions: bool = False
    loss_action_coef: float = 1.0
    encode_initial_state: bool = True

    # CTG++ diffusion fields (cfgs/model/ctg_plus_plus.yaml)
    diffusion_type: str = "states_actions"
    n_diffusion_steps: int = 100
    action_weight: float = 10.0
    loss_discount: float = 1.0
    predict_epsilon: bool = False
    returns_condition: bool = True
    condition_dropout: float = 0.25
    condition_guidance_w: float = 1.2
    test_ret: float = 0.9
    n_eval_diffusion_step: int = 50
    use_rtg: bool = False

    # numeric policy: params in fp32, activations/matmuls in bfloat16 on TPU
    compute_dtype: str = "bfloat16"
    # streaming rollout KV-cache storage: "bfloat16" (exact) or "int8"
    # (per-token symmetric quantization — halves the cache HBM traffic that
    # dominates rollout time; scales stay fp32, softmax/accumulation fp32)
    kv_cache_dtype: str = "bfloat16"
    # dtype of the materialized cross-attention score matrix in the
    # streaming/einsum path (models/layers.py): float32 = exact (default);
    # bfloat16 halves the dominant cross-attn HBM traffic in rollout at
    # ~0.5%-relative attention-weight rounding (accumulation/softmax
    # reductions stay f32). A perf deployment knob, off for parity evals.
    cross_score_dtype: str = "float32"
    # fused Pallas decode attention in the streaming rollout (TPU only;
    # avoids the per-head cache re-layout in HBM)
    use_pallas_attention: bool = True
    # rematerialize transformer layers in the backward pass (trades FLOPs
    # for the O(T^2) attention-score memory). Default OFF: with flash
    # attention the full-size reference config (256-d, 2+4 layers, global
    # batch 64 as 4x16 accumulation) FITS v5e HBM without remat and steps
    # 1.8x faster (828 -> 464 ms/step, tools/profile_train.py round 5);
    # turn back on for larger models/batches that exceed HBM.
    remat: bool = False
    # Pallas flash attention for full-sequence decoding (training + exact
    # rollout): the multi-agent causal mask is evaluated blockwise in-kernel
    # and the [B, heads, T, T] score tensor is never materialized in HBM.
    # TPU only unless flash_interpret (CPU tests run the kernel interpreted).
    use_flash_attention: bool = True
    flash_block_q: int = 128
    flash_interpret: bool = False

    @property
    def num_token_types(self) -> int:
        if self.trajeglish:
            return 1
        if self.il:
            return 2
        return 3

    @property
    def state_token_index(self) -> int:
        # DT layout: (rtg, state, action); default: (state, rtg, action)
        return 1 if self.decision_transformer else 0


@dataclass(frozen=True)
class DiffusionConfig:
    """CTG++ diffusion baseline (reference: cfgs/model/ctg_plus_plus.yaml)."""

    diffusion_type: str = "states_actions"
    n_diffusion_steps: int = 100
    action_weight: float = 10.0
    loss_discount: float = 1.0
    predict_epsilon: bool = False
    returns_condition: bool = True
    condition_dropout: float = 0.25
    condition_guidance_w: float = 1.2
    test_ret: float = 0.9
    n_eval_diffusion_step: int = 50
    future_len: int = 22
    history_len: int = 10


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TrainConfig:
    """Reference: cfgs/train/base.yaml (+ finetuning variant)."""

    seed: int = 0
    max_steps: int = 200_000
    warmup_steps: int = 500
    lr: float = 5e-4
    weight_decay: float = 1e-4
    gradient_clip_val: float = 10.0
    global_batch_size: int = 64
    # microbatch gradient accumulation: effective batch = global_batch_size,
    # each step runs accum_steps sequential microbatches (the reference's
    # global 64 = 16 x 4 GPUs; one chip uses 16 x 4 accumulation)
    accum_steps: int = 1
    check_val_every_n_steps: int = 2000
    finetuning: bool = False
    replay_ratio: float = 0.5  # finetuning: fraction of real (non-CAT) samples
    # GSPMD: number of data-parallel shards is taken from the mesh at runtime
    save_dir: str = "checkpoints"
    keep_last_n: int = 2
    # experiment logging (reference train.py:50-60 WandbLogger gate +
    # models/ctrl_sim.py:231-238 per-layer grad norms); metrics always go to
    # save_dir/metrics.jsonl, wandb mirrors when track and importable
    track: bool = False
    log_grad_norms: bool = False


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TiltConfig:
    """Exponential tilting of predicted RTG distributions
    (reference: cfgs/policy/ctrl_sim*.yaml)."""

    tilt: bool = True
    goal_tilt: float = 0.0
    veh_veh_tilt: float = 0.0
    veh_edge_tilt: float = 0.0


@dataclass(frozen=True)
class PolicyConfig:
    """Rollout-time policy config (reference: cfgs/policy/*.yaml)."""

    use_rtg: bool = True
    predict_rtgs: bool = True
    discretize_rtgs: bool = True
    real_time_rewards: bool = False
    privileged_return: bool = False
    max_return: bool = False
    min_return: bool = False
    action_temperature: float = 1.0
    nucleus_sampling: bool = False
    nucleus_threshold: float = 0.8
    tilt: TiltConfig = field(default_factory=TiltConfig)
    # CTG++ diffusion guidance weights (0 = off). The reference imports a
    # diffusion_guidance module that does not exist in its tree; these make
    # the GoalGuide / CollisionGuide interface real (models/ctg/guidance.py)
    ctg_goal_guidance: float = 0.0
    ctg_collision_guidance: float = 0.0
    ctg_collision_radius: float = 4.0


@dataclass(frozen=True)
class EvalConfig:
    """Reference: cfgs/eval/base.yaml."""

    seed: int = 0
    history_steps: int = 10
    interesting_traj_len_threshold: int = 60
    interesting_goal_dist_threshold: float = 10.0
    interesting_timestep_diff_threshold: int = 20
    multi_agent_eval_threshold: int = 8
    num_files_to_evaluate: int = 1000
    eval_mode: str = "multi_agent"  # one_agent | two_agent | multi_agent
    # rollout execution mode:
    #   'exact'     — re-normalized sliding window recomputed each step
    #                 (reference-parity path, policy_evaluator.py:514-542);
    #                 coherent with the default window-anchored training
    #                 frames (dataset.py:390-428)
    #   'streaming' — fixed normalization frame + incremental KV-cached
    #                 decode (the TPU speed-of-light path). Requires a model
    #                 trained with waymo.episode_start_normalization=True so
    #                 train and eval see the same frames; the evaluator
    #                 refuses a mismatched pairing unless
    #                 allow_normalization_mismatch is set.
    rollout_mode: str = "exact"
    # acknowledge (instead of refuse) evaluating a window-normalized
    # checkpoint in streaming mode — a train/eval distribution mismatch
    allow_normalization_mismatch: bool = False
    # streaming sub-pass structure (default CtRL-Sim family only):
    #   2 — fused action deferral: the t-1 action tokens ride the t state
    #       pass (1.5x less cache traffic; their receptive field misses the
    #       single oldest window step — models/ctrl_sim.py:131-135)
    #   3 — faithful sequential decode (reference order,
    #       autoregressive_policy.py:189-210); the A/B control for the
    #       deferral, equal to 2-pass BIT-EXACTLY while the episode still
    #       fits the window (tests/test_streaming_passes.py)
    streaming_passes: int = 2
    # packed agent slots (streaming rollout only): 0 = full-width crops
    # (waymo.max_num_agents slots, the reference layout). N < max_num_agents
    # packs the N closest in-range agents into N model slots — the KV-cache
    # DMA (the rollout's dominant cost) scales with slots, not real agents,
    # so sparse scenes stop paying dead-slot traffic (BENCH_NOTES.md: 8/16/24
    # slots -> 24.0/17.3/13.7k env-steps/s/chip). Use multiples of 8 (the
    # sublane tile — a misaligned crop is SLOWER than full width). Deviation
    # vs full-width WHEN every in-range agent fits the crop: pad slots'
    # zero-embedding phantom keys are no longer attended; measured at
    # seed-noise level on a trained model (artifacts/eval_r04_slots_ab.json,
    # tests/test_eval_artifact.py) and machinery-pinned in
    # tests/test_packed_slots.py. If MORE than N agents are in range,
    # direct run_streaming callers drop the overflow to GT replay and kept
    # agents' slot ids compact (rollout/groups.py:packed_trivial_groups
    # documents the exact rule); the evaluator path via build_focal_groups
    # partitions such scenes into multiple groups instead.
    agent_slots: int = 0


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Config:
    sim: SimConfig = field(default_factory=SimConfig)
    waymo: WaymoDatasetConfig = field(default_factory=WaymoDatasetConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    policy: PolicyConfig = field(default_factory=PolicyConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    def replace(self, **updates: Any) -> "Config":
        return dataclasses.replace(self, **updates)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)


def _set_dotted(cfg: Any, key: str, value: Any) -> Any:
    """Return a copy of ``cfg`` with dotted ``key`` (e.g. 'model.hidden_dim')
    replaced by ``value``."""
    head, _, rest = key.partition(".")
    if not rest:
        return dataclasses.replace(cfg, **{head: value})
    sub = getattr(cfg, head)
    return dataclasses.replace(cfg, **{head: _set_dotted(sub, rest, value)})


def load_config(overrides: dict | None = None, **kw_overrides: Any) -> Config:
    """Build a Config with optional dotted-key overrides.

    >>> cfg = load_config({"model.hidden_dim": 64, "sim.dynamics": "kinematic"})
    """
    cfg = Config()
    merged = dict(overrides or {})
    merged.update(kw_overrides)
    for key, value in merged.items():
        cfg = _set_dotted(cfg, key, value)
    return cfg


# Model-family presets, mirroring the reference's cfgs/model/{dt,il,trajeglish}.yaml
def preset(name: str) -> Config:
    base = load_config()
    if name == "ctrl_sim":
        return base
    if name == "dt":
        return load_config(
            {
                "model.decision_transformer": True,
                "model.predict_future_states": False,
                "model.predict_rtg": False,
                "policy.predict_rtgs": False,
                "policy.discretize_rtgs": False,
                "policy.real_time_rewards": True,
                "policy.max_return": True,
                "policy.tilt": TiltConfig(tilt=False),
            }
        )
    if name == "il":
        return load_config(
            {
                "model.il": True,
                "model.predict_future_states": False,
                "model.predict_rtg": False,
                "policy.use_rtg": False,
                "policy.predict_rtgs": False,
                "policy.tilt": TiltConfig(tilt=False),
            }
        )
    if name == "trajeglish":
        return load_config(
            {
                "model.trajeglish": True,
                "model.predict_future_states": False,
                "model.predict_rtg": False,
                "policy.use_rtg": False,
                "policy.predict_rtgs": False,
                "policy.tilt": TiltConfig(tilt=False),
            }
        )
    if name == "ctg_plus_plus":
        return load_config(
            {
                "model.ctg_plus_plus": True,
                "model.predict_rtg": False,
                "model.num_transformer_encoder_layers": 2,
                "policy.predict_rtgs": False,
                # cfgs/train/ctg_plus_plus.yaml: lr 2e-4,
                # gradient_accumulate_every 2
                "train.lr": 2e-4,
                "train.accum_steps": 2,
            }
        )
    raise ValueError(f"unknown preset: {name!r}")
