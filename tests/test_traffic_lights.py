"""Traffic lights end-to-end: JSON -> Scenario arrays -> per-step queries ->
env.observe features.

Round-trip semantics pinned to the reference:
- ``tl_states`` parse: static lane position from x[0]/y[0], dense per-step
  state from (state, time_index) pairs (nocturne/cpp/src/scenario.cc:222-241);
- 9-state enum mapping (traffic_light.h:20-30, ParseTrafficLightState :75-95);
- per-step state query (TrafficLight::LightState via set_current_time);
- the native C++ loader produces identical arrays;
- batches mix lighted and light-free scenes (pad rows invalid).
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrl_sim_tpu.config import _set_dotted, load_config
from ctrl_sim_tpu.data.scenario import Scenario, load_scenario_json, stack_scenarios
from ctrl_sim_tpu.env.env import WaymoEnv
from ctrl_sim_tpu.env.traffic_lights import (
    TL_ARROW_GO,
    TL_CAUTION,
    TL_GO,
    TL_STOP,
    TL_UNKNOWN,
    TrafficLights,
    parse_tl_states,
    state_at,
    visible_light_features,
)

T1 = 11  # steps + 1


def _raw_scene_json(with_lights: bool) -> dict:
    """Minimal raw-Nocturne-dialect scene: 2 vehicles, 1 road edge, optional
    lights (headings in DEGREES, like formatted_json_v2_no_tl_*)."""

    def obj(x0, y0):
        return {
            "type": "vehicle",
            "position": [{"x": x0 + t, "y": y0} for t in range(T1)],
            "velocity": [{"x": 10.0, "y": 0.0}] * T1,
            "heading": [0.0] * T1,  # degrees
            "valid": [True] * T1,
            "length": 4.0,
            "width": 2.0,
            "goalPosition": {"x": x0 + 30.0, "y": y0},
        }

    data = {
        "name": "tl_synth",
        "objects": [obj(0.0, 0.0), obj(5.0, 4.0)],
        "roads": [
            {
                "type": "road_edge",
                "geometry": [{"x": -50.0, "y": -10.0}, {"x": 50.0, "y": -10.0}],
            },
            {
                "type": "lane",
                "geometry": [{"x": -50.0, "y": 0.0}, {"x": 50.0, "y": 0.0}],
            },
        ],
    }
    if with_lights:
        data["tl_states"] = [
            {
                # static lane position: only x[0]/y[0] are read
                "x": [12.0, 999.0],
                "y": [3.0, 999.0],
                "state": ["go", "caution", "stop", "arrow_go"],
                "time_index": [0, 2, 3, 7],
            },
            {
                "x": [-6.0],
                "y": [1.0],
                "state": ["flashing_caution", "unknown_garbage"],
                "time_index": [1, 4],
            },
        ]
    return data


@pytest.fixture(scope="module")
def cfg():
    c = load_config()
    for k, v in {
        "sim.steps": T1 - 1,
        "sim.max_agents": 4,
        "waymo.max_num_agents": 4,
        "waymo.max_num_road_polylines": 8,
        "waymo.max_num_road_pts_per_polyline": 10,
    }.items():
        c = _set_dotted(c, k, v)
    return c


def test_raw_json_roundtrip_enum_mapping(cfg):
    s = load_scenario_json(_raw_scene_json(True), cfg)
    assert s.tl_position is not None
    np.testing.assert_allclose(s.tl_position, [[12.0, 3.0], [-6.0, 1.0]])
    assert s.tl_valid.all() and s.tl_state.shape == (2, T1)
    # light 0: sparse (state, time_index) -> dense with UNKNOWN elsewhere
    exp0 = np.zeros(T1, np.int8)
    exp0[0], exp0[2], exp0[3], exp0[7] = TL_GO, TL_CAUTION, TL_STOP, TL_ARROW_GO
    np.testing.assert_array_equal(s.tl_state[0], exp0)
    # light 1: unknown strings map to TL_UNKNOWN (ParseTrafficLightState else)
    assert s.tl_state[1, 1] == 8  # flashing_caution
    assert s.tl_state[1, 4] == TL_UNKNOWN


def test_no_lights_scene_has_none_fields(cfg):
    s = load_scenario_json(_raw_scene_json(False), cfg)
    assert s.tl_position is None and s.tl_state is None and s.tl_valid is None


def test_native_loader_matches_python(cfg, tmp_path):
    from ctrl_sim_tpu.data.native_loader import (
        load_scenario_json_native,
        native_available,
    )

    if not native_available():
        pytest.skip("native loader not built")
    data = _raw_scene_json(True)
    p = tmp_path / "tl_scene.json"
    p.write_text(json.dumps(data))
    s_py = load_scenario_json(data, cfg)
    s_cc = load_scenario_json_native(str(p), cfg)
    np.testing.assert_allclose(s_cc.tl_position, s_py.tl_position)
    np.testing.assert_array_equal(s_cc.tl_state, s_py.tl_state)
    np.testing.assert_array_equal(s_cc.tl_valid, s_py.tl_valid)
    # agents/road parity unaffected
    np.testing.assert_allclose(s_cc.traj_position, s_py.traj_position, atol=1e-5)


def test_stack_mixed_lights(cfg):
    s1 = load_scenario_json(_raw_scene_json(True), cfg)
    s0 = load_scenario_json(_raw_scene_json(False), cfg)
    sb = stack_scenarios([s1, s0], cfg)
    assert sb.tl_state.shape == (2, 2, T1)
    assert sb.tl_valid[0].all() and not sb.tl_valid[1].any()
    np.testing.assert_array_equal(sb.tl_state[1], 0)


def test_state_at_and_features():
    lights = parse_tl_states(_raw_scene_json(True)["tl_states"], T1)
    st = state_at(lights, jnp.asarray(3))
    np.testing.assert_array_equal(np.asarray(st), [TL_STOP, TL_UNKNOWN])
    feats = visible_light_features(
        lights, jnp.asarray(2), jnp.zeros(2), jnp.asarray(0.0), max_visible=4
    )
    feats = np.asarray(feats)
    assert feats.shape == (4, 12)
    # nearest-first: light 1 at (-6, 1) is closer than light 0 at (12, 3)
    np.testing.assert_allclose(feats[0, 1], np.hypot(6.0, 1.0), atol=1e-5)
    np.testing.assert_allclose(feats[1, 1], np.hypot(12.0, 3.0), atol=1e-5)
    # state one-hot at t=2: light1 unknown (idx 0), light0 caution (idx 2)
    assert feats[0, 3 + TL_UNKNOWN] == 1.0
    assert feats[1, 3 + TL_CAUTION] == 1.0
    # pad rows zero
    np.testing.assert_array_equal(feats[2:], 0.0)


def test_env_observe_consumes_lights(cfg):
    s1 = load_scenario_json(_raw_scene_json(True), cfg)
    s0 = load_scenario_json(_raw_scene_json(False), cfg)
    sb = stack_scenarios([s1, s1], cfg)  # same shapes; both lighted
    d = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
         for k, v in dataclasses.asdict(sb).items()}
    d["name"] = ""
    sbj = Scenario(**d)
    env = WaymoEnv(cfg)
    state = env.reset(sbj)
    obs = jax.jit(
        lambda sc, st, e: env.observe(sc, st, e, max_visible_objects=4,
                                      max_visible_lights=4)
    )(sbj, state, jnp.zeros(2, jnp.int32))
    assert obs["ego_state"].shape == (2, 5)
    assert obs["visible_objects"].shape == (2, 4, 13)
    assert obs["traffic_lights"].shape == (2, 4, 12)
    assert np.isfinite(np.asarray(obs["ego_state"])).all()
    # at t=0 the nearest light to ego 0 (at origin) is light 1 at (-6, 1)...
    # which is BEHIND the ego (heading +x, 120deg cone) - both lights are
    # reported by distance regardless (the reference's TL features are not
    # cone-filtered, scenario.cc:486-548 appends them by distance)
    tl = np.asarray(obs["traffic_lights"])[0]
    assert tl[0, 0] == 1.0  # valid
    np.testing.assert_allclose(tl[0, 1], np.hypot(6.0, 1.0), atol=1e-4)
    # no-TL batch: observe still works and returns zeros
    sb0 = stack_scenarios([s0, s0], cfg)
    d0 = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
          for k, v in dataclasses.asdict(sb0).items()}
    d0["name"] = ""
    sbj0 = Scenario(**d0)
    state0 = env.reset(sbj0)
    obs0 = env.observe(sbj0, state0, jnp.zeros(2, jnp.int32),
                       max_visible_objects=4, max_visible_lights=4)
    np.testing.assert_array_equal(np.asarray(obs0["traffic_lights"]), 0.0)
