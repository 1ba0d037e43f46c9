"""Traffic lights (reference: nocturne/cpp/{src,include}/traffic_light.*).

The reference parses per-lane timestamped 9-state lights from the scenario
JSON's ``tl_states`` (scenario.cc:222-241) and exposes the state at the
current step. The CtRL-Sim datasets are the *no-TL* Waymo exports
(``formatted_json_v2_no_tl_*``) so lights never influence its training/eval;
this module completes the simulator surface: dense arrays + the per-step
state query used by visible-feature extraction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# TrafficLightState enum (traffic_light.h:21-31)
TL_UNKNOWN = 0
TL_STOP = 1
TL_CAUTION = 2
TL_GO = 3
TL_ARROW_STOP = 4
TL_ARROW_CAUTION = 5
TL_ARROW_GO = 6
TL_FLASHING_STOP = 7
TL_FLASHING_CAUTION = 8

_STATE_NAMES = {
    "unknown": TL_UNKNOWN,
    "stop": TL_STOP,
    "caution": TL_CAUTION,
    "go": TL_GO,
    "arrow_stop": TL_ARROW_STOP,
    "arrow_caution": TL_ARROW_CAUTION,
    "arrow_go": TL_ARROW_GO,
    "flashing_stop": TL_FLASHING_STOP,
    "flashing_caution": TL_FLASHING_CAUTION,
}


class TrafficLights(NamedTuple):
    """Dense light arrays for one scene (padded)."""

    position: jax.Array  # [L, 2]
    state: jax.Array  # [L, T] int8 — state per timestep (TL_UNKNOWN pad)
    valid: jax.Array  # [L] bool

    @staticmethod
    def empty(num_lights: int = 1, num_steps: int = 91) -> "TrafficLights":
        return TrafficLights(
            position=jnp.zeros((num_lights, 2)),
            state=jnp.zeros((num_lights, num_steps), jnp.int8),
            valid=jnp.zeros((num_lights,), bool),
        )


def parse_tl_states_np(
    tl_json: list, num_steps: int, max_lights: int | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Numpy core of the ``tl_states`` parse (scenario.cc:222-241): each
    entry has x[·], y[·] (static — the first element is used), state[·] and
    time_index[·] streams. Returns (position [L,2] f32, state [L,T] int8,
    valid [L] bool)."""
    n = len(tl_json)
    L = max_lights or max(n, 1)
    position = np.zeros((L, 2), np.float32)
    state = np.zeros((L, num_steps), np.int8)
    valid = np.zeros((L,), bool)
    for i, tl in enumerate(tl_json[:L]):
        position[i] = [float(tl["x"][0]), float(tl["y"][0])]
        valid[i] = True
        for s, t in zip(tl["state"], tl["time_index"]):
            ti = int(t)
            if 0 <= ti < num_steps:
                if isinstance(s, str):
                    state[i, ti] = _STATE_NAMES.get(s.lower(), TL_UNKNOWN)
                else:
                    state[i, ti] = int(s)
    return position, state, valid


def parse_tl_states(
    tl_json: list, num_steps: int, max_lights: int | None = None
) -> TrafficLights:
    """Parse the JSON ``tl_states`` list into device-ready TrafficLights."""
    position, state, valid = parse_tl_states_np(tl_json, num_steps, max_lights)
    return TrafficLights(
        position=jnp.asarray(position),
        state=jnp.asarray(state),
        valid=jnp.asarray(valid),
    )


def state_at(lights: TrafficLights, t: jax.Array) -> jax.Array:
    """[L] light state at step t (TrafficLight::set_current_time query)."""
    T = lights.state.shape[1]
    return jax.lax.dynamic_index_in_dim(
        lights.state, jnp.minimum(t, T - 1), axis=1, keepdims=False
    )


def visible_light_features(
    lights: TrafficLights,
    t: jax.Array,
    ego_position: jax.Array,  # [2]
    ego_heading: jax.Array,
    max_visible: int = 20,
) -> jax.Array:
    """Nearest-first light features [max_visible, 12]:
    [valid, dist, azimuth, 9-state one-hot]
    (scenario.cc:184-205 ExtractTrafficLightFeature)."""
    rel = lights.position - ego_position[None]
    dist = jnp.linalg.norm(rel, axis=-1)
    azimuth = jnp.arctan2(rel[:, 1], rel[:, 0]) - ego_heading
    azimuth = jnp.mod(azimuth + jnp.pi, 2 * jnp.pi) - jnp.pi
    states = state_at(lights, t)
    onehot = jax.nn.one_hot(states, 9)
    feats = jnp.concatenate(
        [
            lights.valid[:, None].astype(jnp.float32),
            dist[:, None],
            azimuth[:, None],
            onehot,
        ],
        axis=-1,
    )
    order = jnp.argsort(jnp.where(lights.valid, dist, jnp.inf))
    feats = jnp.take(feats, order, axis=0)
    L = feats.shape[0]
    take = min(max_visible, L)
    out = jnp.zeros((max_visible, feats.shape[-1]))
    return out.at[:take].set(feats[:take] * feats[:take, :1])
