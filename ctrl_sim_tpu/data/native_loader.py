"""ctypes binding for the native C++ scenario loader.

``load_scenario_json_native`` parses a scenario JSON in C++ (native JSON
parser -> flat arrays, native/scenario_loader.cc) and wraps the result into
the same ``Scenario`` the pure-Python loader produces — same downstream
pipeline, ~10-30x faster ingestion for large scenario sets.

Falls back transparently when the shared library hasn't been built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ctrl_sim_tpu.config import Config
from ctrl_sim_tpu.data.scenario import Scenario, _finalize

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libscenario_loader.so",
)


class _ScenarioRaw(ctypes.Structure):
    _fields_ = [
        ("num_agents", ctypes.c_int32),
        ("num_steps", ctypes.c_int32),
        ("is_physics", ctypes.c_int32),
        ("positions", ctypes.POINTER(ctypes.c_float)),
        ("headings", ctypes.POINTER(ctypes.c_float)),
        ("velocities", ctypes.POINTER(ctypes.c_float)),
        ("valid", ctypes.POINTER(ctypes.c_uint8)),
        ("length", ctypes.POINTER(ctypes.c_float)),
        ("width", ctypes.POINTER(ctypes.c_float)),
        ("type", ctypes.POINTER(ctypes.c_int32)),
        ("goal_position", ctypes.POINTER(ctypes.c_float)),
        ("goal_heading", ctypes.POINTER(ctypes.c_float)),
        ("goal_speed", ctypes.POINTER(ctypes.c_float)),
        ("rewards", ctypes.POINTER(ctypes.c_float)),
        ("actions", ctypes.POINTER(ctypes.c_float)),
        ("num_roads", ctypes.c_int32),
        ("total_road_points", ctypes.c_int32),
        ("road_points", ctypes.POINTER(ctypes.c_float)),
        ("road_offsets", ctypes.POINTER(ctypes.c_int32)),
        ("road_counts", ctypes.POINTER(ctypes.c_int32)),
        ("road_types", ctypes.POINTER(ctypes.c_int32)),
        ("num_lights", ctypes.c_int32),
        ("tl_positions", ctypes.POINTER(ctypes.c_float)),
        ("tl_state", ctypes.POINTER(ctypes.c_int8)),
        ("error", ctypes.c_char * 256),
    ]


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            raise FileNotFoundError(
                f"{_LIB_PATH} not built; run `make -C native`"
            )
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.scenario_load.restype = ctypes.POINTER(_ScenarioRaw)
        _lib.scenario_load.argtypes = [ctypes.c_char_p]
        _lib.scenario_free.argtypes = [ctypes.POINTER(_ScenarioRaw)]
    return _lib


def native_available() -> bool:
    return os.path.exists(_LIB_PATH)


ROAD_TYPE_NAMES = [
    "none", "lane", "road_line", "road_edge", "stop_sign", "crosswalk",
    "speed_bump", "other",
]


def _arr(ptr, shape, dtype=np.float32) -> np.ndarray:
    n = int(np.prod(shape))
    buf = np.ctypeslib.as_array(ptr, shape=(n,))
    return np.array(buf, dtype=dtype).reshape(shape)


def load_scenario_json_native(path: str, cfg: Config) -> Scenario:
    lib = _get_lib()
    raw_p = lib.scenario_load(path.encode())
    raw = raw_p.contents
    try:
        if raw.error and raw.error != b"":
            raise ValueError(f"native loader: {raw.error.decode()} ({path})")
        A, T = raw.num_agents, raw.num_steps
        positions = _arr(raw.positions, (A, T, 2))
        headings = _arr(raw.headings, (A, T))
        velocities = _arr(raw.velocities, (A, T, 2))
        valid = _arr(raw.valid, (A, T), dtype=np.uint8).astype(bool)
        length = _arr(raw.length, (A,))
        width = _arr(raw.width, (A,))
        agent_type = _arr(raw.type, (A,), dtype=np.int64)
        goal_position = _arr(raw.goal_position, (A, 2))
        goal_heading = _arr(raw.goal_heading, (A,))
        goal_speed = _arr(raw.goal_speed, (A,))
        rewards = actions = None
        if raw.is_physics:
            rewards = _arr(raw.rewards, (A, T, 8))
            actions = _arr(raw.actions, (A, T, 2))

        # roads back to the dict form consumed by _finalize's chunker
        roads = []
        if raw.num_roads > 0:
            pts = _arr(raw.road_points, (raw.total_road_points, 2))
            offsets = _arr(raw.road_offsets, (raw.num_roads,), dtype=np.int64)
            counts = _arr(raw.road_counts, (raw.num_roads,), dtype=np.int64)
            rtypes = _arr(raw.road_types, (raw.num_roads,), dtype=np.int64)
            for r in range(raw.num_roads):
                o, c = int(offsets[r]), int(counts[r])
                name = ROAD_TYPE_NAMES[int(rtypes[r])]
                if name == "stop_sign" and c == 1:
                    geometry = {"x": float(pts[o, 0]), "y": float(pts[o, 1])}
                else:
                    geometry = [
                        {"x": float(x), "y": float(y)} for x, y in pts[o : o + c]
                    ]
                roads.append({"geometry": geometry, "type": name})

        # traffic lights: the C side expands to dense [L, T] states; feed
        # them back through _finalize as dense (state, time_index) streams
        tl_states = None
        if raw.num_lights > 0:
            L = raw.num_lights
            tl_pos = _arr(raw.tl_positions, (L, 2))
            tl_st = _arr(raw.tl_state, (L, T), dtype=np.int8)
            tl_states = [
                {
                    "x": [float(tl_pos[i, 0])],
                    "y": [float(tl_pos[i, 1])],
                    "state": [int(s) for s in tl_st[i]],
                    "time_index": list(range(T)),
                }
                for i in range(L)
            ]

        speed = np.linalg.norm(velocities, axis=-1)
        if not raw.is_physics:
            # raw dialect: drop non-vehicles / invalid-at-start agents the
            # way LoadObjects does (scenario.cc:954-957)
            keep = valid[:, 0] & (
                (agent_type == 1) if not cfg.sim.allow_non_vehicles
                else np.ones(A, bool)
            )
            positions, headings, speed = positions[keep], headings[keep], speed[keep]
            valid = valid[keep]
            length, width, agent_type = length[keep], width[keep], agent_type[keep]
            goal_position = goal_position[keep]
            goal_heading, goal_speed = goal_heading[keep], goal_speed[keep]

        return _finalize(
            cfg,
            positions.astype(np.float64),
            headings.astype(np.float64),
            speed.astype(np.float64),
            valid,
            length.astype(np.float64),
            width.astype(np.float64),
            agent_type,
            goal_position.astype(np.float64),
            goal_heading.astype(np.float64),
            goal_speed.astype(np.float64),
            roads,
            rewards=None if rewards is None else rewards.astype(np.float64),
            actions=None if actions is None else actions.astype(np.float64),
            name=path,
            tl_states=tl_states,
        )
    finally:
        lib.scenario_free(raw_p)
