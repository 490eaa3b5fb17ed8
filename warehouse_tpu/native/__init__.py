"""ctypes bindings for the C++ batched warehouse engine.

Builds ``libwarehouse.so`` from ``warehouse.cc`` on first use (g++; no
pybind11 dependency). See warehouse.cc header for the role of this
component. ``NativeBatchedEnv`` keeps state as NumPy arrays and steps in
place; draws are injected (mirroring the oracle's DrawSource design).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..config import EnvConfig

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libwarehouse.so")
_lib = None


def _build() -> None:
    src = os.path.join(_DIR, "warehouse.cc")
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(src):
        return
    subprocess.run(
        ["make", "-C", _DIR, "libwarehouse.so"],
        check=True, capture_output=True, text=True,
    )


def get_lib() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    _build()
    lib = ctypes.CDLL(_SO)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    cf = ctypes.c_float
    lib.wh_step_batch.argtypes = [
        c, c, c, c, c,
        i32p, i32p, u8p, i32p, i32p, i32p, i32p, i32p,
        u8p,  # walls bitmap [H*W]
        i32p, f32p, i32p, i32p,
        cf, cf, cf, cf, cf,
        f32p, u8p, u8p, u8p,
    ]
    lib.wh_step_batch.restype = ctypes.c_int32  # 0 ok, -1 bad A/B/R/H/W
    lib.wh_greedy_batch.argtypes = [c, c, c, i32p, i32p, u8p, i32p, i32p,
                                    i32p]
    lib.wh_greedy_batch.restype = None
    _lib = lib
    return lib


class NativeBatchedEnv:
    """B warehouse envs stepped by the C++ engine; draws injected."""

    def __init__(self, cfg: EnvConfig, batch: int) -> None:
        self.cfg = cfg
        self.B = batch
        self.lib = get_lib()
        A, R = cfg.num_agents, cfg.queue_capacity
        self.agent_pos = np.zeros((batch, A, 2), np.int32)
        self.agent_req = np.full((batch, A), -1, np.int32)
        self.carrying = np.zeros((batch, A), np.uint8)
        self.req_pickup = np.zeros((batch, R, 2), np.int32)
        self.req_drop = np.zeros((batch, R, 2), np.int32)
        self.req_status = np.zeros((batch, R), np.int32)
        self.req_agent = np.full((batch, R), -1, np.int32)
        self.t = np.zeros(batch, np.int32)
        self.walls = np.zeros(cfg.num_cells, np.uint8)
        for w in cfg.walls:
            self.walls[w] = 1

    def load_state(self, b: int, state) -> None:
        """Copy one env's state (engine EnvState or oracle state) in."""
        self.agent_pos[b] = np.asarray(state.agent_pos, np.int32)
        self.agent_req[b] = np.asarray(state.agent_req, np.int32)
        self.carrying[b] = np.asarray(state.carrying).astype(np.uint8)
        self.req_pickup[b] = np.asarray(state.req_pickup, np.int32)
        self.req_drop[b] = np.asarray(state.req_drop, np.int32)
        self.req_status[b] = np.asarray(state.req_status, np.int32)
        self.req_agent[b] = np.asarray(state.req_agent, np.int32)
        self.t[b] = int(np.asarray(state.t))

    def step(self, actions: np.ndarray, spawn_u: np.ndarray,
             spawn_pick: np.ndarray, spawn_drop: np.ndarray):
        """In-place batched step with injected draws. Returns
        (rewards[B,A] f32, picked, delivered, collided bool[B,A])."""
        cfg, B, A = self.cfg, self.B, self.cfg.num_agents
        rewards = np.zeros((B, A), np.float32)
        picked = np.zeros((B, A), np.uint8)
        delivered = np.zeros((B, A), np.uint8)
        collided = np.zeros((B, A), np.uint8)
        status = self.lib.wh_step_batch(
            B, A, cfg.queue_capacity, cfg.height, cfg.width,
            self.agent_pos, self.agent_req, self.carrying,
            self.req_pickup, self.req_drop, self.req_status,
            self.req_agent, self.t,
            self.walls,
            np.ascontiguousarray(actions, np.int32),
            np.ascontiguousarray(spawn_u, np.float32),
            np.ascontiguousarray(spawn_pick, np.int32),
            np.ascontiguousarray(spawn_drop, np.int32),
            cfg.spawn_prob, cfg.step_penalty, cfg.pickup_reward,
            cfg.delivery_reward, cfg.collision_penalty,
            rewards, picked, delivered, collided,
        )
        if status != 0:
            raise ValueError(
                f"wh_step_batch rejected shapes (A={A} must be in "
                "[1, 64]; B/R/H/W must be positive)"
            )
        return (rewards, picked.astype(bool), delivered.astype(bool),
                collided.astype(bool))

    def greedy_actions(self) -> np.ndarray:
        cfg, B, A = self.cfg, self.B, self.cfg.num_agents
        actions = np.zeros((B, A), np.int32)
        self.lib.wh_greedy_batch(
            B, A, cfg.queue_capacity,
            self.agent_pos, self.agent_req, self.carrying,
            self.req_pickup, self.req_drop, actions,
        )
        return actions
