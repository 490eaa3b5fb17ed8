"""Pluggable draw sources for the NumPy oracle (docs/SEMANTICS.md §9).

Two implementations of the same interface:

- ``JaxDrawSource`` — replays the engine's exact threefry stream (via
  :mod:`warehouse_tpu.rng`, eagerly on CPU). Used by the oracle↔engine
  bit-exact parity tests.
- ``NumpyDrawSource`` — a plain ``np.random.Generator`` stream with the
  same *sequence shape*. Standalone CPU use, and the mount point for a
  future reference-RNG-matching mode once ``/root/reference`` is readable
  (SURVEY.md §8 item 6).
"""

from __future__ import annotations

from typing import NamedTuple, Protocol

import numpy as np

from ..config import EnvConfig


class ResetDrawsNp(NamedTuple):
    agent_cells: np.ndarray  # int [A], distinct row-major cell ids
    req_pick: np.ndarray     # int [init_requests]
    req_drop: np.ndarray     # int [init_requests]


class StepDrawsNp(NamedTuple):
    spawn_u: float
    spawn_pick: int
    spawn_drop: int


class DrawSource(Protocol):
    def reset(self, cfg: EnvConfig) -> ResetDrawsNp: ...
    def step(self, cfg: EnvConfig) -> StepDrawsNp: ...
    def reset_from_step(self, cfg: EnvConfig) -> ResetDrawsNp:
        """Draws for an auto-reset triggered by the most recent step."""
        ...


class JaxDrawSource:
    """Mirrors the engine's key threading exactly (docs/SEMANTICS.md §9)."""

    def __init__(self, seed_or_key) -> None:
        import jax

        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key
        self._pending_reset_key = None

    def reset(self, cfg: EnvConfig) -> ResetDrawsNp:
        return self._reset_with(self._key_consume_reset(self._key), cfg)

    def _key_consume_reset(self, key):
        return key

    def _reset_with(self, key, cfg: EnvConfig) -> ResetDrawsNp:
        from .. import rng as _rng

        d = _rng.reset_draws(key, cfg)
        self._key = d.carry_key
        return ResetDrawsNp(
            np.asarray(d.agent_cells),
            np.asarray(d.req_pick),
            np.asarray(d.req_drop),
        )

    def step(self, cfg: EnvConfig) -> StepDrawsNp:
        from .. import rng as _rng

        d = _rng.step_draws(self._key, cfg)
        self._key = d.next_key
        self._pending_reset_key = d.reset_key
        return StepDrawsNp(
            float(d.spawn_u), int(d.spawn_pick), int(d.spawn_drop)
        )

    def reset_from_step(self, cfg: EnvConfig) -> ResetDrawsNp:
        assert self._pending_reset_key is not None, "no step taken yet"
        return self._reset_with(self._pending_reset_key, cfg)


class NumpyDrawSource:
    """Same draw sequence shape from ``np.random.Generator``."""

    def __init__(self, seed: int) -> None:
        self._rng = np.random.default_rng(seed)

    def reset(self, cfg: EnvConfig) -> ResetDrawsNp:
        free = np.array(cfg.free_cells)
        cells = free[self._rng.permutation(cfg.num_free)[: cfg.num_agents]]
        pick = free[self._rng.integers(0, cfg.num_free,
                                       size=cfg.init_requests)]
        drop = free[self._rng.integers(0, cfg.num_free,
                                       size=cfg.init_requests)]
        return ResetDrawsNp(cells, pick, drop)

    def step(self, cfg: EnvConfig) -> StepDrawsNp:
        free = cfg.free_cells
        u = float(self._rng.random())
        pick = free[int(self._rng.integers(0, cfg.num_free))]
        drop = free[int(self._rng.integers(0, cfg.num_free))]
        return StepDrawsNp(u, pick, drop)

    def reset_from_step(self, cfg: EnvConfig) -> ResetDrawsNp:
        return self.reset(cfg)
