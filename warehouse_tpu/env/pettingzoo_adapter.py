"""PettingZoo ParallelEnv adapter.

Interop surface beyond the RLlib-style dict API (``wrapper.py``): the
PettingZoo parallel API is the other common multi-agent env contract, so
ecosystems built on either can consume the engine. Thin shim over
``WarehouseMultiAgentEnv``.
"""

from __future__ import annotations

from typing import Any

from ..config import EnvConfig
from .wrapper import WarehouseMultiAgentEnv

try:
    from pettingzoo import ParallelEnv as _ParallelEnv
except Exception:  # pragma: no cover - pettingzoo optional
    _ParallelEnv = object


class WarehouseParallelEnv(_ParallelEnv):
    """PettingZoo ParallelEnv over the warehouse engine."""

    metadata = {"render_modes": ["ansi"], "name": "warehouse_tpu_v0"}

    def __init__(self, cfg: EnvConfig | None = None,
                 backend: str = "jax") -> None:
        self._env = WarehouseMultiAgentEnv(cfg, backend=backend)
        self.possible_agents = list(self._env.possible_agents)
        self.agents = list(self.possible_agents)

    def observation_space(self, agent: str):
        return self._env.observation_space(agent)

    def action_space(self, agent: str):
        return self._env.action_space(agent)

    def reset(self, seed: int | None = None, options: Any = None):
        obs, info = self._env.reset(seed=seed, options=options)
        self.agents = list(self.possible_agents)
        return obs, info

    def step(self, actions: dict[str, int]):
        obs, rew, term, trunc, info = self._env.step(actions)
        # PettingZoo has no "__all__" key — per-agent dicts only.
        term = {a: term[a] for a in self.possible_agents}
        trunc = {a: trunc[a] for a in self.possible_agents}
        if all(term.values()) or all(trunc.values()):
            self.agents = []
        return obs, rew, term, trunc, info

    def render(self):
        return self._env.render()

    def close(self) -> None:
        pass

    @property
    def num_agents(self) -> int:
        return len(self.agents)
