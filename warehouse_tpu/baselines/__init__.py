"""Baseline policies (greedy nearest-request, obstacle-aware greedy,
uniform random)."""

from .greedy import greedy_actions, greedy_bfs_actions
from .random import random_actions

__all__ = ["greedy_actions", "greedy_bfs_actions", "random_actions"]
