"""NumPy oracle: the readable, step-for-step executable spec."""

from .draws import JaxDrawSource, NumpyDrawSource
from .env import OracleEnv, OracleState
from .greedy import greedy_actions, greedy_bfs_actions

__all__ = [
    "JaxDrawSource",
    "NumpyDrawSource",
    "OracleEnv",
    "OracleState",
    "greedy_actions",
    "greedy_bfs_actions",
]
