"""Pure array ops implementing the env sub-steps (docs/SEMANTICS.md §4)."""

from .move import resolve_moves
from .assign import assign_requests
from .obs import observe
from .gae import gae

__all__ = ["resolve_moves", "assign_requests", "observe", "gae"]
