"""Profiling, debugging, and validation utilities."""

from .profiling import StepsPerSecond, annotate, trace
from .debug import enable_debug_mode, check_state_invariants

__all__ = [
    "trace",
    "annotate",
    "StepsPerSecond",
    "enable_debug_mode",
    "check_state_invariants",
]
