"""Persistent XLA compilation cache (SURVEY.md §6 throughput harness).

First compilation of the fused Pallas rollout / sharded PPO train step
costs tens of seconds of host CPU (this box has 2 cores); every
subsequent process would pay it again. JAX ships a persistent
compilation cache keyed on (HLO, compile options, device topology) —
enabling it makes bench.py / train / evaluate warm-start across
processes, which matters both for the driver's round-end bench run and
for users iterating on configs.

Best-effort: if the backend's PJRT plugin cannot serialize executables,
JAX silently skips caching — never an error.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "warehouse_tpu", "xla_cache"
)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache. Returns the dir used,
    or None if enabling failed (old jax, read-only FS, …)."""
    cache_dir = cache_dir or os.environ.get(
        "WAREHOUSE_TPU_CACHE_DIR", DEFAULT_CACHE_DIR
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything, even fast compiles: the tunnel round-trips
        # during compilation dominate, not compile CPU time.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return cache_dir
    except Exception:  # pragma: no cover - best-effort
        return None
