"""Throughput benchmark: batched greedy rollout, fully jitted on 1 chip.

Implements BASELINE.json config 2 (9x9 grid, 4 agents, greedy baseline
jitted) at stress batch size via the fused Pallas rollout kernel
(warehouse_tpu/pallas/rollout.py — bit-exact against the XLA engine,
tests/test_pallas.py), and prints ONE JSON line.

North-star metric (BASELINE.json:2): env-steps/s per chip. The aggregate
target is >10M env-steps/s on v5e-16 (16 chips), i.e. 625k
steps/s/chip — ``vs_baseline`` is measured-per-chip / 625k.

Episodes are episode-synchronized (all envs reset together at
t = max_steps), so auto-reset runs between kernel invocations; its cost
is included in the timing.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

PER_CHIP_TARGET = 10_000_000 / 16


def _progress(msg: str) -> None:
    """Progress marker on stderr (stdout carries ONLY the JSON line)."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from warehouse_tpu import medium_config
    from warehouse_tpu.env import engine
    from warehouse_tpu.pallas.rollout import greedy_rollout_pallas

    cfg = medium_config()  # auto_reset handled at episode boundary below
    B, BLOCK = 131072, 1024
    T = cfg.max_steps  # one full episode per kernel call

    @jax.jit
    def reset_all(seed):
        keys = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
        )(jnp.arange(B))
        state, _ = jax.vmap(lambda k: engine.reset(cfg, k))(keys)
        return state

    def episode(state):
        # Full-episode fused rollout + synchronized reset (auto-reset
        # equivalent for episode-aligned batches); reset cost is timed.
        new_state, deliv, rew = greedy_rollout_pallas(cfg, state, T, BLOCK)
        return new_state, deliv.sum(), rew.sum()

    _progress(f"compiling reset (B={B}) …")
    state = reset_all(0)
    # Warmup/compile.
    _progress("compiling fused Pallas rollout kernel …")
    t_c = time.perf_counter()
    s2, d, r = episode(state)
    _ = int(d)
    _progress(f"warmup episode done in {time.perf_counter() - t_c:.1f}s; "
              "timing 8 episodes …")

    # The timing gate is ONE host readback of the summed delivery count
    # at the end: every episode's deliveries feed the device-side sum, so
    # the readback can't complete until all iters have really executed
    # (block_until_ready proved unreliable over the remote-device
    # transport, and a readback PER episode pays the tunnel round-trip —
    # measured at ~64 ms — iters times instead of once).
    iters = 8
    deliv_parts = []
    t0 = time.perf_counter()
    for i in range(iters):
        state = reset_all(i)
        state, d, r = episode(state)
        deliv_parts.append(d)
    total_d = int(sum(deliv_parts))
    dt = time.perf_counter() - t0
    assert total_d > 0, "no deliveries — engine dynamics look broken"

    steps = B * T * iters
    sps = steps / dt
    n_chips = jax.device_count()
    per_chip = sps / n_chips
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip",
                "value": round(per_chip),
                "unit": (
                    "env-steps/s/chip (9x9 grid, 4 agents, greedy baseline,"
                    f" fused Pallas rollout, B={B}, full 128-step episodes"
                    " incl. reset)"
                ),
                "vs_baseline": round(per_chip / PER_CHIP_TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
