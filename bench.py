"""Throughput benchmark: batched greedy rollout, fully jitted on 1 chip.

Implements BASELINE.json config 2 (9x9 grid, 4 agents, greedy baseline
jitted) at stress batch size, and prints ONE JSON line.

North-star metric (BASELINE.json:2): env-steps/s per chip. The aggregate
target is >10M env-steps/s on v5e-16 (16 chips), i.e. 625k steps/s/chip —
``vs_baseline`` is measured-per-chip / 625k.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

PER_CHIP_TARGET = 10_000_000 / 16


def main() -> None:
    import jax
    import jax.numpy as jnp

    from warehouse_tpu import medium_config
    from warehouse_tpu.baselines.greedy import greedy_actions
    from warehouse_tpu.env import engine

    # B=65536 is the measured single-chip sweet spot (throughput is
    # non-monotonic in B; see docs/ARCHITECTURE.md perf notes).
    cfg = medium_config(auto_reset=True)
    B, T = 65536, 64

    key = jax.random.PRNGKey(0)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
    state, _ = jax.jit(
        jax.vmap(lambda k: engine.reset(cfg, k))
    )(keys)

    # Keep per-step rewards AND deliveries live so XLA cannot dead-code
    # away reward/flag computation — the number reflects the full step.
    def body(s, _):
        a = jax.vmap(lambda ss: greedy_actions(cfg, ss))(s)
        s, ts = jax.vmap(lambda ss, aa: engine.step(cfg, ss, aa))(s, a)
        return s, (ts.delivered.sum(dtype=jnp.int32), ts.reward.sum())

    @jax.jit
    def rollout(s):
        s, (dels, rews) = jax.lax.scan(body, s, None, length=T)
        return s, dels.sum(), rews.sum()

    # Warmup/compile.
    state, _, _ = rollout(state)
    jax.block_until_ready(state)

    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        state, d, r = rollout(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    assert int(d) > 0, "no deliveries — engine dynamics look broken"

    steps = B * T * iters
    sps = steps / dt
    n_chips = jax.device_count()
    per_chip = sps / n_chips
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip",
                "value": round(per_chip),
                "unit": f"env-steps/s/chip (9x9 grid, 4 agents, greedy jitted, B={B})",
                "vs_baseline": round(per_chip / PER_CHIP_TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
