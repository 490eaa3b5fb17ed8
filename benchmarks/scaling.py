"""Scaling benchmark: env-steps/s at 1 device vs N mesh devices
(BASELINE.json config 5: 1 chip / 1 host / N hosts).

On a real pod slice this reports ICI-scaled throughput; on this dev box
it can exercise the identical shard_map code path over N fake CPU
devices (--cpu --fake-devices N) to validate scaling-efficiency
*mechanics* (real numbers require real chips).

Usage:
  python benchmarks/scaling.py                 # all visible devices
  python benchmarks/scaling.py --cpu --fake-devices 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(mesh, cfg, B, T, policy_seed=0):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from warehouse_tpu.baselines.greedy import greedy_actions
    from warehouse_tpu.env import engine

    def init(seed):
        keys = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
        )(jnp.arange(B))
        state, _ = jax.vmap(lambda k: engine.reset(cfg, k))(keys)
        return state

    state = jax.jit(
        init,
        out_shardings=jax.tree.map(
            lambda _: NamedSharding(mesh, P("data")), jax.eval_shape(init, 0)
        ),
    )(0)

    def body(s, _):
        a = jax.vmap(lambda ss: greedy_actions(cfg, ss))(s)
        s, ts = jax.vmap(lambda ss, aa: engine.step(cfg, ss, aa))(s, a)
        return s, ts.delivered.sum(dtype=jnp.int32)

    @jax.jit
    def rollout(s):
        s, d = jax.lax.scan(body, s, None, length=T)
        return s, d.sum()

    state, _ = rollout(state)
    jax.block_until_ready(state)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        state, d = rollout(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return B * T * iters / dt


def main() -> None:
    p = argparse.ArgumentParser("scaling bench")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--fake-devices", type=int, default=0)
    p.add_argument("--envs-per-device", type=int, default=65536)
    p.add_argument("--unroll", type=int, default=64)
    args = p.parse_args()

    if args.fake_devices:
        flag = f"--xla_force_host_platform_device_count={args.fake_devices}"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " " + flag
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.envs_per_device = min(args.envs_per_device, 512)

    from warehouse_tpu import medium_config
    from warehouse_tpu.parallel.mesh import make_mesh

    cfg = medium_config(auto_reset=True)
    devices = jax.devices()
    results = []
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    for n in sizes:
        mesh = make_mesh(devices[:n])
        sps = measure(mesh, cfg, B=args.envs_per_device * n, T=args.unroll)
        base = results[0]["steps_per_sec"] if results else sps
        results.append(
            {
                "devices": n,
                "steps_per_sec": round(sps),
                "per_device": round(sps / n),
                "efficiency_vs_1": round(sps / (base * n), 3),
            }
        )
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
