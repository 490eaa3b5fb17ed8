"""Trained fast path at BASELINE config 3 stress geometry.

VERDICT r2 item 6: the act (+ fused SGD) kernels had only ever trained
at 9x9/4-agent shapes. This drives PPO at 15x15, 8 agents, 8192 envs
through the fused kernels on the real chip, reports throughput, and
sanity-checks the learning curve (deliveries climbing).

Usage: python benchmarks/stress_train.py [--updates 300] [--block 256]
       [--grad-backend pallas] [--rollout-backend pallas]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--updates", type=int, default=300)
    p.add_argument("--num-envs", type=int, default=8192)
    p.add_argument("--block", type=int, default=256)
    p.add_argument("--rollout-backend", default="pallas")
    p.add_argument("--grad-backend", default="pallas")
    p.add_argument("--sgd-block-envs", type=int, default=1024)
    args = p.parse_args()

    import jax

    from warehouse_tpu.config import TrainConfig, large_config
    from warehouse_tpu.train.ppo import make_train
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    env_cfg = large_config()            # 15x15, 8 agents, queue 16
    tcfg = TrainConfig(
        num_envs=args.num_envs, unroll_length=16,
        rollout_backend=args.rollout_backend,
        grad_backend=args.grad_backend,
        pallas_block=args.block,
        sgd_block_envs=args.sgd_block_envs,
        num_updates=args.updates,
    )
    tr = make_train(env_cfg, tcfg)
    rs = tr.init(jax.random.PRNGKey(0))

    t0 = time.perf_counter()
    rs, m = tr.train_many(rs, 10)
    print(f"warm (compile + 10 updates): {time.perf_counter() - t0:.1f}s"
          f" deliveries={float(m['deliveries_per_env_step'][-1]):.4f}",
          file=sys.stderr, flush=True)

    marks = {}
    done = 10
    t0 = time.perf_counter()
    t_timed0 = t0
    while done < args.updates:
        n = min(50, args.updates - done)
        rs, m = tr.train_many(rs, n)
        done += n
        marks[done] = (float(m["deliveries_per_env_step"][-1]),
                       float(m["entropy"][-1]))
        print(f"[{done}] deliveries={marks[done][0]:.4f} "
              f"entropy={marks[done][1]:.3f}", file=sys.stderr, flush=True)
    dt = time.perf_counter() - t_timed0
    steps = (done - 10) * tcfg.num_envs * tcfg.unroll_length
    print(json.dumps({
        "config": "BASELINE-3 (15x15, 8ag, 8192 envs) trained",
        "rollout_backend": args.rollout_backend,
        "grad_backend": args.grad_backend,
        "env_steps_per_s": round(steps / dt),
        "deliveries_curve": {k: v[0] for k, v in marks.items()},
    }))


if __name__ == "__main__":
    main()
