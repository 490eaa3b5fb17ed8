"""A/B the PPO acting backend (xla scan vs fused Pallas act kernel).

Times full train_many updates (rollout + GAE + 4x4 SGD) at BASELINE
config 4, both backends interleaved in one process, floor-calibrated
against a null readback.

Usage: python benchmarks/ab_backend.py [--updates 10] [--rounds 4]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--updates", type=int, default=10)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--env", choices=["medium", "large"], default="medium",
                   help="medium = BASELINE config 4; large = config 3 "
                        "stress geometry (15x15, 8 agents)")
    p.add_argument("--block", type=int, default=512)
    p.add_argument("--only", type=str, default="",
                   help="comma-separated variant subset")
    args = p.parse_args()
    import jax

    from warehouse_tpu.config import (TrainConfig, large_config,
                                      medium_config)
    from warehouse_tpu.train.ppo import make_train
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    env_cfg = (large_config if args.env == "large" else medium_config)()
    # Backends EXPLICIT: with the round-3 "auto" defaults every variant
    # would silently resolve to the fused path on the chip.
    base = TrainConfig(num_envs=args.num_envs, unroll_length=16,
                       minibatch_mode="env", rollout_backend="xla",
                       grad_backend="xla")
    variants = {
        "xla": base,
        "pallas": base.replace(rollout_backend="pallas",
                               pallas_block=args.block),
        "xla_bf16": base.replace(model_dtype="bfloat16"),
        "grad": base.replace(grad_backend="pallas"),
        "both": base.replace(rollout_backend="pallas",
                             pallas_block=args.block,
                             grad_backend="pallas"),
        "both_micro4": base.replace(rollout_backend="pallas",
                                    pallas_block=args.block,
                                    grad_backend="pallas",
                                    micro_batches=4),
        "micro4": base.replace(micro_batches=4),
        "both_r8": base.replace(rollout_backend="pallas",
                                pallas_block=args.block,
                                grad_backend="pallas",
                                sgd_rows_per_block=8),
        "both_bf16": base.replace(rollout_backend="pallas",
                                  pallas_block=args.block,
                                  grad_backend="pallas",
                                  model_dtype="bfloat16"),
        "both_b128": base.replace(rollout_backend="pallas",
                                  pallas_block=128,
                                  grad_backend="pallas"),
        "both_b512": base.replace(rollout_backend="pallas",
                                  pallas_block=512,
                                  grad_backend="pallas"),
        "both_b1024": base.replace(rollout_backend="pallas",
                                   pallas_block=1024,
                                   grad_backend="pallas"),
        "both_e512": base.replace(rollout_backend="pallas",
                                  pallas_block=args.block,
                                  grad_backend="pallas",
                                  sgd_block_envs=512),
    }
    if args.only:
        names = args.only.split(",")
        variants = {k: v for k, v in variants.items() if k in names}

    runs = {}
    for name, tcfg in variants.items():
        tr = make_train(env_cfg, tcfg)
        rs = tr.init(jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        rs, m = tr.train_many(rs, args.updates)
        loss = float(m["loss"][-1])
        print(f"[ab] {name}: warm in {time.perf_counter() - t0:.1f}s "
              f"(loss {loss:.5f})", file=sys.stderr, flush=True)
        runs[name] = (tr, rs, [])

    # Floor: a null jit call + scalar readback.
    @jax.jit
    def null():
        return jax.numpy.float32(0.0)

    float(null())
    floors = []
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        float(null())
        floors.append(time.perf_counter() - t0)
    floor = min(floors)

    for _ in range(args.rounds):
        for name, (tr, rs, times) in runs.items():
            t0 = time.perf_counter()
            rs, m = tr.train_many(rs, args.updates)
            _ = float(m["loss"][-1])
            times.append(time.perf_counter() - t0)
            runs[name] = (tr, rs, times)

    steps = args.num_envs * 16 * args.updates
    print(json.dumps({"stage": "floor_ms", "value": round(floor * 1e3, 2)}))
    for name, (_, _, times) in runs.items():
        per = (min(times) - floor) / args.updates
        print(json.dumps({
            "stage": name,
            "per_update_ms": round(per * 1e3, 3),
            "env_steps_per_s": round(steps / (min(times) - floor)),
        }))


if __name__ == "__main__":
    main()
