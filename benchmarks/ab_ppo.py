"""Single-process A/B of PPO train-step variants (chip-drift-proof).

The tunneled chip's effective speed varies between processes/sessions
(docs/RESULTS.md "chip-condition variance"), so cross-process numbers
can't rank optimizations. This harness compiles every variant once in
ONE process and times them interleaved round-robin, so chip weather
hits all variants equally. Timing is gated on a host readback per
timed call (one readback per `--updates` updates, train_many-style).

Usage: python benchmarks/ab_ppo.py [--updates 10] [--rounds 3]
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
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from warehouse_tpu.config import TrainConfig, medium_config
    from warehouse_tpu.train.ppo import make_train
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    base = dict(num_envs=args.num_envs, unroll_length=16,
                minibatch_mode="env")
    variants = {
        "env_f32": TrainConfig(**base, flat_optimizer=False),
        "env_f32_flatopt": TrainConfig(**base, flat_optimizer=True),
        "env_bf16_flatopt": TrainConfig(**base, flat_optimizer=True,
                                        model_dtype="bfloat16"),
    }
    env_cfg = medium_config()
    n = args.updates
    steps = n * args.num_envs * 16

    runs = {}
    for name, tcfg in variants.items():
        t0 = time.perf_counter()
        trainer = make_train(env_cfg, tcfg)
        rs = trainer.init(jax.random.PRNGKey(0))
        rs, m = trainer.train_many(rs, n)  # compile + warmup
        loss = float(m["loss"][-1])
        print(f"[ab] {name}: compiled+warm in "
              f"{time.perf_counter() - t0:.1f}s (loss {loss:.4f})",
              file=sys.stderr, flush=True)
        runs[name] = (trainer, rs, [])

    for r in range(args.rounds):
        for name, (trainer, rs, times) in runs.items():
            t0 = time.perf_counter()
            rs2, m = trainer.train_many(rs, n)
            _ = float(m["loss"][-1])
            times.append(time.perf_counter() - t0)

    for name, (_, _, times) in runs.items():
        best = min(times)
        print(json.dumps({
            "variant": name,
            "best_s": round(best, 4),
            "all_s": [round(t, 4) for t in times],
            "env_steps_per_s": round(steps / best),
        }))


if __name__ == "__main__":
    main()
