"""Decompose the PPO update cost by scaling epochs/minibatches.

Model: t(e, m) = R + S*e + g*e*m  (R = rollout + per-update fixed work,
S = per-epoch shuffle/layout, g = per-grad-step). Times four (e, m)
points in ONE process, interleaved (chip-drift-proof), and solves for
R/S/g. Usage: python benchmarks/ab_epochs.py
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
    points = {
        "e4m4": (4, 4),
        "e1m4": (1, 4),
        "e4m1": (4, 1),
        "e1m1": (1, 1),
    }
    env_cfg = medium_config()
    n = args.updates

    runs = {}
    for name, (e, m) in points.items():
        tcfg = TrainConfig(**base, ppo_epochs=e, num_minibatches=m)
        t0 = time.perf_counter()
        trainer = make_train(env_cfg, tcfg)
        rs = trainer.init(jax.random.PRNGKey(0))
        rs, mt = trainer.train_many(rs, n)
        _ = float(mt["loss"][-1])
        print(f"[ab] {name}: warm in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        runs[name] = (trainer, rs, [])

    for r in range(args.rounds):
        for name, (trainer, rs, times) in runs.items():
            t0 = time.perf_counter()
            rs2, mt = trainer.train_many(rs, n)
            _ = float(mt["loss"][-1])
            times.append(time.perf_counter() - t0)

    t = {}
    for name, (_, _, times) in runs.items():
        best = min(times) / n  # per update
        t[name] = best
        print(json.dumps({"point": name, "per_update_ms":
                          round(best * 1e3, 2)}))

    # t(e,m) = R + S*e + g*e*m
    g = (t["e4m4"] - t["e4m1"]) / 12
    S = (t["e4m1"] - t["e1m1"]) / 3 - g
    R = t["e1m1"] - S - g
    print(json.dumps({
        "per_grad_step_ms": round(g * 1e3, 2),
        "per_epoch_overhead_ms": round(S * 1e3, 2),
        "rollout_plus_fixed_ms": round(R * 1e3, 2),
        "check_e1m4_ms": round((R + S + 4 * g) * 1e3, 2),
        "measured_e1m4_ms": round(t["e1m4"] * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
