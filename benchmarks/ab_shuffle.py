"""Single-process A/B: epoch_shuffle='each' vs 'once' on the fast path.

Same chip-drift-proof protocol as ab_ppo.py (one process, variants
compiled once, timed interleaved round-robin, one readback per
`--updates` updates). Both variants run the production fast path
(rollout_backend='pallas', minibatch_mode='env'); the only delta is
whether the minibatch permutation gather happens every epoch or once
per update (TrainConfig.epoch_shuffle).

Usage: python benchmarks/ab_shuffle.py [--updates 10] [--rounds 4]
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
    p.add_argument("--backend", choices=["xla", "pallas"],
                   default="pallas")
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
                minibatch_mode="env", rollout_backend=args.backend)
    variants = {
        "each": TrainConfig(**base, epoch_shuffle="each"),
        "once": TrainConfig(**base, epoch_shuffle="once"),
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

    for _ in range(args.rounds):
        for name, (trainer, rs, times) in runs.items():
            t0 = time.perf_counter()
            _, m = trainer.train_many(rs, n)
            _ = float(m["loss"][-1])
            times.append(time.perf_counter() - t0)

    for name, (_, _, times) in runs.items():
        best = min(times)
        print(json.dumps({
            "variant": name,
            "best_s": round(best, 4),
            "all_s": [round(t, 4) for t in times],
            "per_update_ms": round(1e3 * best / n, 3),
            "env_steps_per_s": round(steps / best),
        }))


if __name__ == "__main__":
    main()
