"""Measure the attn family's acting/learner split (VERDICT r4 item 5).

docs/RESULTS.md asserts the attn (transformer) family stays XLA because
its acting phase is "<40% of the update" — an assertion with no probe
behind it until now. This probe measures the split with the epochs
trick (ab_impala.py's passes trick, generalized): doubling ppo_epochs
adds EXACTLY one learner phase, so ``t(E=8) - t(E=4)`` is one learner
phase and the remainder is acting + XLA glue. If acting were the
majority of the update, an attn act kernel could pay; if the learner
dominates, the documented stays-XLA rationale stands (an in-kernel
transformer backward would reimplement half of flax for the minority
share).

All variants interleaved in one process, floor-calibrated
(docs/RESULTS.md measurement rules).

WATCHDOG (measured, docs/RESULTS.md r5): attn updates run ~7 s each at
4096 envs, and a single device execution lasting longer than roughly a
minute crashes the tunneled TPU worker (reproduced 4/4 at
``train_many(10)``) — keep ``--updates`` at 3 so one timed block stays
~20 s.

Usage: python benchmarks/ab_attn.py [--updates 3] [--rounds 4]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--updates", type=int, default=3)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--num-envs", type=int, default=4096)
    args = p.parse_args()
    import jax

    from warehouse_tpu.config import TrainConfig, medium_config
    from warehouse_tpu.train.ppo import make_train
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    env_cfg = medium_config()
    base = TrainConfig(num_envs=args.num_envs, unroll_length=16,
                       rollout_backend="xla", grad_backend="xla")
    variants = {
        "attn": base,
        "attn_e8": base.replace(ppo_epochs=8),
        # MLP reference at identical shapes/cadence (same process).
        "mlp": base,
    }

    runs = {}
    for name, tcfg in variants.items():
        arch = "mlp" if name == "mlp" else "attn"
        tr = make_train(env_cfg, tcfg, arch=arch)
        rs = tr.init(jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        rs, m = tr.train_many(rs, args.updates)
        _ = float(m["loss"][-1])
        print(f"[ab] {name}: warm in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        runs[name] = (tr, rs, [])

    from warehouse_tpu.utils.profiling import readback_floor

    floor = readback_floor(args.rounds)

    for _ in range(args.rounds):
        for name, (tr, rs, times) in runs.items():
            t0 = time.perf_counter()
            rs, m = tr.train_many(rs, args.updates)
            _ = float(m["loss"][-1])
            times.append(time.perf_counter() - t0)
            runs[name] = (tr, rs, times)

    steps = args.num_envs * 16 * args.updates
    print(json.dumps({"stage": "floor_ms", "value": round(floor * 1e3, 2)}))
    per_ms = {}
    for name, (_, _, times) in runs.items():
        per = (min(times) - floor) / args.updates
        per_ms[name] = per * 1e3
        print(json.dumps({
            "stage": name,
            "per_update_ms": round(per * 1e3, 3),
            "env_steps_per_s": round(steps / (min(times) - floor)),
        }))
    learner = per_ms["attn_e8"] - per_ms["attn"]
    act = per_ms["attn"] - learner
    print(json.dumps({
        "stage": "attn_split",
        "learner_phase_ms": round(learner, 3),
        "act_plus_glue_ms": round(act, 3),
        "act_share_pct": round(100 * act / per_ms["attn"], 1),
    }))


if __name__ == "__main__":
    main()
