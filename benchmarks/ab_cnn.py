"""Measure the CNN family's learner phase (VERDICT r4 item 3 decision).

The CNN family has fused acting (convs as unrolled dense matmuls in
pallas/act.py) but an XLA learner — the one shipped-family/fused-path
hole with no measured rationale. This probe produces the decision
numbers: the epochs trick isolates the XLA CNN learner phase
(``t(E=8) - t(E=4)`` = one learner phase), and the analytic cost model
(utils/roofline.py cnn_sgd_cost) places it on the roofline. If the XLA
learner already sits near its MXU bound, fusing cannot pay (the fused
kernels' historical wins were launch/scheduling overhead on SMALL
matmuls — CNN backward is large-matmul territory, XLA's home turf);
if it sits far off, a fused CNN backward is worth building.

All variants interleaved in one process, floor-calibrated
(docs/RESULTS.md measurement rules).

Usage: python benchmarks/ab_cnn.py [--updates 10] [--rounds 4]
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
    args = p.parse_args()
    import jax

    from warehouse_tpu.config import TrainConfig, medium_config
    from warehouse_tpu.train.ppo import make_train
    from warehouse_tpu.utils import roofline as rl
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    env_cfg = medium_config()
    base = TrainConfig(num_envs=args.num_envs, unroll_length=16,
                       rollout_backend="pallas", grad_backend="xla")
    variants = {
        # Fused acting + XLA learner (the pre-round-5 production path).
        "cnn": base,
        "cnn_e8": base.replace(ppo_epochs=8),
        # FULLY fused: acting + the unrolled-dense CNN SGD kernel
        # (pallas/sgd_cnn.py, round 5).
        "cnn_fused": base.replace(grad_backend="pallas"),
        "cnn_fused_e8": base.replace(grad_backend="pallas",
                                     ppo_epochs=8),
        # All-XLA CNN (is the act kernel still paying at CNN sizes?).
        "cnn_xla_act": base.replace(rollout_backend="xla"),
        # MLP reference at identical shapes/cadence (same process).
        "mlp_fused": base.replace(grad_backend="pallas"),
    }

    runs = {}
    for name, tcfg in variants.items():
        arch = "mlp" if name == "mlp_fused" else "cnn"
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
    cost = rl.cnn_sgd_cost(env_cfg, TrainConfig(
        num_envs=args.num_envs, unroll_length=16))
    for tag in ("cnn", "cnn_fused"):
        if tag + "_e8" not in per_ms:
            continue
        learner = per_ms[tag + "_e8"] - per_ms[tag]
        act = per_ms[tag] - learner
        rep = rl.report(cost, learner / 1e3)
        print(json.dumps({
            "stage": tag + "_split",
            "learner_phase_ms": round(learner, 3),
            "act_plus_glue_ms": round(act, 3),
            "learner_share_pct": round(100 * learner / per_ms[tag], 1),
            # NOTE: the roofline uses the TRUE-conv FLOP count; the
            # fused kernel executes 25/9x those FLOPs in unrolled form,
            # so its sol_frac understates its retired FLOP/s.
            "learner_roofline": rep,
        }))


if __name__ == "__main__":
    main()
