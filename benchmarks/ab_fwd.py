"""Isolate why the MLP forward costs ~2.6 ms at 262k samples.

CAUTION — same LICM problem as ab_grad.py (loop-invariant scan body,
XLA hoists the work; every variant here measured the ~25 ms readback
floor / reps). Superseded by ab_update.py's floor-calibrated stages.

ab_grad.py showed the grad step is forward-bound (fwd 2.59 ms of the
3.39 ms grad step; the PPO loss chain is 0.08 ms) at ~6 TFLOP/s
effective — far below MXU speed. Variants, interleaved:

  F0_full       2x128 MLP + heads, tanh, f32 (the shipped model)
  F1_notanh     same matmuls, identity activation
  F2_dot1       single dense layer only (obs @ W1)
  F3_bf16       full model, bfloat16 torso
  F4_halfN      full model at N/2 (dispatch-overhead check)
  F5_batchminor full model math on pre-transposed [obs_dim, N] input
                (W.T @ X chain) — column-major activations

Usage: python benchmarks/ab_fwd.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--num-samples", type=int, default=262144)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from warehouse_tpu.config import medium_config
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    env_cfg = medium_config()
    N, D, H = args.num_samples, env_cfg.obs_dim, 128
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    obs = jax.random.uniform(ks[0], (N, D), jnp.float32)
    obs_t = jnp.transpose(obs)  # [D, N]
    w1 = jax.random.normal(ks[1], (D, H), jnp.float32) * 0.05
    w2 = jax.random.normal(ks[2], (H, H), jnp.float32) * 0.05
    wh = jax.random.normal(ks[3], (H, 6), jnp.float32) * 0.05
    b1 = jnp.zeros((H,), jnp.float32)
    b2 = jnp.zeros((H,), jnp.float32)
    bh = jnp.zeros((6,), jnp.float32)

    def fwd(x, act, dtype):
        x = x.astype(dtype)
        h1 = act(x @ w1.astype(dtype) + b1.astype(dtype))
        h2 = act(h1 @ w2.astype(dtype) + b2.astype(dtype))
        out = h2 @ wh.astype(dtype) + bh.astype(dtype)
        return out.astype(jnp.float32).sum()

    def fwd_bm(x, act, dtype):  # x: [D, N]
        x = x.astype(dtype)
        h1 = act(w1.astype(dtype).T @ x + b1.astype(dtype)[:, None])
        h2 = act(w2.astype(dtype).T @ h1 + b2.astype(dtype)[:, None])
        out = wh.astype(dtype).T @ h2 + bh.astype(dtype)[:, None]
        return out.astype(jnp.float32).sum()

    tanh, ident = jnp.tanh, lambda x: x

    def make(fn, x):
        @jax.jit
        def run():
            def one(c, _):
                return c + fn(x), None
            out, _ = jax.lax.scan(one, jnp.float32(0.0), None,
                                  length=args.reps)
            return out
        return run

    variants = {
        "F0_full": make(lambda x: fwd(x, tanh, jnp.float32), obs),
        "F1_notanh": make(lambda x: fwd(x, ident, jnp.float32), obs),
        "F2_dot1": make(lambda x: (x @ w1).sum(), obs),
        "F3_bf16": make(lambda x: fwd(x, tanh, jnp.bfloat16), obs),
        "F4_halfN": make(lambda x: fwd(x, tanh, jnp.float32),
                         obs[: N // 2]),
        "F5_batchminor": make(lambda x: fwd_bm(x, tanh, jnp.float32),
                              obs_t),
    }
    runs = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        float(fn())
        print(f"[ab] {name}: warm in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        runs[name] = (fn, [])

    for _ in range(args.rounds):
        for name, (fn, times) in runs.items():
            t0 = time.perf_counter()
            float(fn())
            times.append(time.perf_counter() - t0)

    for name, (_, times) in runs.items():
        per = min(times) / args.reps
        print(json.dumps({
            "stage": name,
            "per_fwd_ms": round(per * 1e3, 3),
        }))


if __name__ == "__main__":
    main()
