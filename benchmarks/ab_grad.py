"""Isolate the PPO grad step's internals at BASELINE config 4 scale.

CAUTION — numbers from this probe are unreliable: the scan body
computes the SAME grad every rep (no data dependence between reps), so
XLA hoists the computation out of the loop (LICM) and the per-rep time
collapses toward the host-readback floor. ab_update.py threads the env
state through reps and calibrates the floor explicitly — use that.
Kept for the variant definitions only.

ab_fixed.py (post auto-reset gating) shows one epoch-equivalent grad
step over 262k samples costs ~2.9 ms — with 4 epochs that is now the
dominant term of the update. This probes, interleaved in one process:

  G0_fwd        loss forward only (no grad)
  G1_grad_f32   value_and_grad of the full PPO loss, float32 torso
  G2_grad_bf16  same, bfloat16 torso (f32 params, bf16 compute)
  G3_mm_only    value_and_grad of a matmul-only surrogate loss
                (mean(value) + mean(logits)) — the softmax/ratio/
                entropy chain is DCE'd, isolating model fwd+bwd

G1-G3 = the loss-chain cost; G1-G2 = the dtype win, if any.

Usage: python benchmarks/ab_grad.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=20, help="grad steps per call")
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
    from warehouse_tpu.models import make_model
    from warehouse_tpu.ops.ppo_update import ppo_losses
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    env_cfg = medium_config()
    N = args.num_samples
    key = jax.random.PRNGKey(0)
    models = {
        "f32": make_model(env_cfg),
        "bf16": make_model(env_cfg, dtype=jnp.bfloat16),
    }
    params = models["f32"].init(
        key, jnp.zeros((1, env_cfg.obs_dim), jnp.float32))

    ks = jax.random.split(key, 6)
    obs = jax.random.uniform(ks[0], (N, env_cfg.obs_dim), jnp.float32)
    action = jax.random.randint(ks[1], (N,), 0, env_cfg.num_actions)
    old_lp = -jnp.abs(jax.random.normal(ks[2], (N,)))
    old_v = jax.random.normal(ks[3], (N,))
    adv = jax.random.normal(ks[4], (N,))
    tgt = jax.random.normal(ks[5], (N,))
    batch = (obs, action, old_lp, old_v, adv, tgt)

    def full_loss(model):
        def loss_fn(params, mb):
            o, a, lp, v, ad, tg = mb
            logits, value = model.apply(params, o)
            return ppo_losses(logits, value, a, lp, v, ad, tg,
                              clip_eps=0.2, value_coef=0.5, ent_coef=0.01,
                              kl_coeff=0.0)
        return loss_fn

    def mm_loss(model):
        def loss_fn(params, mb):
            o = mb[0]
            logits, value = model.apply(params, o)
            return value.mean() + logits.mean(), (0.0, 0.0, 0.0, 0.0)
        return loss_fn

    def make(loss_fn, grad):
        if grad:
            step = jax.value_and_grad(loss_fn, has_aux=True)

            def one(c, _):
                (loss, _), grads = step(params, batch)
                leaf = jax.tree.leaves(grads)[0]
                return c + loss + leaf.sum(), None
        else:
            def one(c, _):
                loss, _ = loss_fn(params, batch)
                return c + loss, None

        @jax.jit
        def run():
            out, _ = jax.lax.scan(one, jnp.float32(0.0), None,
                                  length=args.reps)
            return out

        return run

    variants = {
        "G0_fwd": make(full_loss(models["f32"]), grad=False),
        "G1_grad_f32": make(full_loss(models["f32"]), grad=True),
        "G2_grad_bf16": make(full_loss(models["bf16"]), grad=True),
        "G3_mm_only": make(mm_loss(models["f32"]), grad=True),
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
            "per_grad_step_ms": round(per * 1e3, 3),
        }))


if __name__ == "__main__":
    main()
