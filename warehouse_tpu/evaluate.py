"""Evaluation CLI: ``python -m warehouse_tpu.evaluate`` (SURVEY.md C13).

Batched on-device evaluation of the greedy baseline, a random policy, or
a trained PPO checkpoint: B envs × full episodes, fully jitted, reporting
mean episode return and deliveries/episode — the reference's
evaluate-script capability without the per-step Python loop.
"""

from __future__ import annotations

import argparse

import numpy as np

from .configs_cli import add_env_args, apply_backend_args, env_config_from_args


def evaluate_policy(cfg, policy_fn, num_episodes: int, seed: int = 0):
    """policy_fn(state, obs, key) -> int32[B, A] actions. Returns metrics.

    Runs B=num_episodes envs for exactly max_steps (one episode each;
    auto_reset off) in one jitted scan.
    """
    import jax
    import jax.numpy as jnp

    from .env import engine

    cfg = cfg.replace(auto_reset=False)
    B = num_episodes
    keys = jax.vmap(
        lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
    )(jnp.arange(B))
    state, obs = jax.jit(jax.vmap(lambda k: engine.reset(cfg, k)))(keys)

    def body(carry, _):
        state, obs, key = carry
        key, ak = jax.random.split(key)
        actions = policy_fn(state, obs, ak)
        state, ts = jax.vmap(
            lambda s, a: engine.step(cfg, s, a)
        )(state, actions)
        return (state, ts.obs, key), (ts.reward, ts.delivered)

    @jax.jit
    def run(state, obs):
        (_, _, _), (rews, dels) = jax.lax.scan(
            body, (state, obs, jax.random.PRNGKey(seed + 1)), None,
            length=cfg.max_steps,
        )
        return rews, dels

    rews, dels = run(state, obs)  # [T, B, A]
    ep_return = np.asarray(rews.sum(0))        # [B, A]
    ep_deliv = np.asarray(dels.sum(0))         # [B, A]
    return {
        "episodes": B,
        "mean_agent_return": float(ep_return.mean()),
        "mean_episode_return": float(ep_return.sum(-1).mean()),
        "mean_deliveries_per_episode": float(ep_deliv.sum(-1).mean()),
        "std_episode_return": float(ep_return.sum(-1).std()),
    }


def load_checkpoint_params(cfg, model, checkpoint_dir: str):
    """Restore the latest checkpoint's params for ``model``.

    Device-portable: the abstract restore target is built from checkpoint
    METADATA with the current local device's sharding, so a TPU-saved
    checkpoint restores on CPU (and vice versa)."""
    import os

    import jax
    import orbax.checkpoint as ocp

    from .train import checkpoint as ckpt

    step = ckpt.latest_step(checkpoint_dir)
    if step is None:
        raise SystemExit(f"no checkpoints under {checkpoint_dir}")
    path = os.path.abspath(f"{checkpoint_dir}/step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    meta = ckptr.metadata(path).item_metadata
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def to_abstract(m):
        return jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding)

    abstract = jax.tree.map(to_abstract, meta.tree)
    restored = ckptr.restore(path, abstract)
    return restored["params"]


def main(argv=None) -> None:
    p = argparse.ArgumentParser("warehouse_tpu.evaluate")
    add_env_args(p)
    p.add_argument("--policy", choices=["greedy", "random", "checkpoint"],
                   default="greedy")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--arch", choices=["mlp", "cnn"], default="mlp")
    p.add_argument("--hidden-dim", type=int, default=128)
    p.add_argument("--episodes", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sample", action="store_true",
                   help="sample checkpoint-policy actions from the "
                        "categorical instead of argmax")
    args = p.parse_args(argv)

    import jax

    apply_backend_args(args)
    cfg = env_config_from_args(args)

    if args.policy == "greedy":
        from .baselines.greedy import greedy_actions

        def policy_fn(state, obs, key):
            return jax.vmap(lambda s: greedy_actions(cfg, s))(state)

    elif args.policy == "random":
        from .baselines.random import random_actions

        def policy_fn(state, obs, key):
            B = obs.shape[0]
            return random_actions(cfg, key, (B,)).astype("int32")

    else:
        import jax.numpy as jnp

        from .models import make_model

        model = make_model(cfg, arch=args.arch, hidden_dim=args.hidden_dim)
        params = load_checkpoint_params(cfg, model, args.checkpoint_dir)

        if args.sample:
            def policy_fn(state, obs, key):
                logits, _ = model.apply(params, obs)
                return jax.random.categorical(key, logits).astype(jnp.int32)
        else:
            def policy_fn(state, obs, key):
                logits, _ = model.apply(params, obs)
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    metrics = evaluate_policy(cfg, policy_fn, args.episodes, args.seed)
    for k, v in metrics.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
