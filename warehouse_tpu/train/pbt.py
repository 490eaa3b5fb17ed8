"""Population Based Training — Ray Tune PBT scheduler parity, TPU-native.

Tune's PBT (Jaderberg et al. 2017) runs each population member as a
separate actor process, pausing trials to checkpoint/restore weights on
exploit and editing their config on explore. The TPU-native design
removes every process/checkpoint boundary:

- **The population is a vmap axis.** All members train in ONE compiled
  program; member policies/optimizers batch into single large matmuls
  (same Podracer pattern as train/sweep.py's seed axis).
- **Mutable hyperparameters are runtime arrays, not compile-time
  constants.** The member's learning rate rides inside the optimizer
  state via ``optax.inject_hyperparams`` and the entropy coefficient is
  an input to the loss, so exploit/explore edits are pure array updates
  — zero recompiles across the whole PBT run (Tune pays a restart;
  sweep.py's grid pays a retrace per point).
- **Exploit = gather.** Bottom-quantile members copy the full
  (params, opt_state) pytree from a sampled top-quantile member with a
  single ``jnp.take`` along the population axis; explore then perturbs
  their hyperparameters (×1.2 / ÷1.2, or resample with prob 0.25 —
  Tune's default rule).

Supports the shared-policy feed-forward PPO path (the flagship config);
masking/shaping/policy-groups knobs stay with train/ppo.py.
"""

from __future__ import annotations

import json
from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import EnvConfig, TrainConfig
from ..env import engine
from ..models import make_model
from ..ops.gae import gae


@struct.dataclass
class MemberState:
    """One population member's training state (vmapped to [P, ...])."""
    params: Any
    opt_state: Any
    env_state: Any
    obs: jax.Array
    key: jax.Array          # uint32[2]
    entropy_coef: jax.Array  # float32 — runtime-mutable (PBT explore)


class PBTResult(NamedTuple):
    rows: list
    best: dict
    member: MemberState     # final population (vmapped)


_MUTABLE = ("learning_rate", "entropy_coef")


def _sample_hp(space: dict[str, Any], rng: np.random.Generator) -> float:
    if isinstance(space, (list, tuple)):
        return float(space[int(rng.integers(len(space)))])
    if "uniform" in space:
        lo, hi = space["uniform"]
        return float(rng.uniform(lo, hi))
    if "loguniform" in space:
        lo, hi = space["loguniform"]
        return float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
    raise ValueError(f"bad hyperparam space: {space!r}")


def make_pbt_trainer(env_cfg: EnvConfig, tcfg: TrainConfig,
                     arch: str = "mlp"):
    """Build (init_members, train_chunk) with runtime lr/entropy_coef.

    ``init_members(key, lrs, ents) -> MemberState`` (leading [P] axis);
    ``train_chunk(member, n) -> (member, metrics[P, n])`` — n updates
    for every member in one jitted vmap.
    """
    env_cfg = env_cfg.replace(auto_reset=True)
    model = make_model(env_cfg, arch=arch, hidden_dim=tcfg.hidden_dim,
                       num_layers=tcfg.num_layers)
    if tcfg.num_envs % 1:
        raise ValueError
    b_local = tcfg.num_envs
    batch = tcfg.unroll_length * b_local * env_cfg.num_agents
    if batch % tcfg.num_minibatches:
        raise ValueError("T*B*A must divide into num_minibatches")

    # inject_hyperparams makes learning_rate a leaf of opt_state →
    # vmappable per member and mutable between chunks without retrace.
    tx = optax.chain(
        optax.clip_by_global_norm(tcfg.max_grad_norm),
        optax.inject_hyperparams(optax.adam)(
            learning_rate=tcfg.learning_rate, eps=1e-5),
    )

    def init_one(key: jax.Array, lr: jax.Array,
                 ent: jax.Array) -> MemberState:
        pkey, ekey, skey = jax.random.split(key, 3)
        params = model.init(pkey, jnp.zeros((1, env_cfg.obs_dim),
                                            jnp.float32))
        opt_state = tx.init(params)
        opt_state = set_lr(opt_state, lr)
        env_keys = jax.vmap(
            lambda i: jax.random.fold_in(ekey, i)
        )(jnp.arange(b_local))
        env_state, obs = jax.vmap(
            lambda k: engine.reset(env_cfg, k)
        )(env_keys)
        return MemberState(params, opt_state, env_state, obs, skey,
                           jnp.float32(ent))

    def set_lr(opt_state, lr):
        return _set_lr_impl(opt_state, lr)

    def _set_lr_impl(opt_state, lr):
        # optax.chain state: tuple(clip_state, inject_state); the inject
        # state carries .hyperparams["learning_rate"].
        clip_state, inj = opt_state
        hp = dict(inj.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return (clip_state, inj._replace(hyperparams=hp))

    def _update_one(member: MemberState):
        params = member.params
        key = member.key

        def env_step(carry, _):
            env_state, obs, key = carry
            key, akey = jax.random.split(key)
            logits, value = model.apply(params, obs)
            action = jax.random.categorical(akey, logits)
            log_prob = jnp.take_along_axis(
                jax.nn.log_softmax(logits), action[..., None], axis=-1
            ).squeeze(-1)
            env_state, ts = jax.vmap(
                lambda s, a: engine.step(env_cfg, s, a)
            )(env_state, action.astype(jnp.int32))
            done = jnp.broadcast_to(ts.truncated[:, None], ts.reward.shape)
            return (env_state, ts.obs, key), (
                (obs, action, log_prob, value, ts.reward, done),
                ts.delivered)

        (env_state, last_obs, key), (traj, delivered) = jax.lax.scan(
            env_step, (member.env_state, member.obs, key), None,
            length=tcfg.unroll_length)
        obs_t, action_t, lp_t, val_t, rew_t, done_t = traj
        _, last_value = model.apply(params, last_obs)
        advantages, targets = gae(rew_t, val_t, done_t, last_value,
                                  tcfg.gamma, tcfg.gae_lambda)

        def flat(x):
            return x.reshape(batch, *x.shape[3:])

        data = (flat(obs_t), flat(action_t), flat(lp_t), flat(val_t),
                flat(advantages), flat(targets))

        def loss_fn(params, mb, ent_coef):
            obs, action, old_lp, old_v, adv, tgt = mb
            logits, value = model.apply(params, obs)
            lp = jnp.take_along_axis(
                jax.nn.log_softmax(logits), action[..., None], axis=-1
            ).squeeze(-1)
            ratio = jnp.exp(lp - old_lp)
            adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
            pg1 = ratio * adv_n
            pg2 = jnp.clip(ratio, 1 - tcfg.clip_eps,
                           1 + tcfg.clip_eps) * adv_n
            pg_loss = -jnp.minimum(pg1, pg2).mean()
            v_clip = old_v + jnp.clip(value - old_v, -tcfg.clip_eps,
                                      tcfg.clip_eps)
            v_loss = 0.5 * jnp.maximum((value - tgt) ** 2,
                                       (v_clip - tgt) ** 2).mean()
            probs = jax.nn.softmax(logits)
            entropy = -(probs * jnp.log(probs + 1e-10)).sum(-1).mean()
            return (pg_loss + tcfg.value_coef * v_loss
                    - ent_coef * entropy), entropy

        def epoch(carry, _):
            params, opt_state, key = carry
            key, pkey = jax.random.split(key)
            perm = jax.random.permutation(pkey, batch)
            mb_size = batch // tcfg.num_minibatches
            mbs = jax.tree.map(
                lambda x: x[perm].reshape(tcfg.num_minibatches, mb_size,
                                          *x.shape[1:]),
                data)

            def mb_update(carry, mb):
                params, opt_state = carry
                (loss, ent), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, mb, member.entropy_coef)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, ent)

            (params, opt_state), aux = jax.lax.scan(
                mb_update, (params, opt_state), mbs)
            return (params, opt_state, key), aux

        (params, opt_state, key), (losses, ents) = jax.lax.scan(
            epoch, (params, member.opt_state, key), None,
            length=tcfg.ppo_epochs)
        metrics = {
            "loss": losses.mean(),
            "entropy": ents.mean(),
            "deliveries_per_env_step": delivered.sum(
                dtype=jnp.float32) / (tcfg.unroll_length * b_local),
            "reward_per_step": rew_t.mean(),
        }
        return MemberState(params, opt_state, env_state, last_obs, key,
                           member.entropy_coef), metrics

    def init_members(key: jax.Array, lrs: np.ndarray,
                     ents: np.ndarray) -> MemberState:
        P = len(lrs)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(P))
        return jax.jit(jax.vmap(init_one))(
            keys, jnp.asarray(lrs, jnp.float32),
            jnp.asarray(ents, jnp.float32))

    def _chunk(member: MemberState, n: int):
        def one(m):
            return jax.lax.scan(lambda mm, _: _update_one(mm), m, None,
                                length=n)
        return jax.vmap(one)(member)

    train_chunk = jax.jit(_chunk, static_argnums=1)

    def get_lr(member: MemberState) -> np.ndarray:
        return np.asarray(
            member.opt_state[1].hyperparams["learning_rate"])

    def with_hp(member: MemberState, lrs: np.ndarray,
                ents: np.ndarray) -> MemberState:
        opt_state = _set_lr_impl(
            member.opt_state, jnp.asarray(lrs, jnp.float32))
        return member.replace(opt_state=opt_state,
                              entropy_coef=jnp.asarray(ents, jnp.float32))

    return init_members, train_chunk, get_lr, with_hp


def run_pbt(
    env_cfg: EnvConfig,
    base_tcfg: TrainConfig,
    hyper_space: dict[str, Any],
    population_size: int = 8,
    perturb_interval: int = 10,
    num_intervals: int = 5,
    quantile: float = 0.25,
    resample_prob: float = 0.25,
    arch: str = "mlp",
    select_metric: str = "deliveries_per_env_step",
    mode: str = "max",
    seed: int = 0,
    out_path: str | None = None,
) -> PBTResult:
    """Run PBT; returns (rows, best, final population).

    ``hyper_space`` maps a subset of {"learning_rate", "entropy_coef"}
    to a sample spec (list = choice, {"uniform"|"loguniform": [lo,hi]}).
    Score per interval = mean of ``select_metric`` over the interval's
    updates (seed axis not used here — the population IS the spread).
    """
    for k in hyper_space:
        if k not in _MUTABLE:
            raise ValueError(
                f"PBT mutates {_MUTABLE}; got {k!r} (fixed fields are "
                "compile-time constants — sweep them with train/sweep.py)")
    if mode not in ("max", "min"):
        raise ValueError("mode must be 'max' or 'min'")
    sign = 1.0 if mode == "max" else -1.0
    rng = np.random.default_rng(seed)
    P = population_size

    lrs = np.array([
        _sample_hp(hyper_space["learning_rate"], rng)
        if "learning_rate" in hyper_space else base_tcfg.learning_rate
        for _ in range(P)])
    ents = np.array([
        _sample_hp(hyper_space["entropy_coef"], rng)
        if "entropy_coef" in hyper_space else base_tcfg.entropy_coef
        for _ in range(P)])

    tcfg = base_tcfg.replace(anneal_lr=False)
    init_members, train_chunk, get_lr, with_hp = make_pbt_trainer(
        env_cfg, tcfg, arch=arch)
    member = init_members(jax.random.PRNGKey(seed), lrs, ents)

    rows: list[dict[str, Any]] = []
    scores = np.zeros(P)
    for interval in range(num_intervals):
        member, metrics = train_chunk(member, perturb_interval)
        curve = np.asarray(metrics[select_metric])       # [P, n]
        scores = curve.mean(axis=1)
        lrs = get_lr(member)
        ents = np.asarray(member.entropy_coef)
        for p in range(P):
            rows.append({
                "member": p, "interval": interval,
                "updates_so_far": (interval + 1) * perturb_interval,
                "score": float(scores[p]),
                "learning_rate": float(lrs[p]),
                "entropy_coef": float(ents[p]),
            })
        if interval == num_intervals - 1:
            break
        # ---- exploit/explore (Tune's default PBT rule) --------------
        ranked = np.argsort(sign * scores)[::-1]         # best first
        n_q = max(1, int(np.ceil(P * quantile)))
        top, bottom = ranked[:n_q], ranked[P - n_q:]
        src = np.arange(P)
        src[bottom] = rng.choice(top, size=len(bottom))
        # Gather the full training state along the population axis.
        src_dev = jnp.asarray(src)
        member = jax.tree.map(lambda x: jnp.take(x, src_dev, axis=0),
                              member)
        new_lrs, new_ents = lrs[src].copy(), ents[src].copy()
        for i in bottom:
            for name, arr in (("learning_rate", new_lrs),
                              ("entropy_coef", new_ents)):
                if name not in hyper_space:
                    continue
                if rng.random() < resample_prob:
                    arr[i] = _sample_hp(hyper_space[name], rng)
                else:
                    arr[i] *= 1.2 if rng.random() < 0.5 else 1 / 1.2
        member = with_hp(member, new_lrs, new_ents)

    best_i = int(np.argmax(sign * scores))
    best = {
        "summary": True, "scheduler": "pbt", "select_metric": select_metric,
        "mode": mode, "population_size": P,
        "perturb_interval": perturb_interval,
        "num_intervals": num_intervals,
        "best_member": best_i, "best_score": float(scores[best_i]),
        "best_hyperparams": {"learning_rate": float(get_lr(member)[best_i]),
                             "entropy_coef": float(
                                 np.asarray(member.entropy_coef)[best_i])},
    }
    rows.append(best)
    if out_path:
        with open(out_path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return PBTResult(rows, best, member)
