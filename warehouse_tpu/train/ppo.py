"""On-device PPO actor-learner (SURVEY.md §3.4, §7 PR4).

Anakin-style architecture (cf. PAPERS.md "Large Batch Simulation for Deep
RL"): the same chips alternate acting — a ``lax.scan`` of (policy forward,
env step) over the unroll length — and learning — GAE + clipped-PPO
minibatch epochs — inside ONE jitted program. This collapses the
reference stack's RolloutWorker-actors/learner-driver split (SURVEY.md
§3.1) and removes every host↔device trajectory transfer.

Multi-device: the whole train step runs under ``shard_map`` over the
``data`` mesh axis — env batch sharded, params replicated, one grad
``pmean`` per update (SURVEY.md §2.4). One shared policy acts for all
agents (parameter sharing over the agent axis, SURVEY.md C12).
"""

from __future__ import annotations

from functools import partial
from types import MappingProxyType
from typing import Any, Callable, Mapping, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import PartitionSpec as P

from ..config import ADAM_B1, ADAM_B2, ADAM_EPS, EnvConfig, TrainConfig
from ..env import engine
from ..env.batch import (
    observe_batch,
    reset_truncated_batch,
    step_autoreset_batch,
)
from ..models import make_model
from ..ops.gae import gae
from ..ops.move import valid_action_mask
from ..ops.pathing import potential
from ..ops.ppo_update import (
    NEG_INF,
    adaptive_kl_coeff,
    entropy_coef_at,
    flat_minibatches,
    minibatch_epochs,
    ppo_losses,
    sample_action,
)
from ..parallel.mesh import DATA_AXIS


@struct.dataclass
class RunnerState:
    params: Any
    opt_state: Any
    env_state: Any          # EnvState with leading [B_local] (sharded)
    obs: jax.Array          # float32[B_local, A, obs_dim] (sharded)
    key: jax.Array          # uint32[n_shards, 2] (sharded: one key/shard)
    update_idx: jax.Array   # int32 (replicated)
    kl_coeff: jax.Array     # float32 (replicated; adaptive KL penalty)


class Transition(NamedTuple):
    obs: jax.Array
    action: jax.Array
    log_prob: jax.Array
    value: jax.Array
    reward: jax.Array      # shaped reward when shaping_coef > 0 (GAE input)
    done: jax.Array
    mask: jax.Array        # bool[..., 5] valid-action mask (all-True if off)
    boot_value: jax.Array  # V(final_obs): truncation bootstrap (0 if off)


def make_train(
    env_cfg: EnvConfig,
    tcfg: TrainConfig,
    arch: str = "mlp",
    mesh=None,
    policy_groups: tuple | None = None,
):
    """Build (init_fn, train_step_fn, model, tx).

    With ``mesh``: ``init(key)`` returns a sharded RunnerState and
    ``train_step`` is a jitted shard_map over the ``data`` axis.
    Without: single-device jit. ``num_envs`` is the GLOBAL batch.

    ``policy_groups``: optional tuple of length num_agents mapping each
    agent to a policy group 0..K-1 — trains K independent policies
    (RLlib policy_mapping_fn capability). Default: one shared policy.
    """
    env_cfg = env_cfg.replace(auto_reset=True)
    model_dtype = (
        jnp.bfloat16 if tcfg.model_dtype == "bfloat16" else jnp.float32
    )
    if policy_groups is not None:
        from ..models import make_multi_policy_model

        model = make_multi_policy_model(
            env_cfg, policy_groups, arch=arch,
            hidden_dim=tcfg.hidden_dim, num_layers=tcfg.num_layers,
            dtype=model_dtype,
        )
        groups_arr = jnp.array(policy_groups, jnp.int32)

        def apply_model(params, obs, gids):
            return model.apply(params, obs, gids)

    else:
        model = make_model(env_cfg, arch=arch, hidden_dim=tcfg.hidden_dim,
                           num_layers=tcfg.num_layers, dtype=model_dtype)
        groups_arr = jnp.zeros(env_cfg.num_agents, jnp.int32)

        def apply_model(params, obs, gids):
            return model.apply(params, obs)

    n_shards = 1 if mesh is None else mesh.shape[DATA_AXIS]
    if tcfg.num_envs % max(n_shards, 1):
        raise ValueError(
            f"num_envs={tcfg.num_envs} not divisible by {n_shards} shards"
        )
    b_local = tcfg.num_envs // n_shards
    batch_per_shard = tcfg.unroll_length * b_local * env_cfg.num_agents
    if batch_per_shard % tcfg.num_minibatches:
        raise ValueError("T*B_local*A must divide into num_minibatches")
    if tcfg.minibatch_mode not in ("flat", "env"):
        raise ValueError(
            f"minibatch_mode must be 'flat' or 'env', got "
            f"{tcfg.minibatch_mode!r}")
    if tcfg.epoch_shuffle not in ("each", "once"):
        raise ValueError(
            f"epoch_shuffle must be 'each' or 'once', got "
            f"{tcfg.epoch_shuffle!r}")
    if tcfg.minibatch_mode == "env" and b_local % tcfg.num_minibatches:
        raise ValueError(
            f"minibatch_mode='env' needs B_local={b_local} divisible by "
            f"num_minibatches={tcfg.num_minibatches}")
    mb_samples = batch_per_shard // tcfg.num_minibatches
    if tcfg.micro_batches < 1 or mb_samples % tcfg.micro_batches:
        raise ValueError(
            f"micro_batches={tcfg.micro_batches} must divide the "
            f"minibatch sample count {mb_samples}")

    # env/once minibatching is implemented as a pre-rollout env-STATE
    # permutation + contiguous minibatch ranges (see _train_step_local);
    # identical composition distribution to the post-rollout gather,
    # with the gather's read+write traffic gone entirely.
    use_state_shuffle = (
        tcfg.minibatch_mode == "env" and tcfg.epoch_shuffle == "once"
    )

    # "auto" backends: the fast fused path on real TPU hardware when
    # the config is inside the kernel envelopes, "xla" otherwise. An
    # EXPLICIT "pallas" request still fails loudly below. A fallback to
    # XLA on real TPU hardware is a WARNING (the user is leaving the
    # fast path on the hardware it exists for), and the resolved
    # backends ride home on ``PPOTrainer.backends`` so metrics.jsonl
    # and bench.py can record what actually ran (VERDICT r3 item 6).
    from .backends import log_auto_resolution

    # ONE envelope-problems function per backend, consumed by BOTH the
    # auto resolution (reasons) and the explicit-pallas gate (raise),
    # so the two paths cannot drift apart (round-4 code review).
    def _rollout_problems(check_lanes: bool):
        # The fused act-phase kernel's envelope (pallas/act.py).
        # global_obs and policy_groups are in-envelope since round 3;
        # model_dtype="bfloat16" is in-envelope (acting runs f32
        # in-kernel); arch="cnn" since round 4 (convs as unrolled
        # dense matmuls, extract_cnn_weights).
        problems = []
        if arch not in ("mlp", "cnn"):
            problems.append(
                f"arch={arch!r} (kernel implements MLP/CNN)")
        elif arch == "mlp":
            # Same VMEM-budget check as the cnn branch below: a large
            # pallas_block can push the double-buffered obs/talp output
            # blocks past the cap even with small MLP weights (measured:
            # block=2048 at config-4 shapes wants ~145MB; v5e VMEM is
            # 128MB) — fall back named rather than OOM in Mosaic.
            from ..pallas.act import ACT_VMEM_CAP, act_vmem_estimate

            H, L = tcfg.hidden_dim, tcfg.num_layers
            Dp = (env_cfg.obs_dim + 7) // 8 * 8
            wb = 4 * (Dp * H + H + (L - 1) * (H * H + H) + 8 * H + 8)
            wb *= (max(policy_groups) + 1) if policy_groups else 1
            est = act_vmem_estimate(
                env_cfg, tcfg.unroll_length, tcfg.pallas_block, wb)
            if est > ACT_VMEM_CAP:
                problems.append(
                    f"act-kernel VMEM estimate ~{est >> 20}MB (block="
                    f"{tcfg.pallas_block}) exceeds the "
                    f"{ACT_VMEM_CAP >> 20}MB cap")
        elif arch == "cnn":
            # The unrolled conv matrices must fit the kernel's VMEM
            # budget alongside the block buffers — global-obs CNN on a
            # large grid can exceed it (e.g. 15x15 global: the second
            # conv alone unrolls to ~104 MB); fall back named rather
            # than crash in Mosaic allocation. The threshold is the
            # SAME budget arithmetic the kernel hands Mosaic
            # (pallas/act.py act_vmem_estimate + ACT_VMEM_CAP), with
            # analytic weight bytes — conv unrolls dominate; the dense
            # heads are counted via a copies multiplier below.
            from ..pallas.act import ACT_VMEM_CAP, act_vmem_estimate

            side = (env_cfg.height if env_cfg.global_obs
                    else env_cfg.window_size)
            sub = (model.policies[0] if policy_groups is not None
                   else model)
            chans = (env_cfg.num_obs_channels, *sub.channels)
            wb = sum(4 * (side * side) ** 2 * chans[i] * chans[i + 1]
                     for i in range(len(chans) - 1))
            # Dense trunk + heads: side²·c_last → hidden → 6-row head.
            wb += 4 * (side * side * chans[-1] + 8) * tcfg.hidden_dim
            wb *= (max(policy_groups) + 1) if policy_groups else 1
            est = act_vmem_estimate(
                env_cfg, tcfg.unroll_length, tcfg.pallas_block, wb)
            if est > ACT_VMEM_CAP:
                problems.append(
                    f"cnn act-kernel VMEM estimate ~{est >> 20}MB "
                    f"(unrolled conv weights ~{wb >> 20}MB) exceeds "
                    f"the {ACT_VMEM_CAP >> 20}MB cap")
        if env_cfg.max_steps % tcfg.unroll_length:
            problems.append("max_steps % unroll_length != 0")
        if b_local % tcfg.pallas_block:
            problems.append(
                f"B_local={b_local} % pallas_block={tcfg.pallas_block}")
        elif check_lanes and not (tcfg.pallas_block % 128 == 0
                                  or tcfg.pallas_block == b_local):
            problems.append(f"pallas_block={tcfg.pallas_block} % 128")
        return problems

    def _grad_problems(check_lanes: bool):
        # The fused SGD-phase kernel's envelope (pallas/sgd.py; CNN
        # via pallas/sgd_cnn.py since round 5 — unrolled-dense convs
        # with grads folded onto the shared 3x3 kernels, measured
        # rationale in benchmarks/ab_cnn.py / docs/RESULTS.md r5).
        # Minibatch composition is randomized by permuting the ENV
        # STATE once per update, so the only supported cadence is the
        # default env/once one.
        from ..pallas.sgd import resolve_block_envs

        problems = []
        if arch not in ("mlp", "cnn"):
            problems.append(f"arch={arch!r} (kernel implements MLP/CNN)")
        elif arch == "cnn":
            if policy_groups is not None:
                problems.append(
                    "policy_groups with arch='cnn' (the fused CNN "
                    "learner is single-policy)")
            else:
                # The unrolled conv matrices + grad accumulators +
                # activation working set must fit VMEM even at the
                # smallest env block — same arithmetic the kernel's
                # block resolution uses (pallas/sgd_cnn.py).
                from ..pallas.sgd import _pick_k_ta
                from ..pallas.sgd_cnn import (
                    CNN_VMEM_BUDGET,
                    cnn_sgd_vmem_estimate,
                )

                chans = (env_cfg.num_obs_channels, *model.channels)
                ta = tcfg.unroll_length * env_cfg.num_agents
                k_ta = _pick_k_ta(ta, tcfg.sgd_rows_per_block, 1)
                est = cnn_sgd_vmem_estimate(
                    env_cfg, tcfg, chans, 128, k_ta)
                if est > CNN_VMEM_BUDGET:
                    problems.append(
                        f"cnn SGD-kernel VMEM estimate ~{est >> 20}MB"
                        " at the smallest env block exceeds the "
                        f"{CNN_VMEM_BUDGET >> 20}MB budget")
        if not use_state_shuffle:
            problems.append("epoch_shuffle != 'once' or "
                            "minibatch_mode != 'env'")
        if tcfg.micro_batches != 1:
            problems.append("micro_batches != 1 (the kernel's VMEM "
                            "block accumulation already is one)")
        if tcfg.flat_optimizer:
            problems.append("flat_optimizer")
        if b_local % tcfg.num_minibatches:
            problems.append(
                f"B_local={b_local} % num_minibatches")
        elif check_lanes:
            try:
                resolve_block_envs(
                    b_local // tcfg.num_minibatches, b_local,
                    tcfg.sgd_block_envs, False)
            except ValueError as e:
                problems.append(str(e))
        return problems

    rollout_backend = tcfg.rollout_backend
    grad_backend = tcfg.grad_backend
    if rollout_backend == "auto":
        reasons = _rollout_problems(check_lanes=True)
        if jax.default_backend() != "tpu":
            reasons.insert(0, "not on TPU hardware")
        rollout_backend = "xla" if reasons else "pallas"
        log_auto_resolution("rollout_backend", rollout_backend,
                            reasons, "ppo")
    if grad_backend == "auto":
        reasons = _grad_problems(check_lanes=True)
        if jax.default_backend() != "tpu":
            reasons.insert(0, "not on TPU hardware")
        grad_backend = "xla" if reasons else "pallas"
        log_auto_resolution("grad_backend", grad_backend, reasons, "ppo")

    use_pallas = rollout_backend == "pallas"
    if use_pallas:
        problems = _rollout_problems(
            check_lanes=not tcfg.pallas_interpret)
        if problems:
            raise ValueError(
                "rollout_backend='pallas' unsupported with: "
                + ", ".join(problems))

    use_grad_pallas = grad_backend == "pallas"
    if use_grad_pallas:
        problems = _grad_problems(
            check_lanes=not tcfg.pallas_interpret)
        if problems:
            raise ValueError(
                "grad_backend='pallas' unsupported with: "
                + ", ".join(problems))

    if tcfg.anneal_lr:
        total_steps = (
            tcfg.num_updates * tcfg.ppo_epochs * tcfg.num_minibatches
        )
        lr = optax.linear_schedule(tcfg.learning_rate, 0.0, total_steps)
    else:
        lr = tcfg.learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(tcfg.max_grad_norm),
        optax.adam(lr, b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS),
    )
    if tcfg.flat_optimizer:
        tx = optax.flatten(tx)

    # ---------------------------------------------------------------- init
    def init(key: jax.Array) -> RunnerState:
        pkey, ekey, skey = jax.random.split(key, 3)
        dummy = jnp.zeros((1, env_cfg.obs_dim), jnp.float32)
        if policy_groups is not None:
            params = model.init(pkey, dummy, jnp.zeros(1, jnp.int32))
        else:
            params = model.init(pkey, dummy)
        opt_state = tx.init(params)
        env_keys = jax.vmap(
            lambda i: jax.random.fold_in(ekey, i)
        )(jnp.arange(tcfg.num_envs))
        env_state, obs = jax.vmap(lambda k: engine.reset(env_cfg, k))(env_keys)
        shard_keys = jax.vmap(
            lambda i: jax.random.fold_in(skey, i)
        )(jnp.arange(max(n_shards, 1)))
        return RunnerState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            obs=obs,
            key=shard_keys,
            update_idx=jnp.int32(0),
            kl_coeff=jnp.float32(tcfg.kl_coeff),
        )

    # -------------------------------------------------------- one update
    def _train_step_local(rs: RunnerState):
        """One PPO update on this shard's slice; pmean over `data` if meshed."""
        params = rs.params
        key = rs.key.reshape(2)  # this shard's key (uint32[1, 2] block)

        env_state_in, obs_in = rs.env_state, rs.obs
        if use_state_shuffle:
            # "Shuffle the envs, not the data": permute the env axis of
            # the STATE once per update, then take minibatches as
            # CONTIGUOUS env ranges — random env sets with the same
            # composition distribution as the env-mode permutation
            # gather (env slots are exchangeable; each env's trajectory
            # rides its own state key), at ~1000x less gathered bytes.
            # This is how minibatch_mode="env" + epoch_shuffle="once"
            # is implemented for this trainer on BOTH SGD backends, and
            # what lets the fused SGD kernel (pallas/sgd.py) consume
            # the act kernel's obs trajectory with zero data movement.
            # fold_in (not split): the main draw stream is unadvanced,
            # so rollout draws stay backend-comparable.
            pkey = jax.random.fold_in(key, 0x5EED)
            perm = jax.random.permutation(pkey, b_local)
            env_state_in = jax.tree.map(lambda x: x[perm], env_state_in)
            obs_in = obs_in[perm]

        # Per-sample policy-group ids, broadcast over the env batch.
        gids_ba = jnp.broadcast_to(
            groups_arr[None, :], (b_local, env_cfg.num_agents)
        )

        if use_pallas:
            # Fused act-phase kernel: the whole T-step rollout (obs
            # build, MXU MLP forward, gumbel sampling, env tick) is one
            # Mosaic kernel with state resident in VMEM; the episode
            # boundary auto-reset runs outside, draw-for-draw identical
            # to step_autoreset_batch (env/batch.py).
            from ..pallas.act import ppo_rollout_pallas

            cfg_noar = env_cfg.replace(auto_reset=False)
            new_env_state, roll, reset_key_last, key = ppo_rollout_pallas(
                cfg_noar, params, env_state_in, tcfg.unroll_length, key,
                tcfg.pallas_block, tcfg.pallas_interpret,
                tcfg.mask_actions, tcfg.shaping_coef, tcfg.gamma,
                policy_groups, arch)
            env_state, last_obs, _ = reset_truncated_batch(
                cfg_noar, new_env_state, reset_key_last)
            done = jnp.broadcast_to(
                roll.truncated[:, :, None], roll.reward.shape)
            mask = roll.mask
            if tcfg.bootstrap_truncated:
                # V of the TRUE (pre-reset) boundary state; done is only
                # ever True on the chunk's last step (make_train gates
                # max_steps % unroll == 0), so one row suffices.
                _, boot_last = apply_model(
                    params, observe_batch(cfg_noar, new_env_state),
                    gids_ba)
                boot_value = (
                    jnp.zeros_like(roll.value).at[-1].set(boot_last))
            else:
                boot_value = jnp.zeros_like(roll.value)
            traj = Transition(roll.obs, roll.action, roll.log_prob,
                              roll.value, roll.reward, done, mask,
                              boot_value)
            delivered = roll.delivered
            raw_rew = roll.raw_reward.mean(axis=(1, 2))
            return _learn(rs, params, key, env_state, last_obs, traj,
                          delivered, raw_rew, obs_bm=roll.obs_bm)

        def env_step(carry, _):
            env_state, obs, key = carry
            key, akey = jax.random.split(key)
            logits, value = apply_model(params, obs, gids_ba)
            if tcfg.mask_actions:
                mask = jax.vmap(
                    lambda p: valid_action_mask(env_cfg, p)
                )(env_state.agent_pos)                        # [B, A, 5]
                logits = jnp.where(mask, logits, NEG_INF)
            else:
                mask = jnp.ones(logits.shape, bool)
            action, log_prob = sample_action(akey, logits)  # [B, A]
            if tcfg.shaping_coef > 0.0:
                phi = jax.vmap(lambda s: potential(env_cfg, s))(env_state)
            env_state, ts = step_autoreset_batch(
                env_cfg, env_state, action.astype(jnp.int32)
            )
            done = jnp.broadcast_to(
                ts.truncated[:, None], ts.reward.shape
            )  # [B, A]
            reward = ts.reward
            if tcfg.shaping_coef > 0.0:
                # γ·φ(s')·(1−done) − φ(s): on auto-reset ticks the next
                # state belongs to a fresh episode, so its potential is
                # cut (standard terminal handling).
                phi_next = jax.vmap(
                    lambda s: potential(env_cfg, s)
                )(env_state)
                reward = reward + tcfg.shaping_coef * (
                    tcfg.gamma * phi_next * (1.0 - done) - phi
                )
            if tcfg.bootstrap_truncated:
                # V of the TRUE successor (pre-auto-reset) state, used by
                # GAE as the next-state value at truncation boundaries.
                _, boot_value = apply_model(params, ts.final_obs, gids_ba)
            else:
                boot_value = jnp.zeros_like(value)
            tr = Transition(obs, action, log_prob, value, reward, done,
                            mask, boot_value)
            return (env_state, ts.obs, key), (tr, ts.delivered,
                                              ts.reward.mean())

        (env_state, last_obs, key), (traj, delivered, raw_rew) = jax.lax.scan(
            env_step, (env_state_in, obs_in, key), None,
            length=tcfg.unroll_length,
        )
        return _learn(rs, params, key, env_state, last_obs, traj,
                      delivered, raw_rew)

    # ---------------------------------------------- learn phase (shared)
    def _learn(rs, params, key, env_state, last_obs, traj, delivered,
               raw_rew, obs_bm=None):
        gids_ba = jnp.broadcast_to(
            groups_arr[None, :], (b_local, env_cfg.num_agents)
        )
        _, last_value = apply_model(params, last_obs, gids_ba)
        advantages, targets = gae(
            traj.reward, traj.value, traj.done, last_value,
            tcfg.gamma, tcfg.gae_lambda,
            bootstrap_values=(
                traj.boot_value if tcfg.bootstrap_truncated else None
            ),
        )

        if use_grad_pallas:
            ent_coef = entropy_coef_at(tcfg, rs.update_idx)
            params, opt_state, losses = _sgd_phase_pallas(
                rs, params, traj, advantages, targets, obs_bm, ent_coef)
            # Mirror the one key split minibatch_epochs consumes on the
            # XLA path (its unused contiguous-partition pkey) so the
            # two SGD backends stay on identical draw streams — the
            # backend-equivalence tests rely on it.
            key, _ = jax.random.split(key)
            return _finish(rs, params, opt_state, key, env_state,
                           last_obs, losses, delivered, raw_rew)

        gids_tba = jnp.broadcast_to(
            gids_ba[None], (tcfg.unroll_length, *gids_ba.shape)
        )
        fields = (
            traj.obs, traj.action, traj.log_prob, traj.value,
            advantages, targets, gids_tba, traj.mask,
        )
        if tcfg.minibatch_mode == "env":
            # Env-major layout [B, T·A, ...]: the epoch shuffle becomes a
            # B-row gather (row-count-bound on TPU — ~64x fewer rows than
            # the flat T·B·A gather; see TrainConfig.minibatch_mode).
            ta = tcfg.unroll_length * env_cfg.num_agents
            mb_envs = b_local // tcfg.num_minibatches

            def envmajor(x):
                x = jnp.moveaxis(x, 1, 0)  # [B, T, A, ...]
                return x.reshape(b_local, ta, *x.shape[3:])

            batch = tuple(envmajor(x) for x in fields)

            if use_state_shuffle:
                # Composition was already randomized by the env-STATE
                # permutation before the rollout: minibatches are plain
                # contiguous env ranges — no gather at all. (The pkey
                # minibatch_epochs hands us is unused by construction.)
                def make_minibatches(k):
                    return jax.tree.map(
                        lambda x: x.reshape(
                            tcfg.num_minibatches, mb_envs * ta,
                            *x.shape[2:]
                        ),
                        batch,
                    )

            else:
                def make_minibatches(k):
                    perm = jax.random.permutation(k, b_local)
                    return jax.tree.map(
                        lambda x: x[perm].reshape(
                            tcfg.num_minibatches, mb_envs * ta,
                            *x.shape[2:]
                        ),
                        batch,
                    )

        else:
            # Flatten [T, B, A] → [N]; epochs re-permute all samples.
            def flat(x):
                return x.reshape(batch_per_shard, *x.shape[3:])

            batch = tuple(flat(x) for x in fields)

            def make_minibatches(k):
                return flat_minibatches(k, batch, tcfg.num_minibatches)

        ent_coef = entropy_coef_at(tcfg, rs.update_idx)

        if tcfg.micro_batches > 1:
            # Hoist advantage normalization to per-minibatch so micro
            # grads average to exactly the minibatch grad (see
            # TrainConfig.micro_batches / minibatch_epochs).
            inner_minibatches = make_minibatches

            def make_minibatches(k):  # noqa: F811
                mbs = inner_minibatches(k)
                adv = mbs[4]
                ax = tuple(range(1, adv.ndim))
                mean = adv.mean(axis=ax, keepdims=True)
                std = adv.std(axis=ax, keepdims=True)
                return (*mbs[:4], (adv - mean) / (std + 1e-8), *mbs[5:])

        def loss_fn(params, mb):
            obs, action, old_lp, old_v, adv, tgt, gids, mask = mb
            logits, value = apply_model(params, obs, gids)
            if tcfg.mask_actions:
                logits = jnp.where(mask, logits, NEG_INF)
            return ppo_losses(
                logits, value, action, old_lp, old_v, adv, tgt,
                clip_eps=tcfg.clip_eps, value_coef=tcfg.value_coef,
                ent_coef=ent_coef, kl_coeff=rs.kl_coeff,
                normalize_adv=(tcfg.micro_batches == 1),
            )

        params, opt_state, key, losses = minibatch_epochs(
            params, rs.opt_state, key,
            loss_fn=loss_fn,
            make_minibatches=make_minibatches,
            num_epochs=tcfg.ppo_epochs,
            tx=tx,
            pmean_axis=DATA_AXIS if mesh is not None else None,
            micro_batches=tcfg.micro_batches,
            reshuffle_each_epoch=(tcfg.epoch_shuffle == "each"),
        )
        return _finish(rs, params, opt_state, key, env_state, last_obs,
                       losses, delivered, raw_rew)

    # -------------------------------- fused Pallas SGD phase (sgd.py)
    def _sgd_phase_pallas(rs, params, traj, advantages, targets,
                          obs_bm, ent_coef):
        """The whole epoch/minibatch SGD phase via pallas/sgd.py.

        Minibatch m = env columns [m*mbB, (m+1)*mbB) — composition was
        randomized by the env-STATE permutation before the rollout.
        Single shard: ONE kernel call (params + Adam moments resident
        in VMEM across all steps). Meshed: the same kernel body emits
        per-minibatch grads, pmean'd before an XLA optimizer step.
        """
        import optax as _optax

        from ..pallas.sgd import (
            FIELD_ROWS,
            find_adam_state,
            normalize_adv_env_minibatch,
            pack_fields,
            pack_obs_bm,
            ppo_minibatch_grads_pallas,
            ppo_sgd_phase_pallas,
        )

        D = env_cfg.obs_dim
        M = tcfg.num_minibatches

        # Advantages normalized per contiguous-env minibatch (the
        # ppo_losses(normalize_adv=False) convention).
        adv_n = normalize_adv_env_minibatch(advantages, M)

        if obs_bm is None:
            # XLA-rollout fallback: ONE layout pass per update into the
            # kernel's native [T*A*Dp, B] batch-minor form.
            obs_bm = pack_obs_bm(traj.obs, D)

        fields = pack_fields(traj.action, traj.log_prob, traj.value,
                             adv_n, targets, traj.mask,
                             env_cfg.num_actions)

        # The fused head matrix has 8 rows (5 logits + value + pad) and
        # the fields array 16 rows (5 fixed + num_actions mask rows) —
        # assert the bounds rather than fail as an opaque reshape error
        # if the action space ever grows past the layout.
        assert env_cfg.num_actions + 1 <= 8, (
            f"fused SGD kernel head layout supports <= 7 actions, got "
            f"{env_cfg.num_actions}")
        assert 5 + env_cfg.num_actions <= FIELD_ROWS

        n_steps = tcfg.ppo_epochs * M
        kw = dict(
            num_minibatches=M, clip_eps=tcfg.clip_eps,
            value_coef=tcfg.value_coef,
            mask_actions=tcfg.mask_actions, obs_dim=D,
            block_envs=tcfg.sgd_block_envs,
            rows_per_block=tcfg.sgd_rows_per_block,
            matmul_dtype=tcfg.model_dtype,
            interpret=tcfg.pallas_interpret,
        )
        if arch == "cnn":
            # CNN torso: the unrolled-dense conv kernel
            # (pallas/sgd_cnn.py) — single policy, same contract.
            from ..pallas.sgd_cnn import (
                ppo_cnn_minibatch_grads_pallas,
                ppo_cnn_sgd_phase_pallas,
            )

            phase_fn = partial(ppo_cnn_sgd_phase_pallas,
                               env_cfg=env_cfg, tcfg=tcfg)
            grads_fn = partial(ppo_cnn_minibatch_grads_pallas,
                               env_cfg=env_cfg, tcfg=tcfg)
        else:
            kw["policy_groups"] = policy_groups
            phase_fn = ppo_sgd_phase_pallas
            grads_fn = ppo_minibatch_grads_pallas
        if mesh is None:
            count0, _, _ = find_adam_state(rs.opt_state)
            steps = count0 + jnp.arange(n_steps)
            if callable(lr):
                lr_row = jax.vmap(lr)(steps).astype(jnp.float32)
            else:
                lr_row = jnp.full((n_steps,), lr, jnp.float32)
            cnt = (steps + 1).astype(jnp.float32)
            bc1_row = 1.0 - ADAM_B1 ** cnt
            bc2_row = 1.0 - ADAM_B2 ** cnt
            return phase_fn(
                params, rs.opt_state, obs_bm, fields,
                lr_row, bc1_row, bc2_row, ent_coef, rs.kl_coeff,
                num_epochs=tcfg.ppo_epochs,
                max_grad_norm=tcfg.max_grad_norm,
                b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS, **kw)

        # Meshed: unrolled per-minibatch grads + pmean + XLA optimizer.
        opt_state = rs.opt_state
        rows = []
        for s in range(n_steps):
            (loss, aux), grads = grads_fn(
                params, obs_bm, fields, s % M, ent_coef, rs.kl_coeff,
                **kw)
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
            aux = jax.lax.pmean(aux, DATA_AXIS)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = _optax.apply_updates(params, updates)
            rows.append((loss, *aux))
        losses = tuple(
            jnp.stack([r[i] for r in rows]).reshape(tcfg.ppo_epochs, M)
            for i in range(5))
        return params, opt_state, losses

    # ------------------------------------- metrics + new state (shared)
    def _finish(rs, params, opt_state, key, env_state, last_obs,
                losses, delivered, raw_rew):
        mean_kl = losses[4].mean()
        if mesh is not None:
            mean_kl = jax.lax.pmean(mean_kl, DATA_AXIS)
        kl_coeff = adaptive_kl_coeff(tcfg, rs.kl_coeff, mean_kl)

        mean_reward = raw_rew.mean()  # raw env reward (pre-shaping)
        deliveries = delivered.sum(dtype=jnp.float32) / (
            tcfg.unroll_length * b_local
        )
        if mesh is not None:
            mean_reward = jax.lax.pmean(mean_reward, DATA_AXIS)
            deliveries = jax.lax.pmean(deliveries, DATA_AXIS)
        metrics = {
            "loss": losses[0].mean(),
            "pg_loss": losses[1].mean(),
            "v_loss": losses[2].mean(),
            "entropy": losses[3].mean(),
            "kl": mean_kl,
            "kl_coeff": kl_coeff,
            "reward_per_step": mean_reward,
            "deliveries_per_env_step": deliveries,
        }
        new_rs = RunnerState(
            params=params,
            opt_state=opt_state,
            env_state=env_state,
            obs=last_obs,
            key=key.reshape(1, 2),
            update_idx=rs.update_idx + 1,
            kl_coeff=kl_coeff,
        )
        return new_rs, metrics

    # -------------------------------------------------- jit / shard_map
    init_global = init
    if mesh is None:
        train_step = jax.jit(_train_step_local)
    else:
        state_spec = RunnerState(
            params=P(),
            opt_state=P(),
            env_state=P(DATA_AXIS),
            obs=P(DATA_AXIS),
            key=P(DATA_AXIS),
            update_idx=P(),
            kl_coeff=P(),
        )
        metric_spec = {
            "loss": P(), "pg_loss": P(), "v_loss": P(), "entropy": P(),
            "kl": P(), "kl_coeff": P(),
            "reward_per_step": P(), "deliveries_per_env_step": P(),
        }
        train_step = jax.jit(
            jax.shard_map(
                _train_step_local,
                mesh=mesh,
                in_specs=(state_spec,),
                out_specs=(state_spec, metric_spec),
                check_vma=False,
            )
        )
        # Multi-process-safe init: computed under jit with global output
        # shardings, so every host materializes only its addressable
        # shards (host device_put of a global array would fail).
        from jax.sharding import NamedSharding

        out_shardings = jax.tree.map(
            lambda spec: NamedSharding(mesh, spec),
            state_spec,
            is_leaf=lambda x: isinstance(x, P),
        )
        init_global = jax.jit(init, out_shardings=out_shardings)

    def shard_runner_state(rs: RunnerState) -> RunnerState:
        """Place an (unsharded) RunnerState onto the mesh."""
        if mesh is None:
            return rs
        from jax.sharding import NamedSharding

        def put(x, spec):
            return jax.device_put(x, NamedSharding(mesh, spec))

        return RunnerState(
            params=put(rs.params, P()),
            opt_state=put(rs.opt_state, P()),
            env_state=jax.tree.map(
                lambda x: put(x, P(DATA_AXIS)), rs.env_state
            ),
            obs=put(rs.obs, P(DATA_AXIS)),
            key=put(rs.key, P(DATA_AXIS)),
            update_idx=put(rs.update_idx, P()),
            kl_coeff=put(rs.kl_coeff, P()),
        )

    @partial(jax.jit, static_argnums=1)
    def train_many(rs: RunnerState, n: int):
        """Run n updates in one compiled scan; metrics stacked [n]."""
        return jax.lax.scan(lambda r, _: train_step(r), rs, None, length=n)

    return PPOTrainer(
        init=init,
        init_global=init_global,
        train_step=train_step,
        train_many=train_many,
        shard_runner_state=shard_runner_state,
        model=model,
        tx=tx,
        env_cfg=env_cfg,
        tcfg=tcfg,
        mesh=mesh,
        backends={"rollout": rollout_backend, "grad": grad_backend},
    )


class PPOTrainer(NamedTuple):
    init: Callable
    init_global: Callable   # jit-sharded init (multi-process safe)
    train_step: Callable
    train_many: Callable
    shard_runner_state: Callable
    model: Any
    tx: Any
    env_cfg: EnvConfig
    tcfg: TrainConfig
    mesh: Any
    # RESOLVED {"rollout": ..., "grad": ...}; immutable default so no
    # dict is shared across instances (ADVICE r4).
    backends: Mapping = MappingProxyType({})
