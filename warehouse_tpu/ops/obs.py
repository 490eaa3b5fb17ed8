"""Observation construction fused into the step (docs/SEMANTICS.md §10).

Egocentric windows are ``lax.dynamic_slice`` views on zero-padded global
channel grids (built once per step with scatters), ``vmap``-ed over agents
— the TPU-native fusion of the reference's per-agent obs loops
(BASELINE.json:5 "observation construction (egocentric/global grid views)
fused into the step"). Oracle twin: ``OracleEnv._observe``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import EnvConfig

PENDING = 1


def _targets(cfg, agent_pos, agent_req, carrying, req_pickup, req_drop):
    """(has_task bool[A], target int32[A, 2]) per docs/SEMANTICS.md §10."""
    has_task = agent_req >= 0
    safe = jnp.clip(agent_req, 0, cfg.queue_capacity - 1)
    tgt = jnp.where(carrying[:, None], req_drop[safe], req_pickup[safe])
    tgt = jnp.where(has_task[:, None], tgt, agent_pos)
    return has_task, tgt


def observe(
    cfg: EnvConfig,
    agent_pos: jnp.ndarray,
    agent_req: jnp.ndarray,
    carrying: jnp.ndarray,
    req_pickup: jnp.ndarray,
    req_drop: jnp.ndarray,
    req_status: jnp.ndarray,
) -> jnp.ndarray:
    """Per-agent flat observations, float32[A, obs_dim]."""
    H, W, A = cfg.height, cfg.width, cfg.num_agents
    has_task, tgt = _targets(
        cfg, agent_pos, agent_req, carrying, req_pickup, req_drop
    )

    agents_grid = (
        jnp.zeros((H, W), jnp.float32)
        .at[agent_pos[:, 0], agent_pos[:, 1]]
        .max(1.0)
    )
    pending_grid = (
        jnp.zeros((H, W), jnp.float32)
        .at[req_pickup[:, 0], req_pickup[:, 1]]
        .max((req_status == PENDING).astype(jnp.float32))
    )

    # Self features [row/H, col/W, carrying, has_task, drow/H, dcol/W].
    delta = jnp.where(has_task[:, None], tgt - agent_pos, 0)
    feats = jnp.stack(
        [
            agent_pos[:, 0] / H,
            agent_pos[:, 1] / W,
            carrying.astype(jnp.float32),
            has_task.astype(jnp.float32),
            delta[:, 0] / H,
            delta[:, 1] / W,
        ],
        axis=-1,
    ).astype(jnp.float32)

    if cfg.global_obs:
        rows = jnp.arange(H)[:, None]
        cols = jnp.arange(W)[None, :]

        def per_agent(p, ht, tg):
            self_oh = ((rows == p[0]) & (cols == p[1])).astype(jnp.float32)
            others = jnp.clip(agents_grid - self_oh, 0.0, 1.0)
            tgt_oh = (
                (rows == tg[0]) & (cols == tg[1])
            ).astype(jnp.float32) * ht
            g = jnp.stack([self_oh, others, pending_grid, tgt_oh], axis=-1)
            return g.reshape(-1)

        grids = jax.vmap(per_agent)(
            agent_pos, has_task.astype(jnp.float32), tgt
        )
        return jnp.concatenate([grids, feats], axis=-1)

    k, S = cfg.obs_radius, cfg.window_size
    pad = ((k, k), (k, k))
    agents_p = jnp.pad(agents_grid, pad)
    pending_p = jnp.pad(pending_grid, pad)
    valid_p = jnp.pad(jnp.ones((H, W), jnp.float32), pad)

    wr = jnp.arange(S)[:, None]
    wc = jnp.arange(S)[None, :]

    def window(p, ht, tg):
        # Padded-grid origin is shifted by k, so the window's top-left in
        # padded coordinates is exactly p.
        ch0 = jax.lax.dynamic_slice(agents_p, (p[0], p[1]), (S, S))
        ch1 = jax.lax.dynamic_slice(pending_p, (p[0], p[1]), (S, S))
        ch3 = jax.lax.dynamic_slice(valid_p, (p[0], p[1]), (S, S))
        # ch2: own target one-hot, window coords = tgt - pos + k.
        d = tg - p + k
        ch2 = ((wr == d[0]) & (wc == d[1])).astype(jnp.float32) * ht
        win = jnp.stack([ch0, ch1, ch2, ch3], axis=-1)
        return win.reshape(-1)

    wins = jax.vmap(window)(agent_pos, has_task.astype(jnp.float32), tgt)
    return jnp.concatenate([wins, feats], axis=-1)
