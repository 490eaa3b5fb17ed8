"""Flax actor-critic policy models.

TPU-native replacement for the reference stack's Torch/TF policy nets
(SURVEY.md §2.2 row 2): a shared-parameter per-agent actor-critic, XLA
compiled, applied to the flattened (batch·agents) axis so the matmuls stay
large and MXU-friendly. Two torsos:

- ``mlp``: Dense stack over the flat observation (default — windows are
  tiny, a conv adds latency without accuracy here).
- ``cnn``: splits the flat obs back into the (S, S, 4) window + 6 features
  (docs/SEMANTICS.md §10) and runs a small conv torso — the "small
  conv/MLP" family the reference trains (SURVEY.md C12 [I]).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import EnvConfig


class ActorCriticMLP(nn.Module):
    num_actions: int
    hidden_dims: Sequence[int] = (128, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs: jax.Array):
        x = obs.astype(self.dtype)
        for h in self.hidden_dims:
            x = nn.Dense(h, dtype=self.dtype,
                         kernel_init=nn.initializers.orthogonal(jnp.sqrt(2)))(x)
            x = nn.tanh(x)
        logits = nn.Dense(
            self.num_actions, dtype=self.dtype,
            kernel_init=nn.initializers.orthogonal(0.01),
        )(x)
        value = nn.Dense(
            1, dtype=self.dtype, kernel_init=nn.initializers.orthogonal(1.0)
        )(x)
        return logits.astype(jnp.float32), value.squeeze(-1).astype(jnp.float32)


class ActorCriticCNN(nn.Module):
    """Conv torso over the obs window channels + feature fusion."""

    num_actions: int
    window_size: int          # S: spatial side of the window/global grid
    channels: Sequence[int] = (16, 32)
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs: jax.Array):
        S = self.window_size
        grid_len = S * S * 4
        grid = obs[..., :grid_len].reshape(*obs.shape[:-1], S, S, 4)
        feats = obs[..., grid_len:]
        x = grid.astype(self.dtype)
        for ch in self.channels:
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.relu(x)
        x = x.reshape(*obs.shape[:-1], -1)
        x = jnp.concatenate([x, feats.astype(self.dtype)], axis=-1)
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.tanh(x)
        logits = nn.Dense(
            self.num_actions, dtype=self.dtype,
            kernel_init=nn.initializers.orthogonal(0.01),
        )(x)
        value = nn.Dense(
            1, dtype=self.dtype, kernel_init=nn.initializers.orthogonal(1.0)
        )(x)
        return logits.astype(jnp.float32), value.squeeze(-1).astype(jnp.float32)


def make_model(cfg: EnvConfig, arch: str = "mlp", hidden_dim: int = 128,
               num_layers: int = 2, dtype=jnp.float32) -> nn.Module:
    if arch == "mlp":
        return ActorCriticMLP(
            num_actions=cfg.num_actions,
            hidden_dims=(hidden_dim,) * num_layers,
            dtype=dtype,
        )
    if arch == "cnn":
        side = cfg.height if cfg.global_obs else cfg.window_size
        if cfg.global_obs and cfg.height != cfg.width:
            raise ValueError("cnn+global_obs requires a square grid")
        return ActorCriticCNN(
            num_actions=cfg.num_actions, window_size=side,
            hidden=hidden_dim, dtype=dtype,
        )
    raise ValueError(f"unknown arch {arch!r}")
