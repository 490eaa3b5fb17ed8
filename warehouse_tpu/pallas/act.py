"""Fused PPO act-phase Pallas kernel: policy rollout with the NN inside.

The trained path's rollout (obs construction -> MLP forward -> categorical
sample -> env tick, scanned over T) was ~6 ms of the ~15 ms BASELINE
config-4 update even after the cond-gated auto-reset (docs/RESULTS.md).
This kernel runs the ENTIRE T-step acting phase for a block of envs in
VMEM, batch-minor like the greedy kernel (pallas/rollout.py):

- observations are built in-kernel as [obs_dim, B] rows with the same
  comparison-based channels as ``ops/obs.py`` (bit-exact f32),
- the MLP forward runs on the MXU in-kernel ([H, D] @ [D, B] per agent;
  the weights live in VMEM for all T steps),
- actions are sampled from precomputed gumbel noise ([5, B] rows — all
  128 lanes live) with the same first-max tie rule as ``jnp.argmax``,
- env dynamics are the shared ``env_tick`` (pallas/rollout.py), the
  exact sub-step sequence of ``engine.step`` (docs/SEMANTICS.md §4-§8).

Exactness contract: env dynamics, obs values, rewards, and the gumbel
stream are bit-exact vs the XLA path; the MLP logits/values differ by
float accumulation order (MXU pass structure vs XLA's), so sampled
trajectories are distributionally identical but not bit-identical —
tests/test_act_kernel.py checks obs/dynamics exactly and logits/values
to tolerance, and the trainer A/B checks the learning curve.

Action masking runs in-kernel too (``mask_actions=True``): the static
bounds+walls validity of ``ops/move.py valid_action_mask`` is computed
per step, invalid logits are floored to the same -1e9 the XLA path
uses, and the mask rides home in the trajectory for the loss to
re-apply — so the shelves recipe's ``--mask-actions`` trains on the
fast path.

Restrictions (the trainer gates on these — train/ppo.py fast path):
feed-forward MLP (or GRU) policy, shared across agents, ego-window
obs, no reward shaping in-kernel, and ``T`` must not cross an episode
boundary mid-chunk (``max_steps % T == 0`` with synchronized
``state.t`` — every trainer init satisfies this); the boundary
auto-reset runs OUTSIDE via the same cond-gated reset as the XLA path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EnvConfig
from ..env.state import EnvState
from .. import rng as _rng
from .rollout import _onehot_read, env_tick

PENDING = 1
OBS_SLOT = -1  # set per-call: obs rows padded up to a multiple of 8

# Hard ceiling handed to Mosaic (v5e VMEM is 128M; leave compiler slack).
ACT_VMEM_CAP = 100 * 1024 * 1024


def act_vmem_estimate(cfg: EnvConfig, T: int, block: int,
                      weight_bytes: int) -> int:
    """The act kernel's VMEM budget for one grid step: double-buffered
    block inputs/outputs + the (single-copy, broadcast) weights +
    compiler stack headroom. ``ppo_rollout_pallas`` passes this to
    Mosaic as ``vmem_limit_bytes``; the CNN envelope gate in
    train/ppo.py uses the SAME arithmetic with analytic weight bytes,
    so gate and kernel cannot drift (ADVICE r4)."""
    A, R = cfg.num_agents, cfg.queue_capacity
    Dp = _pad8(cfg.obs_dim)
    return (
        4 * block * 2 * (          # 2x: grid double-buffering
            T * A * Dp + T * A * 16    # obs + talp output blocks
            + 10 * (A + R)             # state rows in+out
            + T * (3 + A * 8)          # draws + gumbel
        )
        + weight_bytes                 # broadcast weight blocks
        + 4 * 1024 * 1024              # compiler stack headroom
    )


def _pad8(n: int) -> int:
    return (n + 7) // 8 * 8


def _f32(b):
    return jnp.where(b, jnp.float32(1.0), jnp.float32(0.0))


def _target_rows(cfg: EnvConfig, i: int, p_r, p_c, aq, cy,
                 q_pr, q_pc, q_dr, q_dc):
    """(has_i, carrying, tgt_r, tgt_c) [1, B] rows for agent ``i``
    from [A, B]/[R, B] state planes — the §10 one-hot target read
    (vectorized masked-sum plane read, exactly the sequential where
    chain it replaced), drop-vs-pickup select."""
    R = cfg.queue_capacity
    aq_i = aq[i:i + 1, :]
    p_r_i = p_r[i:i + 1, :]
    p_c_i = p_c[i:i + 1, :]
    has_i = aq_i >= 0
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, aq.shape[-1]), 0)
    m = aq_i == r_iota
    tpr = _onehot_read(m, q_pr)
    tpc = _onehot_read(m, q_pc)
    tdr = _onehot_read(m, q_dr)
    tdc = _onehot_read(m, q_dc)
    carrying = cy[i:i + 1, :] != 0
    tgt_r = jnp.where(carrying, tdr, tpr)
    tgt_c = jnp.where(carrying, tdc, tpc)
    tgt_r = jnp.where(has_i, tgt_r, p_r_i)
    tgt_c = jnp.where(has_i, tgt_c, p_c_i)
    return has_i, carrying, tgt_r, tgt_c


def _feat_rows(cfg: EnvConfig, i: int, p_r, p_c, has_i, carrying,
               tgt_r, tgt_c):
    """The 6 self-feature rows (§10), explicit-reciprocal normalized.
    ``p_r``/``p_c`` are [A, B] planes."""
    import numpy as _np

    inv_h = float(_np.float32(1.0) / _np.float32(cfg.height))
    inv_w = float(_np.float32(1.0) / _np.float32(cfg.width))
    p_r_i = p_r[i:i + 1, :]
    p_c_i = p_c[i:i + 1, :]
    delta_r = jnp.where(has_i, tgt_r - p_r_i, 0)
    delta_c = jnp.where(has_i, tgt_c - p_c_i, 0)
    return [
        p_r_i.astype(jnp.float32) * inv_h,
        p_c_i.astype(jnp.float32) * inv_w,
        _f32(carrying),
        _f32(has_i),
        delta_r.astype(jnp.float32) * inv_h,
        delta_c.astype(jnp.float32) * inv_w,
    ]


def _obs_rows(cfg: EnvConfig, i: int, p_r, p_c, aq, cy,
              q_pr, q_pc, q_dr, q_dc, q_st):
    """Agent ``i``'s ego-window observation as ONE [D, B] f32 tensor
    in the exact spec order of ``ops/obs.py`` ([S, S, 4] channel-last
    ravel then the 6 self features, docs/SEMANTICS.md §10). Bit-exact:
    the same boolean compares and the same explicit-reciprocal
    normalization.

    Sublane-vectorized (round-5 roofline finding, docs/RESULTS.md r5):
    each channel is computed for ALL S² window positions at once as an
    [S², B] plane (window coordinates from a broadcasted iota), so the
    A-agent / R-request or-chains issue on ~S²/8-sublane-tile vregs
    instead of S² separate [1, B] rows at 1/8 sublane utilization —
    ~6x fewer VPU instructions for the same boolean math. Only the
    final interleave back to the spec's channel-last row order remains
    row-granular (plain copies, no compute)."""
    A, R, H, W = (cfg.num_agents, cfg.queue_capacity, cfg.height,
                  cfg.width)
    S, k = cfg.window_size, cfg.obs_radius
    f32 = _f32

    has_i, carrying, tgt_r, tgt_c = _target_rows(
        cfg, i, p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc)

    B = p_r.shape[-1]
    n = S * S
    widx = jax.lax.broadcasted_iota(jnp.int32, (n, B), 0)
    wr = p_r[i:i + 1, :] + (widx // S - k)             # [n, B]
    wc = p_c[i:i + 1, :] + (widx % S - k)
    never = widx < 0                                   # all-False plane
    # ch0: any agent on the cell.
    ch0 = never
    for j in range(A):
        ch0 = ch0 | ((wr == p_r[j:j + 1, :]) & (wc == p_c[j:j + 1, :]))
    # ch1: pending pickup on the cell.
    ch1 = never
    for r in range(R):
        ch1 = ch1 | (
            (wr == q_pr[r:r + 1, :]) & (wc == q_pc[r:r + 1, :])
            & (q_st[r:r + 1, :] == PENDING)
        )
    # ch2: own target on the cell.
    ch2 = (wr == tgt_r) & (wc == tgt_c) & has_i
    # ch3: inside the grid and not a wall (§1a).
    ch3 = (wr >= 0) & (wr < H) & (wc >= 0) & (wc < W)
    for wcell in cfg.walls:
        ch3 = ch3 & ~((wr == wcell // W) & (wc == wcell % W))

    planes = (f32(ch0), f32(ch1), f32(ch2), f32(ch3))
    rows = [planes[ch][w:w + 1, :] for w in range(n) for ch in range(4)]
    rows.extend(_feat_rows(cfg, i, p_r, p_c, has_i, carrying,
                           tgt_r, tgt_c))
    return jnp.concatenate(rows, axis=0)


def _obs_rows_global(cfg: EnvConfig, i: int, p_r, p_c, aq, cy,
                     q_pr, q_pc, q_dr, q_dc, q_st):
    """Agent ``i``'s GLOBAL-view observation as ONE [D, B] f32 tensor
    ([H, W, 5] channel-last ravel then the 6 self features) — the
    exact twin of ``ops/obs.py observe``'s global branch
    (docs/SEMANTICS.md §10): ch0 self position, ch1 other agents, ch2
    pending pickups, ch3 own target, ch4 traversable (static per
    config). Sublane-vectorized like ``_obs_rows``: each channel is an
    [H*W, B] plane over a cell-index iota."""
    A, R, H, W = (cfg.num_agents, cfg.queue_capacity, cfg.height,
                  cfg.width)
    f32 = _f32

    has_i, carrying, tgt_r, tgt_c = _target_rows(
        cfg, i, p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc)

    B = p_r.shape[-1]
    n = H * W
    widx = jax.lax.broadcasted_iota(jnp.int32, (n, B), 0)
    r_ = widx // W
    c_ = widx % W
    never = widx < 0                                   # all-False plane
    ch_self = (p_r[i:i + 1, :] == r_) & (p_c[i:i + 1, :] == c_)
    others = never
    for j in range(A):
        if j != i:
            others = others | ((p_r[j:j + 1, :] == r_)
                               & (p_c[j:j + 1, :] == c_))
    # observe() computes others = any_agent & ~self; identical to
    # the union over j != i because cells hold at most one agent
    # (engine invariant) — but replicate the & ~self exactly.
    others = others & ~ch_self
    pend = never
    for rq in range(R):
        pend = pend | (
            (q_pr[rq:rq + 1, :] == r_) & (q_pc[rq:rq + 1, :] == c_)
            & (q_st[rq:rq + 1, :] == PENDING)
        )
    ch_tgt = (tgt_r == r_) & (tgt_c == c_) & has_i
    # ch4 traversable: 1.0 except wall cells (static per config) —
    # the exact 0.0/1.0 values of observe()'s free map.
    free = jnp.ones((n, B), jnp.float32)
    for wcell in cfg.walls:
        free = jnp.where(widx == wcell, 0.0, free)

    planes = (f32(ch_self), f32(others), f32(pend), f32(ch_tgt), free)
    rows = [planes[ch][w:w + 1, :] for w in range(n) for ch in range(5)]
    rows.extend(_feat_rows(cfg, i, p_r, p_c, has_i, carrying,
                           tgt_r, tgt_c))
    return jnp.concatenate(rows, axis=0)


NEG_INF = -1e9  # logits floor for masked actions (ops/ppo_update.py)
# Action deltas in action order STAY/UP/DOWN/LEFT/RIGHT (ops/move.py).
_DELTAS = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))


def _valid_action_rows(cfg: EnvConfig, p_r_i, p_c_i):
    """Per-action validity rows [5 x [1, B] bool] — the static
    bounds+walls part of §4.1 rule 1, the exact twin of
    ``ops/move.py valid_action_mask``."""
    H, W = cfg.height, cfg.width
    rows = []
    for dr, dc in _DELTAS:
        pr = p_r_i + dr
        pc = p_c_i + dc
        ok = (pr >= 0) & (pr < H) & (pc >= 0) & (pc < W)
        for w in cfg.walls:
            ok = ok & ~((pr == w // W) & (pc == w % W))
        rows.append(ok)
    return rows


def _phi_row(cfg: EnvConfig, tbl_ref, p_r_i, p_c_i, aq_i, cy_i,
             q_pr, q_pc, q_dr, q_dc):
    """Shaping potential φ(s) for one agent, [1, B] f32 — the exact
    twin of ``ops/pathing.py potential`` (one-hot table contraction;
    every sum selects exactly one element, so it is bit-exact).
    ``q_*`` are [R, B] planes (one-hot masked-sum reads)."""
    from ..ops.pathing import UNREACHABLE
    R, W, C = cfg.queue_capacity, cfg.width, cfg.num_cells
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, aq_i.shape[-1]), 0)
    m = aq_i == r_iota
    tpr = _onehot_read(m, q_pr)
    tpc = _onehot_read(m, q_pc)
    tdr = _onehot_read(m, q_dr)
    tdc = _onehot_read(m, q_dc)
    carrying = cy_i != 0
    has = aq_i >= 0
    tgt_cell = (jnp.where(carrying, tdr, tpr) * W
                + jnp.where(carrying, tdc, tpc))          # [1, B]
    pos_cell = p_r_i * W + p_c_i

    B = p_r_i.shape[-1]
    cell_ids = jax.lax.broadcasted_iota(jnp.int32, (C, B), 0)
    oh_tgt = (cell_ids == tgt_cell).astype(jnp.float32)    # [C, B]
    oh_pos = (cell_ids == pos_cell).astype(jnp.float32)
    # tmp[c, b] = table[c, tgt_b]; d[b] = tmp[pos_b, b].
    tmp = jax.lax.dot_general(
        tbl_ref[...], oh_tgt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    d = jnp.sum(tmp * oh_pos, axis=0, keepdims=True)       # [1, B]
    ok = has & (d < float(UNREACHABLE))
    return jnp.where(ok, -d, 0.0)


def _act_kernel(cfg: EnvConfig, T: int, n_hidden: int, mask_act: bool,
                shaping_coef: float, gamma: float, groups: tuple,
                n_relu: int, cnn_split: int,
                *refs):
    """Kernel body. ``refs`` order: state rows (10 in), u/pick/drop,
    gumbel, [bfs table + trunc rows when shaping], weights (2 per
    hidden layer + heads w/b) PER POLICY GROUP, then outputs: state
    rows (10 out), obs, talp (16-row slots per (t, agent): 0 action,
    1 log-prob, 2 value, 3 reward (shaped when shaping is on),
    4 delivered, 5-9 action mask, 10 raw reward, 11-15 zero).

    ``groups``: static agent -> policy-group map (RLlib
    policy_mapping_fn parity); weight selection is resolved at trace
    time, so multi-policy training costs nothing in-kernel.

    ``n_relu``/``cnn_split``: the CNN arch (models/policy.py
    ActorCriticCNN) runs through the SAME layer loop — its 3x3 SAME
    convs arrive as UNROLLED dense matrices ([S²*OC, S²*IC], built per
    call by ``extract_cnn_weights``), so the first ``n_relu`` layers
    use relu over the ``cnn_split`` grid rows, the 6 self-feature rows
    re-join after the last conv, and the remaining layers are the tanh
    dense torso. ``n_relu == 0`` is the plain MLP (layers all tanh over
    the full obs)."""
    A, R = cfg.num_agents, cfg.queue_capacity
    D = cfg.obs_dim
    Dp = _pad8(D)
    K = max(groups) + 1

    it = iter(refs)
    pos_r, pos_c, areq, carry = next(it), next(it), next(it), next(it)
    rp_r, rp_c, rd_r, rd_c = next(it), next(it), next(it), next(it)
    rstat, ragent = next(it), next(it)
    u_ref, pick_ref, drop_ref, g_ref = (next(it), next(it), next(it),
                                        next(it))
    shape_on = shaping_coef > 0.0
    if shape_on:
        tbl_ref, trunc_ref = next(it), next(it)
    wbs_g = [[(next(it), next(it)) for _ in range(n_hidden)]
             for _g in range(K)]
    heads_g = [(next(it), next(it)) for _g in range(K)]
    obs_rows_fn = _obs_rows_global if cfg.global_obs else _obs_rows
    (o_pos_r, o_pos_c, o_areq, o_carry, o_rp_r, o_rp_c, o_rd_r, o_rd_c,
     o_rstat, o_ragent) = (next(it) for _ in range(10))
    o_obs, o_talp = next(it), next(it)

    state0 = (
        pos_r[...], pos_c[...], areq[...], carry[...],
        rp_r[...], rp_c[...], rd_r[...], rd_c[...],
        rstat[...], ragent[...],
    )

    def step(t, s):
        (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag) = s

        u = u_ref[pl.ds(t, 1), :]
        spick = pick_ref[pl.ds(t, 1), :]
        sdrop = drop_ref[pl.ds(t, 1), :]
        if shape_on:
            done_t = trunc_ref[pl.ds(t, 1), :]
            phi_pre = [
                _phi_row(cfg, tbl_ref, p_r[i:i + 1, :], p_c[i:i + 1, :],
                         aq[i:i + 1, :], cy[i:i + 1, :],
                         q_pr, q_pc, q_dr, q_dc)
                for i in range(A)
            ]

        def forward(x_in, g_idx):
            """Torso forward on the MXU for one agent's [Dp, NB] rows
            (or the agent-concat [Dp, A*NB]): weights pre-transposed
            [out, in]. CNN (n_relu > 0): first n_relu layers are the
            UNROLLED convs (relu) over the grid rows; the self-feature
            rows re-join after the last conv; the rest is the tanh
            dense torso. MLP is the n_relu == 0 special case."""
            wbs = wbs_g[g_idx]
            wh_ref, bh_ref = heads_g[g_idx]
            h = x_in[:cnn_split, :] if n_relu else x_in[:D, :]
            for li, (w_ref, b_ref) in enumerate(wbs):
                z = jax.lax.dot_general(
                    w_ref[:, :], h,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + b_ref[:, :]
                h = jnp.maximum(z, 0.0) if li < n_relu else jnp.tanh(z)
                if n_relu and li == n_relu - 1:
                    h = jnp.concatenate(
                        [h, x_in[cnn_split:D, :]], axis=0)
            return jax.lax.dot_general(
                wh_ref[:, :], h,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bh_ref[:, :]                              # [6(+pad), N]

        xs = []
        for i in range(A):
            x = obs_rows_fn(cfg, i, p_r, p_c, aq, cy,
                            q_pr, q_pc, q_dr, q_dc, q_st)  # [D, B]
            if Dp > D:
                x = jnp.concatenate(
                    [x, jnp.zeros((Dp - D, x.shape[1]), jnp.float32)],
                    axis=0)                               # [Dp, B]
            o_obs[pl.ds((t * A + i) * Dp, Dp), :] = x
            xs.append(x)

        # NOTE (measured null result, docs/RESULTS.md r4): running the
        # shared-policy forward as ONE agent-concat wide matmul
        # (bit-identical — matmuls are column-wise) REGRESSED ~2% on
        # chip: inside a kernel there is no per-call launch overhead
        # to amortize (the replay kernels' win), and the concat's VMEM
        # copies cost more than the wider MXU shape saves at block
        # 512. Keep the per-agent calls.
        outs_a = [forward(xs[i], groups[i]) for i in range(A)]

        act = []
        for i in range(A):
            out = outs_a[i]
            base = (t * A + i) * 16
            if mask_act:
                # Floor invalid logits BEFORE sampling (the XLA path's
                # sample_action receives pre-masked logits); store the
                # mask so the loss can re-apply it.
                valid = _valid_action_rows(cfg, p_r[i:i + 1, :],
                                           p_c[i:i + 1, :])
                masked = jnp.concatenate(
                    [jnp.where(valid[r], out[r:r + 1, :],
                               jnp.float32(NEG_INF))
                     for r in range(5)] + [out[5:, :]], axis=0)
                for r in range(5):
                    o_talp[pl.ds(base + 5 + r, 1), :] = jnp.where(
                        valid[r], 1.0, 0.0)
                out = masked
            # Lane-dense categorical sample: argmax(logits + gumbel),
            # first-max tie rule (same as jnp.argmax / the XLA path).
            g = g_ref[pl.ds((t * A + i) * 8, 5), :]        # [5, B]
            best_a, lp = _sample_logprob(out, g)
            act.append(best_a)

            value = out[5:6, :]
            o_talp[pl.ds(base, 1), :] = best_a.astype(jnp.float32)
            o_talp[pl.ds(base + 1, 1), :] = lp
            o_talp[pl.ds(base + 2, 1), :] = value

        (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
         picked, delivered, collided) = env_tick(
            cfg, p_r, p_c, aq, cy,
            q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
            act, u, spick, sdrop)

        for i in range(A):
            rew = (
                cfg.step_penalty
                + cfg.pickup_reward
                * picked[i:i + 1, :].astype(jnp.float32)
                + cfg.delivery_reward
                * delivered[i:i + 1, :].astype(jnp.float32)
                + cfg.collision_penalty
                * collided[i:i + 1, :].astype(jnp.float32)
            )
            base = (t * A + i) * 16
            if shape_on:
                # Potential-based shaping on the POST-tick (pre-reset)
                # state; the γ·φ(s') term is cut at the boundary
                # exactly like the XLA path's (1 − done) factor.
                phi_post = _phi_row(cfg, tbl_ref, p_r[i:i + 1, :],
                                    p_c[i:i + 1, :], aq[i:i + 1, :],
                                    cy[i:i + 1, :], q_pr, q_pc, q_dr,
                                    q_dc)
                shaped = rew + shaping_coef * (
                    gamma * phi_post * (1.0 - done_t) - phi_pre[i])
                o_talp[pl.ds(base + 3, 1), :] = shaped
                o_talp[pl.ds(base + 10, 1), :] = rew
            else:
                o_talp[pl.ds(base + 3, 1), :] = rew
            o_talp[pl.ds(base + 4, 1), :] = (
                delivered[i:i + 1, :].astype(jnp.float32)
            )

        return (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag)

    out = jax.lax.fori_loop(0, T, step, state0)
    (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag) = out
    o_pos_r[:] = p_r
    o_pos_c[:] = p_c
    o_areq[:] = aq
    o_carry[:] = cy
    o_rp_r[:] = q_pr
    o_rp_c[:] = q_pc
    o_rd_r[:] = q_dr
    o_rd_c[:] = q_dc
    o_rstat[:] = q_st
    o_ragent[:] = q_ag


def _sample_logprob(out, g):
    """(action i32[1, B], log-prob f32[1, B]) from logits rows
    ``out[0:5]`` and gumbel rows ``g[5, B]`` — argmax(logits + gumbel)
    with the first-max tie rule, then a stable log-softmax select."""
    logit = [out[r:r + 1, :] for r in range(5)]
    z = [logit[r] + g[r:r + 1, :] for r in range(5)]
    best = z[0]
    best_a = jnp.zeros_like(z[0], dtype=jnp.int32)
    for r in range(1, 5):
        m = z[r] > best
        best = jnp.where(m, z[r], best)
        best_a = jnp.where(m, r, best_a)
    mx = logit[0]
    for r in range(1, 5):
        mx = jnp.maximum(mx, logit[r])
    ssum = jnp.zeros_like(mx)
    for r in range(5):
        ssum = ssum + jnp.exp(logit[r] - mx)
    lse = jnp.log(ssum)
    lp = jnp.zeros_like(mx)
    for r in range(5):
        lp = lp + jnp.where(best_a == r, logit[r] - mx - lse, 0.0)
    return best_a, lp


def _act_rnn_kernel(cfg: EnvConfig, T: int, n_enc: int, H: int,
                    mask_act: bool, cell: str, *refs):
    """Recurrent act kernel: encoder MLP -> GRU/LSTM cell -> heads,
    carry rows [A*H, B] (LSTM: c rows + h rows) threaded through the
    T-step loop. The flax cell math exactly (models/policy.py
    ActorCriticRNN):
    GRU:  r = sig(Wir x + bir + Whr h); z = sig(Wiz x + biz + Whz h);
          n = tanh(Win x + bin + r*(Whn h + bhn)); h' = (1-z)*n + z*h.
    LSTM (OptimizedLSTMCell): gate = fn(Wi_ x + Wh_ h + bh_) for
          i/f/o (sigmoid) and g (tanh); c' = f*c + i*g;
          h' = o * tanh(c').
    Carry reset at episode boundaries happens OUTSIDE (the envelope
    gates truncation to the chunk's last step)."""
    A, R = cfg.num_agents, cfg.queue_capacity
    D = cfg.obs_dim
    Dp = _pad8(D)
    lstm = cell == "lstm"

    it = iter(refs)
    pos_r, pos_c, areq, carr = next(it), next(it), next(it), next(it)
    rp_r, rp_c, rd_r, rd_c = next(it), next(it), next(it), next(it)
    rstat, ragent = next(it), next(it)
    c_ref = next(it) if lstm else None                # [A*H, B]
    h_ref = next(it)                                  # [A*H, B]
    u_ref, pick_ref, drop_ref, g_ref = (next(it), next(it), next(it),
                                        next(it))
    enc = [(next(it), next(it)) for _ in range(n_enc)]
    if lstm:
        (wii, whi, bhi, wif, whf, bhf, wig, whg, bhg,
         wio, who, bho) = (next(it) for _ in range(12))
    else:
        (wir, bir, whr, wiz, biz, whz, win, bin_, whn, bhn) = (
            next(it) for _ in range(10))
    wh_ref, bh_ref = next(it), next(it)
    (o_pos_r, o_pos_c, o_areq, o_carry, o_rp_r, o_rp_c, o_rd_r, o_rd_c,
     o_rstat, o_ragent) = (next(it) for _ in range(10))
    o_c = next(it) if lstm else None
    o_h, o_obs, o_talp = next(it), next(it), next(it)

    def dot(w_ref, x):
        return jax.lax.dot_general(
            w_ref[...], x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    state0 = (
        pos_r[...], pos_c[...], areq[...], carr[...],
        rp_r[...], rp_c[...], rd_r[...], rd_c[...],
        rstat[...], ragent[...],
        (tuple(c_ref[i * H:(i + 1) * H, :] for i in range(A))
         if lstm else ()),
        tuple(h_ref[i * H:(i + 1) * H, :] for i in range(A)),
    )

    def step(t, s):
        (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
         cs, hs) = s
        hs = list(hs)
        cs = list(cs)

        u = u_ref[pl.ds(t, 1), :]
        spick = pick_ref[pl.ds(t, 1), :]
        sdrop = drop_ref[pl.ds(t, 1), :]

        act = []
        for i in range(A):
            x = _obs_rows(cfg, i, p_r, p_c, aq, cy,
                          q_pr, q_pc, q_dr, q_dc, q_st)    # [D, B]
            if Dp > D:
                x = jnp.concatenate(
                    [x, jnp.zeros((Dp - D, x.shape[1]), jnp.float32)],
                    axis=0)
            o_obs[pl.ds((t * A + i) * Dp, Dp), :] = x

            e = x[:D, :]
            for w_ref, b_ref in enc:
                e = jnp.tanh(dot(w_ref, e) + b_ref[...])
            h = hs[i]
            if lstm:
                c = cs[i]
                ig = jax.nn.sigmoid(dot(wii, e) + dot(whi, h)
                                    + bhi[...])
                fg = jax.nn.sigmoid(dot(wif, e) + dot(whf, h)
                                    + bhf[...])
                gg = jnp.tanh(dot(wig, e) + dot(whg, h) + bhg[...])
                og = jax.nn.sigmoid(dot(wio, e) + dot(who, h)
                                    + bho[...])
                c = fg * c + ig * gg
                h = og * jnp.tanh(c)
                cs[i] = c
            else:
                r = jax.nn.sigmoid(dot(wir, e) + bir[...] + dot(whr, h))
                zg = jax.nn.sigmoid(dot(wiz, e) + biz[...] + dot(whz, h))
                n = jnp.tanh(dot(win, e) + bin_[...]
                             + r * (dot(whn, h) + bhn[...]))
                h = (1.0 - zg) * n + zg * h
            hs[i] = h

            out = dot(wh_ref, h) + bh_ref[...]        # [8, B]
            base = (t * A + i) * 16
            if mask_act:
                valid = _valid_action_rows(cfg, p_r[i:i + 1, :],
                                           p_c[i:i + 1, :])
                out = jnp.concatenate(
                    [jnp.where(valid[r], out[r:r + 1, :],
                               jnp.float32(NEG_INF))
                     for r in range(5)] + [out[5:, :]], axis=0)
                for r in range(5):
                    o_talp[pl.ds(base + 5 + r, 1), :] = jnp.where(
                        valid[r], 1.0, 0.0)
            g = g_ref[pl.ds((t * A + i) * 8, 5), :]
            best_a, lp = _sample_logprob(out, g)
            act.append(best_a)
            o_talp[pl.ds(base, 1), :] = best_a.astype(jnp.float32)
            o_talp[pl.ds(base + 1, 1), :] = lp
            o_talp[pl.ds(base + 2, 1), :] = out[5:6, :]

        (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
         picked, delivered, collided) = env_tick(
            cfg, p_r, p_c, aq, cy,
            q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
            act, u, spick, sdrop)

        for i in range(A):
            rew = (
                cfg.step_penalty
                + cfg.pickup_reward
                * picked[i:i + 1, :].astype(jnp.float32)
                + cfg.delivery_reward
                * delivered[i:i + 1, :].astype(jnp.float32)
                + cfg.collision_penalty
                * collided[i:i + 1, :].astype(jnp.float32)
            )
            base = (t * A + i) * 16
            o_talp[pl.ds(base + 3, 1), :] = rew
            o_talp[pl.ds(base + 4, 1), :] = (
                delivered[i:i + 1, :].astype(jnp.float32))

        return (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
                tuple(cs), tuple(hs))

    out = jax.lax.fori_loop(0, T, step, state0)
    (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag, cs,
     hs) = out
    o_pos_r[:] = p_r
    o_pos_c[:] = p_c
    o_areq[:] = aq
    o_carry[:] = cy
    o_rp_r[:] = q_pr
    o_rp_c[:] = q_pc
    o_rd_r[:] = q_dr
    o_rd_c[:] = q_dc
    o_rstat[:] = q_st
    o_ragent[:] = q_ag
    if lstm:
        o_c[:] = jnp.concatenate(cs, axis=0)
    o_h[:] = jnp.concatenate(hs, axis=0)


def extract_lstm_weights(params):
    """(enc (w,b) list, lstm mats tuple, heads (wh, bh)) from
    ActorCriticRNN(lstm) params, pre-transposed [out, in]. Mat order:
    (wii, whi, bhi, wif, whf, bhf, wig, whg, bhg, wio, who, bho) —
    input-side kernels have no bias (flax OptimizedLSTMCell)."""
    dense = params["params"]
    enc_names = sorted(
        (n for n in dense if n.startswith("Dense_")),
        key=lambda s: int(s.split("_")[1]))
    cell = dense["OptimizedLSTMCell_0"]
    *enc_n, logit_n, value_n = enc_names
    enc = [(jnp.transpose(dense[n]["kernel"]).astype(jnp.float32),
            dense[n]["bias"].astype(jnp.float32)[:, None])
           for n in enc_n]

    def tw(sub):
        return jnp.transpose(cell[sub]["kernel"]).astype(jnp.float32)

    def tb(sub):
        return cell[sub]["bias"].astype(jnp.float32)[:, None]

    mats = (tw("ii"), tw("hi"), tb("hi"), tw("if"), tw("hf"), tb("hf"),
            tw("ig"), tw("hg"), tb("hg"), tw("io"), tw("ho"), tb("ho"))
    wl = jnp.transpose(dense[logit_n]["kernel"]).astype(jnp.float32)
    bl = dense[logit_n]["bias"].astype(jnp.float32)[:, None]
    wv = jnp.transpose(dense[value_n]["kernel"]).astype(jnp.float32)
    bv = dense[value_n]["bias"].astype(jnp.float32)[:, None]
    wh = jnp.concatenate([wl, wv], axis=0)
    bh = jnp.concatenate([bl, bv], axis=0)
    pad = _pad8(wh.shape[0]) - wh.shape[0]
    if pad:
        wh = jnp.pad(wh, ((0, pad), (0, 0)))
        bh = jnp.pad(bh, ((0, pad), (0, 0)))
    return enc, mats, (wh, bh)


def extract_rnn_weights(params):
    """(enc (w,b) list, gru mats tuple, heads (wh, bh)) from
    ActorCriticRNN/GRU params, pre-transposed [out, in]."""
    dense = params["params"]
    enc_names = sorted(
        (n for n in dense if n.startswith("Dense_")),
        key=lambda s: int(s.split("_")[1]))
    gru = dense["GRUCell_0"]
    # Dense heads come AFTER the cell in call order: the last two
    # Dense_* are logits and value; the ones before are the encoder.
    *enc_n, logit_n, value_n = enc_names
    enc = [(jnp.transpose(dense[n]["kernel"]).astype(jnp.float32),
            dense[n]["bias"].astype(jnp.float32)[:, None])
           for n in enc_n]

    def tw(sub):
        return jnp.transpose(gru[sub]["kernel"]).astype(jnp.float32)

    def tb(sub):
        return gru[sub]["bias"].astype(jnp.float32)[:, None]

    gmats = (tw("ir"), tb("ir"), tw("hr"), tw("iz"), tb("iz"), tw("hz"),
             tw("in"), tb("in"), tw("hn"), tb("hn"))
    wl = jnp.transpose(dense[logit_n]["kernel"]).astype(jnp.float32)
    bl = dense[logit_n]["bias"].astype(jnp.float32)[:, None]
    wv = jnp.transpose(dense[value_n]["kernel"]).astype(jnp.float32)
    bv = dense[value_n]["bias"].astype(jnp.float32)[:, None]
    wh = jnp.concatenate([wl, wv], axis=0)
    bh = jnp.concatenate([bl, bv], axis=0)
    pad = _pad8(wh.shape[0]) - wh.shape[0]
    if pad:
        wh = jnp.pad(wh, ((0, pad), (0, 0)))
        bh = jnp.pad(bh, ((0, pad), (0, 0)))
    return enc, gmats, (wh, bh)


@partial(jax.jit, static_argnums=(0, 4, 6, 7, 8, 9))
def ppo_rnn_rollout_pallas(cfg: EnvConfig, params, state: EnvState,
                           carry, T: int, key: jax.Array,
                           block: int = 512, interpret: bool = False,
                           mask_actions: bool = False,
                           cell: str = "gru"):
    """Recurrent (GRU/LSTM) trained rollout via the fused kernel.

    ``carry``: float32[B, A, H] GRU hidden state, or the flax LSTM
    ``(c, h)`` tuple of two such arrays (``cell="lstm"``). Returns
    ``(new EnvState, ActRollout, reset_key_last, next_key, new_carry)``
    with ``new_carry`` NOT reset at boundaries — the caller zeroes it
    where the chunk truncated (matching the per-step semantics, since
    the envelope restricts truncation to the chunk's last step).
    """
    if cfg.auto_reset:
        raise ValueError("act kernel: auto_reset is handled by the caller")
    if cfg.global_obs:
        raise ValueError("act kernel supports ego-window obs only")
    B = state.agent_pos.shape[0]
    if B % block:
        raise ValueError(f"batch {B} must divide into block {block}")
    A, R, D = cfg.num_agents, cfg.queue_capacity, cfg.obs_dim
    Dp = _pad8(D)
    lstm = cell == "lstm"
    if lstm:
        c_carry, h_carry = carry
    else:
        h_carry = carry
    H = h_carry.shape[-1]

    if lstm:
        enc, gmats, (wh, bh) = extract_lstm_weights(params)
    else:
        enc, gmats, (wh, bh) = extract_rnn_weights(params)
    n_enc = len(enc)

    # Batched draw precompute: bit-identical stream, the T*B draws in
    # one program instead of T sequential scan steps (rng.py).
    final_keys, u, pick, drop, reset_keys = _rng.batched_step_draws(
        state.key, cfg, T)

    next_key, g = _rng.batched_gumbel_stream(key, T, (5, B * A))
    g = g.reshape(T, 5, B, A).transpose(0, 3, 1, 2)
    g = jnp.pad(g, ((0, 0), (0, 0), (0, 3), (0, 0)))
    g = g.reshape(T * A * 8, B)

    def bm(x):
        return jnp.transpose(x).astype(jnp.int32)

    def crows(x):   # [B, A, H] -> [A*H, B] f32
        return x.astype(jnp.float32).transpose(1, 2, 0).reshape(
            A * H, B)

    ins = [
        bm(state.agent_pos[:, :, 0]), bm(state.agent_pos[:, :, 1]),
        bm(state.agent_req), bm(state.carrying.astype(jnp.int32)),
        bm(state.req_pickup[:, :, 0]), bm(state.req_pickup[:, :, 1]),
        bm(state.req_drop[:, :, 0]), bm(state.req_drop[:, :, 1]),
        bm(state.req_status), bm(state.req_agent),
    ]
    if lstm:
        ins.append(crows(c_carry))
    ins.extend([
        crows(h_carry),
        u.astype(jnp.float32), pick.astype(jnp.int32),
        drop.astype(jnp.int32), g,
    ])
    for w, b in enc:
        ins.extend([w, b])
    ins.extend(gmats)
    ins.extend([wh, bh])

    def bspec(rows_):
        return pl.BlockSpec((rows_, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        bspec(A), bspec(A), bspec(A), bspec(A),
        bspec(R), bspec(R), bspec(R), bspec(R), bspec(R), bspec(R),
    ]
    if lstm:
        in_specs.append(bspec(A * H))
    in_specs.extend([
        bspec(A * H),
        bspec(T), bspec(T), bspec(T), bspec(T * A * 8),
    ])
    for w, b in enc:
        in_specs.extend([wspec(w.shape), wspec(b.shape)])
    for m in gmats:
        in_specs.append(wspec(m.shape))
    in_specs.extend([wspec(wh.shape), wspec(bh.shape)])

    out_specs = [
        bspec(A), bspec(A), bspec(A), bspec(A),
        bspec(R), bspec(R), bspec(R), bspec(R), bspec(R), bspec(R),
    ]
    if lstm:
        out_specs.append(bspec(A * H))
    out_specs.extend([bspec(A * H), bspec(T * A * Dp),
                      bspec(T * A * 16)])
    out_shape = [
        jax.ShapeDtypeStruct((A, B), jnp.int32) for _ in range(4)
    ] + [
        jax.ShapeDtypeStruct((R, B), jnp.int32) for _ in range(6)
    ] + ([jax.ShapeDtypeStruct((A * H, B), jnp.float32)]
         if lstm else []) + [
        jax.ShapeDtypeStruct((A * H, B), jnp.float32),
        jax.ShapeDtypeStruct((T * A * Dp, B), jnp.float32),
        jax.ShapeDtypeStruct((T * A * 16, B), jnp.float32),
    ]

    vmem_bytes = 4 * block * 2 * (
        T * A * Dp + T * A * 16 + 10 * (A + R) + 4 * A * H
        + T * (3 + A * 8)
    ) + 12 * 1024 * 1024
    outs = pl.pallas_call(
        partial(_act_rnn_kernel, cfg, T, n_enc, H, mask_actions, cell),
        grid=(B // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes, 100 * 1024 * 1024),
        ),
    )(*ins)

    if lstm:
        (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
         c_out, h_out, obs_rows, talp) = outs
    else:
        (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
         h_out, obs_rows, talp) = outs

    def mb(x):
        return jnp.transpose(x)

    new_state = EnvState(
        agent_pos=jnp.stack([mb(p_r), mb(p_c)], axis=-1),
        agent_req=mb(aq),
        carrying=mb(cy).astype(bool),
        req_pickup=jnp.stack([mb(q_pr), mb(q_pc)], axis=-1),
        req_drop=jnp.stack([mb(q_dr), mb(q_dc)], axis=-1),
        req_status=mb(q_st),
        req_agent=mb(q_ag),
        t=state.t + T,
        key=final_keys,
    )
    def uncrow(x):  # [A*H, B] -> [B, A, H]
        return x.reshape(A, H, B).transpose(2, 0, 1)

    new_carry = ((uncrow(c_out), uncrow(h_out)) if lstm
                 else uncrow(h_out))

    obs = obs_rows.reshape(T, A, Dp, B)[:, :, :D, :]
    obs = obs.transpose(0, 3, 1, 2)
    talp = talp.reshape(T, A, 16, B).transpose(0, 3, 1, 2)
    action = talp[..., 0].astype(jnp.int32)
    if mask_actions:
        mask = talp[..., 5:10] > 0.5
    else:
        mask = jnp.ones((T, B, A, 5), bool)
    steps = state.t[None, :] + 1 + jnp.arange(T, dtype=state.t.dtype)[:, None]
    roll = ActRollout(obs=obs, action=action, log_prob=talp[..., 1],
                      value=talp[..., 2], reward=talp[..., 3],
                      delivered=talp[..., 4].astype(jnp.int32).sum(-1),
                      truncated=steps >= cfg.max_steps, mask=mask,
                      raw_reward=talp[..., 3], obs_bm=obs_rows)
    return new_state, roll, reset_keys[-1], next_key, new_carry


class ActRollout(NamedTuple):
    """T-step trained-rollout trajectory, env-major like the XLA path."""
    obs: jax.Array        # float32[T, B, A, obs_dim]
    action: jax.Array     # int32[T, B, A]
    log_prob: jax.Array   # float32[T, B, A]
    value: jax.Array      # float32[T, B, A]
    reward: jax.Array     # float32[T, B, A]
    delivered: jax.Array  # int32[T, B] per-env delivery counts
    truncated: jax.Array  # bool[T, B]
    mask: jax.Array       # bool[T, B, A, 5] valid-action mask (all-True
    #                       when the trainer runs unmasked)
    raw_reward: jax.Array  # float32[T, B, A] pre-shaping env reward
    #                        (== reward when shaping is off)
    obs_bm: jax.Array | None = None
    # float32[T*A*Dp, B] — the kernel's NATIVE batch-minor obs
    # trajectory, unchanged. The fused SGD kernel (pallas/sgd.py)
    # consumes this directly (zero-copy); when only ``obs`` is used,
    # XLA dead-code-eliminates this alias and vice versa.


def extract_cnn_weights(params, cfg: EnvConfig) -> tuple:
    """(layer (w,b) list, heads (wh, bh)) for ActorCriticCNN — the 3x3
    SAME convs UNROLLED into dense [S²*OC, S²*IC] matrices so the
    kernel's layer loop runs them as plain MXU matmuls (row layout =
    the channel-last ravel the obs rows already use, so conv output
    rows line up with the flax ``reshape(-1)`` flatten). One einsum per
    conv per call — negligible next to the rollout itself.

    Returns ``(wbs, heads, n_relu, grid_rows)``: ``wbs`` = conv pairs
    (relu) + hidden dense pairs (tanh), kernel layer-loop order.
    """
    import numpy as _np

    S = cfg.height if cfg.global_obs else cfg.window_size
    C = cfg.num_obs_channels
    P2 = S * S
    dense = params["params"]
    conv_names = sorted(
        (n for n in dense if n.startswith("Conv_")),
        key=lambda s: int(s.split("_")[1]))
    dense_names = sorted(
        (n for n in dense if n.startswith("Dense_")),
        key=lambda s: int(s.split("_")[1]))

    # Static neighbor one-hot P[po, k, pi]: output position po's k-th
    # 3x3 tap reads input position pi ('SAME' zero pad -> tap absent).
    P = _np.zeros((P2, 9, P2), _np.float32)
    for po in range(P2):
        ro, co = po // S, po % S
        for k in range(9):
            r_, c_ = ro + k // 3 - 1, co + k % 3 - 1
            if 0 <= r_ < S and 0 <= c_ < S:
                P[po, k, r_ * S + c_] = 1.0
    P = jnp.asarray(P)

    wbs = []
    for name in conv_names:
        kmat = dense[name]["kernel"].astype(jnp.float32)   # [3,3,IC,OC]
        ic, oc = kmat.shape[2], kmat.shape[3]
        k2 = kmat.reshape(9, ic, oc)
        # M[po*OC+oc, pi*IC+ic] = K[k, ic, oc] at the (po, pi) taps.
        M = jnp.einsum("pkq,kio->poqi", P, k2).reshape(
            P2 * oc, P2 * ic)
        b = jnp.tile(dense[name]["bias"].astype(jnp.float32),
                     P2).reshape(-1, 1)
        wbs.append((M, b))

    *hidden_n, logit_n, value_n = dense_names
    for n in hidden_n:
        wbs.append((jnp.transpose(dense[n]["kernel"]).astype(jnp.float32),
                    dense[n]["bias"].astype(jnp.float32)[:, None]))
    wl = jnp.transpose(dense[logit_n]["kernel"]).astype(jnp.float32)
    bl = dense[logit_n]["bias"].astype(jnp.float32)[:, None]
    wv = jnp.transpose(dense[value_n]["kernel"]).astype(jnp.float32)
    bv = dense[value_n]["bias"].astype(jnp.float32)[:, None]
    wh = jnp.concatenate([wl, wv], axis=0)
    bh = jnp.concatenate([bl, bv], axis=0)
    pad = _pad8(wh.shape[0]) - wh.shape[0]
    if pad:
        wh = jnp.pad(wh, ((0, pad), (0, 0)))
        bh = jnp.pad(bh, ((0, pad), (0, 0)))
    return wbs, (wh, bh), len(conv_names), P2 * C


def extract_mlp_weights(params) -> tuple:
    """(hidden (w,b) list, heads (wh, bh)) from ActorCriticMLP params,
    pre-transposed [out, in] for the kernel's W @ X matmuls; the logits
    and value heads are fused into one [6, H] matrix (rows 0-4 logits,
    row 5 value)."""
    dense = params["params"]
    names = sorted(dense.keys(), key=lambda s: int(s.split("_")[1]))
    mats = [(jnp.transpose(dense[n]["kernel"]).astype(jnp.float32),
             dense[n]["bias"].astype(jnp.float32)[:, None])
            for n in names]
    *hidden, (wl, bl), (wv, bv) = mats
    wh = jnp.concatenate([wl, wv], axis=0)        # [6, H]
    bh = jnp.concatenate([bl, bv], axis=0)        # [6, 1]
    # Pad the head rows to a sublane multiple.
    pad = _pad8(wh.shape[0]) - wh.shape[0]
    if pad:
        wh = jnp.pad(wh, ((0, pad), (0, 0)))
        bh = jnp.pad(bh, ((0, pad), (0, 0)))
    return hidden, (wh, bh)


@partial(jax.jit, static_argnums=(0, 3, 5, 6, 7, 8, 9, 10, 11))
def ppo_rollout_pallas(cfg: EnvConfig, params, state: EnvState, T: int,
                       key: jax.Array, block: int = 512,
                       interpret: bool = False,
                       mask_actions: bool = False,
                       shaping_coef: float = 0.0,
                       gamma: float = 0.99,
                       policy_groups: tuple | None = None,
                       arch: str = "mlp"):
    """Run the T-step trained acting phase via the fused kernel.

    Returns ``(new EnvState, ActRollout, reset_key_last uint32[B, 2])``
    — ``reset_key_last`` is the draw the boundary auto-reset must
    consume (same stream as ``env/batch.py step_autoreset_batch``).
    The caller owns the boundary reset and the next-chunk obs.

    ``policy_groups``: static agent -> group tuple; ``params`` is then
    a ``MultiPolicyActorCritic`` tree (one sub-tree per group) and each
    agent's forward uses its group's weights — trace-time selection,
    exactly the one-hot select of ``models/policy.py``. Global-view
    observations are supported (``cfg.global_obs``): the kernel builds
    the [H, W, 5] channel rows of ``ops/obs.py``'s global branch.
    """
    if cfg.auto_reset:
        raise ValueError("act kernel: auto_reset is handled by the caller")
    B = state.agent_pos.shape[0]
    if B % block:
        raise ValueError(f"batch {B} must divide into block {block}")
    if not interpret and block != B and block % 128:
        raise ValueError(
            f"pallas_block={block} must be a multiple of 128 (Mosaic "
            "lane tiling) or equal to the env batch")
    A, R, D = cfg.num_agents, cfg.queue_capacity, cfg.obs_dim
    Dp = _pad8(D)

    if policy_groups is None:
        groups = (0,) * A
        ptrees = [params]
    else:
        if len(policy_groups) != A:
            raise ValueError("policy_groups must have one entry per agent")
        groups = tuple(int(g) for g in policy_groups)
        ptrees = [
            {"params": params["params"][f"policies_{g}"]}
            for g in range(max(groups) + 1)
        ]
    if arch == "cnn":
        ext = [extract_cnn_weights(p, cfg) for p in ptrees]
        gw = [(e[0], e[1]) for e in ext]
        n_relu, cnn_split = ext[0][2], ext[0][3]
    elif arch == "mlp":
        gw = [extract_mlp_weights(p) for p in ptrees]
        n_relu, cnn_split = 0, 0
    else:
        raise ValueError(f"act kernel: unsupported arch {arch!r}")
    n_hidden = len(gw[0][0])

    # Canonical env draw stream [T, B] (identical to the XLA path).
    # Batched draw precompute: bit-identical stream, the T*B draws in
    # one program instead of T sequential scan steps (rng.py).
    final_keys, u, pick, drop, reset_keys = _rng.batched_step_draws(
        state.key, cfg, T)

    # Gumbel stream, same values the XLA sampler draws: per step,
    # key, akey = split(key); g_t = gumbel(akey, [5, B*A]) consumed as
    # the [5, N] transpose of [B, A, 5] logits (ops/ppo_update.py).
    next_key, g = _rng.batched_gumbel_stream(key, T, (5, B * A))
    # [T, 5, B, A] -> [T, A, 5, B] -> padded rows [T*A*8, B].
    g = g.reshape(T, 5, B, A).transpose(0, 3, 1, 2)
    g = jnp.pad(g, ((0, 0), (0, 0), (0, 3), (0, 0)))
    g = g.reshape(T * A * 8, B)

    def bm(x):  # [B, K] -> [K, B] int32
        return jnp.transpose(x).astype(jnp.int32)

    ins = [
        bm(state.agent_pos[:, :, 0]), bm(state.agent_pos[:, :, 1]),
        bm(state.agent_req), bm(state.carrying.astype(jnp.int32)),
        bm(state.req_pickup[:, :, 0]), bm(state.req_pickup[:, :, 1]),
        bm(state.req_drop[:, :, 0]), bm(state.req_drop[:, :, 1]),
        bm(state.req_status), bm(state.req_agent),
        u.astype(jnp.float32), pick.astype(jnp.int32),
        drop.astype(jnp.int32), g,
    ]

    def bspec(rows_):
        return pl.BlockSpec((rows_, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        bspec(A), bspec(A), bspec(A), bspec(A),
        bspec(R), bspec(R), bspec(R), bspec(R), bspec(R), bspec(R),
        bspec(T), bspec(T), bspec(T), bspec(T * A * 8),
    ]
    if shaping_coef > 0.0:
        from ..ops.pathing import distance_table

        tbl = jnp.asarray(distance_table(cfg), jnp.float32)    # [C, C]
        # Boundary flags [T, B] f32: the envelope restricts truncation
        # to the chunk's last step, but compute it generally.
        steps_ahead = (state.t[None, :] + 1
                       + jnp.arange(T, dtype=state.t.dtype)[:, None])
        trunc = (steps_ahead >= cfg.max_steps).astype(jnp.float32)
        ins.extend([tbl, trunc])
        in_specs.extend([wspec(tbl.shape), bspec(T)])
    for hidden, _heads in gw:
        for w, b in hidden:
            ins.extend([w, b])
            in_specs.extend([wspec(w.shape), wspec(b.shape)])
    for _hidden, (wh, bh) in gw:
        ins.extend([wh, bh])
        in_specs.extend([wspec(wh.shape), wspec(bh.shape)])

    out_specs = [
        bspec(A), bspec(A), bspec(A), bspec(A),
        bspec(R), bspec(R), bspec(R), bspec(R), bspec(R), bspec(R),
        bspec(T * A * Dp), bspec(T * A * 16),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((A, B), jnp.int32) for _ in range(4)
    ] + [
        jax.ShapeDtypeStruct((R, B), jnp.int32) for _ in range(6)
    ] + [
        jax.ShapeDtypeStruct((T * A * Dp, B), jnp.float32),
        jax.ShapeDtypeStruct((T * A * 16, B), jnp.float32),
    ]

    # The obs trajectory output block ([T*A*Dp, block] f32) dominates
    # VMEM for MLP configs (default limit is 16M — a T=16 x block=512
    # call needs ~33M); for CNN the unrolled conv matrices can rival it,
    # so count the ACTUAL extracted weight bytes (ADVICE r4) via the
    # same arithmetic the train/ppo.py envelope gate uses.
    weight_bytes = sum(
        int(x.size) * x.dtype.itemsize
        for hidden, heads in gw
        for w, b in (*hidden, heads)
        for x in (w, b))
    if shaping_coef > 0.0:
        weight_bytes += int(tbl.size) * 4     # broadcast distance table
    vmem_bytes = act_vmem_estimate(cfg, T, block, weight_bytes)
    outs = pl.pallas_call(
        partial(_act_kernel, cfg, T, n_hidden, mask_actions,
                shaping_coef, gamma, groups, n_relu, cnn_split),
        grid=(B // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem_bytes, ACT_VMEM_CAP),
        ),
    )(*ins)

    (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
     obs_rows, talp) = outs

    def mb(x):  # [K, B] -> [B, K]
        return jnp.transpose(x)

    new_state = EnvState(
        agent_pos=jnp.stack([mb(p_r), mb(p_c)], axis=-1),
        agent_req=mb(aq),
        carrying=mb(cy).astype(bool),
        req_pickup=jnp.stack([mb(q_pr), mb(q_pc)], axis=-1),
        req_drop=jnp.stack([mb(q_dr), mb(q_dc)], axis=-1),
        req_status=mb(q_st),
        req_agent=mb(q_ag),
        t=state.t + T,
        key=final_keys,
    )

    obs = obs_rows.reshape(T, A, Dp, B)[:, :, :D, :]
    obs = obs.transpose(0, 3, 1, 2)                   # [T, B, A, D]
    talp = talp.reshape(T, A, 16, B).transpose(0, 3, 1, 2)  # [T, B, A, 16]
    action = talp[..., 0].astype(jnp.int32)
    log_prob = talp[..., 1]
    value = talp[..., 2]
    reward = talp[..., 3]
    delivered = talp[..., 4].astype(jnp.int32).sum(-1)     # [T, B]
    if mask_actions:
        mask = talp[..., 5:10] > 0.5
    else:
        mask = jnp.ones((T, B, A, 5), bool)
    raw_reward = talp[..., 10] if shaping_coef > 0.0 else reward
    steps = state.t[None, :] + 1 + jnp.arange(T, dtype=state.t.dtype)[:, None]
    truncated = steps >= cfg.max_steps                     # [T, B]

    roll = ActRollout(obs=obs, action=action, log_prob=log_prob,
                      value=value, reward=reward, delivered=delivered,
                      truncated=truncated, mask=mask,
                      raw_reward=raw_reward, obs_bm=obs_rows)
    return new_state, roll, reset_keys[-1], next_key
