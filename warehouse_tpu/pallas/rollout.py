"""Fused greedy-rollout Pallas kernel.

One kernel runs the ENTIRE T-step greedy-baseline rollout for a block of
envs with all state resident in VMEM: zero HBM round-trips between steps
and perfect (8, 128) lane tiling because every array is laid out
entity-major/batch-minor ([A, B] / [R, B]). The canonical random draws
(docs/SEMANTICS.md §9) are precomputed OUTSIDE the kernel with
``warehouse_tpu.rng`` and streamed in, so trajectories remain bit-exact
against the XLA engine (verified in tests/test_pallas.py) — the kernel
changes the schedule, never the semantics.

Mosaic notes: the step state is held as batch-minor PLANES ([A, B]
agent rows, [R, B] request rows — round-5 vectorization, docs/RESULTS
r5): request-slot scans run as single plane ops on 8-sublane vreg
tiles, with one-hot reads as masked sums and first/nearest-slot scans
as sublane min-reductions (exact original tie rules). Indexed updates
of [A, B] values would lower to TPU `scatter` (unimplemented in
Mosaic), so every plane update is a full-plane ``where`` against a
static-iota mask; only the genuinely per-pair movement rules run on
[1, B] row slices.

Restrictions: ``auto_reset`` is not supported in-kernel (roll ≤
max_steps, or reset outside); the policy is the greedy baseline (the PPO
path keeps the XLA engine where the NN forward belongs on the MXU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EnvConfig
from ..env.state import EnvState
from .. import rng as _rng

EMPTY, PENDING, IN_TRANSIT = 0, 1, 2
STAY, UP, DOWN, LEFT, RIGHT = 0, 1, 2, 3, 4


def _rows(plane, n):
    """[n, B] plane -> tuple of [1, B] row views (static slices)."""
    return tuple(plane[i:i + 1, :] for i in range(n))


def _onehot_read(m, plane):
    """Select ``plane[r]`` rows by the one-hot [R, B] mask ``m``
    (exactly one true row per lane where any): a masked sum — exact
    for ints and a single-term sum for floats, identical to the
    sequential ``where`` chain it replaces."""
    return jnp.sum(jnp.where(m, plane, 0), axis=0, keepdims=True)


def env_tick(cfg: EnvConfig, p_r, p_c, aq, cy,
             q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
             act, u, spick, sdrop):
    """One env tick on batch-minor planes ([A, B] agent rows /
    [R, B] request rows), given per-agent action rows — the movement →
    pickup → delivery → spawn → assignment sub-step sequence of
    ``engine.step`` (docs/SEMANTICS.md §4–§8), shared by the greedy
    kernel below and the act-phase kernels (``pallas/act.py``).
    Bit-exactness vs the XLA engine is guarded by tests/test_pallas.py
    through the greedy kernel.

    Round-5 vectorization (docs/RESULTS.md r5 roofline): all R-loops
    over request slots run as single [R, B]-plane ops (one 8-sublane
    vreg tile at R = 8) — one-hot reads become masked sums, the
    spawn's first-EMPTY-slot scan and the assignment's
    nearest-PENDING argmin become sublane min-reductions with the
    exact original tie rules (strict < keeps the lowest r). The
    pairwise movement rules (A ≤ 8 agents) stay row-granular — their
    logic is genuinely per-pair. Indexed [., B]-value updates would
    lower to TPU scatter (unimplemented in Mosaic); every plane
    update here is a full-plane ``where`` against a static-iota mask.

    Returns the new planes plus ``(picked, delivered, collided)`` as
    [A, B] int32 0/1 planes for the caller's reward accounting (bool
    rows cannot be concatenated on Mosaic — mask-register cast).
    """
    A, R, H, W = (cfg.num_agents, cfg.queue_capacity, cfg.height,
                  cfg.width)
    BIGI = jnp.int32(1 << 30)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, q_st.shape[-1]), 0)

    # ---- movement rules 1-4 (§4): per-pair logic on [1, B] rows -----
    p_r_rows, p_c_rows = _rows(p_r, A), _rows(p_c, A)
    prop_r, prop_c, moving = [], [], []
    for i in range(A):
        a = act[i]
        dr = jnp.where(a == UP, -1, jnp.where(a == DOWN, 1, 0))
        dc = jnp.where(a == LEFT, -1, jnp.where(a == RIGHT, 1, 0))
        pr = p_r_rows[i] + dr
        pc_ = p_c_rows[i] + dc
        mv = (a != STAY) & (pr >= 0) & (pr < H) & (pc_ >= 0) & (pc_ < W)
        for wcell in cfg.walls:  # static unrolled wall checks (§1a)
            mv = mv & ~((pr == wcell // W) & (pc_ == wcell % W))
        prop_r.append(jnp.where(mv, pr, p_r_rows[i]))
        prop_c.append(jnp.where(mv, pc_, p_c_rows[i]))
        moving.append(mv)

    # rule 2: same target — lowest index wins.
    for i in range(1, A):
        lost = jnp.zeros_like(moving[i])
        for j in range(i):
            lost = lost | (
                moving[i] & moving[j]
                & (prop_r[i] == prop_r[j]) & (prop_c[i] == prop_c[j])
            )
        moving[i] = moving[i] & ~lost
        prop_r[i] = jnp.where(moving[i], prop_r[i], p_r_rows[i])
        prop_c[i] = jnp.where(moving[i], prop_c[i], p_c_rows[i])
    # rule 3: swaps — both revert.
    swap = [jnp.zeros_like(moving[i]) for i in range(A)]
    for i in range(A):
        for j in range(i + 1, A):
            sw = (
                moving[i] & moving[j]
                & (prop_r[i] == p_r_rows[j]) & (prop_c[i] == p_c_rows[j])
                & (prop_r[j] == p_r_rows[i]) & (prop_c[j] == p_c_rows[i])
            )
            swap[i] = swap[i] | sw
            swap[j] = swap[j] | sw
    for i in range(A):
        moving[i] = moving[i] & ~swap[i]
        prop_r[i] = jnp.where(moving[i], prop_r[i], p_r_rows[i])
        prop_c[i] = jnp.where(moving[i], prop_c[i], p_c_rows[i])
    # rule 4: blocked-cell fixed point, A passes.
    for _ in range(A):
        for i in range(A):
            b = jnp.zeros_like(moving[i])
            for j in range(A):
                if j == i:
                    continue
                b = b | (
                    moving[i] & ~moving[j]
                    & (prop_r[i] == prop_r[j])
                    & (prop_c[i] == prop_c[j])
                )
            # In-pass updates are fine: reverts only propagate.
            moving[i] = moving[i] & ~b
            prop_r[i] = jnp.where(moving[i], prop_r[i], p_r_rows[i])
            prop_c[i] = jnp.where(moving[i], prop_c[i], p_c_rows[i])
    # Bool [1, B] rows cannot be concatenated on Mosaic (mask-register
    # cast) — the [A, B] result planes are int32 0/1.
    collided = jnp.concatenate(
        [((act[i] != STAY) & ~moving[i]).astype(jnp.int32)
         for i in range(A)], axis=0)
    p_r = jnp.concatenate(prop_r, axis=0)            # [A, B]
    p_c = jnp.concatenate(prop_c, axis=0)

    # ---- pickup (§5): one-hot plane reads of my request cells -------
    aq_rows = _rows(aq, A)
    cy_rows = _rows(cy, A)
    picked_rows = []
    for i in range(A):
        m = aq_rows[i] == r_iota                      # [R, B] one-hot
        my_st = _onehot_read(m, q_st)
        tpr = _onehot_read(m, q_pr)
        tpc = _onehot_read(m, q_pc)
        pk = (
            (aq_rows[i] >= 0) & (cy_rows[i] == 0) & (my_st == PENDING)
            & (p_r[i:i + 1, :] == tpr) & (p_c[i:i + 1, :] == tpc)
        )
        picked_rows.append(pk)
    picked = jnp.concatenate(
        [pk.astype(jnp.int32) for pk in picked_rows], axis=0)  # [A, B]
    cy = jnp.where(picked != 0, 1, cy)
    sp = jnp.zeros_like(r_iota, jnp.bool_)
    for i in range(A):
        sp = sp | (picked_rows[i] & (aq_rows[i] == r_iota))
    q_st = jnp.where(sp, IN_TRANSIT, q_st)

    # ---- delivery (§5): reads the POST-pickup carry flags -----------
    delivered_rows = []
    for i in range(A):
        m = aq_rows[i] == r_iota
        tdr = _onehot_read(m, q_dr)
        tdc = _onehot_read(m, q_dc)
        dl = (
            (aq_rows[i] >= 0) & (cy[i:i + 1, :] != 0)
            & (p_r[i:i + 1, :] == tdr) & (p_c[i:i + 1, :] == tdc)
        )
        delivered_rows.append(dl)
    delivered = jnp.concatenate(
        [dl.astype(jnp.int32) for dl in delivered_rows], axis=0)
    sd = jnp.zeros_like(r_iota, jnp.bool_)
    for i in range(A):
        sd = sd | (delivered_rows[i] & (aq_rows[i] == r_iota))
    q_st = jnp.where(sd, EMPTY, q_st)
    q_ag = jnp.where(sd, -1, q_ag)
    q_pr = jnp.where(sd, 0, q_pr)
    q_pc = jnp.where(sd, 0, q_pc)
    q_dr = jnp.where(sd, 0, q_dr)
    q_dc = jnp.where(sd, 0, q_dc)
    aq = jnp.where(delivered != 0, -1, aq)
    cy = jnp.where(delivered != 0, 0, cy)

    # ---- spawn (§6): lowest-index EMPTY slot via min-reduction ------
    ok = u < cfg.spawn_prob                           # [1, B]
    first_empty = jnp.min(
        jnp.where(q_st == EMPTY, r_iota, BIGI), axis=0, keepdims=True)
    w = ok & (r_iota == first_empty)                  # [R, B]
    q_pr = jnp.where(w, spick // W, q_pr)
    q_pc = jnp.where(w, spick % W, q_pc)
    q_dr = jnp.where(w, sdrop // W, q_dr)
    q_dc = jnp.where(w, sdrop % W, q_dc)
    q_st = jnp.where(w, PENDING, q_st)
    q_ag = jnp.where(w, -1, q_ag)

    # ---- assignment (§7): nearest-PENDING argmin per agent ----------
    # Sequential over agents ON PURPOSE: agent i's take updates q_ag
    # before agent i+1 scans (the §7 priority order). Ties at equal
    # distance keep the LOWEST r — the min-reduction over the
    # equal-to-best mask reproduces the original strict-< scan.
    aq_out = []
    for i in range(A):
        need = aq[i:i + 1, :] < 0
        avail = (q_st == PENDING) & (q_ag < 0)
        d = (jnp.abs(p_r[i:i + 1, :] - q_pr)
             + jnp.abs(p_c[i:i + 1, :] - q_pc))
        dm = jnp.where(avail, d, BIGI)
        best_d = jnp.min(dm, axis=0, keepdims=True)
        best_r = jnp.min(
            jnp.where(dm == best_d, r_iota, BIGI), axis=0,
            keepdims=True)
        take = need & (best_d < BIGI)
        aq_out.append(jnp.where(take, best_r, aq[i:i + 1, :]))
        q_ag = jnp.where(take & (r_iota == best_r), i, q_ag)
    aq = jnp.concatenate(aq_out, axis=0)

    return (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
            picked, delivered, collided)


def env_tick_rows(cfg: EnvConfig, p_r, p_c, aq, cy,
             q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
             act, u, spick, sdrop):
    """One env tick on batch-minor [1, B] ROW LISTS (the plane-free
    variant) — kept for the greedy kernel, where the measured
    plane version is ~18% SLOWER (docs/RESULTS.md r5: the tick is
    the whole kernel there, and the plane form pays cross-sublane
    slices/concats/min-reductions that the act kernels amortize
    but the bare tick does not). Given per-agent
    actions — the movement → pickup → delivery → spawn → assignment
    sub-step sequence of ``engine.step`` (docs/SEMANTICS.md §4–§8),
    shared by the greedy kernel below and the act-phase PPO kernel
    (``pallas/act.py``). Bit-exactness vs the XLA engine is guarded by
    tests/test_pallas.py through the greedy kernel.

    Returns ``(p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
    picked, delivered, collided)`` — the last three are per-agent [1, B]
    bool lists for the caller's reward accounting.
    """
    A, R, H, W = (cfg.num_agents, cfg.queue_capacity, cfg.height,
                  cfg.width)
    p_r, p_c, aq, cy = list(p_r), list(p_c), list(aq), list(cy)
    q_pr, q_pc = list(q_pr), list(q_pc)
    q_dr, q_dc = list(q_dr), list(q_dc)
    q_st, q_ag = list(q_st), list(q_ag)

    # ---- movement rules 1-4 (§4) ------------------------------------
    prop_r, prop_c, moving = [], [], []
    for i in range(A):
        a = act[i]
        dr = jnp.where(a == UP, -1, jnp.where(a == DOWN, 1, 0))
        dc = jnp.where(a == LEFT, -1, jnp.where(a == RIGHT, 1, 0))
        pr = p_r[i] + dr
        pc_ = p_c[i] + dc
        mv = (a != STAY) & (pr >= 0) & (pr < H) & (pc_ >= 0) & (pc_ < W)
        for wcell in cfg.walls:  # static unrolled wall checks (§1a)
            mv = mv & ~((pr == wcell // W) & (pc_ == wcell % W))
        prop_r.append(jnp.where(mv, pr, p_r[i]))
        prop_c.append(jnp.where(mv, pc_, p_c[i]))
        moving.append(mv)

    # rule 2: same target — lowest index wins.
    for i in range(1, A):
        lost = jnp.zeros_like(moving[i])
        for j in range(i):
            lost = lost | (
                moving[i] & moving[j]
                & (prop_r[i] == prop_r[j]) & (prop_c[i] == prop_c[j])
            )
        moving[i] = moving[i] & ~lost
        prop_r[i] = jnp.where(moving[i], prop_r[i], p_r[i])
        prop_c[i] = jnp.where(moving[i], prop_c[i], p_c[i])
    # rule 3: swaps — both revert.
    swap = [jnp.zeros_like(moving[i]) for i in range(A)]
    for i in range(A):
        for j in range(i + 1, A):
            sw = (
                moving[i] & moving[j]
                & (prop_r[i] == p_r[j]) & (prop_c[i] == p_c[j])
                & (prop_r[j] == p_r[i]) & (prop_c[j] == p_c[i])
            )
            swap[i] = swap[i] | sw
            swap[j] = swap[j] | sw
    for i in range(A):
        moving[i] = moving[i] & ~swap[i]
        prop_r[i] = jnp.where(moving[i], prop_r[i], p_r[i])
        prop_c[i] = jnp.where(moving[i], prop_c[i], p_c[i])
    # rule 4: blocked-cell fixed point, A passes.
    for _ in range(A):
        for i in range(A):
            b = jnp.zeros_like(moving[i])
            for j in range(A):
                if j == i:
                    continue
                b = b | (
                    moving[i] & ~moving[j]
                    & (prop_r[i] == prop_r[j])
                    & (prop_c[i] == prop_c[j])
                )
            # In-pass updates are fine: reverts only propagate.
            moving[i] = moving[i] & ~b
            prop_r[i] = jnp.where(moving[i], prop_r[i], p_r[i])
            prop_c[i] = jnp.where(moving[i], prop_c[i], p_c[i])
    collided = [(act[i] != STAY) & ~moving[i] for i in range(A)]
    p_r, p_c = prop_r, prop_c

    # ---- pickup (§5): one-hot reads of my request cells -------------
    picked = []
    for i in range(A):
        has_i = aq[i] >= 0
        my_st = jnp.zeros_like(aq[i])
        tpr = jnp.zeros_like(p_r[i])
        tpc = jnp.zeros_like(p_r[i])
        for r in range(R):
            m = aq[i] == r
            my_st = jnp.where(m, q_st[r], my_st)
            tpr = jnp.where(m, q_pr[r], tpr)
            tpc = jnp.where(m, q_pc[r], tpc)
        pk = (
            has_i & (cy[i] == 0) & (my_st == PENDING)
            & (p_r[i] == tpr) & (p_c[i] == tpc)
        )
        picked.append(pk)
        cy[i] = jnp.where(pk, 1, cy[i])
    for r in range(R):
        sp = jnp.zeros_like(picked[0])
        for i in range(A):
            sp = sp | (picked[i] & (aq[i] == r))
        q_st[r] = jnp.where(sp, IN_TRANSIT, q_st[r])

    # ---- delivery (§5) ----------------------------------------------
    delivered = []
    for i in range(A):
        has_i = aq[i] >= 0
        tdr = jnp.zeros_like(p_r[i])
        tdc = jnp.zeros_like(p_r[i])
        for r in range(R):
            m = aq[i] == r
            tdr = jnp.where(m, q_dr[r], tdr)
            tdc = jnp.where(m, q_dc[r], tdc)
        dl = (
            has_i & (cy[i] != 0)
            & (p_r[i] == tdr) & (p_c[i] == tdc)
        )
        delivered.append(dl)
    for r in range(R):
        sd = jnp.zeros_like(delivered[0])
        for i in range(A):
            sd = sd | (delivered[i] & (aq[i] == r))
        q_st[r] = jnp.where(sd, EMPTY, q_st[r])
        q_ag[r] = jnp.where(sd, -1, q_ag[r])
        q_pr[r] = jnp.where(sd, 0, q_pr[r])
        q_pc[r] = jnp.where(sd, 0, q_pc[r])
        q_dr[r] = jnp.where(sd, 0, q_dr[r])
        q_dc[r] = jnp.where(sd, 0, q_dc[r])
    for i in range(A):
        aq[i] = jnp.where(delivered[i], -1, aq[i])
        cy[i] = jnp.where(delivered[i], 0, cy[i])

    # ---- spawn (§6): lowest-index EMPTY slot -------------------------
    ok = u < cfg.spawn_prob
    sp_r = spick // W
    sp_c = spick % W
    sd_r = sdrop // W
    sd_c = sdrop % W
    taken = jnp.zeros_like(ok)
    for r in range(R):
        w = ok & ~taken & (q_st[r] == EMPTY)
        q_pr[r] = jnp.where(w, sp_r, q_pr[r])
        q_pc[r] = jnp.where(w, sp_c, q_pc[r])
        q_dr[r] = jnp.where(w, sd_r, q_dr[r])
        q_dc[r] = jnp.where(w, sd_c, q_dc[r])
        q_st[r] = jnp.where(w, PENDING, q_st[r])
        q_ag[r] = jnp.where(w, -1, q_ag[r])
        taken = taken | w

    # ---- assignment (§7) ---------------------------------------------
    BIG = jnp.int32(1 << 30)
    for i in range(A):
        need = aq[i] < 0
        best_d = jnp.full_like(q_st[0], BIG)
        best_r = jnp.full_like(q_st[0], -1)
        for r in range(R):
            avail = (q_st[r] == PENDING) & (q_ag[r] < 0)
            d = (jnp.abs(p_r[i] - q_pr[r])
                 + jnp.abs(p_c[i] - q_pc[r]))
            better = avail & (d < best_d)  # strict <: lowest r ties
            best_d = jnp.where(better, d, best_d)
            best_r = jnp.where(better, r, best_r)
        take = need & (best_r >= 0)
        aq[i] = jnp.where(take, best_r, aq[i])
        for r in range(R):
            q_ag[r] = jnp.where(take & (best_r == r), i, q_ag[r])

    return (tuple(p_r), tuple(p_c), tuple(aq), tuple(cy),
            tuple(q_pr), tuple(q_pc), tuple(q_dr), tuple(q_dc),
            tuple(q_st), tuple(q_ag), picked, delivered, collided)


def _kernel(cfg: EnvConfig, T: int,
            pos_r, pos_c, areq, carry,
            rp_r, rp_c, rd_r, rd_c, rstat, ragent,
            u_ref, pick_ref, drop_ref,
            o_pos_r, o_pos_c, o_areq, o_carry,
            o_rp_r, o_rp_c, o_rd_r, o_rd_c, o_rstat, o_ragent,
            o_deliv, o_rew):
    A, R, H, W = (cfg.num_agents, cfg.queue_capacity, cfg.height,
                  cfg.width)

    def rows(ref, n):
        return tuple(ref[i:i + 1, :] for i in range(n))

    state0 = (
        rows(pos_r, A), rows(pos_c, A), rows(areq, A), rows(carry, A),
        rows(rp_r, R), rows(rp_c, R), rows(rd_r, R), rows(rd_c, R),
        rows(rstat, R), rows(ragent, R),
        jnp.zeros_like(o_deliv[:]),
        jnp.zeros_like(o_rew[:]),
    )

    def step(t, s):
        (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
         deliv, rew) = s

        u = u_ref[pl.ds(t, 1), :]          # [1, B]
        spick = pick_ref[pl.ds(t, 1), :]
        sdrop = drop_ref[pl.ds(t, 1), :]

        # ---- greedy actions (§12): one-hot read of my request cells ---
        act = []
        for i in range(A):
            tpr = jnp.zeros_like(p_r[i])
            tpc = jnp.zeros_like(p_r[i])
            tdr = jnp.zeros_like(p_r[i])
            tdc = jnp.zeros_like(p_r[i])
            for r in range(R):
                m = aq[i] == r
                tpr = jnp.where(m, q_pr[r], tpr)
                tpc = jnp.where(m, q_pc[r], tpc)
                tdr = jnp.where(m, q_dr[r], tdr)
                tdc = jnp.where(m, q_dc[r], tdc)
            has_i = aq[i] >= 0
            tgt_r = jnp.where(cy[i] != 0, tdr, tpr)
            tgt_c = jnp.where(cy[i] != 0, tdc, tpc)
            drow = tgt_r - p_r[i]
            dcol = tgt_c - p_c[i]
            vert = jnp.where(drow < 0, UP, DOWN)
            horiz = jnp.where(dcol < 0, LEFT, RIGHT)
            a = jnp.where(drow != 0, vert,
                          jnp.where(dcol != 0, horiz, STAY))
            act.append(jnp.where(has_i, a, STAY))

        # ---- shared env dynamics (§4–§7) -------------------------------
        (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
         picked, delivered, collided) = env_tick_rows(
            cfg, p_r, p_c, aq, cy,
            q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
            act, u, spick, sdrop)

        # ---- accounting (§8) ------------------------------------------
        n_pick = jnp.zeros_like(rew)
        n_del = jnp.zeros_like(rew)
        n_col = jnp.zeros_like(rew)
        d_cnt = jnp.zeros_like(deliv)
        for i in range(A):
            n_pick = n_pick + picked[i].astype(jnp.float32)
            n_del = n_del + delivered[i].astype(jnp.float32)
            n_col = n_col + collided[i].astype(jnp.float32)
            d_cnt = d_cnt + delivered[i].astype(jnp.int32)
        deliv = deliv + d_cnt
        rew = rew + (
            cfg.step_penalty * A
            + cfg.pickup_reward * n_pick
            + cfg.delivery_reward * n_del
            + cfg.collision_penalty * n_col
        )

        return (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc,
                q_st, q_ag, deliv, rew)

    out = jax.lax.fori_loop(0, T, step, state0)
    (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
     deliv, rew) = out
    o_pos_r[:] = jnp.concatenate(p_r, axis=0)
    o_pos_c[:] = jnp.concatenate(p_c, axis=0)
    o_areq[:] = jnp.concatenate(aq, axis=0)
    o_carry[:] = jnp.concatenate(cy, axis=0)
    o_rp_r[:] = jnp.concatenate(q_pr, axis=0)
    o_rp_c[:] = jnp.concatenate(q_pc, axis=0)
    o_rd_r[:] = jnp.concatenate(q_dr, axis=0)
    o_rd_c[:] = jnp.concatenate(q_dc, axis=0)
    o_rstat[:] = jnp.concatenate(q_st, axis=0)
    o_ragent[:] = jnp.concatenate(q_ag, axis=0)
    o_deliv[:] = deliv
    o_rew[:] = rew


@partial(jax.jit, static_argnums=(0, 2, 3, 4))
def greedy_rollout_pallas(cfg: EnvConfig, state: EnvState, T: int,
                          block: int = 512, interpret: bool = False):
    """Run T greedy steps for a [B]-batched EnvState via the fused kernel.

    Returns (new EnvState, delivered_count int32[B], reward_sum f32[B])
    — bit-identical trajectories to scanning ``engine.step`` with the
    greedy policy (auto_reset must be off and T ≤ remaining max_steps
    for truncation-free equivalence).
    """
    if cfg.auto_reset:
        raise ValueError("pallas rollout does not support auto_reset")
    B = state.agent_pos.shape[0]
    if B % block:
        raise ValueError(f"batch {B} must divide into block {block}")

    # Precompute the canonical draw stream [T, B] (threefry outside the
    # kernel, exactly as engine.step would consume it; batched —
    # bit-identical, one program for the T*B draws, rng.py).
    final_keys, u, pick, drop, _rk = _rng.batched_step_draws(
        state.key, cfg, T)

    # Batch-minor layout for perfect lane tiling.
    def bm(x):  # [B, K] -> [K, B] int32
        return jnp.transpose(x).astype(jnp.int32)

    ins = (
        bm(state.agent_pos[:, :, 0]), bm(state.agent_pos[:, :, 1]),
        bm(state.agent_req), bm(state.carrying.astype(jnp.int32)),
        bm(state.req_pickup[:, :, 0]), bm(state.req_pickup[:, :, 1]),
        bm(state.req_drop[:, :, 0]), bm(state.req_drop[:, :, 1]),
        bm(state.req_status), bm(state.req_agent),
        u.astype(jnp.float32), pick.astype(jnp.int32),
        drop.astype(jnp.int32),
    )

    A, R = cfg.num_agents, cfg.queue_capacity
    grid = (B // block,)

    def bspec(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    in_specs = [
        bspec(A), bspec(A), bspec(A), bspec(A),
        bspec(R), bspec(R), bspec(R), bspec(R), bspec(R), bspec(R),
        bspec(T), bspec(T), bspec(T),
    ]
    out_specs = [
        bspec(A), bspec(A), bspec(A), bspec(A),
        bspec(R), bspec(R), bspec(R), bspec(R), bspec(R), bspec(R),
        bspec(1), bspec(1),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((A, B), jnp.int32) for _ in range(4)
    ] + [
        jax.ShapeDtypeStruct((R, B), jnp.int32) for _ in range(6)
    ] + [
        jax.ShapeDtypeStruct((1, B), jnp.int32),
        jax.ShapeDtypeStruct((1, B), jnp.float32),
    ]

    outs = pl.pallas_call(
        partial(_kernel, cfg, T),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*ins)

    (p_r, p_c, aq, cy, q_pr, q_pc, q_dr, q_dc, q_st, q_ag,
     deliv, rew) = outs

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
    return new_state, deliv[0], rew[0]
