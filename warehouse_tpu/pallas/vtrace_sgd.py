"""Fused IMPALA V-trace learner kernel (round-4, VERDICT r3 item 3).

Round-4 decomposition (benchmarks/ab_impala.py, interleaved
floor-calibrated): the IMPALA update at BASELINE config 4 costs
6.59 ms of which the all-XLA learner phase — ``impala_passes x
num_minibatches`` grad steps of (flat MLP forward, V-trace reverse
scan, backward, clip+RMSProp) — is 1.91 ms, measured exactly as
t(passes=2) - t(passes=1). This module fuses that whole phase into ONE
``pallas_call`` following the pallas/sgd.py pattern, with params and
optimizer moments VMEM-resident across all steps and zero-copy obs
from the act kernel.

Differences from the PPO kernel that make this one SIMPLER and WIDER:

- IMPALA minibatches are FIXED contiguous env slices (train/impala.py
  reshapes, never permutes), exactly the kernel's env-column ranges —
  no composition caveat at all;
- there is no epoch shuffle and no KL penalty; passes re-visit the
  same slices;
- the feed-forward has no T recurrence, so the WHOLE env block's
  (t, a) slots are concatenated along the lane axis and each layer is
  ONE matmul at width T*A*blk (8192 lanes at T=16, A=4, blk=128) —
  the best MXU shape in the repo;
- only V-trace itself is sequential: a reverse T-loop of elementwise
  row ops on [1, A*blk] slices (statically unrolled), between the
  forward and the backward;
- the optimizer is IMPALA's canonical RMSProp (Espeholt et al. 2018
  §4) — replicated EXACTLY from optax ``scale_by_rms`` (nu only,
  eps inside the sqrt, no bias correction) — with in-kernel
  ``clip_by_global_norm``; Adam (``impala_rmsprop=False``) reuses the
  shared ``_clip_adam_step``.

Fields layout (FIELD_ROWS=16 rows per (t, a) slot): 0 action,
1 behavior_log_prob, 2 reward, 3 done (1.0/0.0), 4 zero,
5..5+n_act-1 action-validity mask, rest zero.

Scope (train/impala.py gates): ActorCriticMLP, float32, shared policy,
``bootstrap_truncated=False``, ``flat_optimizer=False``,
``micro_batches=1`` (block accumulation IS micro-batching). Multi-
device: ``impala_minibatch_grads_pallas`` emits per-minibatch grads
for the XLA ``pmean`` + optimizer, composing with ``shard_map``.

Reference anchor: replaces RLlib's IMPALA learner update
(SURVEY.md C12/L1 [API] — reference mount empty, see SURVEY.md §0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .act import _pad8
from .sgd import (
    FIELD_ROWS,
    _clip_adam_step,
    _flat_tensors,
    _unflat_tensors,
    find_adam_state,
    rebuild_opt_state,
    resolve_block_envs,
)

NEG_INF = -1e9
HEAD_ROWS = 8


def _clip_rms_step(p_scr, v_scr, g_scr, lr, decay, eps, max_grad_norm):
    """In-kernel ``optax.chain(clip_by_global_norm, rmsprop)`` EXACTLY
    (optax scale_by_rms defaults: eps inside the sqrt, no bias
    correction, no momentum): nu <- decay*nu + (1-decay)*g²;
    p -= lr * g * rsqrt(nu + eps). Mutates scratch refs in place."""
    gs = [g[...] for g in g_scr]
    ss = jnp.float32(0.0)
    for g in gs:
        ss = ss + jnp.sum(g * g)
    norm = jnp.sqrt(ss)
    trigger = norm < max_grad_norm
    for k in range(len(p_scr)):
        g = gs[k]
        g = jnp.where(trigger, g, (g / norm) * max_grad_norm)
        nu_new = decay * v_scr[k][...] + (1.0 - decay) * (g * g)
        v_scr[k][...] = nu_new
        p_scr[k][...] = p_scr[k][...] - lr * g * jax.lax.rsqrt(
            nu_new + eps)


def find_rms_state(opt_state):
    """Locate the ScaleByRmsState inside an
    ``optax.chain(clip_by_global_norm, rmsprop)`` state. Returns nu."""
    found = []

    def rec(node):
        if isinstance(node, optax.ScaleByRmsState):
            found.append(node)
        elif isinstance(node, tuple):
            for c in node:
                rec(c)

    rec(opt_state)
    if len(found) != 1:
        raise ValueError(
            f"expected exactly one ScaleByRmsState, found {len(found)}"
            " — the fused IMPALA kernel supports "
            "optax.chain(clip_by_global_norm, rmsprop) (or adam)")
    return found[0].nu


def rebuild_rms_state(opt_state, new_nu, n_steps: int):
    """New opt_state with the RMS second moment replaced and any
    ``count`` fields (LR schedule) advanced by ``n_steps``."""

    def rec(node):
        if isinstance(node, optax.ScaleByRmsState):
            return node._replace(nu=new_nu)
        if hasattr(node, "_fields") and "count" in node._fields:
            return node._replace(count=node.count + n_steps)
        if isinstance(node, tuple):
            mapped = tuple(rec(c) for c in node)
            return type(node)(*mapped) if hasattr(node, "_fields") \
                else mapped
        return node

    return rec(opt_state)


def _learner_block(n_hidden, D, n_act, T, A, blkB, gamma, rho_clip,
                   c_clip, value_coef, mask_act, ent_coef, inv_n,
                   mm_dtype, obs_ref, f_ref, lobs_ref, p_list, g_accum,
                   macc_add):
    """One env-block's full IMPALA learner step contribution.

    Forward all T*A slots as lane-concatenated big matmuls, V-trace
    reverse loop on [1, A*blkB] row slices, backward big matmuls.
    ``g_accum(k, g)`` accumulates grads; ``macc_add(r, row [1, blkB])``
    accumulates metric rows (0 lp*pg_adv, 1 (v-vs)², 2 entropy).
    """
    Dp = _pad8(D)
    TA = T * A
    NW = A * blkB                       # per-t column width
    hidden = [(p_list[2 * li], p_list[2 * li + 1])
              for li in range(n_hidden)]
    wh, bh = p_list[-2], p_list[-1]

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a.astype(mm_dtype), b.astype(mm_dtype), dims,
            preferred_element_type=jnp.float32)

    WX = (((1,), (0,)), ((), ()))
    DYX = (((1,), (1,)), ((), ()))
    WTDY = (((0,), (0,)), ((), ()))

    # ---------------- forward: whole block as one wide batch ---------
    X = jnp.concatenate(
        [obs_ref[pl.ds(s * Dp, Dp), :] for s in range(TA)], axis=1)
    F = jnp.concatenate(
        [f_ref[pl.ds(s * FIELD_ROWS, FIELD_ROWS), :]
         for s in range(TA)], axis=1)

    h = X[:D, :]
    hs = []
    for w, b in hidden:
        h = jnp.tanh(dot(w, h, WX) + b)
        hs.append(h)
    out = dot(wh, h, WX) + bh                       # [8, TA*blkB]

    # Last-state value V(s_T) per (a, env): [Dp * A] rows -> [1, NW].
    Xl = jnp.concatenate(
        [lobs_ref[pl.ds(i * Dp, Dp), :] for i in range(A)], axis=1)
    hl = Xl[:D, :]
    for w, b in hidden:
        hl = jnp.tanh(dot(w, hl, WX) + b)
    last_v = (dot(wh, hl, WX) + bh)[n_act:n_act + 1, :]   # [1, NW]

    logit = [out[r:r + 1, :] for r in range(n_act)]
    if mask_act:
        valid = [F[5 + r:6 + r, :] for r in range(n_act)]
        logit = [jnp.where(valid[r] > 0.5, logit[r],
                           jnp.float32(NEG_INF))
                 for r in range(n_act)]
    v = out[n_act:n_act + 1, :]

    mx = logit[0]
    for r in range(1, n_act):
        mx = jnp.maximum(mx, logit[r])
    ssum = jnp.zeros_like(mx)
    for r in range(n_act):
        ssum = ssum + jnp.exp(logit[r] - mx)
    lse = mx + jnp.log(ssum)
    logp = [logit[r] - lse for r in range(n_act)]
    p = [jnp.exp(lp_) for lp_ in logp]

    a = F[0:1, :]
    onehot = [(a == float(r)).astype(jnp.float32)
              for r in range(n_act)]
    lp = jnp.zeros_like(mx)
    for r in range(n_act):
        lp = lp + onehot[r] * logp[r]
    ent = jnp.zeros_like(mx)
    for r in range(n_act):
        ent = ent - p[r] * logp[r]

    # ---------------- V-trace (ops/vtrace.py, statically unrolled) ---
    def tcol(row, t):                   # [1, TA*blkB] -> t's [1, NW]
        return row[:, t * NW:(t + 1) * NW]

    b_lp = F[1:2, :]
    rew = F[2:3, :]
    done = F[3:4, :]
    rho = jnp.exp(lp - b_lp)
    clipped_rho = jnp.minimum(rho, rho_clip)
    cs = jnp.minimum(rho, c_clip)

    vs_rows = [None] * T
    acc = jnp.zeros((1, NW), jnp.float32)
    for t in range(T - 1, -1, -1):
        v_t = tcol(v, t)
        nd = 1.0 - tcol(done, t)
        v_next = tcol(v, t + 1) if t + 1 < T else last_v
        v_next = nd * v_next          # boundary cuts the bootstrap
        delta = tcol(clipped_rho, t) * (
            tcol(rew, t) + gamma * v_next - v_t)
        acc = delta + gamma * nd * tcol(cs, t) * acc
        vs_rows[t] = v_t + acc
    pg_rows = [None] * T
    for t in range(T):
        nd = 1.0 - tcol(done, t)
        vs_next = vs_rows[t + 1] if t + 1 < T else last_v
        vs_next = nd * vs_next
        pg_rows[t] = tcol(clipped_rho, t) * (
            tcol(rew, t) + gamma * vs_next - tcol(v, t))
    vs = jnp.concatenate(vs_rows, axis=1)           # [1, TA*blkB]
    pg_adv = jnp.concatenate(pg_rows, axis=1)

    # ---------------- loss grads to the head output ------------------
    # total = -(lp*pg_adv).mean() + vcoef*0.5*((v-vs)²).mean()
    #         - ent_coef*ent.mean();  vs/pg_adv are stop-grad.
    d_lp = -pg_adv * inv_n
    d_logit = [
        d_lp * (onehot[r] - p[r]) + ent_coef * inv_n * p[r]
        * (logp[r] + ent)
        for r in range(n_act)
    ]
    if mask_act:
        d_logit = [d_logit[r] * valid[r] for r in range(n_act)]
    d_v = value_coef * inv_n * (v - vs)
    n_pad = HEAD_ROWS - n_act - 1
    d_out = jnp.concatenate(
        d_logit + [d_v] + [jnp.zeros_like(d_v)] * n_pad, axis=0)

    # Metric rows (sums over lanes taken by the wrapper).
    verr = v - vs
    mrows = (lp * pg_adv, verr * verr, ent)
    for ridx, row in enumerate(mrows):
        accm = row[:, 0:blkB]
        for sidx in range(1, TA):
            accm = accm + row[:, sidx * blkB:(sidx + 1) * blkB]
        macc_add(ridx, accm)

    # ---------------- backward ---------------------------------------
    h_last = hs[-1]
    g_accum(len(p_list) - 2, dot(d_out, h_last, DYX))
    g_accum(len(p_list) - 1, jnp.sum(d_out, axis=1, keepdims=True))
    dh = dot(wh, d_out, WTDY)
    for li in range(n_hidden - 1, -1, -1):
        h_li = hs[li]
        dz = dh * (1.0 - h_li * h_li)
        prev = X[:D, :] if li == 0 else hs[li - 1]
        g_accum(2 * li, dot(dz, prev, DYX))
        g_accum(2 * li + 1, jnp.sum(dz, axis=1, keepdims=True))
        if li > 0:
            dh = dot(hidden[li][0], dz, WTDY)


def _impala_kernel(n_hidden: int, D: int, n_act: int, T: int, A: int,
                   nbe: int, n_steps: int, mb_n: int, blkB: int,
                   gamma: float, rho_clip: float, c_clip: float,
                   value_coef: float, max_grad_norm: float,
                   use_rms: bool, decay_or_b1: float, b2: float,
                   eps: float, mask_act: bool, mm_dtype, *refs):
    """Fused IMPALA learner phase; grid = (n_steps, nbe).

    refs: scal_steps SMEM [n_steps, 4] (lr, 1-b1^t, 1-b2^t, 0 — bias
    corrections unused for RMSProp), scal_glob SMEM [1, 4] (ent_coef),
    obs block, fields block, last_obs block [A*Dp, blkB], then params
    (+ mu if adam) + nu in, same out, metrics out; scratch mirrors.
    """
    n_t = 2 * n_hidden + 2
    n_m = 0 if use_rms else n_t         # first-moment tensors (adam)
    it = iter(refs)
    scal_steps = next(it)
    scal_glob = next(it)
    obs_ref = next(it)
    f_ref = next(it)
    lobs_ref = next(it)
    p_in = [next(it) for _ in range(n_t)]
    m_in = [next(it) for _ in range(n_m)]
    v_in = [next(it) for _ in range(n_t)]
    p_out = [next(it) for _ in range(n_t)]
    m_out = [next(it) for _ in range(n_m)]
    v_out = [next(it) for _ in range(n_t)]
    met_out = next(it)
    p_scr = [next(it) for _ in range(n_t)]
    m_scr = [next(it) for _ in range(n_m)]
    v_scr = [next(it) for _ in range(n_t)]
    g_scr = [next(it) for _ in range(n_t)]
    macc = next(it)

    s = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((s == 0) & (j == 0))
    def _load():
        for dst, src in zip(p_scr + m_scr + v_scr,
                            p_in + m_in + v_in):
            dst[...] = src[...]

    @pl.when(j == 0)
    def _zero():
        for g in g_scr:
            g[...] = jnp.zeros(g.shape, jnp.float32)
        macc[...] = jnp.zeros(macc.shape, jnp.float32)

    def g_accum(k, g):
        g_scr[k][...] += g

    def macc_add(r, row):
        macc[r:r + 1, :] += row

    _learner_block(
        n_hidden, D, n_act, T, A, blkB, gamma, rho_clip, c_clip,
        value_coef, mask_act, scal_glob[0, 0],
        jnp.float32(1.0 / mb_n), mm_dtype, obs_ref, f_ref, lobs_ref,
        [p[...] for p in p_scr], g_accum, macc_add)

    @pl.when(j == nbe - 1)
    def _opt_step():
        if use_rms:
            _clip_rms_step(p_scr, v_scr, g_scr, scal_steps[s, 0],
                           decay_or_b1, eps, max_grad_norm)
        else:
            _clip_adam_step(p_scr, m_scr, v_scr, g_scr,
                            scal_steps[s, 0], scal_steps[s, 1],
                            scal_steps[s, 2], decay_or_b1, b2, eps,
                            max_grad_norm)
        met_out[...] = macc[...]

    @pl.when((s == n_steps - 1) & (j == nbe - 1))
    def _store():
        for dst, src in zip(p_out + m_out + v_out,
                            p_scr + m_scr + v_scr):
            dst[...] = src[...]


def _grads_impala_kernel(n_hidden: int, D: int, n_act: int, T: int,
                         A: int, nbe: int, mb_n: int, blkB: int,
                         gamma: float, rho_clip: float, c_clip: float,
                         value_coef: float, mask_act: bool, mm_dtype,
                         *refs):
    """Single-minibatch IMPALA grads; grid = (nbe,). Multi-device
    variant (grads leave the kernel for the pmean)."""
    n_t = 2 * n_hidden + 2
    it = iter(refs)
    scal_glob = next(it)
    obs_ref = next(it)
    f_ref = next(it)
    lobs_ref = next(it)
    p_in = [next(it) for _ in range(n_t)]
    g_out = [next(it) for _ in range(n_t)]
    met_out = next(it)

    j = pl.program_id(0)

    @pl.when(j == 0)
    def _zero():
        for g in g_out:
            g[...] = jnp.zeros(g.shape, jnp.float32)
        met_out[...] = jnp.zeros(met_out.shape, jnp.float32)

    def g_accum(k, g):
        g_out[k][...] += g

    def macc_add(r, row):
        met_out[r:r + 1, :] += row

    _learner_block(
        n_hidden, D, n_act, T, A, blkB, gamma, rho_clip, c_clip,
        value_coef, mask_act, scal_glob[0, 0],
        jnp.float32(1.0 / mb_n), mm_dtype, obs_ref, f_ref, lobs_ref,
        [p[...] for p in p_in], g_accum, macc_add)


def pack_impala_fields(action, behavior_lp, reward, done, mask,
                       num_actions: int):
    """[T, B, A] tensors -> IMPALA fields [T*A*FIELD_ROWS, B] (module
    docstring layout)."""
    T, B, A = action.shape

    def row_ta(x):
        return x.transpose(0, 2, 1).reshape(T * A, B)

    frows = [row_ta(action.astype(jnp.float32)), row_ta(behavior_lp),
             row_ta(reward), row_ta(done.astype(jnp.float32)),
             jnp.zeros((T * A, B), jnp.float32)]
    for r in range(num_actions):
        frows.append(row_ta(mask[..., r].astype(jnp.float32)))
    frows += [jnp.zeros((T * A, B), jnp.float32)] * (
        FIELD_ROWS - len(frows))
    return jnp.stack(frows, axis=1).reshape(T * A * FIELD_ROWS, B)


def pack_last_obs(last_obs, obs_dim: int):
    """[B, A, D] -> [A*Dp, B] agent-major rows."""
    B, A, D = last_obs.shape
    Dp = _pad8(obs_dim)
    return jnp.pad(last_obs.transpose(1, 2, 0),
                   ((0, 0), (0, Dp - D), (0, 0))).reshape(A * Dp, B)


def _impala_common(params, obs_bm, obs_dim, num_minibatches,
                   unroll_length, num_agents, block_envs, interpret):
    ta_dp, B = obs_bm.shape
    Dp = _pad8(obs_dim)
    M = num_minibatches
    if B % M:
        raise ValueError(f"B={B} not divisible by {M} minibatches")
    mbB = B // M
    blkB = resolve_block_envs(mbB, B, block_envs, interpret,
                              kind="IMPALA")
    nbe = mbB // blkB
    mb_n = mbB * unroll_length * num_agents
    p_list = _flat_tensors(params)
    n_hidden = (len(p_list) - 2) // 2
    names = sorted(params["params"].keys(),
                   key=lambda s: int(s.split("_")[1]))
    n_act = params["params"][names[-2]]["kernel"].shape[1]
    return B, Dp, M, mbB, blkB, nbe, mb_n, p_list, n_hidden, n_act


def impala_sgd_phase_pallas(
    params, opt_state, obs_bm, fields, last_obs_rows, lr_row, bc1_row,
    bc2_row, ent_coef, *,
    num_passes: int, num_minibatches: int, unroll_length: int,
    num_agents: int, gamma: float, rho_clip: float, c_clip: float,
    value_coef: float, max_grad_norm: float, mask_actions: bool,
    obs_dim: int, use_rms: bool = True, block_envs: int = 256,
    rms_decay: float = 0.99, b1: float = 0.9, b2: float = 0.999,
    eps: float = 0.1, matmul_dtype: str = "float32",
    interpret: bool = False,
):
    """Run the ENTIRE IMPALA learner phase in one fused kernel.

    ``obs_bm [T*A*Dp, B]`` (zero-copy from the act kernel), ``fields``
    (``pack_impala_fields``), ``last_obs_rows [A*Dp, B]``
    (``pack_last_obs``); minibatch m = env columns; optimizer steps =
    ``num_passes * num_minibatches`` (passes revisit the same fixed
    slices, exactly train/impala.py's cadence).

    Returns ``(new_params, new_opt_state, losses)`` with ``losses`` =
    (total, pg, v, ent) arrays of shape [num_passes, M].
    """
    T, A = unroll_length, num_agents
    (B, Dp, M, mbB, blkB, nbe, mb_n, p_list, n_hidden,
     n_act) = _impala_common(params, obs_bm, obs_dim, num_minibatches,
                             T, A, block_envs, interpret)
    n_steps = num_passes * M

    if use_rms:
        nu = find_rms_state(opt_state)
        m_list = []
    else:
        _c, mu, nu = find_adam_state(opt_state)
        m_list = _flat_tensors(mu)
    v_list = _flat_tensors(nu)
    n_t = len(p_list)

    scal_steps = jnp.stack(
        [lr_row, bc1_row, bc2_row, jnp.zeros_like(lr_row)], axis=1)
    scal_glob = jnp.stack([
        jnp.asarray(ent_coef, jnp.float32), jnp.float32(0.0),
        jnp.float32(0.0), jnp.float32(0.0)]).reshape(1, 4)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda s, j: (0, 0),
                            memory_space=pltpu.VMEM)

    def colspec(rows):
        return pl.BlockSpec(
            (rows, blkB), lambda s, j: (0, (s % M) * nbe + j),
            memory_space=pltpu.VMEM)

    met_spec = pl.BlockSpec((8, blkB), lambda s, j: (s, 0),
                            memory_space=pltpu.VMEM)

    pv = p_list + m_list + v_list
    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM),
         pl.BlockSpec(memory_space=pltpu.SMEM),
         colspec(T * A * Dp), colspec(T * A * FIELD_ROWS),
         colspec(A * Dp)]
        + [wspec(t.shape) for t in pv]
    )
    out_specs = [wspec(t.shape) for t in pv] + [met_spec]
    out_shape = (
        [jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in pv]
        + [jax.ShapeDtypeStruct((n_steps * 8, blkB), jnp.float32)]
    )
    scratch = (
        [pltpu.VMEM(t.shape, jnp.float32) for t in pv + p_list]
        + [pltpu.VMEM((8, blkB), jnp.float32)]
    )

    outs = pl.pallas_call(
        partial(_impala_kernel, n_hidden, obs_dim, n_act, T, A, nbe,
                n_steps, mb_n, blkB, gamma, rho_clip, c_clip,
                value_coef, max_grad_norm, use_rms,
                rms_decay if use_rms else b1, b2, eps, mask_actions,
                jnp.dtype(matmul_dtype)),
        grid=(n_steps, nbe),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(scal_steps, scal_glob, obs_bm, fields, last_obs_rows, *pv)

    new_p = _unflat_tensors(outs[:n_t], params)
    if use_rms:
        new_nu = _unflat_tensors(outs[n_t:2 * n_t], params)
        new_opt = rebuild_rms_state(opt_state, new_nu, n_steps)
        met = outs[2 * n_t]
    else:
        new_mu = _unflat_tensors(outs[n_t:2 * n_t], params)
        new_nu = _unflat_tensors(outs[2 * n_t:3 * n_t], params)
        new_opt = rebuild_opt_state(opt_state, new_mu, new_nu, n_steps)
        met = outs[3 * n_t]

    sums = met.reshape(num_passes, M, 8, blkB).sum(axis=-1)
    pg_loss = -sums[..., 0] / mb_n
    v_loss = 0.5 * sums[..., 1] / mb_n
    entropy = sums[..., 2] / mb_n
    total = pg_loss + value_coef * v_loss - ent_coef * entropy
    return new_p, new_opt, (total, pg_loss, v_loss, entropy)


def impala_minibatch_grads_pallas(
    params, obs_bm, fields, last_obs_rows, mb_idx: int, ent_coef, *,
    num_minibatches: int, unroll_length: int, num_agents: int,
    gamma: float, rho_clip: float, c_clip: float, value_coef: float,
    mask_actions: bool, obs_dim: int, block_envs: int = 256,
    matmul_dtype: str = "float32", interpret: bool = False,
):
    """One minibatch's exact V-trace loss + gradient (multi-device
    variant). Returns ``((total, (pg, v, ent)), grads_pytree)``."""
    T, A = unroll_length, num_agents
    (B, Dp, M, mbB, blkB, nbe, mb_n, p_list, n_hidden,
     n_act) = _impala_common(params, obs_bm, obs_dim, num_minibatches,
                             T, A, block_envs, interpret)
    n_t = len(p_list)

    scal_glob = jnp.stack([
        jnp.asarray(ent_coef, jnp.float32), jnp.float32(0.0),
        jnp.float32(0.0), jnp.float32(0.0)]).reshape(1, 4)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda j: (0, 0),
                            memory_space=pltpu.VMEM)

    def colspec(rows):
        return pl.BlockSpec(
            (rows, blkB), lambda j: (0, mb_idx * nbe + j),
            memory_space=pltpu.VMEM)

    met_spec = pl.BlockSpec((8, blkB), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM),
                 colspec(T * A * Dp), colspec(T * A * FIELD_ROWS),
                 colspec(A * Dp)]
                + [wspec(t.shape) for t in p_list])
    out_specs = [wspec(t.shape) for t in p_list] + [met_spec]
    out_shape = ([jax.ShapeDtypeStruct(t.shape, jnp.float32)
                  for t in p_list]
                 + [jax.ShapeDtypeStruct((8, blkB), jnp.float32)])

    outs = pl.pallas_call(
        partial(_grads_impala_kernel, n_hidden, obs_dim, n_act, T, A,
                nbe, mb_n, blkB, gamma, rho_clip, c_clip, value_coef,
                mask_actions, jnp.dtype(matmul_dtype)),
        grid=(nbe,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(scal_glob, obs_bm, fields, last_obs_rows, *p_list)

    grads = _unflat_tensors(outs[:n_t], params)
    sums = outs[n_t].sum(axis=-1)
    pg_loss = -sums[0] / mb_n
    v_loss = 0.5 * sums[1] / mb_n
    entropy = sums[2] / mb_n
    total = pg_loss + value_coef * v_loss - ent_coef * entropy
    return (total, (pg_loss, v_loss, entropy)), grads
