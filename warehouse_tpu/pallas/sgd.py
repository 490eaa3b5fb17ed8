"""Fused PPO SGD-phase Pallas kernel (round-3 rewrite of pallas/grad.py).

The round-2 fused loss+backward kernel was numerically right but ~1.8 ms
SLOWER than XLA's fwd+bwd (docs/RESULTS.md session 3b). Its own
post-mortem named three taxes: a [N, D] -> [D, N] obs transpose per call
that XLA cannot fuse into the kernel (~28 MB x 16/update), 16 separate
pallas_call launches per update, and MXU K underfill. This module kills
the first two BY CONSTRUCTION and goes further: the ENTIRE SGD phase —
``ppo_epochs`` x ``num_minibatches`` optimizer steps, each a full
clipped-PPO loss + hand-derived backward + global-norm clip + Adam
update — runs as ONE ``pallas_call``, with params and Adam moments
resident in VMEM for the whole phase.

Zero-copy obs: the kernel consumes the act-phase kernel's trajectory
output (``pallas/act.py`` o_obs, layout ``[T*A*Dp, B]`` batch-minor)
DIRECTLY via BlockSpec index maps — no transpose, no gather, no
minibatch materialization. Minibatches are CONTIGUOUS env-column ranges;
the trainer randomizes composition by permuting the env axis of the
*environment state* once per update before the rollout ("shuffle the
envs, not the data" — distributionally identical to the round-2
``minibatch_mode="env"`` + ``epoch_shuffle="once"`` permutation gather,
since env slots are exchangeable; curve proof in docs/RESULTS.md).

Per optimizer step s (grid dim 0; minibatch ``s % M`` of epoch
``s // M``), the grid's inner dim streams the minibatch's obs/field
blocks from HBM (auto double-buffered) while gradients accumulate in
VMEM scratch; at the last block the kernel applies the EXACT
``optax.chain(clip_by_global_norm, adam)`` update — same formulas, same
tie rules, bias corrections precomputed per step — to the VMEM-resident
params. Loss/backward math is the round-2 kernel's (jax.grad tie
conventions for min/max/clip, epoch-0 exact surrogate ties), extended
with in-kernel action masking (the mask rides in the fields rows).

Scope (the trainer gates on this): ActorCriticMLP, float32, shared
policy, ``epoch_shuffle="once"`` composition, ``flat_optimizer=False``,
``micro_batches=1`` (block accumulation IS micro-batching), advantages
pre-normalized per minibatch. Action masking IS supported (unlike the
round-2 kernel). Multi-device: ``ppo_minibatch_grads_pallas`` runs the
same body per minibatch (grads out, optimizer in XLA after the
``pmean``) so the fast path composes with ``shard_map``.

Reference anchor: replaces RLlib ``Policy.learn_on_batch`` /
``Learner.update`` minibatch SGD (SURVEY.md §3.1 — reference mount
empty, see SURVEY.md §0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .act import _pad8, extract_mlp_weights

NEG_INF = -1e9          # masked-logit floor (ops/ppo_update.py)

# Fields-array row layout per (t, a) slot (16 rows, 8-aligned like the
# act kernel's talp): 0 action, 1 old_log_prob, 2 old_value,
# 3 advantage (pre-normalized per minibatch), 4 target, 5-9 action
# validity mask (1.0/0.0), 10-15 zero padding.
FIELD_ROWS = 16


def _loss_and_dout(n_act, clip_eps, value_coef, mask_act,
                   ent_coef, kl_coeff, inv_n, out, f, head_rows):
    """Clipped-PPO loss chain + d(mean loss)/d(head output).

    ``out [>=n_act+1, N]`` raw head outputs (rows 0..n_act-1 logits,
    row n_act value), ``f [16, N]`` fields rows (FIELD_ROWS layout).
    Returns ``(d_out [head_rows, N], metric_rows)`` — the loss chain
    and tie conventions documented on ``_block_grads`` (this IS that
    kernel's math, factored out so the recurrent sequence-replay
    kernel in ``sgd_rnn.py`` shares it verbatim).
    """
    logit = [out[r:r + 1, :] for r in range(n_act)]
    if mask_act:
        valid = [f[5 + r:6 + r, :] for r in range(n_act)]   # 1.0/0.0
        logit = [jnp.where(valid[r] > 0.5, logit[r],
                           jnp.float32(NEG_INF))
                 for r in range(n_act)]
    v = out[n_act:n_act + 1, :]

    # ---------------- loss chain ------------------------------------
    mx = logit[0]
    for r in range(1, n_act):
        mx = jnp.maximum(mx, logit[r])
    ssum = jnp.zeros_like(mx)
    for r in range(n_act):
        ssum = ssum + jnp.exp(logit[r] - mx)
    lse = mx + jnp.log(ssum)
    logp = [logit[r] - lse for r in range(n_act)]
    p = [jnp.exp(lp_) for lp_ in logp]

    a = f[0:1, :]
    onehot = [(a == float(r)).astype(jnp.float32) for r in range(n_act)]
    lp = jnp.zeros_like(mx)
    for r in range(n_act):
        lp = lp + onehot[r] * logp[r]

    old_lp = f[1:2, :]
    old_v = f[2:3, :]
    adv = f[3:4, :]
    tgt = f[4:5, :]

    ratio = jnp.exp(lp - old_lp)
    r_clip = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
    pg1 = ratio * adv
    pg2 = r_clip * adv
    min_pg = jnp.minimum(pg1, pg2)

    v_err = v - tgt
    v_clipped = old_v + jnp.clip(v - old_v, -clip_eps, clip_eps)
    vc_err = v_clipped - tgt
    sq1 = v_err * v_err
    sq2 = vc_err * vc_err
    sq_max = jnp.maximum(sq1, sq2)

    ent = jnp.zeros_like(mx)
    for r in range(n_act):
        ent = ent - p[r] * logp[r]

    # Metric rows kept lane-shaped ([1, N]) — the kernel accumulates
    # them row-wise (no scalar VMEM writes); the wrapper sums lanes.
    metric_rows = (min_pg, sq_max, ent, old_lp - lp)

    # ---------------- backward to the head output -------------------
    use1 = (pg1 <= pg2).astype(jnp.float32)
    inclip = ((ratio >= 1.0 - clip_eps)
              & (ratio <= 1.0 + clip_eps)).astype(jnp.float32)
    sel = use1 + (1.0 - use1) * inclip
    d_lp = -(adv * ratio * sel + kl_coeff) * inv_n

    d_logit = [
        d_lp * (onehot[r] - p[r]) + ent_coef * inv_n * p[r]
        * (logp[r] + ent)
        for r in range(n_act)
    ]
    if mask_act:
        # Forward floored invalid logits via where(valid, z, -1e9);
        # its gradient selects: d z = d z_masked * valid.
        d_logit = [d_logit[r] * valid[r] for r in range(n_act)]
    usem = (sq1 >= sq2).astype(jnp.float32)
    invc = ((v - old_v >= -clip_eps)
            & (v - old_v <= clip_eps)).astype(jnp.float32)
    d_v = value_coef * inv_n * (usem * v_err
                                + (1.0 - usem) * vc_err * invc)

    n_pad = head_rows - n_act - 1
    d_out = jnp.concatenate(
        d_logit + [d_v] + [jnp.zeros_like(d_v)] * n_pad, axis=0)
    return d_out, metric_rows


def _block_grads(D, n_act, clip_eps, value_coef, mask_act,
                 ent_coef, kl_coeff, inv_n, x, f, weights,
                 mm_dtype=jnp.float32):
    """Loss gradient contribution of one sample block.

    ``x [Dp, N]`` obs rows (rows >= D ignored), ``f [16, N]`` fields
    rows, ``weights = (hidden [(w, b), ...], (wh, bh))`` CURRENT values.
    Returns ``(dhidden [(dw, db), ...], dwh, dbh, metric_sums [4])`` —
    grads are d(mean-loss over the minibatch)/dW restricted to this
    block (summing blocks gives the exact minibatch gradient);
    metric_sums are per-sample sums of (min_pg, sq_max, entropy, kl).

    Tie handling: at branch ties the kernel routes the full gradient to
    the FIRST argument (``use1 = pg1 <= pg2``), while ``jax.grad``
    splits min/max ties 0.5/0.5 (balanced_eq). The two coincide
    numerically at the load-bearing epoch-0 ties because there
    ratio == 1 puts both surrogate branches inside the clip interval
    with IDENTICAL local derivatives — first-arg vs 0.5/0.5 of equal
    branches is the same number. They differ only in the measure-zero
    case of a tie exactly at the clip boundary. ``jnp.clip``'s boundary
    gradient is 1 on both paths (the ``inclip``/``invc`` >=/<= bounds
    replicate it).

    ``mm_dtype=jnp.bfloat16`` runs every matmul's operands in bf16 with
    f32 accumulation (TrainConfig.model_dtype="bfloat16") — the MXU's
    native precision, exactly the tradeoff XLA's bf16-torso Dense makes;
    the loss chain, grad accumulation, and Adam all stay f32.
    """
    hidden, (wh, bh) = weights

    def dot(a, bmat, dims):
        return jax.lax.dot_general(
            a.astype(mm_dtype), bmat.astype(mm_dtype), dims,
            preferred_element_type=jnp.float32)

    # ---------------- forward (activations stay live in VMEM) --------
    h = x[:D, :]
    hs = []
    xin = h
    for w, b in hidden:
        z = dot(w, h, (((1,), (0,)), ((), ()))) + b
        h = jnp.tanh(z)
        hs.append(h)
    out = dot(wh, h, (((1,), (0,)), ((), ()))) + bh         # [8, N]

    d_out, metric_rows = _loss_and_dout(
        n_act, clip_eps, value_coef, mask_act, ent_coef, kl_coeff,
        inv_n, out, f, wh.shape[0])

    h_last = hs[-1]
    dwh = dot(d_out, h_last, (((1,), (1,)), ((), ())))
    dbh = jnp.sum(d_out, axis=1, keepdims=True)

    dh = dot(wh, d_out, (((0,), (0,)), ((), ())))

    dhidden = [None] * len(hidden)
    for li in range(len(hidden) - 1, -1, -1):
        h_li = hs[li]
        dz = dh * (1.0 - h_li * h_li)
        prev = xin if li == 0 else hs[li - 1]
        dw = dot(dz, prev, (((1,), (1,)), ((), ())))
        db = jnp.sum(dz, axis=1, keepdims=True)
        dhidden[li] = (dw, db)
        if li > 0:
            dh = dot(hidden[li][0], dz, (((0,), (0,)), ((), ())))
    return dhidden, dwh, dbh, metric_rows


def _clip_adam_step(p_scr, m_scr, v_scr, g_scr, lr, bc1, bc2,
                    b1, b2, eps, max_grad_norm):
    """In-kernel ``optax.chain(clip_by_global_norm, adam)`` EXACTLY:
    clip scale = select(norm < max, 1, (g / norm) * max); adam with
    precomputed bias corrections ``bc1/bc2``; update = -lr * mhat /
    (sqrt(vhat) + eps). Mutates the p/m/v scratch refs in place.
    Shared by the MLP phase kernel here and the recurrent
    sequence-replay kernel (sgd_rnn.py)."""
    gs = [g[...] for g in g_scr]
    ss = jnp.float32(0.0)
    for g in gs:
        ss = ss + jnp.sum(g * g)
    norm = jnp.sqrt(ss)
    trigger = norm < max_grad_norm
    for k in range(len(p_scr)):
        g = gs[k]
        g = jnp.where(trigger, g, (g / norm) * max_grad_norm)
        m_new = b1 * m_scr[k][...] + (1.0 - b1) * g
        v_new = b2 * v_scr[k][...] + (1.0 - b2) * (g * g)
        m_scr[k][...] = m_new
        v_scr[k][...] = v_new
        upd = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
        p_scr[k][...] = p_scr[k][...] - lr * upd


def _slot_sweep(n_hidden, D, n_act, k_ta, clip_eps, value_coef,
                mask_act, ent_coef, kl_coeff, inv_n, mm_dtype, groups,
                K, npg, obs_ref, f_ref, weights_g, g_accum, macc):
    """Sweep the block's k_ta (t, a) slots through ``_block_grads``.

    Single-policy (K == 1): the slots are CONCATENATED along the lane
    axis and swept as ONE ``_block_grads`` call — every layer matmul
    runs at width k_ta*blkB (8192 lanes at defaults) instead of k_ta
    narrow ones (the round-4 lane-concat pattern measured on the fused
    IMPALA learner, docs/RESULTS.md r4). Multi-policy: per-slot loop
    with trace-time group routing (slot % A), unchanged.
    ``g_accum(k, g)`` accumulates grad tensor k; metric rows fold into
    ``macc`` per blkB chunk.
    """
    Dp = _pad8(D)
    blkB = macc.shape[1]

    def add_rows(rows, width):
        for r, row in enumerate(rows):
            acc = row[:, 0:blkB]
            for c in range(1, width // blkB):
                acc = acc + row[:, c * blkB:(c + 1) * blkB]
            macc[r:r + 1, :] += acc

    if K == 1:
        x = jnp.concatenate(
            [obs_ref[s * Dp:(s + 1) * Dp, :] for s in range(k_ta)],
            axis=1)
        f = jnp.concatenate(
            [f_ref[s * FIELD_ROWS:(s + 1) * FIELD_ROWS, :]
             for s in range(k_ta)], axis=1)
        dhidden, dwh, dbh, rows = _block_grads(
            D, n_act, clip_eps, value_coef, mask_act,
            ent_coef, kl_coeff, inv_n, x, f, weights_g[0], mm_dtype)
        for li, (dw, db) in enumerate(dhidden):
            g_accum(2 * li, dw)
            g_accum(2 * li + 1, db)
        g_accum(npg - 2, dwh)
        g_accum(npg - 1, dbh)
        add_rows(rows, k_ta * blkB)
        return

    for slot in range(k_ta):
        g = groups[slot % len(groups)]
        off = g * npg
        x = obs_ref[slot * Dp:(slot + 1) * Dp, :]
        f = f_ref[slot * FIELD_ROWS:(slot + 1) * FIELD_ROWS, :]
        dhidden, dwh, dbh, rows = _block_grads(
            D, n_act, clip_eps, value_coef, mask_act,
            ent_coef, kl_coeff, inv_n, x, f, weights_g[g], mm_dtype)
        for li, (dw, db) in enumerate(dhidden):
            g_accum(off + 2 * li, dw)
            g_accum(off + 2 * li + 1, db)
        g_accum(off + npg - 2, dwh)
        g_accum(off + npg - 1, dbh)
        add_rows(rows, blkB)


def _sgd_kernel(n_hidden: int, D: int, n_act: int, k_ta: int,
                nbe: int, n_blk: int, n_steps: int, mb_n: int,
                clip_eps: float, value_coef: float,
                max_grad_norm: float, b1: float, b2: float, eps: float,
                mask_act: bool, mm_dtype, groups: tuple, *refs):
    """Fused-phase kernel body; grid = (n_steps, n_blk).

    refs: scal_steps SMEM [n_steps, 4] (lr, 1-b1^t, 1-b2^t, 0),
    scal_glob SMEM [1, 4] (ent_coef, kl_coeff, 0, 0),
    obs block [k_ta*Dp, blkB], fields block [k_ta*16, blkB],
    params in (w, b per hidden + wh, bh) PER POLICY GROUP, m in (same),
    v in (same), outs: params, m, v (same shapes), metrics block
    [8, blkB] of per-lane partial sums (wrapper sums lanes);
    scratch: p/m/v/g working copies (same shapes) + macc [8, blkB].

    ``groups``: static agent -> policy-group map (RLlib
    policy_mapping_fn parity, same convention as pallas/act.py). With
    k_ta a multiple of len(groups), a block slot's agent index is
    ``slot % len(groups)`` (rows are (t, a)-slot-major), so weight
    selection and per-group grad routing are resolved at trace time.
    The global-norm clip spans ALL groups' grads — exactly the XLA
    path's optax chain over the full MultiPolicy tree.
    """
    npg = 2 * n_hidden + 2              # tensors per policy group
    K = max(groups) + 1
    n_t = K * npg
    it = iter(refs)
    scal_steps = next(it)
    scal_glob = next(it)
    obs_ref = next(it)
    f_ref = next(it)
    p_in = [next(it) for _ in range(n_t)]
    m_in = [next(it) for _ in range(n_t)]
    v_in = [next(it) for _ in range(n_t)]
    p_out = [next(it) for _ in range(n_t)]
    m_out = [next(it) for _ in range(n_t)]
    v_out = [next(it) for _ in range(n_t)]
    met_out = next(it)
    p_scr = [next(it) for _ in range(n_t)]
    m_scr = [next(it) for _ in range(n_t)]
    v_scr = [next(it) for _ in range(n_t)]
    g_scr = [next(it) for _ in range(n_t)]
    macc = next(it)

    s = pl.program_id(0)
    j = pl.program_id(1)
    Dp = _pad8(D)

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

    ent_coef = scal_glob[0, 0]
    kl_coeff = scal_glob[0, 1]
    inv_n = jnp.float32(1.0 / mb_n)

    def weights_of(tensors, g):
        off = g * npg
        hidden = [(tensors[off + 2 * li][...],
                   tensors[off + 2 * li + 1][...])
                  for li in range(n_hidden)]
        return (hidden, (tensors[off + npg - 2][...],
                         tensors[off + npg - 1][...]))

    weights_g = [weights_of(p_scr, g) for g in range(K)]

    def g_accum(k, g):
        g_scr[k][...] += g

    _slot_sweep(n_hidden, D, n_act, k_ta, clip_eps, value_coef,
                mask_act, ent_coef, kl_coeff, inv_n, mm_dtype, groups,
                K, npg, obs_ref, f_ref, weights_g, g_accum, macc)

    @pl.when(j == n_blk - 1)
    def _opt_step():
        _clip_adam_step(p_scr, m_scr, v_scr, g_scr,
                        scal_steps[s, 0], scal_steps[s, 1],
                        scal_steps[s, 2], b1, b2, eps, max_grad_norm)
        met_out[...] = macc[...]

    @pl.when((s == n_steps - 1) & (j == n_blk - 1))
    def _store():
        for dst, src in zip(p_out + m_out + v_out,
                            p_scr + m_scr + v_scr):
            dst[...] = src[...]


def _grads_kernel(n_hidden: int, D: int, n_act: int, k_ta: int,
                  n_blk: int, mb_n: int, clip_eps: float,
                  value_coef: float, mask_act: bool, mm_dtype,
                  groups: tuple, *refs):
    """Single-minibatch grads kernel body; grid = (n_blk,).

    The multi-device variant: grads leave the kernel so XLA can
    ``pmean`` them across data shards before the optimizer step.
    refs: scal_glob SMEM [1, 4], obs block, fields block, params
    (w, b ... wh, bh) PER POLICY GROUP, outs: grads (same shapes) +
    metrics [8, blkB] of per-lane partial sums (wrapper sums lanes).
    ``groups``: see ``_sgd_kernel``.
    """
    npg = 2 * n_hidden + 2
    K = max(groups) + 1
    n_t = K * npg
    it = iter(refs)
    scal_glob = next(it)
    obs_ref = next(it)
    f_ref = next(it)
    p_in = [next(it) for _ in range(n_t)]
    g_out = [next(it) for _ in range(n_t)]
    met_out = next(it)

    j = pl.program_id(0)
    Dp = _pad8(D)

    @pl.when(j == 0)
    def _zero():
        for g in g_out:
            g[...] = jnp.zeros(g.shape, jnp.float32)
        met_out[...] = jnp.zeros(met_out.shape, jnp.float32)

    ent_coef = scal_glob[0, 0]
    kl_coeff = scal_glob[0, 1]
    inv_n = jnp.float32(1.0 / mb_n)

    def weights_of(g):
        off = g * npg
        hidden = [(p_in[off + 2 * li][...],
                   p_in[off + 2 * li + 1][...])
                  for li in range(n_hidden)]
        return (hidden, (p_in[off + npg - 2][...],
                         p_in[off + npg - 1][...]))

    weights_g = [weights_of(g) for g in range(K)]

    def g_accum(k, g):
        g_out[k][...] += g

    _slot_sweep(n_hidden, D, n_act, k_ta, clip_eps, value_coef,
                mask_act, ent_coef, kl_coeff, inv_n, mm_dtype, groups,
                K, npg, obs_ref, f_ref, weights_g, g_accum, met_out)


# --------------------------------------------------------------------
# Layout helpers: flax params/moments pytree <-> kernel tensor list
# --------------------------------------------------------------------

def _flat_tensors(tree):
    """ActorCriticMLP params-structured pytree -> kernel tensor list
    [w0, b0, w1, b1, ..., wh, bh] with kernels pre-transposed [out, in]
    and the logits/value heads fused+padded (extract_mlp_weights).
    MultiPolicyActorCritic trees (``policies_g`` sub-trees, the RLlib
    policy_mapping_fn capability) flatten each group's tensors in
    group order: [g0 tensors..., g1 tensors..., ...]."""
    if "policies_0" in tree["params"]:
        out = []
        for g in range(len(tree["params"])):
            out.extend(_flat_tensors(
                {"params": tree["params"][f"policies_{g}"]}))
        return out
    hidden, (wh, bh) = extract_mlp_weights(tree)
    out = []
    for w, b in hidden:
        out.extend([w, b])
    out.extend([wh, bh])
    return out


def _unflat_tensors(tensors, template):
    """Inverse of ``_flat_tensors``: kernel tensor list -> pytree with
    ``template``'s structure (dict or FrozenDict; single- or
    multi-policy)."""
    import flax

    if "policies_0" in template["params"]:
        K = len(template["params"])
        npg = len(tensors) // K
        tree = {"params": {}}
        for g in range(K):
            sub = _unflat_tensors(
                tensors[g * npg:(g + 1) * npg],
                {"params": dict(template["params"][f"policies_{g}"])})
            tree["params"][f"policies_{g}"] = sub["params"]
        if isinstance(template, flax.core.FrozenDict):
            tree = flax.core.freeze(tree)
        return tree

    dense = template["params"]
    names = sorted(dense.keys(), key=lambda s: int(s.split("_")[1]))
    n_act = dense[names[-2]]["kernel"].shape[1]
    tree = {"params": {}}
    for i, name in enumerate(names[:-2]):
        w, b = tensors[2 * i], tensors[2 * i + 1]
        tree["params"][name] = {"kernel": jnp.transpose(w),
                                "bias": b[:, 0]}
    wh, bh = tensors[-2], tensors[-1]
    tree["params"][names[-2]] = {
        "kernel": jnp.transpose(wh[:n_act, :]), "bias": bh[:n_act, 0]}
    tree["params"][names[-1]] = {
        "kernel": jnp.transpose(wh[n_act:n_act + 1, :]),
        "bias": bh[n_act:n_act + 1, 0]}
    if isinstance(template, flax.core.FrozenDict):
        tree = flax.core.freeze(tree)
    return tree


def find_adam_state(opt_state):
    """Locate the ScaleByAdamState inside an
    ``optax.chain(clip_by_global_norm, adam)`` state. Returns
    ``(count, mu, nu)``."""
    found = []

    def rec(node):
        if isinstance(node, optax.ScaleByAdamState):
            found.append(node)
        elif isinstance(node, tuple):
            for c in node:
                rec(c)

    rec(opt_state)
    if len(found) != 1:
        raise ValueError(
            f"expected exactly one ScaleByAdamState, found {len(found)}"
            " — the fused SGD kernel supports "
            "optax.chain(clip_by_global_norm, adam) only")
    st = found[0]
    return st.count, st.mu, st.nu


def find_step_count(opt_state):
    """Optimizer step count read from the state ITSELF (checkpoint /
    warm-start safe — ADVICE r4): the ScaleByAdamState count if
    present, else the lr schedule's ScaleByScheduleState count, else
    ``None`` (constant-lr RMSProp keeps no count anywhere, and none is
    needed: the count only feeds bias corrections / the lr schedule)."""
    adam, sched = [], []

    def rec(node):
        if isinstance(node, optax.ScaleByAdamState):
            adam.append(node.count)
        elif isinstance(node, optax.ScaleByScheduleState):
            sched.append(node.count)
        elif isinstance(node, tuple):
            for c in node:
                rec(c)

    rec(opt_state)
    if adam:
        return adam[0]
    if sched:
        return sched[0]
    return None


def rebuild_opt_state(opt_state, new_mu, new_nu, n_steps: int):
    """New opt_state with updated Adam moments and every ``count``
    field advanced by ``n_steps`` (covers ScaleByAdamState and the LR
    schedule's ScaleByScheduleState)."""

    def rec(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node._replace(count=node.count + n_steps,
                                 mu=new_mu, nu=new_nu)
        if hasattr(node, "_fields") and "count" in node._fields:
            return node._replace(count=node.count + n_steps)
        if isinstance(node, tuple):
            mapped = tuple(rec(c) for c in node)
            return type(node)(*mapped) if hasattr(node, "_fields") \
                else mapped
        return node

    return rec(opt_state)


def pack_obs_bm(obs, obs_dim: int):
    """[T, B, A, D] trajectory obs -> the kernels' native batch-minor
    layout [T*A*Dp, B] (XLA-rollout fallback; the Pallas act kernels
    emit this layout directly as ``ActRollout.obs_bm``)."""
    T, B, A, D = obs.shape
    Dp = _pad8(obs_dim)
    return jnp.pad(
        obs.transpose(0, 2, 3, 1),
        ((0, 0), (0, 0), (0, Dp - D), (0, 0))).reshape(T * A * Dp, B)


def pack_fields(action, log_prob, value, adv_n, targets, mask,
                num_actions: int):
    """[T, B, A]-shaped per-sample tensors -> the fields array
    [T*A*FIELD_ROWS, B] (row layout documented at FIELD_ROWS).
    ``adv_n`` must already be normalized per minibatch."""
    T, B, A = action.shape

    def row_ta(x):
        return x.transpose(0, 2, 1).reshape(T * A, B)

    frows = [row_ta(action.astype(jnp.float32)), row_ta(log_prob),
             row_ta(value), row_ta(adv_n), row_ta(targets)]
    for r in range(num_actions):
        frows.append(row_ta(mask[..., r].astype(jnp.float32)))
    frows += [jnp.zeros((T * A, B), jnp.float32)] * (
        FIELD_ROWS - len(frows))
    return jnp.stack(frows, axis=1).reshape(T * A * FIELD_ROWS, B)


def normalize_adv_env_minibatch(advantages, num_minibatches: int):
    """Normalize advantages per CONTIGUOUS-ENV minibatch (the
    ``ppo_losses(normalize_adv=False)`` convention for the fused
    kernels' env-column minibatches). ``advantages [T, B, A]``."""
    T, B, A = advantages.shape
    adv_g = advantages.reshape(T, num_minibatches,
                               B // num_minibatches, A)
    mean = adv_g.mean(axis=(0, 2, 3), keepdims=True)
    std = adv_g.std(axis=(0, 2, 3), keepdims=True)
    return ((adv_g - mean) / (std + 1e-8)).reshape(T, B, A)


def resolve_block_envs(mbB: int, B: int, block_envs: int,
                       interpret: bool, bytes_per_col: int = 0,
                       vmem_budget: int = 90 * 1024 * 1024,
                       kind: str = "SGD") -> int:
    """THE canonical env-column block resolution, shared by every fused
    learner kernel wrapper AND the trainer gates (so a gate can never
    approve a block the kernel would reject — the round-4 code review
    found exactly that drift): halve ``block_envs`` until it divides
    the minibatch, then (when a per-column VMEM cost is given) halve
    further while the estimated footprint exceeds the budget; raise if
    the result violates Mosaic lane tiling (% 128, unless it spans the
    full env batch) outside interpret mode."""
    blkB = block_envs
    while mbB % blkB:
        blkB //= 2
    while (bytes_per_col and blkB > 128
           and blkB * bytes_per_col > vmem_budget):
        blkB //= 2
    if not interpret and blkB % 128 and blkB != B:
        raise ValueError(
            f"{kind} block_envs resolved to {blkB}: must be a multiple"
            " of 128 (Mosaic lane tiling) or equal to the env batch")
    return blkB


def _pick_k_ta(ta: int, want: int, group_mod: int = 1) -> int:
    """Largest divisor of ``ta`` that is <= ``want`` and a multiple of
    ``group_mod`` (the agent count when policy groups are active, so a
    block slot's agent index — hence its group — is static)."""
    if group_mod > 1:
        T = ta // group_mod
        m = max(1, min(want // group_mod, T))
        while T % m:
            m -= 1
        return m * group_mod
    k = min(want, ta)
    while ta % k:
        k -= 1
    return k


def _policy_dims(params, p_list, policy_groups):
    """(groups, K, n_hidden, n_act) for single- or multi-policy."""
    groups = ((0,) if policy_groups is None
              else tuple(int(g) for g in policy_groups))
    K = max(groups) + 1
    npg = len(p_list) // K
    n_hidden = (npg - 2) // 2
    sub = (params["params"] if policy_groups is None
           else params["params"]["policies_0"])
    names = sorted(sub.keys(), key=lambda s: int(s.split("_")[1]))
    n_act = sub[names[-2]]["kernel"].shape[1]
    return groups, K, n_hidden, n_act


def _specs_for(shapes, wspec):
    return [wspec(s.shape) for s in shapes]


def ppo_sgd_phase_pallas(
    params, opt_state, obs_bm, fields, lr_row, bc1_row, bc2_row,
    ent_coef, kl_coeff, *,
    num_epochs: int, num_minibatches: int, clip_eps: float,
    value_coef: float, max_grad_norm: float, mask_actions: bool,
    obs_dim: int, block_envs: int = 1024, rows_per_block: int = 4,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-5,
    matmul_dtype: str = "float32", policy_groups: tuple | None = None,
    interpret: bool = False,
):
    """Run the ENTIRE PPO SGD phase in one fused Mosaic kernel.

    ``obs_bm float32[T*A*Dp, B]`` — the act kernel's trajectory obs,
    unchanged; ``fields float32[T*A*16, B]`` — per-(t, a) rows (see
    FIELD_ROWS; advantages pre-normalized per minibatch); ``lr_row /
    bc1_row / bc2_row float32[n_steps]`` — per-optimizer-step learning
    rate and Adam bias corrections ``1 - b^count`` (count continues
    across updates); minibatch m = env columns
    ``[m * B/M, (m+1) * B/M)`` — the caller owns composition
    randomization (permute the ENV STATE before the rollout).

    ``policy_groups``: static agent -> group tuple; ``params`` is then
    a ``MultiPolicyActorCritic`` tree and each (t, a) slot's forward,
    backward and grad routing use its group's weights — trace-time
    selection, same convention as the act kernel (pallas/act.py).

    Returns ``(new_params, new_opt_state, losses)`` with ``losses`` the
    ``minibatch_epochs`` tuple ``(total, pg, v, ent, kl)`` of
    ``[num_epochs, M]`` arrays.
    """
    ta_dp, B = obs_bm.shape
    Dp = _pad8(obs_dim)
    ta = ta_dp // Dp
    M = num_minibatches
    n_steps = num_epochs * M
    if B % M:
        raise ValueError(f"B={B} not divisible by {M} minibatches")
    mbB = B // M
    blkB = resolve_block_envs(mbB, B, block_envs, interpret)
    nbe = mbB // blkB

    p_list = _flat_tensors(params)
    count, mu, nu = find_adam_state(opt_state)
    m_list = _flat_tensors(mu)
    v_list = _flat_tensors(nu)
    groups, K, n_hidden, n_act = _policy_dims(
        params, p_list, policy_groups)

    k_ta = _pick_k_ta(ta, rows_per_block, len(groups))
    n_rb = ta // k_ta
    n_blk = n_rb * nbe
    mb_n = mbB * ta                       # samples per minibatch

    scal_steps = jnp.stack(
        [lr_row, bc1_row, bc2_row, jnp.zeros_like(lr_row)], axis=1)
    scal_glob = jnp.stack([
        jnp.asarray(ent_coef, jnp.float32),
        jnp.asarray(kl_coeff, jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0)]).reshape(1, 4)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda s, j: (0, 0),
                            memory_space=pltpu.VMEM)

    obs_spec = pl.BlockSpec(
        (k_ta * Dp, blkB),
        lambda s, j: (j // nbe, (s % M) * nbe + j % nbe),
        memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec(
        (k_ta * FIELD_ROWS, blkB),
        lambda s, j: (j // nbe, (s % M) * nbe + j % nbe),
        memory_space=pltpu.VMEM)
    met_spec = pl.BlockSpec((8, blkB), lambda s, j: (s, 0),
                            memory_space=pltpu.VMEM)

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM),
         pl.BlockSpec(memory_space=pltpu.SMEM),
         obs_spec, f_spec]
        + _specs_for(p_list, wspec) + _specs_for(m_list, wspec)
        + _specs_for(v_list, wspec)
    )
    out_specs = (
        _specs_for(p_list, wspec) + _specs_for(m_list, wspec)
        + _specs_for(v_list, wspec) + [met_spec]
    )
    out_shape = (
        [jax.ShapeDtypeStruct(t.shape, jnp.float32)
         for t in p_list + m_list + v_list]
        + [jax.ShapeDtypeStruct((n_steps * 8, blkB), jnp.float32)]
    )
    scratch = [pltpu.VMEM(t.shape, jnp.float32)
               for t in p_list * 4] + [pltpu.VMEM((8, blkB),
                                                  jnp.float32)]

    outs = pl.pallas_call(
        partial(_sgd_kernel, n_hidden, obs_dim, n_act, k_ta, nbe,
                n_blk, n_steps, mb_n, clip_eps, value_coef,
                max_grad_norm, b1, b2, eps, mask_actions,
                jnp.dtype(matmul_dtype), groups),
        grid=(n_steps, n_blk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(scal_steps, scal_glob, obs_bm, fields, *p_list, *m_list, *v_list)

    n_t = len(p_list)
    new_p = _unflat_tensors(outs[:n_t], params)
    new_mu = _unflat_tensors(outs[n_t:2 * n_t], params)
    new_nu = _unflat_tensors(outs[2 * n_t:3 * n_t], params)
    met = outs[3 * n_t]                               # [n_steps*8, blkB]
    new_opt = rebuild_opt_state(opt_state, new_mu, new_nu, n_steps)

    sums = met.reshape(num_epochs, M, 8, blkB).sum(axis=-1)
    pg_loss = -sums[..., 0] / mb_n
    v_loss = 0.5 * sums[..., 1] / mb_n
    entropy = sums[..., 2] / mb_n
    kl = sums[..., 3] / mb_n
    total = (pg_loss + value_coef * v_loss - ent_coef * entropy
             + kl_coeff * kl)
    return new_p, new_opt, (total, pg_loss, v_loss, entropy, kl)


def ppo_minibatch_grads_pallas(
    params, obs_bm, fields, mb_idx: int, ent_coef, kl_coeff, *,
    num_minibatches: int, clip_eps: float, value_coef: float,
    mask_actions: bool, obs_dim: int, block_envs: int = 1024,
    rows_per_block: int = 4, matmul_dtype: str = "float32",
    policy_groups: tuple | None = None, interpret: bool = False,
):
    """One minibatch's exact loss + gradient from the act kernel's
    native-layout trajectory (multi-device variant: the caller pmeans
    grads and runs the optimizer). ``mb_idx`` is STATIC (the trainer
    unrolls the epoch/minibatch loop). Returns
    ``((total, (pg, v, ent, kl)), grads_pytree)`` — the
    ``jax.value_and_grad(loss_fn, has_aux=True)`` contract.
    ``policy_groups``: see ``ppo_sgd_phase_pallas``.
    """
    ta_dp, B = obs_bm.shape
    Dp = _pad8(obs_dim)
    ta = ta_dp // Dp
    M = num_minibatches
    if B % M:
        raise ValueError(f"B={B} not divisible by {M} minibatches")
    mbB = B // M
    blkB = resolve_block_envs(mbB, B, block_envs, interpret)
    nbe = mbB // blkB

    p_list = _flat_tensors(params)
    groups, K, n_hidden, n_act = _policy_dims(
        params, p_list, policy_groups)

    k_ta = _pick_k_ta(ta, rows_per_block, len(groups))
    n_rb = ta // k_ta
    n_blk = n_rb * nbe
    mb_n = mbB * ta

    scal_glob = jnp.stack([
        jnp.asarray(ent_coef, jnp.float32),
        jnp.asarray(kl_coeff, jnp.float32),
        jnp.float32(0.0), jnp.float32(0.0)]).reshape(1, 4)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda j: (0, 0),
                            memory_space=pltpu.VMEM)

    obs_spec = pl.BlockSpec(
        (k_ta * Dp, blkB),
        lambda j: (j // nbe, mb_idx * nbe + j % nbe),
        memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec(
        (k_ta * FIELD_ROWS, blkB),
        lambda j: (j // nbe, mb_idx * nbe + j % nbe),
        memory_space=pltpu.VMEM)
    met_spec = pl.BlockSpec((8, blkB), lambda j: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM),
                 obs_spec, f_spec] + _specs_for(p_list, wspec))
    out_specs = _specs_for(p_list, wspec) + [met_spec]
    out_shape = ([jax.ShapeDtypeStruct(t.shape, jnp.float32)
                  for t in p_list]
                 + [jax.ShapeDtypeStruct((8, blkB), jnp.float32)])

    outs = pl.pallas_call(
        partial(_grads_kernel, n_hidden, obs_dim, n_act, k_ta, n_blk,
                mb_n, clip_eps, value_coef, mask_actions,
                jnp.dtype(matmul_dtype), groups),
        grid=(n_blk,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(scal_glob, obs_bm, fields, *p_list)

    grads = _unflat_tensors(outs[:-1], params)
    sums = outs[-1].sum(axis=-1)
    pg_loss = -sums[0] / mb_n
    v_loss = 0.5 * sums[1] / mb_n
    entropy = sums[2] / mb_n
    kl = sums[3] / mb_n
    total = (pg_loss + value_coef * v_loss - ent_coef * entropy
             + kl_coeff * kl)
    return (total, (pg_loss, v_loss, entropy, kl)), grads
