"""Fused CNN-torso PPO SGD-phase Pallas kernel (round 5).

Measured rationale (benchmarks/ab_cnn.py, docs/RESULTS.md r5): the XLA
CNN learner phase is 87.5% of a CNN-PPO update at only 16% of the MXU
peak — XLA lowers the S x S-spatial convs as convolutions, and a 5x5
image with 4->16->32 channels is a pathological MXU shape. This kernel
instead runs the convs in the act kernel's UNROLLED-dense form
([S²*OC, S²*IC] matmuls — MXU-native shape, 25/9x the conv FLOPs but
far better retired FLOP/s), as one whole-phase ``pallas_call``:

- forward: unrolled conv (relu) over the grid rows, the 6 self-feature
  rows re-join after the last conv, tanh dense trunk, fused 8-row head
  (exactly pallas/act.py's CNN layer loop);
- backward: dgrad through the unrolled matrices (their structural
  zeros make this EXACTLY the conv dgrad); wgrad as ONE dense matmul
  per layer (dW_dense = dz @ x^T — MXU-shaped) accumulated over env
  blocks, then FOLDED onto the shared 3x3 kernels at the optimizer
  step (dW_conv[k] = sum over valid (p_out, k) taps of the
  corresponding dW_dense block — the chain rule over the weight
  copies, so the folded grad equals d(loss)/d(conv kernel));
- optimizer: the EXACT ``optax.chain(clip_by_global_norm, adam)``
  update (pallas/sgd.py `_clip_adam_step`) applied in the CONV basis
  (params + Adam moments VMEM-resident in flax-kernel-equivalent
  packed layout), after which the unrolled matrices are REBUILT from
  the updated conv kernels (static valid-tap block copies; structural
  zeros never touched).

Tie conventions match pallas/sgd.py `_block_grads`; additionally the
relu backward uses ``z > 0`` (XLA's ``jax.grad(maximum)`` splits the
measure-zero z == 0 tie 0.5/0.5 — unreachable after an f32 matmul+bias
in practice, same class as the documented min/max ties).

Scope (train/ppo.py gates on this): ActorCriticCNN, single policy
(policy_groups=None), ``epoch_shuffle="once"`` composition,
``flat_optimizer=False``, ``micro_batches=1``. The unrolled matrices,
their grad accumulators and the activation working set must fit VMEM —
``cnn_sgd_vmem_estimate`` is the shared gate/kernel arithmetic.

Reference anchor: replaces RLlib ``Policy.learn_on_batch`` minibatch
SGD for conv models (SURVEY.md §3.1 — reference mount empty, see
SURVEY.md §0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .act import _pad8
from .sgd import (
    FIELD_ROWS,
    _clip_adam_step,
    _loss_and_dout,
    _pick_k_ta,
    find_adam_state,
    rebuild_opt_state,
    resolve_block_envs,
)


def conv_taps(S: int):
    """Static valid-tap list [(po, k, pi), ...] for a 3x3 SAME conv on
    an S x S grid: output position ``po``'s k-th tap reads input
    position ``pi`` (taps falling off the grid are the structural
    zeros of the unrolled matrix). Same geometry as
    ``pallas/act.py extract_cnn_weights``'s P tensor."""
    taps = []
    for po in range(S * S):
        ro, co = po // S, po % S
        for k in range(9):
            r_, c_ = ro + k // 3 - 1, co + k % 3 - 1
            if 0 <= r_ < S and 0 <= c_ < S:
                taps.append((po, k, r_ * S + c_))
    return taps


def _cnn_names(tree):
    dense = tree["params"]
    conv_names = sorted((n for n in dense if n.startswith("Conv_")),
                        key=lambda s: int(s.split("_")[1]))
    dense_names = sorted((n for n in dense if n.startswith("Dense_")),
                         key=lambda s: int(s.split("_")[1]))
    return dense, conv_names, dense_names


def flat_cnn_tensors(tree):
    """ActorCriticCNN params-structured pytree -> kernel tensor list
    [Wc0 [9*OC, IC], bc0 [OC, 1], Wc1, bc1, ..., wt, bt, ..., wh, bh].

    Conv kernels are PACKED [9*OC, IC] (row = k*OC + oc — the layout
    the in-kernel fold/rebuild block copies address directly); packing
    is an elementwise relayout of the flax [3, 3, IC, OC] tensor, so
    applying Adam in this basis is exactly Adam in the flax basis.
    Dense tensors follow pallas/sgd.py's convention ([out, in] + fused
    8-row head)."""
    dense, conv_names, dense_names = _cnn_names(tree)
    out = []
    for n in conv_names:
        kmat = dense[n]["kernel"].astype(jnp.float32)      # [3,3,IC,OC]
        ic, oc = kmat.shape[2], kmat.shape[3]
        out.append(kmat.reshape(9, ic, oc).transpose(0, 2, 1)
                   .reshape(9 * oc, ic))
        out.append(dense[n]["bias"].astype(jnp.float32)[:, None])
    *hidden_n, logit_n, value_n = dense_names
    for n in hidden_n:
        out.append(jnp.transpose(dense[n]["kernel"]).astype(jnp.float32))
        out.append(dense[n]["bias"].astype(jnp.float32)[:, None])
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
    out.extend([wh, bh])
    return out


def unflat_cnn_tensors(tensors, template):
    """Inverse of ``flat_cnn_tensors`` (dict or FrozenDict)."""
    import flax

    dense, conv_names, dense_names = _cnn_names(template)
    it = iter(tensors)
    tree = {"params": {}}
    for n in conv_names:
        ic, oc = dense[n]["kernel"].shape[2], dense[n]["kernel"].shape[3]
        wp = next(it)
        tree["params"][n] = {
            "kernel": wp.reshape(9, oc, ic).transpose(0, 2, 1)
            .reshape(3, 3, ic, oc),
            "bias": next(it)[:, 0],
        }
    *hidden_n, logit_n, value_n = dense_names
    for n in hidden_n:
        w = next(it)
        tree["params"][n] = {"kernel": jnp.transpose(w),
                             "bias": next(it)[:, 0]}
    n_act = dense[logit_n]["kernel"].shape[1]
    wh, bh = next(it), next(it)
    tree["params"][logit_n] = {
        "kernel": jnp.transpose(wh[:n_act, :]), "bias": bh[:n_act, 0]}
    tree["params"][value_n] = {
        "kernel": jnp.transpose(wh[n_act:n_act + 1, :]),
        "bias": bh[n_act:n_act + 1, 0]}
    if isinstance(template, flax.core.FrozenDict):
        tree = flax.core.freeze(tree)
    return tree


def cnn_dims(template, cfg):
    """(S, chans, n_hidden) — grid side, channel chain (C_in, c1, ...),
    dense-hidden count — from a params tree + env config."""
    dense, conv_names, dense_names = _cnn_names(template)
    S = cfg.height if cfg.global_obs else cfg.window_size
    chans = [cfg.num_obs_channels]
    for n in conv_names:
        chans.append(dense[n]["kernel"].shape[3])
    return S, tuple(chans), len(dense_names) - 2


def cnn_sgd_vmem_estimate(cfg, tcfg, chans, blkB: int,
                          k_ta: int) -> int:
    """Rough VMEM footprint (bytes) of the fused CNN SGD kernel at a
    given block geometry — THE arithmetic the trainer gate shares so
    gate and kernel cannot drift: unrolled matrices + their dense-basis
    grad accumulators (x2) + packed p/m/v/g + double-buffered obs and
    fields windows + the lane-concat activation working set (forward
    activations stay live for the backward, plus ~2 temporaries)."""
    S = cfg.height if cfg.global_obs else cfg.window_size
    P2 = S * S
    Dp = _pad8(cfg.obs_dim)
    H = tcfg.hidden_dim
    fixed = 0
    rows = 0
    for i in range(len(chans) - 1):
        ic, oc = chans[i], chans[i + 1]
        fixed += 4 * (P2 * oc) * (P2 * ic) * 2     # unrolled W + dW acc
        fixed += 4 * (P2 * oc) * 2                 # unrolled b + db acc
        fixed += 4 * (9 * oc * ic + oc) * 4        # packed p/m/v/g
        rows += P2 * oc
    trunk_in = P2 * chans[-1] + 6
    fixed += 4 * (H * trunk_in + H + 8 * H + 8) * 4
    rows += trunk_in + H + 8 + cfg.obs_dim
    N = k_ta * blkB
    win = 8 * k_ta * (Dp + FIELD_ROWS) * blkB      # double-buffered io
    acts = 4 * rows * N * 3
    return fixed + win + acts


CNN_VMEM_BUDGET = 90 * 1024 * 1024


def _cnn_block_grads(S, chans, n_hidden, D, n_act, clip_eps,
                     value_coef, mask_act, ent_coef, kl_coeff, inv_n,
                     mm_dtype, x, f, u_w, u_b, dense_w, head):
    """Loss gradient contribution of one lane-concat sample block.

    ``x [Dp, N]`` obs rows (grid rows then self features), ``f``
    fields rows, ``u_w/u_b`` UNROLLED conv matrices/biases (values),
    ``dense_w`` [(w, b), ...] trunk, ``head`` (wh, bh). Returns
    ``(du_w, du_b, ddense, dwh, dbh, metric_rows)`` — conv grads in
    the DENSE (unrolled) basis; the caller folds them."""
    grid_rows = S * S * chans[0]

    def dot(a, bmat, dims):
        return jax.lax.dot_general(
            a.astype(mm_dtype), bmat.astype(mm_dtype), dims,
            preferred_element_type=jnp.float32)

    # ---------------- forward (activations stay live) ----------------
    h = x[:grid_rows, :]
    conv_in = []                # input of each conv layer
    conv_z = []                 # pre-relu output of each conv layer
    for wm, bm in zip(u_w, u_b):
        conv_in.append(h)
        z = dot(wm, h, (((1,), (0,)), ((), ()))) + bm
        conv_z.append(z)
        h = jnp.maximum(z, 0.0)
    h = jnp.concatenate([h, x[grid_rows:D, :]], axis=0)   # re-join feats
    hs_in = []
    hs = []
    for w, b in dense_w:
        hs_in.append(h)
        z = dot(w, h, (((1,), (0,)), ((), ()))) + b
        h = jnp.tanh(z)
        hs.append(h)
    wh, bh = head
    out = dot(wh, h, (((1,), (0,)), ((), ()))) + bh       # [8, N]

    d_out, metric_rows = _loss_and_dout(
        n_act, clip_eps, value_coef, mask_act, ent_coef, kl_coeff,
        inv_n, out, f, wh.shape[0])

    # ---------------- backward ---------------------------------------
    dwh = dot(d_out, hs[-1], (((1,), (1,)), ((), ())))
    dbh = jnp.sum(d_out, axis=1, keepdims=True)
    dh = dot(wh, d_out, (((0,), (0,)), ((), ())))

    ddense = [None] * n_hidden
    for li in range(n_hidden - 1, -1, -1):
        dz = dh * (1.0 - hs[li] * hs[li])
        dw = dot(dz, hs_in[li], (((1,), (1,)), ((), ())))
        db = jnp.sum(dz, axis=1, keepdims=True)
        ddense[li] = (dw, db)
        dh = dot(dense_w[li][0], dz, (((0,), (0,)), ((), ())))

    # Split off the re-joined self-feature rows (inputs — no grad).
    last_rows = S * S * chans[-1]
    dh = dh[:last_rows, :]

    du_w = [None] * len(u_w)
    du_b = [None] * len(u_w)
    for li in range(len(u_w) - 1, -1, -1):
        # relu backward: route on z > 0 (see module doc tie note).
        dz = dh * (conv_z[li] > 0.0).astype(jnp.float32)
        du_w[li] = dot(dz, conv_in[li], (((1,), (1,)), ((), ())))
        du_b[li] = jnp.sum(dz, axis=1, keepdims=True)
        if li > 0:
            dh = dot(u_w[li], dz, (((0,), (0,)), ((), ())))
    return du_w, du_b, ddense, dwh, dbh, metric_rows


def _cnn_sgd_kernel(S: int, chans: tuple, n_hidden: int, D: int,
                    n_act: int, k_ta: int, nbe: int, n_blk: int,
                    n_steps: int, mb_n: int, clip_eps: float,
                    value_coef: float, max_grad_norm: float, b1: float,
                    b2: float, eps: float, mask_act: bool, mm_dtype,
                    emit_grads: bool, *refs):
    """Fused-phase kernel body; grid = (n_steps, n_blk) — or, with
    ``emit_grads`` (the meshed per-minibatch variant), grid = (n_blk,)
    and the outputs are PACKED-basis grads instead of updated p/m/v.

    refs (phase mode): scal_steps SMEM [n_steps, 4], scal_glob SMEM
    [1, 4], obs block [k_ta*Dp, blkB], fields block [k_ta*16, blkB],
    p/m/v in (packed), p/m/v out, metrics out [8, blkB]; scratch:
    p/m/v/g working copies (packed) + per-conv unrolled W/b + their
    dense-basis grad accumulators + macc [8, blkB].
    """
    n_conv = len(chans) - 1
    n_t = 2 * n_conv + 2 * n_hidden + 2
    it = iter(refs)
    if emit_grads:
        scal_glob = next(it)
        obs_ref, f_ref = next(it), next(it)
        p_in = [next(it) for _ in range(n_t)]
        g_out = [next(it) for _ in range(n_t)]
        met_out = next(it)
        u_w = [next(it) for _ in range(n_conv)]
        u_b = [next(it) for _ in range(n_conv)]
        gd_w = [next(it) for _ in range(n_conv)]
        gd_b = [next(it) for _ in range(n_conv)]
        macc = met_out
        p_scr, g_scr = p_in, g_out
        j = pl.program_id(0)
        s = None
    else:
        scal_steps = next(it)
        scal_glob = next(it)
        obs_ref, f_ref = next(it), next(it)
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
        u_w = [next(it) for _ in range(n_conv)]
        u_b = [next(it) for _ in range(n_conv)]
        gd_w = [next(it) for _ in range(n_conv)]
        gd_b = [next(it) for _ in range(n_conv)]
        macc = next(it)
        s = pl.program_id(0)
        j = pl.program_id(1)

    Dp = _pad8(D)
    P2 = S * S
    taps = conv_taps(S)

    def build_unrolled():
        """Unrolled W/b <- packed conv params (valid taps only; the
        structural zeros were zeroed once at init)."""
        for li in range(n_conv):
            ic, oc = chans[li], chans[li + 1]
            wp = p_scr[2 * li]
            bp = p_scr[2 * li + 1]
            for po, k, pi in taps:
                u_w[li][po * oc:(po + 1) * oc, pi * ic:(pi + 1) * ic] = \
                    wp[k * oc:(k + 1) * oc, :]
            for po in range(P2):
                u_b[li][po * oc:(po + 1) * oc, :] = bp[...]

    def fold_conv_grads():
        """Packed conv grads <- dense-basis accumulators (sum over the
        weight copies = the chain rule over the unroll). Static
        per-offset block sums + one concatenate — no scatter (Mosaic
        has no scatter-add)."""
        for li in range(n_conv):
            ic, oc = chans[li], chans[li + 1]
            per_k = [None] * 9
            for po, k, pi in taps:
                blk = gd_w[li][po * oc:(po + 1) * oc,
                               pi * ic:(pi + 1) * ic]
                per_k[k] = blk if per_k[k] is None else per_k[k] + blk
            for k in range(9):
                # Per-offset ref writes at static offsets (a value
                # concatenate of these narrow-lane blocks trips a
                # Mosaic relayout bug on real TPU).
                g_scr[2 * li][k * oc:(k + 1) * oc, :] = (
                    per_k[k] if per_k[k] is not None
                    else jnp.zeros((oc, ic), jnp.float32))
            gb = gd_b[li][0:oc, :]
            for po in range(1, P2):
                gb = gb + gd_b[li][po * oc:(po + 1) * oc, :]
            g_scr[2 * li + 1][...] = gb

    if emit_grads:
        @pl.when(j == 0)
        def _init():
            for li in range(n_conv):
                u_w[li][...] = jnp.zeros(u_w[li].shape, jnp.float32)
            build_unrolled()
            for g in gd_w + gd_b:
                g[...] = jnp.zeros(g.shape, jnp.float32)
            for k in range(2 * n_conv, n_t):
                g_scr[k][...] = jnp.zeros(g_scr[k].shape, jnp.float32)
            macc[...] = jnp.zeros(macc.shape, jnp.float32)
    else:
        @pl.when((s == 0) & (j == 0))
        def _load():
            for dst, src in zip(p_scr + m_scr + v_scr,
                                p_in + m_in + v_in):
                dst[...] = src[...]
            for li in range(n_conv):
                u_w[li][...] = jnp.zeros(u_w[li].shape, jnp.float32)
            build_unrolled()

        @pl.when(j == 0)
        def _zero():
            for g in gd_w + gd_b:
                g[...] = jnp.zeros(g.shape, jnp.float32)
            for k in range(2 * n_conv, n_t):
                g_scr[k][...] = jnp.zeros(g_scr[k].shape, jnp.float32)
            macc[...] = jnp.zeros(macc.shape, jnp.float32)

    ent_coef = scal_glob[0, 0]
    kl_coeff = scal_glob[0, 1]
    inv_n = jnp.float32(1.0 / mb_n)

    dense_w = [(p_scr[2 * n_conv + 2 * li][...],
                p_scr[2 * n_conv + 2 * li + 1][...])
               for li in range(n_hidden)]
    head = (p_scr[n_t - 2][...], p_scr[n_t - 1][...])
    u_w_val = [w[...] for w in u_w]
    u_b_val = [b[...] for b in u_b]

    blkB = macc.shape[1]
    x = jnp.concatenate(
        [obs_ref[sl * Dp:(sl + 1) * Dp, :] for sl in range(k_ta)],
        axis=1)
    f = jnp.concatenate(
        [f_ref[sl * FIELD_ROWS:(sl + 1) * FIELD_ROWS, :]
         for sl in range(k_ta)], axis=1)
    du_w, du_b, ddense, dwh, dbh, rows = _cnn_block_grads(
        S, chans, n_hidden, D, n_act, clip_eps, value_coef, mask_act,
        ent_coef, kl_coeff, inv_n, mm_dtype, x, f, u_w_val, u_b_val,
        dense_w, head)

    for li in range(n_conv):
        gd_w[li][...] += du_w[li]
        gd_b[li][...] += du_b[li]
    for li, (dw, db) in enumerate(ddense):
        g_scr[2 * n_conv + 2 * li][...] += dw
        g_scr[2 * n_conv + 2 * li + 1][...] += db
    g_scr[n_t - 2][...] += dwh
    g_scr[n_t - 1][...] += dbh
    for r, row in enumerate(rows):
        acc = row[:, 0:blkB]
        for c in range(1, k_ta):
            acc = acc + row[:, c * blkB:(c + 1) * blkB]
        macc[r:r + 1, :] += acc

    if emit_grads:
        @pl.when(j == n_blk - 1)
        def _fold():
            fold_conv_grads()
    else:
        @pl.when(j == n_blk - 1)
        def _opt_step():
            fold_conv_grads()
            _clip_adam_step(p_scr, m_scr, v_scr, g_scr,
                            scal_steps[s, 0], scal_steps[s, 1],
                            scal_steps[s, 2], b1, b2, eps,
                            max_grad_norm)
            build_unrolled()
            met_out[...] = macc[...]

        @pl.when((s == n_steps - 1) & (j == n_blk - 1))
        def _store():
            for dst, src in zip(p_out + m_out + v_out,
                                p_scr + m_scr + v_scr):
                dst[...] = src[...]


def _common_geometry(obs_bm, obs_dim, num_minibatches, block_envs,
                     rows_per_block, interpret, cfg, tcfg, chans):
    ta_dp, B = obs_bm.shape
    Dp = _pad8(obs_dim)
    ta = ta_dp // Dp
    M = num_minibatches
    if B % M:
        raise ValueError(f"B={B} not divisible by {M} minibatches")
    mbB = B // M
    k_ta = _pick_k_ta(ta, rows_per_block, 1)
    # Halve the env block until the estimated footprint fits (shared
    # arithmetic with the trainer gate: cnn_sgd_vmem_estimate).
    blkB = resolve_block_envs(mbB, B, block_envs, interpret)
    while (blkB > 128 and cnn_sgd_vmem_estimate(cfg, tcfg, chans, blkB,
                                                k_ta)
           > CNN_VMEM_BUDGET):
        blkB //= 2
    if not interpret and blkB % 128 and blkB != B:
        raise ValueError(
            f"CNN SGD block_envs resolved to {blkB}: must be a "
            "multiple of 128 (Mosaic lane tiling) or the env batch")
    nbe = mbB // blkB
    n_rb = ta // k_ta
    return ta, B, Dp, mbB, blkB, nbe, k_ta, n_rb * nbe, mbB * ta


def ppo_cnn_sgd_phase_pallas(
    params, opt_state, obs_bm, fields, lr_row, bc1_row, bc2_row,
    ent_coef, kl_coeff, *, env_cfg, tcfg,
    num_epochs: int, num_minibatches: int, clip_eps: float,
    value_coef: float, max_grad_norm: float, mask_actions: bool,
    obs_dim: int, block_envs: int = 1024, rows_per_block: int = 4,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-5,
    matmul_dtype: str = "float32", interpret: bool = False,
):
    """Run the ENTIRE CNN-PPO SGD phase in one fused Mosaic kernel
    (single policy). Same contract as pallas/sgd.py
    ``ppo_sgd_phase_pallas``; ``env_cfg``/``tcfg`` supply the conv
    geometry for the VMEM gate arithmetic."""
    S, chans, n_hidden = cnn_dims(params, env_cfg)
    ta, B, Dp, mbB, blkB, nbe, k_ta, n_blk, mb_n = _common_geometry(
        obs_bm, obs_dim, num_minibatches, block_envs, rows_per_block,
        interpret, env_cfg, tcfg, chans)
    M = num_minibatches
    n_steps = num_epochs * M
    n_conv = len(chans) - 1
    P2 = S * S

    p_list = flat_cnn_tensors(params)
    count, mu, nu = find_adam_state(opt_state)
    m_list = flat_cnn_tensors(mu)
    v_list = flat_cnn_tensors(nu)
    dense_sub = params["params"]
    logit_n = sorted((n for n in dense_sub if n.startswith("Dense_")),
                     key=lambda s: int(s.split("_")[1]))[-2]
    n_act = dense_sub[logit_n]["kernel"].shape[1]

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
        + [wspec(t.shape) for t in p_list + m_list + v_list]
    )
    out_specs = ([wspec(t.shape) for t in p_list + m_list + v_list]
                 + [met_spec])
    out_shape = (
        [jax.ShapeDtypeStruct(t.shape, jnp.float32)
         for t in p_list + m_list + v_list]
        + [jax.ShapeDtypeStruct((n_steps * 8, blkB), jnp.float32)]
    )
    scratch = [pltpu.VMEM(t.shape, jnp.float32) for t in p_list * 4]
    for li in range(n_conv):
        ic, oc = chans[li], chans[li + 1]
        scratch.append(pltpu.VMEM((P2 * oc, P2 * ic), jnp.float32))
    for li in range(n_conv):
        oc = chans[li + 1]
        scratch.append(pltpu.VMEM((P2 * oc, 1), jnp.float32))
    for li in range(n_conv):
        ic, oc = chans[li], chans[li + 1]
        scratch.append(pltpu.VMEM((P2 * oc, P2 * ic), jnp.float32))
    for li in range(n_conv):
        oc = chans[li + 1]
        scratch.append(pltpu.VMEM((P2 * oc, 1), jnp.float32))
    scratch.append(pltpu.VMEM((8, blkB), jnp.float32))

    outs = pl.pallas_call(
        partial(_cnn_sgd_kernel, S, chans, n_hidden, obs_dim, n_act,
                k_ta, nbe, n_blk, n_steps, mb_n, clip_eps, value_coef,
                max_grad_norm, b1, b2, eps, mask_actions,
                jnp.dtype(matmul_dtype), False),
        grid=(n_steps, n_blk),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(scal_steps, scal_glob, obs_bm, fields, *p_list, *m_list, *v_list)

    n_t = len(p_list)
    new_p = unflat_cnn_tensors(outs[:n_t], params)
    new_mu = unflat_cnn_tensors(outs[n_t:2 * n_t], params)
    new_nu = unflat_cnn_tensors(outs[2 * n_t:3 * n_t], params)
    met = outs[3 * n_t]
    new_opt = rebuild_opt_state(opt_state, new_mu, new_nu, n_steps)

    sums = met.reshape(num_epochs, M, 8, blkB).sum(axis=-1)
    pg_loss = -sums[..., 0] / mb_n
    v_loss = 0.5 * sums[..., 1] / mb_n
    entropy = sums[..., 2] / mb_n
    kl = sums[..., 3] / mb_n
    total = (pg_loss + value_coef * v_loss - ent_coef * entropy
             + kl_coeff * kl)
    return new_p, new_opt, (total, pg_loss, v_loss, entropy, kl)


def ppo_cnn_minibatch_grads_pallas(
    params, obs_bm, fields, mb_idx: int, ent_coef, kl_coeff, *,
    env_cfg, tcfg, num_minibatches: int, clip_eps: float,
    value_coef: float, mask_actions: bool, obs_dim: int,
    block_envs: int = 1024, rows_per_block: int = 4,
    matmul_dtype: str = "float32", interpret: bool = False,
):
    """One minibatch's exact CNN loss + gradient (flax conv basis) —
    the multi-device variant (caller pmeans grads, XLA optimizer).
    Same contract as pallas/sgd.py ``ppo_minibatch_grads_pallas``."""
    S, chans, n_hidden = cnn_dims(params, env_cfg)
    ta, B, Dp, mbB, blkB, nbe, k_ta, n_blk, mb_n = _common_geometry(
        obs_bm, obs_dim, num_minibatches, block_envs, rows_per_block,
        interpret, env_cfg, tcfg, chans)
    n_conv = len(chans) - 1
    P2 = S * S

    p_list = flat_cnn_tensors(params)
    dense_sub = params["params"]
    logit_n = sorted((n for n in dense_sub if n.startswith("Dense_")),
                     key=lambda s: int(s.split("_")[1]))[-2]
    n_act = dense_sub[logit_n]["kernel"].shape[1]

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
                 obs_spec, f_spec] + [wspec(t.shape) for t in p_list])
    out_specs = [wspec(t.shape) for t in p_list] + [met_spec]
    out_shape = ([jax.ShapeDtypeStruct(t.shape, jnp.float32)
                  for t in p_list]
                 + [jax.ShapeDtypeStruct((8, blkB), jnp.float32)])
    scratch = []
    for li in range(n_conv):
        ic, oc = chans[li], chans[li + 1]
        scratch.append(pltpu.VMEM((P2 * oc, P2 * ic), jnp.float32))
    for li in range(n_conv):
        oc = chans[li + 1]
        scratch.append(pltpu.VMEM((P2 * oc, 1), jnp.float32))
    for li in range(n_conv):
        ic, oc = chans[li], chans[li + 1]
        scratch.append(pltpu.VMEM((P2 * oc, P2 * ic), jnp.float32))
    for li in range(n_conv):
        oc = chans[li + 1]
        scratch.append(pltpu.VMEM((P2 * oc, 1), jnp.float32))

    outs = pl.pallas_call(
        partial(_cnn_sgd_kernel, S, chans, n_hidden, obs_dim, n_act,
                k_ta, nbe, n_blk, 1, mb_n, clip_eps, value_coef, 0.0,
                0.0, 0.0, 0.0, mask_actions, jnp.dtype(matmul_dtype),
                True),
        grid=(n_blk,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(scal_glob, obs_bm, fields, *p_list)

    grads = unflat_cnn_tensors(outs[:-1], params)
    sums = outs[-1].sum(axis=-1)
    pg_loss = -sums[0] / mb_n
    v_loss = 0.5 * sums[1] / mb_n
    entropy = sums[2] / mb_n
    kl = sums[3] / mb_n
    total = (pg_loss + value_coef * v_loss - ent_coef * entropy
             + kl_coeff * kl)
    return (total, (pg_loss, v_loss, entropy, kl)), grads
