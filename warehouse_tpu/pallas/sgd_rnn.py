"""Fused recurrent-PPO sequence-replay SGD kernel (round-4).

Round 3 left the recurrent family as the last slow trained path: 2.57M
env-steps/s vs feed-forward PPO's 11.69M, because its SGD phase still
replays every minibatch SEQUENCE through a per-step ``model.apply``
under an XLA scan (train/ppo_rnn.py) — T sequential launches of small
matmuls per minibatch, h round-tripping through HBM between steps, and
a separate backward scan. This module applies the round-3 whole-phase
fusion pattern (pallas/sgd.py) to that replay:

- the ENTIRE SGD phase — ``ppo_epochs`` x ``num_minibatches`` optimizer
  steps, each a full truncated-BPTT forward + hand-derived backward
  through the encoder/GRU/heads + global-norm clip + Adam — runs as ONE
  ``pallas_call``, with params and Adam moments VMEM-resident for the
  whole phase;
- zero-copy obs: the kernel streams the GRU act kernel's trajectory
  output (``pallas/act.py`` o_obs, layout ``[T*A*Dp, B]`` batch-minor)
  directly via BlockSpec index maps, minibatches = contiguous env
  columns ("shuffle the envs, not the data", docs/RESULTS.md);
- the A agents' rows are CONCATENATED along the lane axis in-kernel, so
  every matmul in the T-step recurrence runs at width ``A * blkB``
  (e.g. 1024 lanes at A=4, blkB=256) instead of per-agent width — the
  MXU shape the per-step XLA replay never gets;
- rematerialized backward: only the hidden-state sequence h_0..h_T and
  the per-step head gradients d_out are stored in VMEM scratch; encoder
  activations and GRU gates are recomputed during the backward sweep
  (one extra forward's matmuls, ~25% FLOPs, instead of ~4x the VMEM);
- matmuls run in ``matmul_dtype`` (bf16 operands / f32 accumulation
  for TrainConfig.model_dtype="bfloat16" — the measured round-3 win:
  the replay is matmul-bound) while the loss chain, h carries, grad
  accumulation and Adam stay f32.

Carry resets: the trainer's envelope (max_steps % unroll_length == 0)
restricts episode truncation to the chunk's LAST step, where the XLA
replay's in-scan carry zeroing has no downstream consumer — so the
kernel replays the full T steps with no reset logic, exactly like the
GRU act kernel (pallas/act.py _act_rnn_kernel).

The loss math and tie conventions are ``pallas/sgd.py``'s, shared via
``_loss_and_dout``; the in-kernel optimizer is the shared
``_clip_adam_step`` (exact ``optax.chain(clip_by_global_norm, adam)``).

Scope (the trainer gates on this): ActorCriticRNN with
cell_type="gru" or "lstm" (the LSTM variant stores the c sequence
alongside h and backwards through c' = f*c + i*g, h' = o*tanh(c');
cell auto-detected from the params tree), shared policy,
``epoch_shuffle="once"`` composition, ``flat_optimizer=False``; action
masking supported. Multi-device:
``ppo_rnn_minibatch_grads_pallas`` emits per-minibatch grads for an XLA
``pmean`` + optimizer step, composing with ``shard_map``.

Reference anchor: replaces RLlib's recurrent ``Policy.learn_on_batch``
sequence replay (``use_lstm`` path, SURVEY.md C12 [API] — reference
mount empty, see SURVEY.md §0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .act import _pad8, extract_lstm_weights, extract_rnn_weights
from .sgd import (
    FIELD_ROWS,
    _clip_adam_step,
    _loss_and_dout,
    find_adam_state,
    rebuild_opt_state,
    resolve_block_envs,
)

HEAD_ROWS = 8  # fused logits+value head rows, padded (extract_rnn_weights)


def _seq_fwd_bwd(n_enc, D, n_act, H, A, T, blkB, clip_eps, value_coef,
                 mask_act, ent_coef, kl_coeff, inv_n, mm_dtype,
                 obs_ref, f_ref, h0_ref, p_list, g_accum, macc_add,
                 h_scr, dout_scr, cell="gru"):
    """One env-block's full-sequence forward + BPTT backward.

    ``p_list``: CURRENT param values (jnp arrays, kernel tensor order
    ``_flat_rnn_tensors``). ``g_accum(k, g)`` adds ``g`` into grad
    accumulator ``k``; ``macc_add(r, row)`` adds a [1, blkB] row into
    metric accumulator row ``r``. ``h_scr`` is VMEM scratch of
    ``[(T+1)*H, A*blkB]`` rows (GRU) or ``[2*(T+1)*H, ...]`` (LSTM:
    h slots first, then c slots); ``dout_scr [T*HEAD_ROWS, A*blkB]``.
    ``h0_ref``: ``[A*H, blkB]`` (GRU) or ``[2*A*H, blkB]`` (LSTM:
    c rows then h rows, matching the act kernel's carry layout).

    Grads are d(mean minibatch loss)/dW restricted to this block
    (summing blocks gives the exact minibatch gradient). The math is
    the hand-derived adjoint of the flax ActorCriticRNN step
    (models/policy.py: tanh encoder -> nn.GRUCell /
    nn.OptimizedLSTMCell -> linear heads), with ``jax.grad``-matching
    conventions via ``_loss_and_dout``.
    """
    Dp = _pad8(D)
    N = A * blkB
    lstm = cell == "lstm"
    c_off = (T + 1) * H                 # c slots start here (LSTM)

    enc_w = [(p_list[2 * li], p_list[2 * li + 1]) for li in range(n_enc)]
    base = 2 * n_enc
    if lstm:
        (wii, whi, bhi, wif, whf, bhf, wig, whg, bhg,
         wio, who, bho) = p_list[base:base + 12]
    else:
        (wir, bir, whr, wiz, biz, whz, win, bin_, whn, bhn) = p_list[
            base:base + 10]
    wh, bh = p_list[-2], p_list[-1]

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a.astype(mm_dtype), b.astype(mm_dtype), dims,
            preferred_element_type=jnp.float32)

    WX = (((1,), (0,)), ((), ()))     # [out,in] @ [in,N]
    DYX = (((1,), (1,)), ((), ()))    # dY [out,N] x X [in,N] -> [out,in]
    WTDY = (((0,), (0,)), ((), ()))   # W [out,in] x dY [out,N] -> [in,N]

    def cols(ref, t, rows):
        """Concat the A agents' [rows, blkB] slots -> [rows, A*blkB]."""
        parts = [ref[pl.ds((t * A + i) * rows, rows), :]
                 for i in range(A)]
        return jnp.concatenate(parts, axis=1)

    def enc_forward(x):
        es = [x[:D, :]]
        for w, b in enc_w:
            es.append(jnp.tanh(dot(w, es[-1], WX) + b[...]))
        return es

    def gates(e, h_prev):
        r = jax.nn.sigmoid(dot(wir, e, WX) + bir[...]
                           + dot(whr, h_prev, WX))
        z = jax.nn.sigmoid(dot(wiz, e, WX) + biz[...]
                           + dot(whz, h_prev, WX))
        q = dot(whn, h_prev, WX) + bhn[...]
        n_ = jnp.tanh(dot(win, e, WX) + bin_[...] + r * q)
        return r, z, q, n_

    def lstm_gates(e, h_prev):
        ig = jax.nn.sigmoid(dot(wii, e, WX) + dot(whi, h_prev, WX)
                            + bhi[...])
        fg = jax.nn.sigmoid(dot(wif, e, WX) + dot(whf, h_prev, WX)
                            + bhf[...])
        gg = jnp.tanh(dot(wig, e, WX) + dot(whg, h_prev, WX)
                      + bhg[...])
        og = jax.nn.sigmoid(dot(wio, e, WX) + dot(who, h_prev, WX)
                            + bho[...])
        return ig, fg, gg, og

    def head_and_loss(t, h_new):
        out = dot(wh, h_new, WX) + bh[...]            # [HEAD_ROWS, N]
        f = cols(f_ref, t, FIELD_ROWS)
        d_out, rows = _loss_and_dout(
            n_act, clip_eps, value_coef, mask_act, ent_coef, kl_coeff,
            inv_n, out, f, HEAD_ROWS)
        dout_scr[pl.ds(t * HEAD_ROWS, HEAD_ROWS), :] = d_out
        for ridx, row in enumerate(rows):
            acc = row[:, 0:blkB]
            for i in range(1, A):
                acc = acc + row[:, i * blkB:(i + 1) * blkB]
            macc_add(ridx, acc)

    # ---------------- forward: store carries and d_out_t --------------
    h0_cols = jnp.concatenate(
        [h0_ref[pl.ds((A if lstm else 0) * H + i * H, H), :]
         for i in range(A)], axis=1)
    h_scr[pl.ds(0, H), :] = h0_cols
    if lstm:
        c0_cols = jnp.concatenate(
            [h0_ref[pl.ds(i * H, H), :] for i in range(A)], axis=1)
        h_scr[pl.ds(c_off, H), :] = c0_cols

    if lstm:
        def fwd_step(t, carry):
            c, h = carry
            x = cols(obs_ref, t, Dp)
            e = enc_forward(x)[-1]
            ig, fg, gg, og = lstm_gates(e, h)
            c_new = fg * c + ig * gg
            h_new = og * jnp.tanh(c_new)
            h_scr[pl.ds((t + 1) * H, H), :] = h_new
            h_scr[pl.ds(c_off + (t + 1) * H, H), :] = c_new
            head_and_loss(t, h_new)
            return (c_new, h_new)

        jax.lax.fori_loop(0, T, fwd_step, (c0_cols, h0_cols))
    else:
        def fwd_step(t, h):
            x = cols(obs_ref, t, Dp)
            e = enc_forward(x)[-1]
            r, z, q, n_ = gates(e, h)
            h_new = (1.0 - z) * n_ + z * h
            h_scr[pl.ds((t + 1) * H, H), :] = h_new
            head_and_loss(t, h_new)
            return h_new

        jax.lax.fori_loop(0, T, fwd_step, h0_cols)

    # ---------------- backward: recompute gates, accumulate grads ----
    gbase = base

    def enc_backward(de, es):
        d_cur = de
        for li in range(n_enc - 1, -1, -1):
            a_out = es[li + 1]
            dz_e = d_cur * (1.0 - a_out * a_out)
            g_accum(2 * li, dot(dz_e, es[li], DYX))
            g_accum(2 * li + 1, jnp.sum(dz_e, axis=1, keepdims=True))
            if li > 0:
                d_cur = dot(enc_w[li][0], dz_e, WTDY)

    def head_backward(t):
        """dwh/dbh from stored d_out; returns (d_out's dh, h_prev)."""
        d_out = dout_scr[pl.ds(t * HEAD_ROWS, HEAD_ROWS), :]
        h_cur = h_scr[pl.ds((t + 1) * H, H), :]
        h_prev = h_scr[pl.ds(t * H, H), :]
        g_accum(len(p_list) - 2, dot(d_out, h_cur, DYX))
        g_accum(len(p_list) - 1,
                jnp.sum(d_out, axis=1, keepdims=True))
        return dot(wh, d_out, WTDY), h_prev

    if lstm:
        def bwd_step(i, carry):
            dh_carry, dc_carry = carry
            t = T - 1 - i
            dh0, h_prev = head_backward(t)
            dh = dh0 + dh_carry
            c_cur = h_scr[pl.ds(c_off + (t + 1) * H, H), :]
            c_prev = h_scr[pl.ds(c_off + t * H, H), :]

            x = cols(obs_ref, t, Dp)
            es = enc_forward(x)
            e = es[-1]
            ig, fg, gg, og = lstm_gates(e, h_prev)
            tc = jnp.tanh(c_cur)

            do = dh * tc
            dc = dc_carry + dh * og * (1.0 - tc * tc)
            df = dc * c_prev
            di = dc * gg
            dg = dc * ig
            dc_prev = dc * fg

            dh_prev = jnp.zeros_like(dh)
            de = jnp.zeros_like(e)
            for dp, wi, wh_, boff in (
                (di * ig * (1.0 - ig), wii, whi, 0),
                (df * fg * (1.0 - fg), wif, whf, 3),
                (dg * (1.0 - gg * gg), wig, whg, 6),
                (do * og * (1.0 - og), wio, who, 9),
            ):
                g_accum(gbase + boff + 0, dot(dp, e, DYX))
                g_accum(gbase + boff + 1, dot(dp, h_prev, DYX))
                g_accum(gbase + boff + 2,
                        jnp.sum(dp, axis=1, keepdims=True))
                de = de + dot(wi, dp, WTDY)
                dh_prev = dh_prev + dot(wh_, dp, WTDY)
            enc_backward(de, es)
            return (dh_prev, dc_prev)

        jax.lax.fori_loop(0, T, bwd_step,
                          (jnp.zeros((H, N), jnp.float32),
                           jnp.zeros((H, N), jnp.float32)))
    else:
        def bwd_step(i, dh_carry):
            t = T - 1 - i
            dh0, h_prev = head_backward(t)
            dh = dh0 + dh_carry

            x = cols(obs_ref, t, Dp)
            es = enc_forward(x)
            e = es[-1]
            r, z, q, n_ = gates(e, h_prev)

            dz = dh * (h_prev - n_)
            dn = dh * (1.0 - z)
            dh_prev = dh * z

            dpn = dn * (1.0 - n_ * n_)
            g_accum(gbase + 6, dot(dpn, e, DYX))              # win
            g_accum(gbase + 7, jnp.sum(dpn, axis=1, keepdims=True))
            de = dot(win, dpn, WTDY)
            dq = dpn * r
            g_accum(gbase + 8, dot(dq, h_prev, DYX))          # whn
            g_accum(gbase + 9, jnp.sum(dq, axis=1, keepdims=True))
            dh_prev = dh_prev + dot(whn, dq, WTDY)

            dr = dpn * q
            dpr = dr * r * (1.0 - r)
            g_accum(gbase + 0, dot(dpr, e, DYX))              # wir
            g_accum(gbase + 1, jnp.sum(dpr, axis=1, keepdims=True))
            de = de + dot(wir, dpr, WTDY)
            g_accum(gbase + 2, dot(dpr, h_prev, DYX))         # whr
            dh_prev = dh_prev + dot(whr, dpr, WTDY)

            dpz = dz * z * (1.0 - z)
            g_accum(gbase + 3, dot(dpz, e, DYX))              # wiz
            g_accum(gbase + 4, jnp.sum(dpz, axis=1, keepdims=True))
            de = de + dot(wiz, dpz, WTDY)
            g_accum(gbase + 5, dot(dpz, h_prev, DYX))         # whz
            dh_prev = dh_prev + dot(whz, dpz, WTDY)

            enc_backward(de, es)
            return dh_prev

        jax.lax.fori_loop(0, T, bwd_step,
                          jnp.zeros((H, N), jnp.float32))


def _sgd_rnn_kernel(n_enc: int, D: int, n_act: int, H: int, A: int,
                    T: int, nbe: int, n_steps: int, mb_n: int,
                    blkB: int, clip_eps: float, value_coef: float,
                    max_grad_norm: float, b1: float, b2: float,
                    eps: float, mask_act: bool, mm_dtype, cell: str,
                    *refs):
    """Fused-phase kernel body; grid = (n_steps, nbe).

    refs: scal_steps SMEM [n_steps, 4] (lr, 1-b1^t, 1-b2^t, 0),
    scal_glob SMEM [1, 4] (ent_coef, kl_coeff, 0, 0),
    obs block [T*A*Dp, blkB], fields block [T*A*16, blkB],
    h0 block [A*H, blkB], params/m/v in (n_t each),
    outs: params/m/v (n_t each) + metrics [8, blkB] per step,
    scratch: p/m/v/g working copies + macc [8, blkB]
    + h_scr [(T+1)*H, A*blkB] + dout_scr [T*8, A*blkB].
    """
    n_t = 2 * n_enc + (14 if cell == "lstm" else 12)
    it = iter(refs)
    scal_steps = next(it)
    scal_glob = next(it)
    obs_ref = next(it)
    f_ref = next(it)
    h0_ref = next(it)
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
    h_scr = next(it)
    dout_scr = next(it)

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

    _seq_fwd_bwd(
        n_enc, D, n_act, H, A, T, blkB, clip_eps, value_coef, mask_act,
        scal_glob[0, 0], scal_glob[0, 1], jnp.float32(1.0 / mb_n),
        mm_dtype, obs_ref, f_ref, h0_ref,
        [p[...] for p in p_scr], g_accum, macc_add, h_scr, dout_scr,
        cell)

    @pl.when(j == nbe - 1)
    def _opt_step():
        _clip_adam_step(p_scr, m_scr, v_scr, g_scr,
                        scal_steps[s, 0], scal_steps[s, 1],
                        scal_steps[s, 2], b1, b2, eps, max_grad_norm)
        met_out[...] = macc[...]

    @pl.when((s == n_steps - 1) & (j == nbe - 1))
    def _store():
        for dst, src in zip(p_out + m_out + v_out,
                            p_scr + m_scr + v_scr):
            dst[...] = src[...]


def _grads_rnn_kernel(n_enc: int, D: int, n_act: int, H: int, A: int,
                      T: int, nbe: int, mb_n: int, blkB: int,
                      clip_eps: float, value_coef: float,
                      mask_act: bool, mm_dtype, cell: str, *refs):
    """Single-minibatch grads kernel body; grid = (nbe,).

    Multi-device variant: grads leave the kernel so XLA can ``pmean``
    them across data shards before the optimizer step.
    """
    n_t = 2 * n_enc + (14 if cell == "lstm" else 12)
    it = iter(refs)
    scal_glob = next(it)
    obs_ref = next(it)
    f_ref = next(it)
    h0_ref = next(it)
    p_in = [next(it) for _ in range(n_t)]
    g_out = [next(it) for _ in range(n_t)]
    met_out = next(it)
    h_scr = next(it)
    dout_scr = next(it)

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

    _seq_fwd_bwd(
        n_enc, D, n_act, H, A, T, blkB, clip_eps, value_coef, mask_act,
        scal_glob[0, 0], scal_glob[0, 1], jnp.float32(1.0 / mb_n),
        mm_dtype, obs_ref, f_ref, h0_ref,
        [p[...] for p in p_in], g_accum, macc_add, h_scr, dout_scr,
        cell)


# --------------------------------------------------------------------
# Layout helpers: flax RNN params/moments pytree <-> kernel tensor list
# --------------------------------------------------------------------

def _flat_rnn_tensors(tree):
    """ActorCriticRNN params-structured pytree -> kernel tensor list
    [enc pairs..., cell mats..., wh, bh] with kernels pre-transposed
    [out, in] and the logits/value heads fused+padded. GRU mats:
    (wir, bir, whr, wiz, biz, whz, win, bin, whn, bhn); LSTM
    (auto-detected from the tree): extract_lstm_weights order."""
    if "OptimizedLSTMCell_0" in tree["params"]:
        enc, gmats, (wh, bh) = extract_lstm_weights(tree)
    else:
        enc, gmats, (wh, bh) = extract_rnn_weights(tree)
    out = []
    for w, b in enc:
        out.extend([w, b])
    out.extend(gmats)
    out.extend([wh, bh])
    return out


def _unflat_rnn_tensors(tensors, template):
    """Inverse of ``_flat_rnn_tensors``: kernel tensor list -> pytree
    with ``template``'s structure (ActorCriticRNN gru params)."""
    import flax

    dense = template["params"]
    enc_names = sorted(
        (n for n in dense if n.startswith("Dense_")),
        key=lambda s: int(s.split("_")[1]))
    *enc_n, logit_n, value_n = enc_names
    n_enc = len(enc_n)
    n_act = dense[logit_n]["kernel"].shape[1]

    tree = {"params": {}}
    for i, name in enumerate(enc_n):
        w, b = tensors[2 * i], tensors[2 * i + 1]
        tree["params"][name] = {"kernel": jnp.transpose(w),
                                "bias": b[:, 0]}
    base = 2 * n_enc
    if "OptimizedLSTMCell_0" in dense:
        (wii, whi, bhi, wif, whf, bhf, wig, whg, bhg,
         wio, who, bho) = tensors[base:base + 12]
        tree["params"]["OptimizedLSTMCell_0"] = {
            "ii": {"kernel": jnp.transpose(wii)},
            "hi": {"kernel": jnp.transpose(whi), "bias": bhi[:, 0]},
            "if": {"kernel": jnp.transpose(wif)},
            "hf": {"kernel": jnp.transpose(whf), "bias": bhf[:, 0]},
            "ig": {"kernel": jnp.transpose(wig)},
            "hg": {"kernel": jnp.transpose(whg), "bias": bhg[:, 0]},
            "io": {"kernel": jnp.transpose(wio)},
            "ho": {"kernel": jnp.transpose(who), "bias": bho[:, 0]},
        }
    else:
        (wir, bir, whr, wiz, biz, whz, win, bin_, whn, bhn) = tensors[
            base:base + 10]
        tree["params"]["GRUCell_0"] = {
            "ir": {"kernel": jnp.transpose(wir), "bias": bir[:, 0]},
            "hr": {"kernel": jnp.transpose(whr)},
            "iz": {"kernel": jnp.transpose(wiz), "bias": biz[:, 0]},
            "hz": {"kernel": jnp.transpose(whz)},
            "in": {"kernel": jnp.transpose(win), "bias": bin_[:, 0]},
            "hn": {"kernel": jnp.transpose(whn), "bias": bhn[:, 0]},
        }
    wh, bh = tensors[-2], tensors[-1]
    tree["params"][logit_n] = {
        "kernel": jnp.transpose(wh[:n_act, :]), "bias": bh[:n_act, 0]}
    tree["params"][value_n] = {
        "kernel": jnp.transpose(wh[n_act:n_act + 1, :]),
        "bias": bh[n_act:n_act + 1, 0]}
    if isinstance(template, flax.core.FrozenDict):
        tree = flax.core.freeze(tree)
    return tree


def _resolve_blk(mbB: int, B: int, block_envs: int, interpret: bool,
                 bytes_per_col: int = 0):
    """Shared canonical resolution (pallas/sgd.py resolve_block_envs)
    with this kernel's VMEM footprint auto-halving — a too-large block
    must degrade to a smaller one, not crash in Mosaic allocation
    (measured: blkB=1024 at config-4 shapes is ~115M)."""
    return resolve_block_envs(mbB, B, block_envs, interpret,
                              bytes_per_col, kind="RNN SGD")


def _bytes_per_col(T: int, A: int, Dp: int, H: int) -> int:
    """Estimated VMEM bytes per env column of the replay kernel."""
    windows = 2 * (T * A * Dp + T * A * FIELD_ROWS + A * H)  # dbl-buf
    scratch = A * ((T + 1) * H + T * HEAD_ROWS)
    return 4 * (windows + scratch)


def _rnn_dims(params, obs_bm, obs_dim):
    ta_dp, B = obs_bm.shape
    Dp = _pad8(obs_dim)
    dense = params["params"]
    enc_names = sorted(
        (n for n in dense if n.startswith("Dense_")),
        key=lambda s: int(s.split("_")[1]))
    n_enc = len(enc_names) - 2
    n_act = dense[enc_names[-2]]["kernel"].shape[1]
    if "OptimizedLSTMCell_0" in dense:
        cell = "lstm"
        H = dense["OptimizedLSTMCell_0"]["hi"]["kernel"].shape[0]
    else:
        cell = "gru"
        H = dense["GRUCell_0"]["hr"]["kernel"].shape[0]
    return B, Dp, n_enc, n_act, H, cell


def ppo_rnn_sgd_phase_pallas(
    params, opt_state, obs_bm, fields, h0_rows, lr_row, bc1_row,
    bc2_row, ent_coef, kl_coeff, *,
    num_epochs: int, num_minibatches: int, unroll_length: int,
    num_agents: int, clip_eps: float, value_coef: float,
    max_grad_norm: float, mask_actions: bool, obs_dim: int,
    block_envs: int = 256, b1: float = 0.9, b2: float = 0.999,
    eps: float = 1e-5, matmul_dtype: str = "float32",
    interpret: bool = False,
):
    """Run the ENTIRE recurrent-PPO SGD phase in one fused kernel.

    ``obs_bm float32[T*A*Dp, B]`` — the GRU act kernel's trajectory
    obs, unchanged; ``fields float32[T*A*16, B]`` — per-(t, a) rows
    (pallas/sgd.py FIELD_ROWS layout; advantages pre-normalized per
    minibatch); ``h0_rows float32[A*H, B]`` — the rollout-start carry
    in the act kernel's row layout (agent-major, batch-minor), already
    env-permuted; minibatch m = env columns ``[m * B/M, (m+1) * B/M)``.

    Returns ``(new_params, new_opt_state, losses)`` with ``losses`` the
    ``minibatch_epochs`` tuple of ``[num_epochs, M]`` arrays.
    """
    T, A = unroll_length, num_agents
    B, Dp, n_enc, n_act, H, cell = _rnn_dims(params, obs_bm, obs_dim)
    ncar = 2 if cell == "lstm" else 1
    M = num_minibatches
    n_steps = num_epochs * M
    if B % M:
        raise ValueError(f"B={B} not divisible by {M} minibatches")
    mbB = B // M
    blkB = _resolve_blk(mbB, B, block_envs, interpret,
                        _bytes_per_col(T, A, Dp, H * ncar))
    nbe = mbB // blkB
    mb_n = mbB * T * A

    p_list = _flat_rnn_tensors(params)
    _count, mu, nu = find_adam_state(opt_state)
    m_list = _flat_rnn_tensors(mu)
    v_list = _flat_rnn_tensors(nu)
    n_t = len(p_list)

    scal_steps = jnp.stack(
        [lr_row, bc1_row, bc2_row, jnp.zeros_like(lr_row)], axis=1)
    scal_glob = jnp.stack([
        jnp.asarray(ent_coef, jnp.float32),
        jnp.asarray(kl_coeff, jnp.float32),
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

    in_specs = (
        [pl.BlockSpec(memory_space=pltpu.SMEM),
         pl.BlockSpec(memory_space=pltpu.SMEM),
         colspec(T * A * Dp), colspec(T * A * FIELD_ROWS),
         colspec(ncar * A * H)]
        + [wspec(t.shape) for t in p_list] * 3
    )
    out_specs = (
        [wspec(t.shape) for t in p_list] * 3 + [met_spec]
    )
    out_shape = (
        [jax.ShapeDtypeStruct(t.shape, jnp.float32)
         for t in p_list + m_list + v_list]
        + [jax.ShapeDtypeStruct((n_steps * 8, blkB), jnp.float32)]
    )
    scratch = (
        [pltpu.VMEM(t.shape, jnp.float32) for t in p_list * 4]
        + [pltpu.VMEM((8, blkB), jnp.float32),
           pltpu.VMEM((ncar * (T + 1) * H, A * blkB), jnp.float32),
           pltpu.VMEM((T * HEAD_ROWS, A * blkB), jnp.float32)]
    )

    outs = pl.pallas_call(
        partial(_sgd_rnn_kernel, n_enc, obs_dim, n_act, H, A, T, nbe,
                n_steps, mb_n, blkB, clip_eps, value_coef,
                max_grad_norm, b1, b2, eps, mask_actions,
                jnp.dtype(matmul_dtype), cell),
        grid=(n_steps, nbe),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(scal_steps, scal_glob, obs_bm, fields, h0_rows,
      *p_list, *m_list, *v_list)

    new_p = _unflat_rnn_tensors(outs[:n_t], params)
    new_mu = _unflat_rnn_tensors(outs[n_t:2 * n_t], params)
    new_nu = _unflat_rnn_tensors(outs[2 * n_t:3 * n_t], params)
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


def ppo_rnn_minibatch_grads_pallas(
    params, obs_bm, fields, h0_rows, mb_idx: int, ent_coef, kl_coeff, *,
    num_minibatches: int, unroll_length: int, num_agents: int,
    clip_eps: float, value_coef: float, mask_actions: bool,
    obs_dim: int, block_envs: int = 256, matmul_dtype: str = "float32",
    interpret: bool = False,
):
    """One minibatch's exact sequence-replay loss + gradient (the
    multi-device variant: the caller pmeans grads and runs the
    optimizer). ``mb_idx`` is STATIC. Returns
    ``((total, (pg, v, ent, kl)), grads_pytree)``.
    """
    T, A = unroll_length, num_agents
    B, Dp, n_enc, n_act, H, cell = _rnn_dims(params, obs_bm, obs_dim)
    ncar = 2 if cell == "lstm" else 1
    M = num_minibatches
    if B % M:
        raise ValueError(f"B={B} not divisible by {M} minibatches")
    mbB = B // M
    blkB = _resolve_blk(mbB, B, block_envs, interpret,
                        _bytes_per_col(T, A, Dp, H * ncar))
    nbe = mbB // blkB
    mb_n = mbB * T * A

    p_list = _flat_rnn_tensors(params)
    n_t = len(p_list)

    scal_glob = jnp.stack([
        jnp.asarray(ent_coef, jnp.float32),
        jnp.asarray(kl_coeff, jnp.float32),
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
                 colspec(ncar * A * H)]
                + [wspec(t.shape) for t in p_list])
    out_specs = [wspec(t.shape) for t in p_list] + [met_spec]
    out_shape = ([jax.ShapeDtypeStruct(t.shape, jnp.float32)
                  for t in p_list]
                 + [jax.ShapeDtypeStruct((8, blkB), jnp.float32)])
    scratch = [pltpu.VMEM((ncar * (T + 1) * H, A * blkB), jnp.float32),
               pltpu.VMEM((T * HEAD_ROWS, A * blkB), jnp.float32)]

    outs = pl.pallas_call(
        partial(_grads_rnn_kernel, n_enc, obs_dim, n_act, H, A, T, nbe,
                mb_n, blkB, clip_eps, value_coef, mask_actions,
                jnp.dtype(matmul_dtype), cell),
        grid=(nbe,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(scal_glob, obs_bm, fields, h0_rows, *p_list)

    grads = _unflat_rnn_tensors(outs[:n_t], params)
    sums = outs[n_t].sum(axis=-1)
    pg_loss = -sums[0] / mb_n
    v_loss = 0.5 * sums[1] / mb_n
    entropy = sums[2] / mb_n
    kl = sums[3] / mb_n
    total = (pg_loss + value_coef * v_loss - ent_coef * entropy
             + kl_coeff * kl)
    return (total, (pg_loss, v_loss, entropy, kl)), grads
