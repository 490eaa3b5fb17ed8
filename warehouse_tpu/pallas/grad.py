"""Fused PPO loss + backward Pallas kernel (the SGD phase's hot op).

After the act-phase kernel, the 4x4 minibatch SGD is ~85% of the PPO
update, and probing (benchmarks/ab_sgd.py) showed it is neither
MXU-bound (bf16 neutral) nor activation-HBM-bound (remat hurts) — the
cost is XLA's scheduling of the fwd+bwd chain at large batch. This
kernel computes the ENTIRE clipped-PPO gradient for a minibatch in one
pass per block: forward (MXU matmuls, activations stay in VMEM),
hand-derived backward through the loss chain and both hidden layers,
and cross-block gradient accumulation in VMEM — obs is read from HBM
exactly once and nothing else spills.

Everything is batch-minor ([D, N]/[H, N]/[5, N] — samples on the 128
vector lanes). The backward math mirrors jax.grad's conventions
(min/max/clip tie rules included — epoch 0 has ratio == 1 everywhere,
an exact tie of the surrogate branches) and is verified against
``jax.value_and_grad(ppo_losses ∘ model.apply)`` to f32 accumulation
tolerance in tests/test_grad_kernel.py.

Scope (the trainer gates on this): ActorCriticMLP, float32, no action
masking, advantages pre-normalized per minibatch (the
``ppo_losses(normalize_adv=False)`` convention shared with
micro-batching).

Measured on-chip (docs/RESULTS.md session 3b): numerically right (loss
matches XLA to 4e-5) but ~1.8 ms/update SLOWER than XLA's fwd+bwd at
BASELINE config 4 — so it ships OPT-IN (grad_backend="pallas", default
"xla"). Known taxes to attack before flipping the default: (a) the
[N, D] -> [D, N] obs transpose in the wrapper (~28 MB x 16 calls
per update that XLA cannot fuse into the kernel), (b) 16 separate
pallas_call launches per update, (c) K=106/128 matmuls at
4096-column blocks underfill the MXU (grad_block is now tunable).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .act import _pad8, extract_mlp_weights


def _grad_kernel(n_hidden: int, D: int, N: int, clip_eps: float,
                 value_coef: float, *refs):
    """refs: scal[2] SMEM (ent_coef, kl_coeff),
    obs [Dp, blk], action/old_lp/old_v/adv_n/tgt [1, blk] x5,
    weights (w, b) per hidden + (wh, bh),
    outs: per-sample aux [8, blk], then accumulated grads mirroring the
    weight refs."""
    it = iter(refs)
    scal = next(it)
    obs_ref = next(it)
    act_ref, olp_ref, ov_ref, adv_ref, tgt_ref = (next(it)
                                                  for _ in range(5))
    wbs = [(next(it), next(it)) for _ in range(n_hidden)]
    wh_ref, bh_ref = next(it), next(it)
    aux_ref = next(it)
    dwbs = [(next(it), next(it)) for _ in range(n_hidden)]
    dwh_ref, dbh_ref = next(it), next(it)

    ent_coef = scal[0]
    kl_coeff = scal[1]
    inv_n = jnp.float32(1.0 / N)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for (dw, db) in dwbs:
            dw[...] = jnp.zeros(dw.shape, jnp.float32)
            db[...] = jnp.zeros(db.shape, jnp.float32)
        dwh_ref[...] = jnp.zeros(dwh_ref.shape, jnp.float32)
        dbh_ref[...] = jnp.zeros(dbh_ref.shape, jnp.float32)

    # ---------------- forward (activations stay live in VMEM) --------
    x = obs_ref[:D, :]                                    # [D, blk]
    hs = []                                               # tanh outputs
    h = x
    for w_ref, b_ref in wbs:
        z = jax.lax.dot_general(
            w_ref[...], h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b_ref[...]
        h = jnp.tanh(z)
        hs.append(h)
    out = jax.lax.dot_general(
        wh_ref[...], h, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bh_ref[...]  # [8, blk]

    logit = [out[r:r + 1, :] for r in range(5)]
    v = out[5:6, :]

    # ---------------- loss chain ------------------------------------
    mx = logit[0]
    for r in range(1, 5):
        mx = jnp.maximum(mx, logit[r])
    ssum = jnp.zeros_like(mx)
    for r in range(5):
        ssum = ssum + jnp.exp(logit[r] - mx)
    lse = mx + jnp.log(ssum)
    logp = [logit[r] - lse for r in range(5)]
    p = [jnp.exp(lp_) for lp_ in logp]

    a = act_ref[...]
    onehot = [(a == r).astype(jnp.float32) for r in range(5)]
    lp = jnp.zeros_like(mx)
    for r in range(5):
        lp = lp + onehot[r] * logp[r]

    old_lp = olp_ref[...]
    old_v = ov_ref[...]
    adv = adv_ref[...]
    tgt = tgt_ref[...]

    ratio = jnp.exp(lp - old_lp)
    r_clip = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
    pg1 = ratio * adv
    pg2 = r_clip * adv
    min_pg = jnp.minimum(pg1, pg2)

    v_err = v - tgt
    v_clip = old_v + jnp.clip(v - old_v, -clip_eps, clip_eps)
    vc_err = v_clip - tgt
    sq1 = v_err * v_err
    sq2 = vc_err * vc_err
    sq_max = jnp.maximum(sq1, sq2)

    ent = jnp.zeros_like(mx)
    for r in range(5):
        ent = ent - p[r] * logp[r]

    # Per-sample aux rows (XLA means these into the loss/metrics).
    aux_ref[0:1, :] = min_pg
    aux_ref[1:2, :] = sq_max
    aux_ref[2:3, :] = ent
    aux_ref[3:4, :] = old_lp - lp
    aux_ref[4:8, :] = jnp.zeros_like(out[4:8, :])

    # ---------------- backward --------------------------------------
    # d total / d lp: pg term -(1/N) adv·ratio·sel (jnp.minimum routes
    # the tie to pg1, matching jax.grad) + kl term -kl_coeff/N.
    use1 = (pg1 <= pg2).astype(jnp.float32)
    inclip = ((ratio >= 1.0 - clip_eps)
              & (ratio <= 1.0 + clip_eps)).astype(jnp.float32)
    # jnp.clip = min(max(r, lo), hi): at the boundary the grad is 1
    # (max ties to x, min ties to x), so >=/<= matches jax.grad.
    sel = use1 + (1.0 - use1) * inclip
    d_lp = -(adv * ratio * sel + kl_coeff) * inv_n

    # d total / d z (logits), per row: d_lp·(onehot - p) + entropy term
    # +ent_coef/N·p·(logp + ent) (from -ent_coef·H).
    d_logit = [
        d_lp * (onehot[r] - p[r]) + ent_coef * inv_n * p[r]
        * (logp[r] + ent)
        for r in range(5)
    ]
    # d total / d v: value_coef·0.5·d max(sq1, sq2) — jnp.maximum routes
    # the tie to sq1.
    usem = (sq1 >= sq2).astype(jnp.float32)
    invc = ((v - old_v >= -clip_eps)
            & (v - old_v <= clip_eps)).astype(jnp.float32)
    d_v = value_coef * inv_n * (usem * v_err + (1.0 - usem) * vc_err
                                * invc)

    d_out = jnp.concatenate(
        d_logit + [d_v] + [jnp.zeros_like(d_v)] * 2, axis=0)  # [8, blk]

    # Heads: dWh += dO @ H2^T (contract over samples), dbh += rowsum.
    h_last = hs[-1]
    dwh_ref[...] += jax.lax.dot_general(
        d_out, h_last, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [8, H]
    dbh_ref[...] += jnp.sum(d_out, axis=1, keepdims=True)

    # dH_last = Wh^T @ dO.
    dh = jax.lax.dot_general(
        wh_ref[...], d_out, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [H, blk]

    for li in range(n_hidden - 1, -1, -1):
        h_li = hs[li]
        dz = dh * (1.0 - h_li * h_li)
        prev = x if li == 0 else hs[li - 1]
        dw_ref, db_ref = dwbs[li]
        dw_ref[...] += jax.lax.dot_general(
            dz, prev, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [H, prev]
        db_ref[...] += jnp.sum(dz, axis=1, keepdims=True)
        if li > 0:
            w_ref = wbs[li][0]
            dh = jax.lax.dot_general(
                w_ref[...], dz, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


@partial(jax.jit,
         static_argnames=("clip_eps", "value_coef", "block", "interpret"))
def ppo_value_and_grad_pallas(
    params, obs, action, old_lp, old_v, adv_n, tgt, *,
    ent_coef, kl_coeff, clip_eps: float, value_coef: float,
    block: int = 4096, interpret: bool = False,
):
    """((total_loss, (pg, v, ent, kl)), grads) for the clipped-PPO loss
    over a minibatch — the drop-in replacement for
    ``jax.value_and_grad(loss_fn, has_aux=True)`` in the trainer's SGD
    scaffold (advantages must arrive pre-normalized, the
    ``normalize_adv=False`` convention).

    ``obs [N, D] f32``; per-sample fields ``[N]``; ``params`` an
    ActorCriticMLP pytree. Returns grads as the SAME pytree structure.
    """
    N, D = obs.shape
    if N % block:
        block = N  # single block fallback for small minibatches
    Dp = _pad8(D)

    hidden, (wh, bh) = extract_mlp_weights(params)
    n_hidden = len(hidden)

    obs_t = jnp.transpose(obs)                       # [D, N]
    if Dp > D:
        obs_t = jnp.pad(obs_t, ((0, Dp - D), (0, 0)))

    def row(x, dtype=jnp.float32):
        return x.reshape(1, N).astype(dtype)

    scal = jnp.stack([jnp.asarray(ent_coef, jnp.float32),
                      jnp.asarray(kl_coeff, jnp.float32)])

    ins = [scal, obs_t, row(action, jnp.int32), row(old_lp), row(old_v),
           row(adv_n), row(tgt)]
    for w, b in hidden:
        ins.extend([w, b])
    ins.extend([wh, bh])

    def bspec(rows_):
        return pl.BlockSpec((rows_, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                bspec(Dp), bspec(1), bspec(1), bspec(1), bspec(1),
                bspec(1)]
    for w, b in hidden:
        in_specs.extend([wspec(w.shape), wspec(b.shape)])
    in_specs.extend([wspec(wh.shape), wspec(bh.shape)])

    out_specs = [bspec(8)]
    out_shape = [jax.ShapeDtypeStruct((8, N), jnp.float32)]
    for w, b in hidden:
        out_specs.extend([wspec(w.shape), wspec(b.shape)])
        out_shape.extend([jax.ShapeDtypeStruct(w.shape, jnp.float32),
                          jax.ShapeDtypeStruct(b.shape, jnp.float32)])
    out_specs.extend([wspec(wh.shape), wspec(bh.shape)])
    out_shape.extend([jax.ShapeDtypeStruct(wh.shape, jnp.float32),
                      jax.ShapeDtypeStruct(bh.shape, jnp.float32)])

    outs = pl.pallas_call(
        partial(_grad_kernel, n_hidden, D, N, clip_eps, value_coef),
        grid=(N // block,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*ins)

    aux_rows = outs[0]
    it = iter(outs[1:])
    dhidden = [(next(it), next(it)) for _ in range(n_hidden)]
    dwh, dbh = next(it), next(it)

    pg_loss = -aux_rows[0].mean()
    v_loss = 0.5 * aux_rows[1].mean()
    entropy = aux_rows[2].mean()
    kl = aux_rows[3].mean()
    total = (pg_loss + value_coef * v_loss - ent_coef * entropy
             + kl_coeff * kl)

    # Map the [out, in]-layout grads back into the flax params pytree.
    dense = params["params"]
    names = sorted(dense.keys(), key=lambda s: int(s.split("_")[1]))
    n_act = dense[names[-2]]["kernel"].shape[1]          # logits head
    grads = {"params": {}}
    for i, name in enumerate(names[:-2]):
        dw, db = dhidden[i]
        grads["params"][name] = {
            "kernel": jnp.transpose(dw),
            "bias": db[:, 0],
        }
    grads["params"][names[-2]] = {                        # logits head
        "kernel": jnp.transpose(dwh[:n_act, :]),
        "bias": dbh[:n_act, 0],
    }
    grads["params"][names[-1]] = {                        # value head
        "kernel": jnp.transpose(dwh[n_act:n_act + 1, :]),
        "bias": dbh[n_act:n_act + 1, 0],
    }
    import flax

    grads = flax.core.freeze(grads) if isinstance(
        params, flax.core.FrozenDict) else grads
    return (total, (pg_loss, v_loss, entropy, kl)), grads
