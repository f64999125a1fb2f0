"""Pallas TPU kernel: the deep GCNII TRAIN stack (fwd + custom bwd).

`ops/pallas_gcnii.py` fuses the deterministic forward and measured parity
with the XLA scan (the forward's matmuls are roofline-bound).  The round-3
op profile shows where the stack's real cost lives in TRAINING: ~3.2 of the
6.5 ms device-busy step is `graph_net`, and ~1.4 ms of that is elementwise
HBM traffic between the matmuls (mul/add/concat/select/reduce + dropout
masks) plus the backward's per-layer residual reads — exactly what a fused
fwd+bwd kernel eliminates.

Design (both kernels grid = (B, nlayers/K) with K layers statically
unrolled per grid step, layer-block axis innermost; carries in VMEM
scratch persist across sequential grid steps):

* forward: per (b, l) recompute the layer with the adjacency resident in
  VMEM; store ONLY the three per-layer carries (h, lh, lc — the LSTM states
  and layer input) as bf16 residuals; dropout is generated in-kernel from
  the TPU hardware PRNG (`pltpu.prng_seed(seed, b, l)`), so the mask is
  never materialized in HBM — the backward re-seeds identically and
  regenerates it.
* backward: walks layers in reverse, recomputes the layer forward from the
  residual carries (remat), and produces every gradient the XLA autodiff
  would: d_entry, d_h0, d_adj (the adjacency is DATA-dependent — gradients
  flow through the dynamic graph into the encoders), per-layer dW, and the
  shared reason-LSTM weight grads, accumulated in VMEM scratch and written
  once at the final grid step.

Faithful semantics: GCNII_lyc wiring (reference ``model_GCN.py:444-483``)
— variant=True, dropout AFTER each conv's ReLU, reason-LSTM + additive
skip.  The in-kernel dropout draws differ from `jax.random.bernoulli`
(hardware PRNG, threshold test) but are deterministic per (seed, b, l);
same contract as the trainer's `rng_impl='rbg'` knob.

Numerics: matmul inputs bf16 (same trade as `gcn_compute_dtype='bfloat16'`,
the production scan config), f32 accumulation and elementwise math,
residuals stored bf16.

Layer blocking (round 3): each (b, layer) grid step runs only ~60 MFLOP of
bf16 matmuls — well under a microsecond of MXU time — so at grid
(B, nlayers) = 512 steps the stack was grid-step-overhead-bound (~1 us/step
fwd, ~2.5 us/step bwd in the op profile).  Unrolling K layers per grid
step divides that overhead by K; the per-block VMEM footprint grows only
by the K per-layer weight/residual slabs (~0.5 MB at K=8), far under
budget.  Identical math — the loop order is unchanged, only the grid/DMA
granularity moves.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmdfn_tpu.ops._util import pad_to as pad, round_up

_MASK64 = (1 << 32) - 1


def _lstm_fwd(h, lh, lc, ih, hh, b, Hp, fused=False):
    if fused:
        # ih holds [w_ih; w_hh] stacked on the contraction axis (2Hp, 4Hp);
        # one (N, 2Hp) @ (2Hp, 4Hp) dot replaces two half-size ones (same
        # FLOPs and f32 accumulation, one MXU dispatch).  hh is unused.
        g = jnp.dot(jnp.concatenate([h, lh], axis=1), ih,
                    preferred_element_type=jnp.float32) + b
    else:
        g = (jnp.dot(h, ih, preferred_element_type=jnp.float32)
             + jnp.dot(lh, hh, preferred_element_type=jnp.float32) + b)
    i = jax.nn.sigmoid(g[:, :Hp])
    f = jax.nn.sigmoid(g[:, Hp:2 * Hp])
    gg = jnp.tanh(g[:, 2 * Hp:3 * Hp])
    o = jax.nn.sigmoid(g[:, 3 * Hp:])
    lc1 = f * lc + i * gg
    lh1 = o * jnp.tanh(lc1)
    return lh1, lc1, (i, f, gg, o)


def _layer_fwd(h, lh, lc, mm, h0, w1, w2, lstm, *, theta, alpha, reason,
               drop, inv_keep, draw_keep, Hp, fused=False):
    """Recompute one GCNII layer; returns (h_next, lh1, lc1, aux).

    ``mm`` maps h1 -> adj @ h1 (a closure, so the backward's batch-blocked
    variant can loop its per-b adjacencies while sharing this exact math);
    ``draw_keep`` returns the dropout keep mask (in-kernel PRNG, seeded per
    global (b, layer) by the caller).  ``drop`` is a STATIC bool (dropout
    machinery traced at all); ``inv_keep`` is the keep scale — a python
    float on the static-rate path, a traced SMEM scalar on the dynamic
    (config-stacked) path.
    """
    if reason:
        lh1, lc1, gates = _lstm_fwd(h, lh, lc, *lstm, Hp, fused=fused)
        h1 = lh1
    else:
        lh1, lc1, gates = lh, lc, None
        h1 = h
    hi = mm(h1)
    if fused:
        # w1 holds [W1; W2] stacked on the contraction axis (2Hp, Hp):
        # support = [hi, h0] @ [W1; W2] in one dot.  w2 is unused.
        support = jnp.dot(jnp.concatenate([hi.astype(w1.dtype), h0], axis=1),
                          w1, preferred_element_type=jnp.float32)
    else:
        support = (jnp.dot(hi.astype(w1.dtype), w1,
                           preferred_element_type=jnp.float32)
                   + jnp.dot(h0, w2, preferred_element_type=jnp.float32))
    r = (1.0 - alpha) * hi + alpha * h0.astype(jnp.float32)
    pre = theta * support + (1.0 - theta) * r
    h2 = jnp.maximum(pre, 0.0)
    if drop:
        keep = draw_keep()
        h3 = jnp.where(keep, h2 * inv_keep, 0.0)
    else:
        keep = None
        h3 = h2
    h_next = h3 + h if reason else h3
    return h_next, lh1, lc1, (h1, hi, pre, keep, gates)


def _fwd_kernel(adj_ref, he_ref, h0_ref, w1_ref, w2_ref, theta_ref,
                lih_ref, lhh_ref, lb_ref, seed_ref, thresh_ref, invk_ref,
                hout_ref, hres_ref, lhres_ref, lcres_ref,
                h_scr, lh_scr, lc_scr,
                *, alpha, reason, drop, dyn, inv_keep, thresh, nlb, K, Hp,
                fused):
    b = pl.program_id(0)
    j = pl.program_id(1)               # layer-block index; layers j*K..+K-1

    @pl.when(j == 0)
    def _():
        h_scr[:] = he_ref[0].astype(jnp.float32)
        lh_scr[:] = jnp.zeros_like(lh_scr)
        lc_scr[:] = jnp.zeros_like(lc_scr)

    h, lh, lc = h_scr[:], lh_scr[:], lc_scr[:]
    lstm = (lih_ref[:], None if fused else lhh_ref[:], lb_ref[:])
    adj = adj_ref[0]
    mm = lambda h1: jnp.dot(adj, h1.astype(adj.dtype),
                            preferred_element_type=jnp.float32)
    if dyn:   # config-stacked rate: threshold/scale are traced SMEM scalars
        thresh_v = thresh_ref[0, 0].astype(jnp.uint32)
        inv_keep = invk_ref[0, 0]
    else:
        thresh_v = jnp.uint32(thresh)
    for k in range(K):                 # static unroll over the block
        l = j * K + k
        # residuals: the pre-layer carries, bf16
        hres_ref[0, k] = h.astype(jnp.bfloat16)
        lhres_ref[0, k] = lh.astype(jnp.bfloat16)
        lcres_ref[0, k] = lc.astype(jnp.bfloat16)

        def draw_keep(l=l, shape=h.shape):
            pltpu.prng_seed(seed_ref[0, 0] + b * 8192 + l)  # (b, layer)
            bits = pltpu.prng_random_bits(shape)
            keep = bits.astype(jnp.uint32) < thresh_v
            if dyn:   # a stacked rate of exactly 0 must keep EVERYTHING
                keep = jnp.logical_or(keep, inv_keep <= 1.0)
            return keep

        h, lh, lc, _ = _layer_fwd(
            h, lh, lc, mm, h0_ref[0], w1_ref[k],
            None if fused else w2_ref[k], lstm,
            theta=theta_ref[l, 0], alpha=alpha, reason=reason, drop=drop,
            inv_keep=inv_keep, draw_keep=draw_keep, Hp=Hp, fused=fused)

    h_scr[:] = h
    lh_scr[:] = lh
    lc_scr[:] = lc

    @pl.when(j == nlb - 1)
    def _():
        hout_ref[0] = h


def _cat_b(parts):
    """Stack per-batch (Np, X) pieces into one (Bk*Np, X) operand."""
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _bwd_kernel(adj_ref, h0_ref, w1_ref, w2_ref, theta_ref,
                lih_ref, lhh_ref, lb_ref, seed_ref, thresh_ref, invk_ref,
                hres_ref, lhres_ref, lcres_ref, dhf_ref,
                dhe_ref, dh0_ref, dadj_ref, dw1_ref, dw2_ref,
                dlih_ref, dlhh_ref, dlb_ref,
                dh_scr, dlh_scr, dlc_scr, dh0_scr, dadj_scr,
                dw1_scr, dw2_scr, dlih_scr, dlhh_scr, dlb_scr,
                *, alpha, reason, drop, dyn, inv_keep, thresh, nlb, K, nbb,
                Bk, Np, Hp, fused, ablate=frozenset()):
    """Reverse pass, batch-blocked: each grid step owns Bk batch elements
    so every shared-weight gradient dot gets Bk x the rows (the bwd is
    latency-bound on small serially-dependent dots, not FLOPs); only the
    adjacency contractions and the PRNG re-draws stay per-b loops.  Bk=1
    reproduces the original per-b kernel.

    ``ablate`` (TIMING ATTRIBUTION ONLY, env ``MMDFN_GCNII_BWD_ABLATE``,
    benchmarks/attr_gcnii_bwd.py) statically removes a gradient region so
    its cost can be measured by difference; the resulting gradients are
    WRONG — never set in production:
      'wgrad'    — skip the per-layer conv weight-grad dots (dW1/dW2)
      'dadj'     — skip the per-b adjacency-gradient dots
      'prng'     — skip the dropout PRNG re-draws (all-keep mask)
      'lstmgrad' — skip the reason-LSTM gradient chain (elementwise gate
                   grads + its input/weight dots; the recompute stays)
    """
    b = pl.program_id(0)               # batch-BLOCK index: b*Bk .. +Bk-1
    j = pl.program_id(1)               # reversed: layer-block nlb-1-j

    @pl.when(jnp.logical_and(b == 0, j == 0))
    def _():
        dw1_scr[:] = jnp.zeros_like(dw1_scr)
        dw2_scr[:] = jnp.zeros_like(dw2_scr)
        dlih_scr[:] = jnp.zeros_like(dlih_scr)
        dlhh_scr[:] = jnp.zeros_like(dlhh_scr)
        dlb_scr[:] = jnp.zeros_like(dlb_scr)

    @pl.when(j == 0)
    def _():
        dh_scr[:] = _cat_b([dhf_ref[bb] for bb in range(Bk)])
        dlh_scr[:] = jnp.zeros_like(dlh_scr)
        dlc_scr[:] = jnp.zeros_like(dlc_scr)
        dh0_scr[:] = jnp.zeros_like(dh0_scr)
        dadj_scr[:] = jnp.zeros_like(dadj_scr)

    adjs = [adj_ref[bb] for bb in range(Bk)]
    h0 = _cat_b([h0_ref[bb] for bb in range(Bk)])
    lstm = (lih_ref[:], None if fused else lhh_ref[:], lb_ref[:])
    if dyn:   # config-stacked rate: threshold/scale are traced SMEM scalars
        thresh_v = thresh_ref[0, 0].astype(jnp.uint32)
        inv_keep = invk_ref[0, 0]
    else:
        thresh_v = jnp.uint32(thresh)

    def mm(h1):
        return _cat_b([
            jnp.dot(adjs[bb], h1[bb * Np:(bb + 1) * Np].astype(adjs[bb].dtype),
                    preferred_element_type=jnp.float32)
            for bb in range(Bk)])

    base = (nlb - 1 - j) * K           # this block's first layer index
    for k in range(K - 1, -1, -1):     # static reverse unroll
        l = base + k
        h = _cat_b([hres_ref[bb, k] for bb in range(Bk)]).astype(jnp.float32)
        lh = _cat_b([lhres_ref[bb, k]
                     for bb in range(Bk)]).astype(jnp.float32)
        lc = _cat_b([lcres_ref[bb, k]
                     for bb in range(Bk)]).astype(jnp.float32)
        w1 = w1_ref[k]
        w2 = None if fused else w2_ref[k]
        theta = theta_ref[l, 0]

        def draw_keep(l=l):
            if "prng" in ablate:           # timing ablation: all-keep
                return jnp.ones((Bk * Np, Hp), jnp.bool_)
            # identical (seed, GLOBAL b, layer) derivation as the forward
            ks = []
            for bb in range(Bk):
                pltpu.prng_seed(seed_ref[0, 0] + (b * Bk + bb) * 8192 + l)
                bits = pltpu.prng_random_bits((Np, Hp))
                ks.append(bits.astype(jnp.uint32) < thresh_v)
            keep = _cat_b(ks)
            if dyn:   # a stacked rate of exactly 0 must keep EVERYTHING
                keep = jnp.logical_or(keep, inv_keep <= 1.0)
            return keep

        _, _, lc1, (h1, hi, pre, keep, gates) = _layer_fwd(
            h, lh, lc, mm, h0, w1, w2, lstm,
            theta=theta, alpha=alpha, reason=reason, drop=drop,
            inv_keep=inv_keep, draw_keep=draw_keep, Hp=Hp, fused=fused)

        dh_in = dh_scr[:]
        dh3 = dh_in                                   # h_next = h3 (+ h)
        dh2 = jnp.where(keep, dh3 * inv_keep, 0.0) if drop else dh3
        dpre = jnp.where(pre > 0.0, dh2, 0.0)
        tdpre = theta * dpre

        if fused:
            # one (2Hp, N) @ (N, Hp) weight-grad dot and one
            # (N, Hp) @ (Hp, 2Hp) input-grad dot replace two of each
            if "wgrad" not in ablate:
                dw1_scr[l] += jax.lax.dot_general(
                    jnp.concatenate([hi, h0.astype(jnp.float32)], axis=1),
                    tdpre, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            dhih0 = jax.lax.dot_general(tdpre, w1.astype(jnp.float32),
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            d_hi = dhih0[:, :Hp] + (1.0 - theta) * (1.0 - alpha) * dpre
            dh0_scr[:] += dhih0[:, Hp:] + (1.0 - theta) * alpha * dpre
        else:
            if "wgrad" not in ablate:
                dw1_scr[l] += jax.lax.dot_general(
                    hi, tdpre, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dw2_scr[l] += jax.lax.dot_general(
                    h0.astype(jnp.float32), tdpre, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            d_hi = (jax.lax.dot_general(tdpre, w1.astype(jnp.float32),
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                    + (1.0 - theta) * (1.0 - alpha) * dpre)
            dh0_scr[:] += (jax.lax.dot_general(
                tdpre, w2.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
                + (1.0 - theta) * alpha * dpre)
        # hi = adj @ h1  (adj is the symmetric-normalized matrix, but use
        # the explicit transposed contraction, not assumed symmetry);
        # per-b: the adjacency is batch-dependent
        d_h1_parts = []
        for bb in range(Bk):
            sl = slice(bb * Np, (bb + 1) * Np)
            d_h1_parts.append(jax.lax.dot_general(
                adjs[bb].astype(jnp.float32), d_hi[sl],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            if "dadj" not in ablate:
                dadj_scr[bb] += jax.lax.dot_general(
                    d_hi[sl], h1[sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
        d_h1 = _cat_b(d_h1_parts)

        if reason and "lstmgrad" in ablate:
            # timing ablation: route the gradient past the LSTM as identity
            # (same dataflow length, none of the gate-grad VPU work or dots)
            dh_total = dh_in + d_h1
            dlh_new = dlh_scr[:]
            dlc_new = dlc_scr[:]
        elif reason:
            i, f, gg, o = gates
            tl = jnp.tanh(lc1)
            dlh1 = d_h1 + dlh_scr[:]
            dlc1 = dlc_scr[:] + dlh1 * o * (1.0 - tl * tl)
            do = dlh1 * tl
            df = dlc1 * lc
            di = dlc1 * gg
            dgg = dlc1 * i
            dgates = jnp.concatenate(
                [di * i * (1.0 - i), df * f * (1.0 - f),
                 dgg * (1.0 - gg * gg), do * o * (1.0 - o)], axis=1)
            ih, hh, _ = lstm
            if fused:
                # ih holds [w_ih; w_hh]: one input-grad dot gives
                # [d_h_lstm, dlh], one weight-grad dot gives d[w_ih; w_hh]
                dhl = jax.lax.dot_general(
                    dgates, ih, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                d_h_lstm = dhl[:, :Hp]
                dlh_new = dhl[:, Hp:]
                dlih_scr[:] += jax.lax.dot_general(
                    jnp.concatenate([h, lh], axis=1), dgates,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                d_h_lstm = jax.lax.dot_general(
                    dgates, ih, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dlh_new = jax.lax.dot_general(
                    dgates, hh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dlih_scr[:] += jax.lax.dot_general(
                    h, dgates, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dlhh_scr[:] += jax.lax.dot_general(
                    lh, dgates, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            dlb_scr[:] += jnp.sum(dgates, axis=0, keepdims=True)
            dh_total = dh_in + d_h_lstm        # skip (+h) plus LSTM input
            dlc_new = dlc1 * f
        else:
            dh_total = d_h1
            dlh_new = dlh_scr[:]
            dlc_new = dlc_scr[:]

        dh_scr[:] = dh_total
        dlh_scr[:] = dlh_new
        dlc_scr[:] = dlc_new

    @pl.when(j == nlb - 1)
    def _():
        for bb in range(Bk):
            sl = slice(bb * Np, (bb + 1) * Np)
            dhe_ref[bb] = dh_scr[sl]
            dh0_ref[bb] = dh0_scr[sl]
            dadj_ref[bb] = dadj_scr[bb]

    @pl.when(jnp.logical_and(b == nbb - 1, j == nlb - 1))
    def _():
        dw1_ref[:] = dw1_scr[:]
        dw2_ref[:] = dw2_scr[:]
        dlih_ref[:] = dlih_scr[:]
        dlhh_ref[:] = dlhh_scr[:]
        dlb_ref[:] = dlb_scr[:]


def _per_b(*shape, Bk=1):
    """Per-batch(-block) slab: block (Bk, *shape) at batch-block index b."""
    n = len(shape)
    return pl.BlockSpec((Bk,) + shape, lambda b, l: (b,) + (0,) * n,
                        memory_space=pltpu.VMEM)


def _per_bl(K, *shape, rev_nlb=None, Bk=1):
    """Per-(batch-block, layer-block) slab of K layers' residuals."""
    n = len(shape)
    if rev_nlb is None:
        idx = lambda b, j: (b, j) + (0,) * n
    else:
        idx = lambda b, j: (b, rev_nlb - 1 - j) + (0,) * n
    return pl.BlockSpec((Bk, K) + shape, idx, memory_space=pltpu.VMEM)


def _per_l(K, *shape, rev_nlb=None):
    """Per-layer-block slab of K layers' weights."""
    n = len(shape)
    if rev_nlb is None:
        idx = lambda b, j: (j,) + (0,) * n
    else:
        idx = lambda b, j: (rev_nlb - 1 - j,) + (0,) * n
    return pl.BlockSpec((K,) + shape, idx, memory_space=pltpu.VMEM)


def _const(*shape):
    return pl.BlockSpec(shape, lambda b, l: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _smem(*shape):
    return pl.BlockSpec(shape, lambda b, l: (0,) * len(shape),
                        memory_space=pltpu.SMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _stack_core(static, adj, h_entry, h0, W1, W2, lih, lhh, lb, theta, seed,
                thresh, invk):
    return _stack_fwd(static, adj, h_entry, h0, W1, W2, lih, lhh, lb,
                      theta, seed, thresh, invk)[0]


def _interp_mode(drop, interpret):
    """interpret=True + live dropout needs the TPU-aware interpreter (the
    HLO interpreter lacks the PRNG primitives; the TPU interpreter stubs
    them with zeros — all-keep — which is why nn/gcn.py falls back to the
    scan for live dropout off-TPU; tests exercise the scale path only)."""
    if interpret and drop:
        return pltpu.InterpretParams()
    return interpret


def _layer_block(nl: int) -> int:
    """Layers per grid step: largest of 8/4/2/1 dividing nl (8 keeps the
    per-block residual slabs ~1.5 MB; nl is a layer-count flag, always
    even in practice)."""
    for K in (8, 4, 2):
        if nl % K == 0:
            return K
    return 1


def _fuse_weights(W1, W2, lih, lhh):
    """Host-side operand prep for the fused-dot kernel mode: stack the two
    conv weights / the two LSTM weights on their contraction axes (XLA-level
    concat, ~1 MB once per step) and hand the kernels tile-aligned dummies
    for the now-unused slots (block specs keep their DMA at one tile)."""
    Wc = jnp.concatenate([W1, W2], axis=1)          # (nl, 2Hp, Hp)
    ihc = jnp.concatenate([lih, lhh], axis=0)       # (2Hp, 4Hp)
    dummy = jnp.zeros((8, 128), jnp.float32)
    return Wc, ihc, dummy


def _stack_fwd(static, adj, h_entry, h0, W1, W2, lih, lhh, lb, theta, seed,
               thresh_c, invk_c):
    alpha, reason, rate, interpret, fused, _, dyn = static
    drop = dyn or rate > 0.0
    interpret = _interp_mode(drop, interpret)
    B, Np, _ = adj.shape
    nl, Hp, _ = W1.shape
    K = _layer_block(nl)
    nlb = nl // K
    thresh = min(int((1.0 - rate) * (1 << 32)), _MASK64) if rate > 0 else 0
    inv_keep = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    kernel = functools.partial(_fwd_kernel, alpha=alpha, reason=reason,
                               drop=drop, dyn=dyn, inv_keep=inv_keep,
                               thresh=thresh, nlb=nlb, K=K, Hp=Hp,
                               fused=fused)
    bf = jnp.bfloat16
    if fused:
        w1_op, ih_op, dummy = _fuse_weights(W1, W2, lih, lhh)
        w2_op, hh_op = dummy, dummy
        w1_spec, w2_spec = _per_l(K, 2 * Hp, Hp), _const(8, 128)
        ih_spec, hh_spec = _const(2 * Hp, 4 * Hp), _const(8, 128)
    else:
        w1_op, w2_op, ih_op, hh_op = W1, W2, lih, lhh
        w1_spec, w2_spec = _per_l(K, Hp, Hp), _per_l(K, Hp, Hp)
        ih_spec, hh_spec = _const(Hp, 4 * Hp), _const(Hp, 4 * Hp)
    h_out, h_res, lh_res, lc_res = pl.pallas_call(
        kernel,
        grid=(B, nlb),
        in_specs=[
            _per_b(Np, Np), _per_b(Np, Hp), _per_b(Np, Hp),
            w1_spec, w2_spec,
            _smem(nl, 1),
            ih_spec, hh_spec, _const(1, 4 * Hp),
            _smem(1, 1), _smem(1, 1), _smem(1, 1),
        ],
        out_specs=[
            _per_b(Np, Hp),
            _per_bl(K, Np, Hp), _per_bl(K, Np, Hp), _per_bl(K, Np, Hp),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, Hp), jnp.float32),
            jax.ShapeDtypeStruct((B, nl, Np, Hp), bf),
            jax.ShapeDtypeStruct((B, nl, Np, Hp), bf),
            jax.ShapeDtypeStruct((B, nl, Np, Hp), bf),
        ],
        scratch_shapes=[pltpu.VMEM((Np, Hp), jnp.float32)] * 3,
        interpret=interpret,
    )(adj, h_entry, h0, w1_op, w2_op, theta, ih_op, hh_op, lb, seed,
      thresh_c, invk_c)
    res = (adj, h0, W1, W2, lih, lhh, lb, theta, seed, thresh_c, invk_c,
           h_res, lh_res, lc_res)
    return h_out, res


def _stack_bwd(static, res, dh_final):
    alpha, reason, rate, interpret, fused, bwd_bk, dyn = static
    drop = dyn or rate > 0.0
    interpret = _interp_mode(drop, interpret)
    (adj, h0, W1, W2, lih, lhh, lb, theta, seed, thresh_c, invk_c,
     h_res, lh_res, lc_res) = res
    B, Np, _ = adj.shape
    nl, Hp, _ = W1.shape
    Bk = bwd_bk if (bwd_bk and B % bwd_bk == 0) else 1
    # shrink the layer block as the batch block grows: the (Bk, K) residual
    # slabs are the dominant VMEM tenant and Bk*K == const keeps them flat.
    # The product cap is env-overridable for A/B (MMDFN_GCNII_BKK; a larger
    # product = fewer grid steps but bigger slabs under the raised VMEM cap)
    import os
    bkk = int(os.environ.get("MMDFN_GCNII_BKK", "8"))
    K = _layer_block(nl)
    while Bk > 1 and K > 1 and Bk * K > bkk:
        K //= 2
    nlb = nl // K
    thresh = min(int((1.0 - rate) * (1 << 32)), _MASK64) if rate > 0 else 0
    inv_keep = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    # timing-attribution ablations (benchmarks/attr_gcnii_bwd.py); empty in
    # production — see _bwd_kernel's docstring
    ablate = frozenset(
        a for a in os.environ.get("MMDFN_GCNII_BWD_ABLATE", "").split(",")
        if a)
    kernel = functools.partial(_bwd_kernel, alpha=alpha, reason=reason,
                               drop=drop, dyn=dyn, inv_keep=inv_keep,
                               thresh=thresh, nlb=nlb, K=K,
                               nbb=B // Bk, Bk=Bk, Np=Np, Hp=Hp, fused=fused,
                               ablate=ablate)
    if fused:
        # dW1/dlih slots carry the stacked grads (split after the call);
        # dW2/dlhh slots shrink to one-tile dummies
        w1_op, ih_op, dummy = _fuse_weights(W1, W2, lih, lhh)
        w2_op, hh_op = dummy, dummy
        w1_spec = _per_l(K, 2 * Hp, Hp, rev_nlb=nlb)
        w2_spec, hh_spec = _const(8, 128), _const(8, 128)
        ih_spec = _const(2 * Hp, 4 * Hp)
        dw_shape, dih_shape = (nl, 2 * Hp, Hp), (2 * Hp, 4 * Hp)
        ddummy_shape = (8, 128)
    else:
        w1_op, w2_op, ih_op, hh_op = W1, W2, lih, lhh
        w1_spec = _per_l(K, Hp, Hp, rev_nlb=nlb)
        w2_spec = _per_l(K, Hp, Hp, rev_nlb=nlb)
        ih_spec, hh_spec = _const(Hp, 4 * Hp), _const(Hp, 4 * Hp)
        dw_shape, dih_shape = (nl, Hp, Hp), (Hp, 4 * Hp)
        ddummy_shape = None
    res_spec = lambda: _per_bl(K, Np, Hp, rev_nlb=nlb, Bk=Bk)
    extra = {}
    if Bk > 1 or nl > 32:
        # the batch-blocked backward's live set (Bk x the temporaries plus
        # the block operands) exceeds XLA's default 16 MiB scoped-VMEM
        # budget at flagship shapes (21.5 MiB at Bk=2), as do the deep
        # stacks' per-layer weight-grad accumulators (8 MiB at nl=64 plus
        # the rest of the live set); raise the Mosaic cap so the compiler
        # may use the physical VMEM beyond the conservative default —
        # hardware-validated at both shapes
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)
    (dhe, dh0, dadj, dW1, dW2, dlih, dlhh, dlb) = pl.pallas_call(
        kernel,
        grid=(B // Bk, nlb),
        in_specs=[
            _per_b(Np, Np, Bk=Bk), _per_b(Np, Hp, Bk=Bk),
            w1_spec, w2_spec,
            _smem(nl, 1),
            ih_spec, hh_spec, _const(1, 4 * Hp),
            _smem(1, 1), _smem(1, 1), _smem(1, 1),
            res_spec(), res_spec(), res_spec(),
            _per_b(Np, Hp, Bk=Bk),
        ],
        out_specs=[
            _per_b(Np, Hp, Bk=Bk), _per_b(Np, Hp, Bk=Bk),
            _per_b(Np, Np, Bk=Bk),
            _const(*dw_shape), _const(*(ddummy_shape or dw_shape)),
            _const(*dih_shape), _const(*(ddummy_shape or dih_shape)),
            _const(1, 4 * Hp),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, Hp), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, Hp), jnp.float32),
            jax.ShapeDtypeStruct((B, Np, Np), jnp.float32),
            jax.ShapeDtypeStruct(dw_shape, jnp.float32),
            jax.ShapeDtypeStruct(ddummy_shape or dw_shape, jnp.float32),
            jax.ShapeDtypeStruct(dih_shape, jnp.float32),
            jax.ShapeDtypeStruct(ddummy_shape or dih_shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * Hp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bk * Np, Hp), jnp.float32),  # dh
            pltpu.VMEM((Bk * Np, Hp), jnp.float32),  # dlh
            pltpu.VMEM((Bk * Np, Hp), jnp.float32),  # dlc
            pltpu.VMEM((Bk * Np, Hp), jnp.float32),  # dh0 acc
            pltpu.VMEM((Bk, Np, Np), jnp.float32),   # dadj acc
            pltpu.VMEM(dw_shape, jnp.float32),      # dW1 / d[W1;W2] acc
            pltpu.VMEM(ddummy_shape or dw_shape, jnp.float32),
            pltpu.VMEM(dih_shape, jnp.float32),     # dlih / d[ih;hh] acc
            pltpu.VMEM(ddummy_shape or dih_shape, jnp.float32),
            pltpu.VMEM((1, 4 * Hp), jnp.float32),
        ],
        interpret=interpret,
        **extra,
    )(adj, h0, w1_op, w2_op, theta, ih_op, hh_op, lb, seed,
      thresh_c, invk_c, h_res, lh_res, lc_res, dh_final)
    if fused:
        dW1, dW2 = dW1[:, :Hp], dW1[:, Hp:]
        dlih, dlhh = dlih[:Hp], dlih[Hp:]
    import numpy as np
    # cotangent dtypes must match the (bf16) primals; int seed/thresh get
    # float0; the keep-scale operand is a hyperparameter (zero cotangent)
    return (dadj.astype(adj.dtype), dhe, dh0.astype(h0.dtype),
            dW1.astype(W1.dtype), dW2.astype(W2.dtype), dlih, dlhh, dlb,
            jnp.zeros_like(theta),
            np.zeros(seed.shape, jax.dtypes.float0),
            np.zeros(thresh_c.shape, jax.dtypes.float0),
            jnp.zeros_like(invk_c))


_stack_core.defvjp(_stack_fwd, _stack_bwd)


def gcnii_stack_train(adj: jnp.ndarray, h_entry: jnp.ndarray,
                      h0: jnp.ndarray, W: jnp.ndarray, theta: jnp.ndarray,
                      lstm_ih: Optional[jnp.ndarray],
                      lstm_hh: Optional[jnp.ndarray],
                      lstm_b: Optional[jnp.ndarray],
                      *, alpha: float, reason: bool, rate,
                      seed, interpret: bool = False,
                      fuse_dots: bool = False,
                      bwd_batch_block: Optional[int] = None) -> jnp.ndarray:
    """Differentiable fused GCNII_lyc layer loop (variant=True,
    dropout-after wiring).

    ``fuse_dots`` stacks the two conv weights and the two reason-LSTM
    weights on their contraction axes so each layer issues ~9 MXU dots
    instead of ~15 (same FLOPs, same f32 accumulation; identical math up
    to f32 summation order within a dot).  Perf experiment knob — reach it
    with ``gcn_backend='pallas_fused'``.

    Args:
      adj: (B, N, N) normalized adjacency; h_entry: (B, N, H) loop-entry
      hidden (post fc_in/ReLU/dropout); h0: (B, N, H) residual anchor;
      W: (nlayers, 2H, H); theta: (nlayers,); lstm_*: shared reason-LSTM
      params or None; rate: dropout rate — a python float (0 disables,
      in-kernel hardware PRNG otherwise; the rate is baked into the
      compiled threshold) OR a traced
      :class:`~mmdfn_tpu.nn.drop_override.DropRate` whose
      threshold/keep-scale ride as SMEM scalar operands (the
      config-stacked sweep vmaps them over the config axis; draws are
      bit-identical with the equivalent static rate for the same seed
      because both thresholds come from the same exact integer formula);
      seed: int32 scalar.
      bwd_batch_block: batch elements per backward grid step (must divide
        B, else silently 1).  The backward's shared-weight gradient dots
        contract Bk x the rows per dot, amortizing MXU pipeline fill over
        the serial layer chain; identical math up to f32 summation order
        inside each dot.  None/1 = original per-b backward.
    Returns:
      (B, N, H) final hidden state (pad rows garbage, caller masks).
    """
    B, N, H = h_entry.shape
    nl = W.shape[0]
    Np = round_up(N, 128)
    Hp = round_up(H, 128)
    bf = jnp.bfloat16

    adj_p = pad(adj.astype(bf), B, Np, Np)
    he_p = pad(h_entry.astype(jnp.float32), B, Np, Hp)
    h0_p = pad(h0.astype(bf), B, Np, Hp)
    W1 = pad(W[:, :H].astype(bf), nl, Hp, Hp)
    W2 = pad(W[:, H:].astype(bf), nl, Hp, Hp)
    theta_c = jnp.asarray(theta, jnp.float32).reshape(nl, 1)

    if reason:
        pg = lambda a: jnp.concatenate(
            [pad(a[..., k * H:(k + 1) * H].astype(jnp.float32),
                 *(a.shape[:-1] + (Hp,))) for k in range(4)], axis=-1)
        ih = jnp.pad(pg(lstm_ih), [(0, Hp - H), (0, 0)])
        hh = jnp.pad(pg(lstm_hh), [(0, Hp - H), (0, 0)])
        b_ = pg(lstm_b.reshape(1, -1))
    else:
        ih = jnp.zeros((Hp, 4 * Hp), jnp.float32)
        hh = jnp.zeros((Hp, 4 * Hp), jnp.float32)
        b_ = jnp.zeros((1, 4 * Hp), jnp.float32)

    # rank-2 so the vmap batching rule's per-config block
    # (trailing dims == array dims) passes the Mosaic block-shape
    # rule — rank-1 (K, 1) blocks are rejected (config-parallel sweep)
    seed_c = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    dyn = hasattr(rate, "thresh")          # DropRate: traced per-config rate
    if dyn:
        thresh_c = jnp.asarray(rate.thresh, jnp.int32).reshape(1, 1)
        invk_c = jnp.asarray(rate.inv_keep, jnp.float32).reshape(1, 1)
        rate_s = -1.0                      # unused on the dynamic path
    else:
        thresh_c = jnp.zeros((1, 1), jnp.int32)
        invk_c = jnp.ones((1, 1), jnp.float32)
        rate_s = float(rate)
    static = (float(alpha), bool(reason), rate_s, bool(interpret),
              bool(fuse_dots),
              int(bwd_batch_block) if bwd_batch_block else 1, dyn)
    out = _stack_core(static, adj_p, he_p, h0_p, W1, W2, ih, hh, b_,
                      theta_c, seed_c, thresh_c, invk_c)
    return out[:, :N, :H]
