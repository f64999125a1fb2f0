"""Pallas TPU kernel: fused masked bidirectional GRU (fwd + custom bwd).

The flagship step's measured ceiling is sequential-scan latency, not FLOPs
(DESIGN.md round-2 op profile: ~10 of ~11.75 ms device-busy in scan chains).
The encoder RNNs — the reference's cuDNN GRUs (``code/model.py:866-868``) —
run as 4 separate 80-step ``lax.scan`` chains per step (2 layers x 2
directions for ``lstm_l`` and again for ``rnn_parties``), each step a tiny
``(B,100) @ (100,300)`` matmul that pays a full XLA while-loop iteration of
HBM round-trips for its carry and per-step residuals.

This kernel runs ONE layer's BOTH directions as a single Pallas grid over
time: the grid dimension is the time axis (sequential on TPU), the hidden
carries live in VMEM scratch that persists across grid steps, and Pallas's
block pipeline auto-double-buffers the per-step ``xg`` blocks from HBM while
the previous step computes.  Per time step the kernel does exactly two
aligned ``(Bp, Hp) @ (Hp, 3Hp)`` MXU matmuls + VPU gate math — no dispatch,
no carry round-trip, no residual writes.

MASKED RECURRENCE (round 3): the recurrence is gated per (batch, time) by a
mask — ``h_t = where(m_t, gru(h_prev, xg_t), h_prev)`` — which makes the
kernel the single primitive behind BOTH sequence-padding semantics and the
CRN speaker encoder:

* the BACKWARD direction no longer needs its input pre-flipped
  valid-frames-first: it walks the SAME arrays in reverse time (the block
  index map runs ``nT-1-i`` while the forward direction runs ``i``), gated
  by the mask so trailing pads leave the carry at h0.  This deletes the
  ``flip_valid`` one-hot permutation matmuls (and their backwards) that
  bracketed every bidirectional layer.
* the CRN party gather/scatter (reference python loops at
  ``code/model.py:1040-1060``) is subsumed entirely: running the shared
  party GRU over the raw sequence gated by "is this party's frame" visits
  exactly that party's frames in order — bit-identical carries to
  left-packing the frames, running, and scattering back, with ZERO
  permutation machinery (see ``nn/rnn.py:crn_party_delta``).

Gating uses ``where`` (select), never multiplication, so a non-finite value
in a masked-out frame cannot poison valid rows through ``0*inf`` — masked
frames are fully quarantined in forward AND backward.

The backward is a second Pallas kernel whose two directions walk the grid in
the opposite orders (BPTT of the forward walk = reverse walk and vice
versa), recomputing the gate pre-activations from the carried state (the
same trade ``rnn_scan_remat`` makes, DESIGN.md) and accumulating
``dW_hh``/``db_hh`` in VMEM scratch; ``dxg`` streams out per step, zeroed at
masked frames.

Gate math and layouts match ``mmdfn_tpu.nn.rnn._gru_scan`` exactly (torch
GRU semantics: r,z,n gate order, ``n = tanh(xn + r * (W_hn h + b_hn))``).
Gates are padded PER GATE to lane-aligned ``Hp = ceil(H/128)*128`` blocks so
in-kernel gate slices stay tile-aligned; zero-padding is invariant under the
gate math (pad columns of the carry stay exactly 0: r=z=sigmoid(0)=0.5,
n=tanh(0)=0 => h' = 0.5*0 + 0.5*0).

HBM-glue design (round-3, profile-driven): gate packing to ``Hp`` lanes is
applied to the WEIGHTS (``pack_gate_weights``, a few KB) rather than to
``xg`` (tens of MB): ``x @ pack(W_ih)`` produces packed pre-activations
directly because each output column of a matmul is independent —
bit-identical values, zero extra passes over the big tensors.  The kernel
operands stay TIME-MAJOR ``(L, Bp, G)``: a batch-first layout was measured
and REVERTED — with time second-minor, every in-kernel ``xg[:, t]`` access
is sublane-strided against the (8, 128) VMEM tiling and the kernel ran ~5x
slower (op profile: rnn_parties pallas 0.34 -> 1.71 ms/step), far more than
the ~0.18 ms the avoided ``swapaxes`` saves.  ``xg[t]`` on a time-leading
block is a whole aligned tile.  The mask rides as a tiny ``(L, Bp, 1)``
operand (lane dim 1, padded to a lane internally).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmdfn_tpu.ops._util import round_up


def _gru_step(xg, hg, h, Hp):
    """Torch GRU gate math on gate-padded (B, 3Hp) pre-activations."""
    xr, xz, xn = xg[:, :Hp], xg[:, Hp:2 * Hp], xg[:, 2 * Hp:]
    hr, hz, hn = hg[:, :Hp], hg[:, Hp:2 * Hp], hg[:, 2 * Hp:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _fwd_kernel(xgf_ref, xgb_ref, mf_ref, mb_ref,
                whhf_ref, bhhf_ref, whhb_ref, bhhb_ref,
                ysf_ref, ysb_ref, hf_scr, hb_scr, *, Hp: int, T: int):
    """One grid step = T time steps (block): amortizes the per-grid-step
    pipeline overhead that made the 1-step-per-grid version only ~5% faster
    end-to-end (Pallas still double-buffers the T-step blocks).  The forward
    direction's refs stream blocks in ascending time; the backward
    direction's refs are index-mapped ``nT-1-i`` so the SAME grid walks them
    in descending time — no pre-flipped inputs."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        hf_scr[:] = jnp.zeros_like(hf_scr)
        hb_scr[:] = jnp.zeros_like(hb_scr)

    for h_scr, xg_ref, m_ref, whh_ref, bhh_ref, ys_ref, trange in (
            (hf_scr, xgf_ref, mf_ref, whhf_ref, bhhf_ref, ysf_ref,
             range(T)),
            (hb_scr, xgb_ref, mb_ref, whhb_ref, bhhb_ref, ysb_ref,
             range(T - 1, -1, -1))):
        h = h_scr[:]
        whh = whh_ref[:]
        bhh = bhh_ref[:]
        for t in trange:                          # static unroll
            hg = jnp.dot(h, whh,
                         preferred_element_type=jnp.float32) + bhh
            h_new = _gru_step(xg_ref[t], hg, h, Hp)
            # select, never multiply: a non-finite xg in a masked frame must
            # not reach the carry (0*inf would NaN a multiplicative gate)
            h = jnp.where(m_ref[t] > 0.0, h_new, h)
            ys_ref[t] = h
        h_scr[:] = h


def _bwd_kernel(xgf_ref, xgb_ref, mf_ref, mb_ref,
                whhf_ref, bhhf_ref, whhb_ref, bhhb_ref,
                hprevf_ref, hprevb_ref, dyf_ref, dyb_ref,
                dxgf_ref, dxgb_ref, dwf_ref, dbf_ref, dwb_ref, dbb_ref,
                dhf_scr, dhb_scr, dwf_scr, dbf_scr, dwb_scr, dbb_scr,
                *, Hp: int, T: int, nT: int):
    """Reverse-walk BPTT for both directions, T steps per grid step.  BPTT
    traverses each direction's walk order backwards, so the forward
    direction's refs are index-mapped ``nT-1-i`` here and the backward
    direction's stream ascending.  ``hprev`` is each direction's
    walk-order-shifted output (``[h0, ys[:-1]]`` in walk order, precomputed
    in XLA), so no cross-block indexing is needed.  Gate values are
    recomputed from (h_prev, xg) — remat instead of streaming per-step
    residuals."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dhf_scr[:] = jnp.zeros_like(dhf_scr)
        dhb_scr[:] = jnp.zeros_like(dhb_scr)
        dwf_scr[:] = jnp.zeros_like(dwf_scr)
        dbf_scr[:] = jnp.zeros_like(dbf_scr)
        dwb_scr[:] = jnp.zeros_like(dwb_scr)
        dbb_scr[:] = jnp.zeros_like(dbb_scr)

    for (xg_ref, m_ref, whh_ref, bhh_ref, hprev_ref, dy_ref, dxg_ref,
         dh_scr, dw_scr, db_scr, trange) in (
            (xgf_ref, mf_ref, whhf_ref, bhhf_ref, hprevf_ref, dyf_ref,
             dxgf_ref, dhf_scr, dwf_scr, dbf_scr, range(T - 1, -1, -1)),
            (xgb_ref, mb_ref, whhb_ref, bhhb_ref, hprevb_ref, dyb_ref,
             dxgb_ref, dhb_scr, dwb_scr, dbb_scr, range(T))):
        whh = whh_ref[:]
        bhh = bhh_ref[:]
        dh = dh_scr[:]
        dw = dw_scr[:]
        db = db_scr[:]
        for t in trange:                          # static unroll
            h_prev = hprev_ref[t]
            dh = dh + dy_ref[t]
            m = m_ref[t] > 0.0

            xg = xg_ref[t]
            hg = jnp.dot(h_prev, whh,
                         preferred_element_type=jnp.float32) + bhh
            xr, xz, xn = xg[:, :Hp], xg[:, Hp:2 * Hp], xg[:, 2 * Hp:]
            hr, hz, hn = hg[:, :Hp], hg[:, Hp:2 * Hp], hg[:, 2 * Hp:]
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)

            # h_t = where(m, (1-z)*n + z*h_prev, h_prev)
            dh_eff = jnp.where(m, dh, 0.0)
            dz = dh_eff * (h_prev - n) * z * (1.0 - z)    # through sigmoid
            dn = dh_eff * (1.0 - z) * (1.0 - n * n)       # through tanh
            dr = dn * hn * r * (1.0 - r)                  # through sigmoid
            dhgn = dn * r
            # where-select the final cotangents: with m=0 the gate values
            # may be garbage/non-finite (masked frames are quarantined) and
            # 0*NaN would otherwise leak into dW via the accumulations
            dhg = jnp.where(m, jnp.concatenate([dr, dz, dhgn], axis=1), 0.0)
            dxg_ref[t] = jnp.where(
                m, jnp.concatenate([dr, dz, dn], axis=1), 0.0)  # dxn == dn

            dh = jnp.where(
                m,
                dh_eff * z + jax.lax.dot_general(
                    dhg, whh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32),
                dh)
            dw = dw + jax.lax.dot_general(
                h_prev, dhg, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            db = db + jnp.sum(dhg, axis=0, keepdims=True)
        dh_scr[:] = dh
        dw_scr[:] = dw
        db_scr[:] = db

    @pl.when(i == nT - 1)
    def _():
        dwf_ref[:] = dwf_scr[:]
        dbf_ref[:] = dbf_scr[:]
        dwb_ref[:] = dwb_scr[:]
        dbb_ref[:] = dbb_scr[:]


def _pick_T(L, Bp, Hp):
    """Time steps per grid block: amortize per-grid-step overhead while
    keeping the double-buffered blocks within a ~1 MB per-direction budget
    (the backward streams ~2.7x the forward per step).  Prefer the largest
    in-budget T that DIVIDES L: a non-divisor means Lp > L and every
    operand/cotangent gets a whole-tensor time-pad copy in XLA (~0.23
    ms/step at the flagship CRN shapes — more than the grid steps saved)."""
    budget = 1 << 20
    cap = max(1, min(8, L, budget // (Bp * 3 * Hp * 4)))
    for T in range(cap, 1, -1):
        if L % T == 0:
            return T
    return cap


def _vmem_extra(Bp, Hp):
    """Very wide party-batches (MELD CRN: B*P*modalities = 864 sequences)
    saturate _pick_T's T=1 floor and the streamed block set can exceed the
    default scoped-VMEM cap by a sliver (measured: 18.99M vs an 18.58M
    limit).  Raise the Mosaic cap — physical VMEM headroom is
    hardware-validated by the GCNII kernel's batch-blocked backward —
    exactly when one time step's gate block already blows the budget, so
    the flagship shapes keep their default-compiled executables."""
    if Bp * 3 * Hp * 4 > (1 << 20):
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)}
    return {}


def _blk_spec(T, Bp, G):
    return pl.BlockSpec((T, Bp, G), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _rev_blk_spec(T, Bp, G, nT):
    return pl.BlockSpec((T, Bp, G), lambda i: (nT - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)


def _const_spec(*shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _pad_time(a, Lp):
    return jnp.pad(a, ((0, Lp - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bigru_core(interpret, xg_f, xg_b, mask, whh_f, bhh_f, whh_b, bhh_b):
    return _bigru_fwd(interpret, xg_f, xg_b, mask,
                      whh_f, bhh_f, whh_b, bhh_b)[0]


def _bigru_fwd(interpret, xg_f, xg_b, mask, whh_f, bhh_f, whh_b, bhh_b):
    L, Bp, G3 = xg_f.shape
    Hp = G3 // 3
    T = _pick_T(L, Bp, Hp)
    nT = -(-L // T)
    Lp = nT * T
    if Lp != L:   # zero xg/mask pads come AFTER valid steps (mask gates
        # them off in BOTH directions; the backward walk starts on them
        # with carry h0 and passes through untouched)
        xg_f, xg_b = _pad_time(xg_f, Lp), _pad_time(xg_b, Lp)
        mask = _pad_time(mask, Lp)
    kernel = functools.partial(_fwd_kernel, Hp=Hp, T=T)
    ys_f, ys_b = pl.pallas_call(
        kernel,
        grid=(nT,),
        in_specs=[
            _blk_spec(T, Bp, 3 * Hp), _rev_blk_spec(T, Bp, 3 * Hp, nT),
            _blk_spec(T, Bp, 1), _rev_blk_spec(T, Bp, 1, nT),
            _const_spec(Hp, 3 * Hp), _const_spec(1, 3 * Hp),
            _const_spec(Hp, 3 * Hp), _const_spec(1, 3 * Hp),
        ],
        out_specs=[_blk_spec(T, Bp, Hp), _rev_blk_spec(T, Bp, Hp, nT)],
        out_shape=[jax.ShapeDtypeStruct((Lp, Bp, Hp), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((Bp, Hp), jnp.float32)] * 2,
        interpret=interpret,
        **_vmem_extra(Bp, Hp),
    )(xg_f, xg_b, mask, mask, whh_f, bhh_f, whh_b, bhh_b)
    ys_f, ys_b = ys_f[:L], ys_b[:L]
    res = (xg_f, xg_b, mask, whh_f, bhh_f, whh_b, bhh_b, ys_f, ys_b)
    return (ys_f, ys_b), res


def _bigru_bwd(interpret, res, grads):
    xg_f, xg_b, mask, whh_f, bhh_f, whh_b, bhh_b, ys_f, ys_b = res
    dy_f, dy_b = grads
    Lp, Bp, G3 = xg_f.shape            # xg/mask are already time-padded
    Hp = G3 // 3
    L = ys_f.shape[0]
    T = _pick_T(L, Bp, Hp)
    nT = Lp // T

    # each direction's previous-in-walk-order state as a plain shifted
    # array: fwd's h_prev at t is ys_f[t-1] (h0=0 at t=0); bwd's is
    # ys_b[t+1] (h0=0 at the walk start t=L-1; time-pad steps are masked
    # off so their zero hprev/dy/xg back-propagate exact zeros)
    hprev_f = _pad_time(
        jnp.concatenate([jnp.zeros_like(ys_f[:1]), ys_f[:-1]], axis=0), Lp)
    hprev_b = _pad_time(
        jnp.concatenate([ys_b[1:], jnp.zeros_like(ys_b[:1])], axis=0), Lp)
    dy_f, dy_b = _pad_time(dy_f, Lp), _pad_time(dy_b, Lp)

    kernel = functools.partial(_bwd_kernel, Hp=Hp, T=T, nT=nT)
    dxg_f, dxg_b, dw_f, db_f, dw_b, db_b = pl.pallas_call(
        kernel,
        grid=(nT,),
        in_specs=[
            # fwd direction BPTT walks reverse time; bwd walks forward
            _rev_blk_spec(T, Bp, 3 * Hp, nT), _blk_spec(T, Bp, 3 * Hp),
            _rev_blk_spec(T, Bp, 1, nT), _blk_spec(T, Bp, 1),
            _const_spec(Hp, 3 * Hp), _const_spec(1, 3 * Hp),
            _const_spec(Hp, 3 * Hp), _const_spec(1, 3 * Hp),
            _rev_blk_spec(T, Bp, Hp, nT), _blk_spec(T, Bp, Hp),
            _rev_blk_spec(T, Bp, Hp, nT), _blk_spec(T, Bp, Hp),
        ],
        out_specs=[
            _rev_blk_spec(T, Bp, 3 * Hp, nT), _blk_spec(T, Bp, 3 * Hp),
            _const_spec(Hp, 3 * Hp), _const_spec(1, 3 * Hp),
            _const_spec(Hp, 3 * Hp), _const_spec(1, 3 * Hp),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Lp, Bp, 3 * Hp), jnp.float32),
            jax.ShapeDtypeStruct((Lp, Bp, 3 * Hp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, 3 * Hp), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * Hp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, 3 * Hp), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * Hp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bp, Hp), jnp.float32),
            pltpu.VMEM((Bp, Hp), jnp.float32),
            pltpu.VMEM((Hp, 3 * Hp), jnp.float32),
            pltpu.VMEM((1, 3 * Hp), jnp.float32),
            pltpu.VMEM((Hp, 3 * Hp), jnp.float32),
            pltpu.VMEM((1, 3 * Hp), jnp.float32),
        ],
        interpret=interpret,
        **_vmem_extra(Bp, Hp),
    )(xg_f, xg_b, mask, mask, whh_f, bhh_f, whh_b, bhh_b,
      hprev_f, hprev_b, dy_f, dy_b)
    return (dxg_f[:L], dxg_b[:L], jnp.zeros_like(mask[:L]),
            dw_f, db_f, dw_b, db_b)


_bigru_core.defvjp(_bigru_fwd, _bigru_bwd)


def _pack_gates(a, H, Hp, axis):
    """Split the 3H gate axis into r/z/n and pad each to Hp lanes."""
    parts = jnp.split(a, 3, axis=axis)
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, Hp - H)
    return jnp.concatenate([jnp.pad(p, pad) for p in parts], axis=axis)


def pack_gate_weights(w_ih: jnp.ndarray, b_ih: jnp.ndarray, H: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gate-pack the INPUT projection so ``x @ w`` is born kernel-ready.

    ``w_ih`` (D, 3H) / ``b_ih`` (3H,) -> (D, 3Hp) / (3Hp,) with each gate's
    H columns zero-padded to Hp lanes.  Every output column of a matmul is
    an independent dot product, so ``x @ pack(w) + pack(b)`` equals
    ``pack(x @ w + b)`` bit-for-bit while skipping the split/pad/concat
    HBM passes over the (B, L, 3H) pre-activations (and their transposes
    in the backward).
    """
    Hp = round_up(H, 128)
    return (_pack_gates(w_ih, H, Hp, axis=1),
            _pack_gates(b_ih.reshape(1, -1), H, Hp, axis=1).reshape(-1))


def fused_bigru_layer_packed(xg_f: jnp.ndarray, xg_b: jnp.ndarray,
                             whh_f: jnp.ndarray, bhh_f: jnp.ndarray,
                             whh_b: jnp.ndarray, bhh_b: jnp.ndarray,
                             H: int, umask: Optional[jnp.ndarray] = None,
                             *, interpret: bool = False
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused masked bi-GRU layer on gate-packed pre-activations.

    Args:
      xg_f / xg_b: (B, L, 3Hp) gate-packed ``x @ pack(W_ih) + pack(b_ih)``
        per direction, BOTH in natural time order (the kernel walks the
        backward direction in reverse internally).
      whh_f / whh_b: (H, 3H) UNPACKED hidden weights; bhh: (3H,).
      H: logical hidden size (Hp is inferred from xg's last dim).
      umask: (B, L) recurrence gate — the carry updates only where
        ``umask > 0`` (``None`` = all frames).  Masked frames output the
        carried state and are fully quarantined (non-finites there cannot
        leak; their cotangents are exact zeros).
    Returns:
      (ys_f, ys_b): (B, L, H) float32 per-direction outputs, position-
      aligned (ys_b[t] summarizes the valid (mask>0) frames at times >= t).
    """
    B, L, G3p = xg_f.shape
    Hp = G3p // 3
    Bp = round_up(B, 8)

    def prep_xg(xg):
        xg = xg.astype(jnp.float32)
        if Bp != B:
            xg = jnp.pad(xg, ((0, Bp - B), (0, 0), (0, 0)))
        return jnp.swapaxes(xg, 0, 1)                 # (L, Bp, 3Hp)

    def prep_w(w):
        w = _pack_gates(w.astype(jnp.float32), H, Hp, axis=1)
        return jnp.pad(w, ((0, Hp - H), (0, 0)))      # (Hp, 3Hp)

    prep_b = lambda b: _pack_gates(
        b.astype(jnp.float32).reshape(1, -1), H, Hp, axis=1)

    if umask is None:
        mask = jnp.ones((L, Bp, 1), jnp.float32)
    else:
        mask = (umask > 0).astype(jnp.float32)
        if Bp != B:
            mask = jnp.pad(mask, ((0, Bp - B), (0, 0)))
        mask = jnp.swapaxes(mask, 0, 1)[..., None]    # (L, Bp, 1)

    ys_f, ys_b = _bigru_core(
        bool(interpret), prep_xg(xg_f), prep_xg(xg_b), mask,
        prep_w(whh_f), prep_b(bhh_f), prep_w(whh_b), prep_b(bhh_b))
    unpack = lambda ys: jnp.swapaxes(ys, 0, 1)[:B, :, :H]
    return unpack(ys_f), unpack(ys_b)


def fused_bigru_layer(xg_f: jnp.ndarray, xg_b: jnp.ndarray,
                      whh_f: jnp.ndarray, bhh_f: jnp.ndarray,
                      whh_b: jnp.ndarray, bhh_b: jnp.ndarray,
                      umask: Optional[jnp.ndarray] = None,
                      *, interpret: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One masked bidirectional GRU layer's hidden recurrence, fused.

    Drop-in for the two ``_gru_scan`` calls of a BiRNN layer: both ``xg``
    streams are in natural time order; the backward direction's reverse
    walk and the padding/CRN masking happen inside the kernel.

    Unpacked-``xg`` convenience wrapper over
    :func:`fused_bigru_layer_packed` (which BiRNN calls directly with
    weight-side packing to skip the per-call xg repack).

    Args:
      xg_f / xg_b: (B, L, 3H) precomputed ``x @ W_ih + b_ih`` per direction.
      whh_f / whh_b: (H, 3H) hidden weights; bhh_f / bhh_b: (3H,).
      umask: (B, L) recurrence gate or None.
    Returns:
      (ys_f, ys_b): (B, L, H) per-direction outputs, float32.
    """
    B, L, G3 = xg_f.shape
    H = G3 // 3
    Hp = round_up(H, 128)
    pack = lambda xg: _pack_gates(xg.astype(jnp.float32), H, Hp, axis=2)
    return fused_bigru_layer_packed(
        pack(xg_f), pack(xg_b), whh_f, bhh_f, whh_b, bhh_b, H, umask,
        interpret=interpret)
