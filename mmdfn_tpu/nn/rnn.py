"""Recurrent context encoders as XLA scans.

The reference leans on cuDNN fused RNNs (``nn.GRU``/``nn.LSTM``,
``code/model.py:866-868``, ``code/model_GCN.py:433``) and python time loops
(DialogueRNN ``code/model.py:271-276``, MFN ``code/model_fusion.py:83-113``).
On TPU the idiomatic equivalent is:

* hoist the input-to-hidden projection out of the recurrence — one large
  ``(B*L, D) @ (D, 3H)`` MXU matmul for the whole sequence;
* run the hidden recurrence as a ``jax.lax.scan`` (the only truly sequential
  part, O(L) small ``(B, H) @ (H, 3H)`` matmuls);
* parallelize across dialogues (batch), never across time.

Gate math matches torch exactly (gate order r,z,n for GRU; i,f,g,o for LSTM;
``n = tanh(W_in x + b_in + r * (W_hn h + b_hn))``), verified against
``torch.nn.GRU/LSTM`` in tests/test_rnn.py.

MASKED RECURRENCE (round 3): every recurrence is gated per (batch, time) —
``h_t = where(m_t, cell(h_prev, x_t), h_prev)`` — with ``where`` (select),
never multiplication, so masked frames are fully quarantined (a non-finite
value there cannot poison valid rows through ``0*inf``).  This one
primitive yields:

* padding semantics: pads freeze the carry, so valid outputs are
  padding-invariant by construction (unlike the reference, which feeds
  padded tensors to cuDNN and lets the backward direction consume pads —
  a batch-composition-dependent quirk we fix; DESIGN.md);
* backward directions by PLAIN time reversal (``x[:, ::-1]``) instead of
  the valid-first ``flip_valid`` permutation matmuls — gating makes plain
  reversal correct for arbitrary masks, deleting one-hot ``(B, L, L)``
  einsums (and their backwards) around every bidirectional layer;
* the CRN speaker encoder with ZERO gather/scatter: see
  :func:`crn_party_delta`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmdfn_tpu.utils import torch_init
from mmdfn_tpu.ops._util import on_tpu


def _gru_gates(xg_t: jnp.ndarray, hg: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Torch GRU gate math from precomputed input/hidden projections."""
    xr, xz, xn = jnp.split(xg_t, 3, axis=-1)
    hr, hz, hn = jnp.split(hg, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def _scan_xs(xg, mask):
    """Time-major (xg, gate) pair for a masked scan."""
    m = jnp.swapaxes(mask, 0, 1)[..., None] > 0        # (L, B, 1)
    return (jnp.swapaxes(xg, 0, 1), m)


def _gru_scan(xg: jnp.ndarray, w_hh: jnp.ndarray, b_hh: jnp.ndarray,
              h0: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
              remat: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the (optionally masked) GRU hidden recurrence.

    Args:
      xg: (B, L, 3H) precomputed ``x @ W_ih + b_ih`` for all steps.
      w_hh: (H, 3H); b_hh: (3H,); h0: (B, H).
      mask: (B, L) recurrence gate — the carry updates only where
        ``mask > 0`` (None = every step).
      remat: checkpoint the step — the backward scan recomputes the gate
        math from the carried ``h`` and the input ``xg_t`` instead of
        reading ~6 per-step residual tensors back from HBM (the backward
        scan's gather traffic is the cost; the recompute is a tiny matmul
        that is latency- not FLOP-bound).
    Returns:
      (outputs (B, L, H), final hidden (B, H)).
    """
    if mask is None:
        def step(h, xg_t):
            h_new = _gru_gates(xg_t, h @ w_hh + b_hh, h)
            return h_new, h_new
        xs = jnp.swapaxes(xg, 0, 1)
    else:
        def step(h, xs_t):
            xg_t, m_t = xs_t
            h_new = _gru_gates(xg_t, h @ w_hh + b_hh, h)
            h_new = jnp.where(m_t, h_new, h)
            return h_new, h_new
        xs = _scan_xs(xg, mask)

    if remat:
        step = jax.checkpoint(step, prevent_cse=False)
    h_last, ys = jax.lax.scan(step, h0, xs, unroll=8)
    return jnp.swapaxes(ys, 0, 1), h_last


def _gru_scan_bidi(xg_f: jnp.ndarray, xg_b_rev: jnp.ndarray,
                   w_hh_f: jnp.ndarray, b_hh_f: jnp.ndarray,
                   w_hh_b: jnp.ndarray, b_hh_b: jnp.ndarray,
                   h0: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                   mask_rev: Optional[jnp.ndarray] = None,
                   remat: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Both GRU directions in ONE scan over time.

    ``xg_b_rev`` (and ``mask_rev``) must already be time-reversed; the
    returned backward stream is still reversed — the caller un-reverses.
    The body keeps the two recurrent matmuls *plain* ``(B, H) @ (H, 3H)`` —
    the earlier direction-fusion attempt that packed them into a d=2
    batched einsum regressed 25% on MXU mapping (DESIGN.md) — so this
    variant only halves the number of sequential scan steps (the measured
    latency ceiling), not the per-step matmul shape.
    """
    gated = mask is not None

    def step(carry, xs):
        hf, hb = carry
        if gated:
            xgf_t, mf_t, xgb_t, mb_t = xs
            hf = jnp.where(mf_t, _gru_gates(xgf_t, hf @ w_hh_f + b_hh_f, hf),
                           hf)
            hb = jnp.where(mb_t, _gru_gates(xgb_t, hb @ w_hh_b + b_hh_b, hb),
                           hb)
        else:
            xgf_t, xgb_t = xs
            hf = _gru_gates(xgf_t, hf @ w_hh_f + b_hh_f, hf)
            hb = _gru_gates(xgb_t, hb @ w_hh_b + b_hh_b, hb)
        return (hf, hb), (hf, hb)

    if remat:
        step = jax.checkpoint(step, prevent_cse=False)
    if gated:
        xs = _scan_xs(xg_f, mask) + _scan_xs(xg_b_rev, mask_rev)
    else:
        xs = (jnp.swapaxes(xg_f, 0, 1), jnp.swapaxes(xg_b_rev, 0, 1))
    _, (ys_f, ys_b) = jax.lax.scan(step, (h0, h0), xs, unroll=8)
    return jnp.swapaxes(ys_f, 0, 1), jnp.swapaxes(ys_b, 0, 1)


def _lstm_gates(g: jnp.ndarray, c: jnp.ndarray):
    """Torch LSTM gate math from the summed gate pre-activations."""
    i, f, gg, o = jnp.split(g, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _lstm_scan(xg: jnp.ndarray, w_hh: jnp.ndarray, b_hh: jnp.ndarray,
               h0: jnp.ndarray, c0: jnp.ndarray,
               mask: Optional[jnp.ndarray] = None, remat: bool = False):
    """LSTM hidden recurrence; xg is (B, L, 4H) precomputed input gates."""
    if mask is None:
        def step(carry, xg_t):
            h, c = carry
            h_new, c_new = _lstm_gates(xg_t + h @ w_hh + b_hh, c)
            return (h_new, c_new), h_new
        xs = jnp.swapaxes(xg, 0, 1)
    else:
        def step(carry, xs_t):
            h, c = carry
            xg_t, m_t = xs_t
            h_new, c_new = _lstm_gates(xg_t + h @ w_hh + b_hh, c)
            h_new = jnp.where(m_t, h_new, h)
            c_new = jnp.where(m_t, c_new, c)
            return (h_new, c_new), h_new
        xs = _scan_xs(xg, mask)

    if remat:
        step = jax.checkpoint(step, prevent_cse=False)
    (h_last, c_last), ys = jax.lax.scan(step, (h0, c0), xs, unroll=8)
    return jnp.swapaxes(ys, 0, 1), (h_last, c_last)


def _lstm_scan_bidi(xg_f: jnp.ndarray, xg_b_rev: jnp.ndarray,
                    w_hh_f: jnp.ndarray, b_hh_f: jnp.ndarray,
                    w_hh_b: jnp.ndarray, b_hh_b: jnp.ndarray,
                    h0: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                    mask_rev: Optional[jnp.ndarray] = None,
                    remat: bool = False):
    """Both LSTM directions in one scan (see ``_gru_scan_bidi``)."""
    gated = mask is not None

    def step(carry, xs):
        (hf, cf), (hb, cb) = carry
        if gated:
            xgf_t, mf_t, xgb_t, mb_t = xs
            hf_n, cf_n = _lstm_gates(xgf_t + hf @ w_hh_f + b_hh_f, cf)
            hf = jnp.where(mf_t, hf_n, hf)
            cf = jnp.where(mf_t, cf_n, cf)
            hb_n, cb_n = _lstm_gates(xgb_t + hb @ w_hh_b + b_hh_b, cb)
            hb = jnp.where(mb_t, hb_n, hb)
            cb = jnp.where(mb_t, cb_n, cb)
        else:
            xgf_t, xgb_t = xs
            hf, cf = _lstm_gates(xgf_t + hf @ w_hh_f + b_hh_f, cf)
            hb, cb = _lstm_gates(xgb_t + hb @ w_hh_b + b_hh_b, cb)
        return ((hf, cf), (hb, cb)), (hf, hb)

    if remat:
        step = jax.checkpoint(step, prevent_cse=False)
    zeros = jnp.zeros_like(h0)
    if gated:
        xs = _scan_xs(xg_f, mask) + _scan_xs(xg_b_rev, mask_rev)
    else:
        xs = (jnp.swapaxes(xg_f, 0, 1), jnp.swapaxes(xg_b_rev, 0, 1))
    _, (ys_f, ys_b) = jax.lax.scan(
        step, ((h0, zeros), (h0, zeros)), xs, unroll=8)
    return jnp.swapaxes(ys_f, 0, 1), jnp.swapaxes(ys_b, 0, 1)


class BiRNN(nn.Module):
    """Multi-layer (optionally bidirectional) GRU/LSTM, torch-compatible.

    Equivalent of the reference's ``nn.GRU(input, hidden, num_layers=2,
    bidirectional=True, dropout=p)`` encoders (``code/model.py:866-868``) but
    batch-first and mask-aware.  Inter-layer dropout follows torch: applied to
    every layer's output except the last, train-time only.

    The recurrence is MASK-GATED (carry frozen where ``umask == 0``): valid
    outputs are padding-invariant, and arbitrary (non-prefix) masks select a
    subsequence — the CRN party encoder rides this (``crn_party_delta``).
    The backward direction reads the same arrays reverse-time (in-kernel
    for the pallas backend; plain ``[:, ::-1]`` for the scans) — the former
    ``flip_valid`` permutation matmuls are gone.
    """

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = True
    cell: str = "gru"          # "gru" | "lstm"
    dropout: float = 0.0
    compute_dtype: Optional[str] = None   # 'bfloat16': run the scans in bf16
                                          # (params stay f32 masters; output
                                          # cast back) — same HBM-traffic
                                          # rationale as GCNIIStack's flag
    fuse_directions: bool = False         # run fwd+bwd in ONE scan per layer
                                          # (identical math — params/outputs
                                          # unchanged; halves the sequential
                                          # scan count, the measured latency
                                          # ceiling of the flagship step)
    scan_remat: bool = False              # checkpoint the scan step: the
                                          # backward recomputes gate math
                                          # instead of reading per-step
                                          # residuals back from HBM
    backend: Optional[str] = None         # 'pallas': run each bidirectional
                                          # GRU layer's recurrence as ONE
                                          # fused masked Pallas kernel (fwd +
                                          # custom bwd, ops/pallas_rnn.py);
                                          # falls back to the scans for LSTM
                                          # / unidirectional.  The kernel is
                                          # f32 internally (compute_dtype
                                          # only affects the XLA projections
                                          # around it); scan_remat is moot
                                          # (the kernel's backward always
                                          # recomputes gates in VMEM).
    rate_tag: Optional[str] = None        # consult the traced dropout-rate
                                          # override under this tag for the
                                          # inter-layer dropout (config-
                                          # stacked sweep; nn/drop_override)

    @nn.compact
    def __call__(self, x: jnp.ndarray, umask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """x: (B, L, D) -> (B, L, H * num_directions)."""
        B, L, _ = x.shape
        H = self.hidden_size
        n_gates = 3 if self.cell == "gru" else 4
        scan = _gru_scan if self.cell == "gru" else _lstm_scan
        init = torch_init.rnn_uniform(H)
        directions = ("fwd", "bwd") if self.bidirectional else ("fwd",)
        cd = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        out_dtype = x.dtype
        mask = umask
        mask_rev = mask[:, ::-1] if mask is not None else None
        rev = lambda z: z[:, ::-1]

        out = x if cd is None else x.astype(cd)
        for layer in range(self.num_layers):
            params = {}
            for d in directions:
                name = f"l{layer}_{d}"
                in_dim = out.shape[-1]
                w_ih = self.param(f"w_ih_{name}", init, (in_dim, n_gates * H))
                w_hh = self.param(f"w_hh_{name}", init, (H, n_gates * H))
                b_ih = self.param(f"b_ih_{name}", init, (n_gates * H,))
                b_hh = self.param(f"b_hh_{name}", init, (n_gates * H,))
                if cd is not None:
                    w_ih, w_hh = w_ih.astype(cd), w_hh.astype(cd)
                    b_ih, b_hh = b_ih.astype(cd), b_hh.astype(cd)
                params[d] = (w_ih, w_hh, b_ih, b_hh)

            h0 = jnp.zeros((B, H), dtype=out.dtype)
            if (self.backend == "pallas" and self.bidirectional
                    and self.cell == "gru"):
                from mmdfn_tpu.ops.pallas_rnn import (
                    fused_bigru_layer_packed, pack_gate_weights)
                w_ih_f, w_hh_f, b_ih_f, b_hh_f = params["fwd"]
                w_ih_b, w_hh_b, b_ih_b, b_hh_b = params["bwd"]
                # gate-pack the (tiny) input weights so the projection
                # matmul emits kernel-ready pre-activations — no
                # split/pad/concat pass over the (B, L, 3H) tensors
                # (bit-identical: matmul columns are independent)
                wp_f, bp_f = pack_gate_weights(w_ih_f, b_ih_f, H)
                wp_b, bp_b = pack_gate_weights(w_ih_b, b_ih_b, H)
                xg_f = out @ wp_f + bp_f
                xg_b = out @ wp_b + bp_b
                # interpret off-TPU (CI runs the kernel on the CPU
                # interpreter; same auto-resolution caveat as GCNIIStack's
                # scan_unroll — trace-time process-default backend)
                interp = not on_tpu()
                ys_f, ys_b = fused_bigru_layer_packed(
                    xg_f, xg_b, w_hh_f, b_hh_f, w_hh_b, b_hh_b, H, mask,
                    interpret=interp)
                feats = [ys_f.astype(out.dtype), ys_b.astype(out.dtype)]
            elif self.fuse_directions and self.bidirectional:
                w_ih_f, w_hh_f, b_ih_f, b_hh_f = params["fwd"]
                w_ih_b, w_hh_b, b_ih_b, b_hh_b = params["bwd"]
                xg_f = out @ w_ih_f + b_ih_f
                xg_b_rev = rev(out) @ w_ih_b + b_ih_b
                bidi = _gru_scan_bidi if self.cell == "gru" else _lstm_scan_bidi
                ys_f, ys_b_rev = bidi(xg_f, xg_b_rev, w_hh_f, b_hh_f,
                                      w_hh_b, b_hh_b, h0,
                                      mask=mask, mask_rev=mask_rev,
                                      remat=self.scan_remat)
                feats = [ys_f, rev(ys_b_rev)]
            else:
                feats = []
                for d in directions:
                    w_ih, w_hh, b_ih, b_hh = params[d]
                    inp = rev(out) if d == "bwd" else out
                    m = (mask_rev if d == "bwd" else mask)
                    xg = inp @ w_ih + b_ih
                    if self.cell == "gru":
                        ys, _ = scan(xg, w_hh, b_hh, h0, mask=m,
                                     remat=self.scan_remat)
                    else:
                        ys, _ = scan(xg, w_hh, b_hh, h0, jnp.zeros_like(h0),
                                     mask=m, remat=self.scan_remat)
                    if d == "bwd":
                        ys = rev(ys)
                    feats.append(ys)
            out = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]
            if layer < self.num_layers - 1:
                # draw-compatible nn.Dropout drop-in; honors the traced
                # per-config rate override (no-op when rate 0 + no override)
                from mmdfn_tpu.nn.drop_override import Dropout
                out = Dropout(self.dropout, rate_tag=self.rate_tag)(
                    out, deterministic=deterministic)
        return out.astype(out_dtype)


class GRUCellStep(nn.Module):
    """Single torch-compatible GRU cell (``nn.GRUCell`` gate math).

    Used by the DialogueRNN recurrence (reference ``code/model.py:180-183``:
    ``g_cell``/``p_cell``/``e_cell``/``l_cell``) inside ``lax.scan``/``nn.scan``
    bodies.  Params are created lazily from the input width.
    """

    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        H = self.hidden_size
        init = torch_init.rnn_uniform(H)
        w_ih = self.param("w_ih", init, (x.shape[-1], 3 * H))
        w_hh = self.param("w_hh", init, (H, 3 * H))
        b_ih = self.param("b_ih", init, (3 * H,))
        b_hh = self.param("b_hh", init, (3 * H,))
        xg = x @ w_ih + b_ih
        hg = h @ w_hh + b_hh
        xr, xz, xn = jnp.split(xg, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h


class LSTMCellStep(nn.Module):
    """Single torch-compatible LSTM cell usable step-by-step.

    The GCNII ``reason_flag`` path applies one shared ``nn.LSTM(H, H, 1)``
    step per graph layer with state carried across layers (reference
    ``code/model_GCN.py:458-467``); this module provides that cell.  Params
    are created eagerly so the module can be applied inside ``lax.scan``.
    """

    hidden_size: int

    def setup(self):
        H = self.hidden_size
        init = torch_init.rnn_uniform(H)
        self.w_ih = self.param("w_ih", init, (H, 4 * H))
        self.w_hh = self.param("w_hh", init, (H, 4 * H))
        self.b_ih = self.param("b_ih", init, (4 * H,))
        self.b_hh = self.param("b_hh", init, (4 * H,))

    def __call__(self, x: jnp.ndarray, carry):
        h, c = carry
        g = x @ self.w_ih + self.b_ih + h @ self.w_hh + self.b_hh
        i, f, gg, o = jnp.split(g, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(gg)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, (h_new, c_new)


def crn_party_delta(rnn: nn.Module, x: jnp.ndarray, qmask: jnp.ndarray,
                    umask: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
    """Contextual-reasoning (CRN) speaker encoder via masked recurrence.

    The reference gathers each speaker's utterances into a left-packed
    sub-sequence with nested python loops over batch x party
    (``code/model.py:1040-1060`` and three near-copies at 1070-1154), runs a
    shared party GRU, and scatters outputs back to utterance positions.

    TPU-native formulation (round 3): no gather/scatter at all.  The shared
    RNN's recurrence is MASK-GATED (``BiRNN``: carry frozen at masked
    frames), so running it over the raw sequence gated by "is party p's
    frame" visits exactly that party's frames in time order — the carry
    evolution, and therefore every output at those frames, is bit-identical
    to left-packing the frames, running, and scattering back (oracle test:
    ``test_crn_party_delta_matches_loop_oracle``).  All B*P (batch, party)
    streams run as one fused RNN batch.  This replaced an earlier one-hot
    permutation-matmul formulation (round 2) — gating deletes the
    ``(B, P, L, L)`` permutation build, its two einsum applications, and
    their backwards from the step entirely.

    Args:
      rnn: shared party RNN (reference ``rnn_parties``, ``model.py:868``),
        mask-gated (``BiRNN`` or anything with the same contract).
      x: (B, L, D) projected utterance features.
      qmask: (B, L, P) speaker one-hots (zero rows at pads).
      umask: (B, L) validity mask.
    Returns:
      (B, L, D_out) per-utterance party-contextual features (zero where the
      utterance has no speaker / is padding).
    """
    B, L, P = qmask.shape
    is_p = jnp.transpose(qmask, (0, 2, 1)) > 0            # (B, P, L)
    is_p = jnp.logical_and(is_p, umask[:, None, :] > 0)

    flat = jnp.broadcast_to(x[:, None], (B, P, L, x.shape[-1]))
    flat = flat.reshape(B * P, L, x.shape[-1])
    flat_mask = is_p.reshape(B * P, L).astype(x.dtype)
    E = rnn(flat, flat_mask, deterministic=deterministic)  # (B*P, L, D_out)
    E = E.reshape(B, P, L, -1)

    # outputs only claim each party's own frames (select, not multiply:
    # masked frames output carried state, and a non-finite parked in ANY
    # masked frame must stay quarantined — 0*inf would NaN here)
    return jnp.sum(jnp.where(is_p[..., None], E, 0.0), axis=1)
