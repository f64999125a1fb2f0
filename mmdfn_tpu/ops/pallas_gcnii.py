"""Pallas TPU kernel: the whole deep GCNII stack fused into one kernel.

This is the framework's hottest op (SURVEY.md §3.1): 16-64 iterations of
``hi = A @ h`` + GCNII affine update (+ optional shared reason-LSTM step) per
forward.  The XLA formulation (``mmdfn_tpu.nn.gcn.GCNIIStack``) scans over
layers, which re-reads the ``(B, N, N)`` adjacency from HBM and round-trips
``h`` every layer.  This kernel instead runs ALL layers for one batch element
inside a single grid step with the adjacency and hidden state resident in
VMEM:

  HBM traffic per batch element
    XLA scan : nlayers * (N*N + 2*N*H) * 4 bytes      (~4 MB at N=256,L=16)
    fused    : (N*N + 2*N*H + nlayers*2*H*H) * 4      (~1.6 MB, once)

The GCNII 'variant' update splits the concat matmul: ``[hi; h0] @ W ==
hi @ W1 + h0 @ W2`` with ``W1 = W[:H], W2 = W[H:]`` — two aligned MXU matmuls
instead of a concat.

Scope: deterministic forward (eval/serving — dropout is off).  Training keeps
the XLA scan whose backward XLA derives automatically.

MEASURED VERDICT (benchmarks/bench_gcnii_pallas.py, TPU v5e, B=32 N=240 H=100
16 layers + reason-LSTM, round-2 re-measurement with chained data
dependencies): XLA f32 scan 1.83 ms, fused kernel 1.80 ms — **parity** on
the forward.  (Round 1 recorded 0.032 ms vs 0.132 ms; both were async-queue
ghost readings over the tunneled chip — the benchmark pipelined 30
independent calls and blocked only on the last.  The adjacency re-read the
kernel saves is only ~130 MB/stack ≈ 0.16 ms of HBM time, so VMEM residency
cannot produce a large win at these shapes.)  Per SURVEY.md §7.9's
keep-whichever-wins rule the XLA scan stays the production path — it also
gets the backward for free and composes with ``compute_dtype='bfloat16'``
(1.41x fwd+bwd, the optimization that actually pays at these shapes).  The
kernel remains the measured alternative for large-graph regimes.

Zero-padding safety: rows/cols >= the true N are zero in ``adj``/``h``/``h0``.
Pad rows may develop nonzero values through LSTM biases, but pad *columns* of
``adj`` are zero, so valid rows never read them; outputs at pad rows are
garbage and the caller slices them off (same contract as the rest of the
framework).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmdfn_tpu.ops._util import pad_to as pad, round_up


def _kernel(adj_ref, h_ref, h0_ref, w1_ref, w2_ref, theta_ref,
            lstm_ih_ref, lstm_hh_ref, lstm_b_ref, out_ref,
            *, nlayers: int, alpha: float, reason: bool, Hp: int):
    adj = adj_ref[0]                      # (Np, Np) resident for all layers
    h = h_ref[0]
    h0 = h0_ref[0]
    lstm_h = jnp.zeros_like(h)
    lstm_c = jnp.zeros_like(h)

    for l in range(nlayers):              # static unroll: nlayers is small
        theta = theta_ref[l, 0]
        q = h
        if reason:
            g = (h @ lstm_ih_ref[:] + lstm_h @ lstm_hh_ref[:]
                 + lstm_b_ref[0])
            i = jax.nn.sigmoid(g[:, :Hp])
            f = jax.nn.sigmoid(g[:, Hp:2 * Hp])
            gg = jnp.tanh(g[:, 2 * Hp:3 * Hp])
            o = jax.nn.sigmoid(g[:, 3 * Hp:])
            lstm_c = f * lstm_c + i * gg
            lstm_h = o * jnp.tanh(lstm_c)
            h = lstm_h
        hi = jnp.dot(adj, h, preferred_element_type=jnp.float32)
        support = (jnp.dot(hi, w1_ref[l], preferred_element_type=jnp.float32)
                   + jnp.dot(h0, w2_ref[l], preferred_element_type=jnp.float32))
        r = (1.0 - alpha) * hi + alpha * h0
        h = jnp.maximum(theta * support + (1.0 - theta) * r, 0.0)
        if reason:
            h = h + q
    out_ref[0] = h


@functools.partial(jax.jit, static_argnames=("alpha", "variant", "reason",
                                             "interpret"))
def gcnii_stack_fused(adj: jnp.ndarray, h: jnp.ndarray, h0: jnp.ndarray,
                      W: jnp.ndarray, theta: jnp.ndarray,
                      lstm_ih: Optional[jnp.ndarray] = None,
                      lstm_hh: Optional[jnp.ndarray] = None,
                      lstm_b: Optional[jnp.ndarray] = None,
                      *, alpha: float, variant: bool = True,
                      reason: bool = False,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused deterministic GCNII stack.

    Args:
      adj: (B, N, N) normalized adjacency (block-diagonal per dialogue).
      h:   (B, N, H) input hidden state (post fc_in/ReLU).
      h0:  (B, N, H) initial residual.
      W:   (nlayers, 2H, H) if variant else (nlayers, H, H).
      theta: (nlayers,) GCNII identity-map strengths.
      lstm_*: shared reason-LSTM params (H, 4H)/(H, 4H)/(4H,) when reason.
    Returns:
      (B, N, H) final hidden state (pad rows garbage).
    """
    B, N, H = h.shape
    nlayers = W.shape[0]
    Np = round_up(N, 128)
    Hp = round_up(H, 128)

    adj_p = pad(adj.astype(jnp.float32), B, Np, Np)
    h_p = pad(h.astype(jnp.float32), B, Np, Hp)
    h0_p = pad(h0.astype(jnp.float32), B, Np, Hp)
    if variant:
        W1 = pad(W[:, :H].astype(jnp.float32), nlayers, Hp, Hp)
        W2 = pad(W[:, H:].astype(jnp.float32), nlayers, Hp, Hp)
    else:
        # non-variant: support == r == (1-a) hi + a h0; fold into W1/W2
        Wp = pad(W.astype(jnp.float32), nlayers, Hp, Hp)
        W1 = (1.0 - alpha) * Wp
        W2 = alpha * Wp
    theta_c = jnp.asarray(theta, jnp.float32).reshape(nlayers, 1)

    if reason:
        ih = jnp.concatenate(
            [pad(lstm_ih[:, k * H:(k + 1) * H].astype(jnp.float32), H, Hp)
             for k in range(4)], axis=1)
        ih = jnp.pad(ih, [(0, Hp - H), (0, 0)])
        hh = jnp.concatenate(
            [pad(lstm_hh[:, k * H:(k + 1) * H].astype(jnp.float32), H, Hp)
             for k in range(4)], axis=1)
        hh = jnp.pad(hh, [(0, Hp - H), (0, 0)])
        b = jnp.concatenate(
            [jnp.pad(lstm_b[k * H:(k + 1) * H].astype(jnp.float32),
                     (0, Hp - H)) for k in range(4)])
        b = b.reshape(1, 4 * Hp)
    else:
        ih = jnp.zeros((Hp, 4 * Hp), jnp.float32)
        hh = jnp.zeros((Hp, 4 * Hp), jnp.float32)
        b = jnp.zeros((1, 4 * Hp), jnp.float32)

    kernel = functools.partial(_kernel, nlayers=nlayers, alpha=float(alpha),
                               reason=reason, Hp=Hp)
    bcast = lambda shape: pl.BlockSpec(
        shape, lambda b_: (0,) * len(shape), memory_space=pltpu.VMEM)
    per_b = lambda *shape: pl.BlockSpec(
        (1,) + shape, lambda b_: (b_,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            per_b(Np, Np),                       # adj
            per_b(Np, Hp),                       # h
            per_b(Np, Hp),                       # h0
            bcast((nlayers, Hp, Hp)),            # W1
            bcast((nlayers, Hp, Hp)),            # W2
            pl.BlockSpec((nlayers, 1), lambda b_: (0, 0),
                         memory_space=pltpu.SMEM),   # theta
            bcast((Hp, 4 * Hp)),                 # lstm ih
            bcast((Hp, 4 * Hp)),                 # lstm hh
            bcast((1, 4 * Hp)),                  # lstm bias
        ],
        out_specs=per_b(Np, Hp),
        out_shape=jax.ShapeDtypeStruct((B, Np, Hp), jnp.float32),
        interpret=interpret,
    )(adj_p, h_p, h0_p, W1, W2, theta_c, ih, hh, b)
    return out[:, :N, :H].astype(h.dtype)
