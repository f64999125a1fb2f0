"""Graph-convolution stacks compiled to a single XLA scan.

The reference's deep GCNII stacks run a 16-64 iteration python loop of
``torch.spmm(adj, h)`` + GCNII update per layer (``model_GCN.py:461-472``),
with per-layer ``theta = log(lamda/l + 1)`` and an optional shared
"reasoning" LSTM cell whose state persists across layers
(``model_GCN.py:458-467``).  Here the whole stack is one ``jax.lax.scan``
over stacked layer weights; each step is a batched dense
``(B, N, N) @ (B, N, H)`` matmul that maps straight onto the MXU, plus the
GCNII affine update.  The adjacency is built once per forward (see
:mod:`mmdfn_tpu.graph.adjacency`) and closed over by the scan.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmdfn_tpu.nn.linear import TorchDense
from mmdfn_tpu.utils import torch_init
from mmdfn_tpu.ops._util import on_tpu


def gcnii_conv(h: jnp.ndarray, adj: jnp.ndarray, h0: jnp.ndarray,
               W: jnp.ndarray, theta: jnp.ndarray, alpha: float,
               variant: bool, spmm=None) -> jnp.ndarray:
    """One GCNII graph convolution (reference ``model_GCN.py:176-189``).

    ``hi = A h``; variant: ``support = [hi; h0]``, ``r = (1-a) hi + a h0``;
    else ``support = r = (1-a) hi + a h0``; output
    ``theta * support W + (1-theta) * r``.

    ``spmm`` overrides the dense batched matmul (e.g. the node-sharded
    tensor-parallel product, ``parallel/graph_parallel.py``).
    """
    hi = (jnp.einsum("bnm,bmh->bnh", adj, h) if spmm is None
          else spmm(adj, h))
    if variant:
        support = jnp.concatenate([hi, h0], axis=-1)
        r = (1.0 - alpha) * hi + alpha * h0
    else:
        support = (1.0 - alpha) * hi + alpha * h0
        r = support
    return theta * (support @ W) + (1.0 - theta) * r


def _dropout(x, key, keep, inv_keep):
    # explicit inv_keep multiply: static and traced rates compile to the
    # same arithmetic (see nn/drop_override.py:resolve).  The cast keeps a
    # traced f32 scale from promoting a bf16 compute-dtype carry (a python
    # float would stay weakly typed).
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x * jnp.asarray(inv_keep, x.dtype), 0.0)


class GCNIIStack(nn.Module):
    """Deep GCNII stack as a ``lax.scan``.

    Covers all three reference wirings through flags:

    * ``GCNII`` (``model_GCN.py:224-285``): ``has_fc_in=True``,
      ``dropout_mode='none'``, ``post_loop_dropout=True``.
    * ``GCNII_lyc`` (``model_GCN.py:412-488``, the MM-DFN backbone):
      ``has_fc_in=True``, ``dropout_mode='after'``,
      ``post_loop_dropout=False``.
    * ``MM_GCN2``'s inline conv loop (``model_mm.py:240-246``):
      ``has_fc_in=False``, ``dropout_mode='before'``,
      ``post_loop_dropout=True``.

    ``reason_flag`` threads a single shared LSTM cell through the layer loop
    with an additive skip (the MM-DFN "dynamic fusion" recurrence).

    Returns ``(x_resid, h)`` where ``x_resid`` is the (input-dropout'd) stack
    input the caller may concat as a residual (reference reuses its mutated
    ``x`` variable for the residue concat, ``model_GCN.py:482-483``).
    """

    nlayers: int
    nhidden: int
    dropout: float = 0.0
    lamda: float = 0.5
    alpha: float = 0.1
    variant: bool = True
    reason_flag: bool = False
    has_fc_in: bool = True
    dropout_mode: str = "after"      # 'before' | 'after' | 'none' (in-loop)
    post_loop_dropout: bool = False
    compute_dtype: Optional[str] = None   # 'bfloat16': run the layer scan in
                                          # bf16 (params stay f32; the output
                                          # is cast back).  Halves the scan's
                                          # HBM traffic — measured 1.4x on
                                          # the fwd+bwd stack at flagship
                                          # shapes.  Off by default: strict
                                          # reference parity needs f32.
    scan_unroll: Optional[int] = None     # None = auto: FULL unroll on TPU
                                          # (interleaved A/B: blocked median
                                          # 43.2 ms vs 52.1 at unroll=2;
                                          # XLA fuses across layer bounds;
                                          # one-time compile ~51 s at 16
                                          # layers, disk-cached), unroll=2
                                          # on CPU/other backends where the
                                          # straight-lined program blows up
                                          # test compile times (the full
                                          # suite regressed 2x).  Set an int
                                          # to override either way.
    scan_remat: bool = False              # checkpoint each layer: backward
                                          # recomputes adj@h + gates instead
                                          # of reading per-layer residuals
                                          # from HBM (extra MXU FLOPs are
                                          # ~20x cheaper than the traffic)
    spmm: Optional[Callable] = None       # override for the per-layer
                                          # adj@h product — set to
                                          # parallel.sharded_spmm_batched
                                          # (via Trainer n_model_devices>1)
                                          # to run the stack node-sharded
                                          # over the mesh's model axis
    backend: Optional[str] = None         # 'pallas': fully fused train
                                          # stack (fwd + custom bwd +
                                          # in-kernel PRNG dropout,
                                          # ops/pallas_gcnii_train.py);
                                          # 'pallas_fused': same kernel with
                                          # stacked-operand dots (fuse_dots,
                                          # perf experiment); falls back to
                                          # the scan for non-variant / other
                                          # dropout wirings / nlayers>64 / TP
    bwd_block: Optional[int] = None       # batch elements per backward grid
                                          # step of the fused kernel (grad
                                          # dots contract Bk x the rows;
                                          # non-divisors of B fall back to 1)
    rate_tag: Optional[str] = None        # consult the traced dropout-rate
                                          # override under this tag (set by
                                          # the config-stacked sweep; see
                                          # nn/drop_override.py) — only sites
                                          # whose static rate derives from
                                          # the swept config field are tagged

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray,
                 deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from mmdfn_tpu.nn import drop_override

        H = self.nhidden
        B, N = x.shape[0], x.shape[1]
        keep, inv_keep, rate_ov = drop_override.resolve(
            self.rate_tag, self.dropout)
        use_dropout = ((rate_ov is not None) or (self.dropout > 0.0)) \
            and not deterministic
        if use_dropout:
            root_key = self.make_rng("dropout")
            keys = jax.random.split(root_key, self.nlayers + 3)
        else:
            keys = None

        if self.has_fc_in:
            if use_dropout:
                x = _dropout(x, keys[-1], keep, inv_keep)
            h = nn.relu(TorchDense(H, name="fc_in")(x))
            h0 = h
            if use_dropout:
                h = _dropout(h, keys[-2], keep, inv_keep)
        else:
            h = x
            h0 = x

        in_w = 2 * H if self.variant else H
        W = self.param(
            "conv_w",
            torch_init.uniform_by_bound(1.0 / math.sqrt(H)),
            (self.nlayers, in_w, H),
        )
        theta = jnp.log(self.lamda / jnp.arange(1, self.nlayers + 1) + 1.0)

        if self.reason_flag:
            init = torch_init.rnn_uniform(H)
            lw_ih = self.param("reason_w_ih", init, (H, 4 * H))
            lw_hh = self.param("reason_w_hh", init, (H, 4 * H))
            lb_ih = self.param("reason_b_ih", init, (4 * H,))
            lb_hh = self.param("reason_b_hh", init, (4 * H,))

        out_dtype = h.dtype
        interp = not on_tpu()
        if (self.backend in ("pallas", "pallas_fused") and self.variant
                and self.dropout_mode == "after" and self.spmm is None
                and not self.post_loop_dropout and self.nlayers <= 64
                # off-TPU the Pallas interpreter's PRNG is a zero stub, so
                # the in-kernel dropout would silently keep everything —
                # fall back to the scan whenever dropout is live off-TPU
                and not (use_dropout and interp)):
            # fully fused train stack (fwd + custom bwd + in-kernel
            # hardware-PRNG dropout, ops/pallas_gcnii_train.py).  nlayers
            # gated by the backward's VMEM weight-grad accumulators (8 MiB
            # at 64 layers — the deepest published config — under the
            # raised Mosaic VMEM cap; see _stack_bwd).
            # gcn_compute_dtype is ignored: the kernel is bf16-matmul /
            # f32-accumulate internally.  Dropout draws come from the TPU
            # PRNG (deterministic per step seed; same contract as the
            # trainer's rng_impl knob).
            from mmdfn_tpu.ops.pallas_gcnii_train import gcnii_stack_train
            if use_dropout:
                root_data = (jax.random.key_data(root_key)
                             if jnp.issubdtype(root_key.dtype,
                                               jax.dtypes.prng_key)
                             else root_key)
                seed = root_data.reshape(-1)[0].astype(jnp.int32)
                # static rate -> baked threshold; override -> the traced
                # per-config DropRate rides as SMEM operands
                rate_arg = (float(self.dropout) if rate_ov is None
                            else rate_ov)
            else:
                seed = jnp.int32(0)
                rate_arg = 0.0
            if self.reason_flag:
                lstm = (lw_ih, lw_hh, lb_ih + lb_hh)
            else:
                lstm = (None, None, None)
            h = gcnii_stack_train(
                adj, h, h0, W, theta, *lstm, alpha=self.alpha,
                reason=self.reason_flag, rate=rate_arg, seed=seed,
                interpret=interp,
                fuse_dots=(self.backend == "pallas_fused"),
                bwd_batch_block=self.bwd_block)
            return x, h.astype(out_dtype)

        cd = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        if cd is not None:
            # cast once at the scan boundary: carry, residual anchor h0,
            # adjacency, stacked weights and theta all live in bf16 so every
            # in-loop tensor (the HBM-bound part) is half-width; python
            # scalars (alpha) stay weakly typed and do not upcast
            h, h0, adj = h.astype(cd), h0.astype(cd), adj.astype(cd)
            W = W.astype(cd)
            theta = theta.astype(cd)
            if self.reason_flag:
                lw_ih, lw_hh = lw_ih.astype(cd), lw_hh.astype(cd)
                lb_ih, lb_hh = lb_ih.astype(cd), lb_hh.astype(cd)

        def lstm_step(h_in, state):
            hh, cc = state
            g = h_in @ lw_ih + lb_ih + hh @ lw_hh + lb_hh
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(gg)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return h_new, (h_new, c_new)

        zeros = jnp.zeros_like(h)
        layer_keys = keys[: self.nlayers] if use_dropout else jnp.zeros((self.nlayers, 2), dtype=jnp.uint32)

        def body(carry, xs):
            h, state = carry
            W_i, theta_i, key_i = xs
            if self.dropout_mode == "before" and use_dropout:
                h = _dropout(h, key_i, keep, inv_keep)
            if self.reason_flag:
                q = h
                h, state = lstm_step(h, state)
            h = nn.relu(gcnii_conv(h, adj, h0, W_i, theta_i, self.alpha,
                                   self.variant, spmm=self.spmm))
            if self.dropout_mode == "after" and use_dropout:
                h = _dropout(h, key_i, keep, inv_keep)
            if self.reason_flag:
                h = h + q
            return (h, state), None

        if self.scan_unroll is not None:
            unroll = max(1, self.scan_unroll)
        else:  # auto: backend is a trace-time constant ('axon' = TPU tunnel).
            # Caveat (accepted): this reads the PROCESS-default backend, so a
            # jit explicitly targeting a different backend than the default
            # picks the other unroll — compile-time/perf only, math identical
            # (invariance tested); set scan_unroll explicitly in that case.
            unroll = self.nlayers if on_tpu() else 2
        if self.scan_remat:
            body = jax.checkpoint(body, prevent_cse=False)
        (h, _), _ = jax.lax.scan(
            body, (h, (zeros, zeros)), (W, theta, layer_keys),
            unroll=min(unroll, self.nlayers))
        h = h.astype(out_dtype)

        if self.post_loop_dropout and use_dropout:
            h = _dropout(h, keys[-3], keep, inv_keep)
        return x, h


class GCNLayer1(nn.Module):
    """Plain dense-adjacency GCN layer (reference ``model_GCN.py:8-23``):
    builds its own graph from the inputs, then ``linear(adj @ x)``.

    ``new_graph=True`` uses the *unnormalized* directed-speaker chain graph
    (``model_GCN.py:85-118`` returns raw adj); ``False`` uses the normalized
    full-clique angular graph with identity diagonal (``model_GCN.py:43-83``).
    ``use_topic`` is dead/broken upstream (indexes past the node array) and
    is deliberately unsupported.
    """

    out_feats: int
    new_graph: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, qmask: jnp.ndarray,
                 umask: jnp.ndarray) -> jnp.ndarray:
        from mmdfn_tpu.graph.adjacency import (
            directed_speaker_adjacency, intra_modal_similarity,
            symmetric_normalize)

        if self.new_graph:
            adj = directed_speaker_adjacency(x, qmask, umask, normalize=False)
        else:
            sim = intra_modal_similarity(x, umask, variant="angular_exact")
            off_diag = sim * (1.0 - jnp.eye(x.shape[1])[None])
            adj = off_diag + jnp.eye(x.shape[1])[None] * umask[:, :, None]
            adj = symmetric_normalize(adj, umask)
        h = jnp.einsum("bnm,bmd->bnd", adj, x)
        return TorchDense(self.out_feats)(h)


class GCN2Layers(nn.Module):
    """Two stacked GCNLayer1 + residual classifier head
    (reference ``GCN_2Layers``, ``model_GCN.py:121-154``)."""

    gcn_hid_dim: int
    num_class: int
    use_residue: bool = True
    return_feature: bool = False
    new_graph: bool = True  # GCNLayer1 default upstream (model_GCN.py:9)

    @nn.compact
    def __call__(self, x, qmask, umask, deterministic: bool = True):
        g1 = GCNLayer1(self.gcn_hid_dim, self.new_graph, name="gcn1")(x, qmask, umask)
        if not self.use_residue:
            out = GCNLayer1(self.num_class, self.new_graph, name="gcn2")(g1, qmask, umask)
            return jax.nn.log_softmax(out, axis=-1)
        g2 = GCNLayer1(self.gcn_hid_dim, self.new_graph, name="gcn2")(g1, qmask, umask)
        feat = jnp.concatenate([x, g2], axis=-1)
        if self.return_feature:
            return feat
        out = TorchDense(self.num_class, name="linear")(feat)
        return jax.nn.log_softmax(out, axis=-1)
