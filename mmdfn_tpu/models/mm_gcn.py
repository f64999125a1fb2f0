"""MM-DFN / MMGCN graph-fusion cores.

* :class:`MMGCN` — the MM-DFN core (reference ``MM_GCN``,
  ``code/model_mm.py:44-180``): speaker/modal embeddings, dynamic cross-modal
  adjacency, GCNII_lyc backbone over the stacked ``[a; v; l]`` node matrix,
  per-modality re-split + concat.  ``reason_flag=True`` is the published
  MM-DFN ("GDF"); ``False`` is the MMGCN baseline ("GF").
* :class:`MMGCN2` — the MMGCN2 ablation (reference ``MM_GCN2``,
  ``model_mm.py:183-258``, graph_type "GF2").
* :class:`DeepGCNII` — single-modality deep GCNII net (reference ``GCNII`` /
  ``GCNII_lyc`` full networks, ``model_GCN.py:224-285`` / ``412-488``), the
  "DeepGCN" graph type.

Deliberate deviations from the reference (each documented in DESIGN.md):
  * ``MM_GCN.a_fc/v_fc/l_fc`` are declared upstream but never called in
    forward (``model_mm.py:55-57`` vs ``77-120``) — we do not create them.
  * hard-coded ``.cuda()`` calls (``model_mm.py:98,125``) have no equivalent;
    device placement is XLA's job.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmdfn_tpu.graph.adjacency import (mm_big_adjacency,
                                       mm_wo_speaker_adjacency)
from mmdfn_tpu.nn.gcn import GCNIIStack
from mmdfn_tpu.nn.linear import TorchDense
from mmdfn_tpu.utils import torch_init


class MMGCN(nn.Module):
    """Cross-modal GCNII fusion network (MM-DFN when ``reason_flag``).

    Call with the modality dict produced by the context encoders; every
    tensor is ``(B, L, n_dim)`` with shared ``qmask (B, L, P)`` /
    ``umask (B, L)``.  Output is the fused per-utterance feature
    ``(B, L, M * (n_dim + nhidden))`` when ``use_residue`` (the default path
    feeding the classifier head), matching reference ``model_mm.py:108-118``.
    """

    n_dim: int
    nlayers: int
    nhidden: int
    nclass: int
    dropout: float = 0.4
    lamda: float = 0.5
    alpha: float = 0.2
    variant: bool = True
    return_feature: bool = True
    use_residue: bool = True
    n_speakers: int = 2
    modals: str = "avl"
    use_speaker: bool = False
    use_modal: bool = False
    reason_flag: bool = False
    modal_weight: float = 1.0
    compute_dtype: Optional[str] = None   # 'bfloat16' scan fast path
    scan_unroll: Optional[int] = None     # layer-scan unroll (see GCNIIStack)
    scan_remat: bool = False              # layer remat (see GCNIIStack)
    spmm: Optional[Callable] = None       # node-sharded adj@h override
                                          # (tensor parallelism; GCNIIStack)
    backend: Optional[str] = None         # 'pallas' fused train stack
    bwd_block: Optional[int] = None       # fused-kernel backward batch block
    rate_tag: Optional[str] = None        # traced dropout-rate override tag
                                          # (config-stacked sweep)

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], qmask: jnp.ndarray,
                 umask: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        modals = [m for m in self.modals]
        assert len(modals) >= 2, "MMGCN needs at least two modalities"
        B, L = umask.shape
        um = umask[..., None]

        feats = dict(feats)
        if self.use_speaker and "l" in modals:
            # speaker embedding added to the text modality only
            # (reference model_mm.py:79-83)
            spk_idx = jnp.argmax(qmask, axis=-1)
            spk_table = self.param(
                "speaker_embeddings", torch_init.embedding_normal,
                (self.n_speakers, self.n_dim))
            feats["l"] = feats["l"] + spk_table[spk_idx] * um
        if self.use_modal:
            modal_table = self.param(
                "modal_embeddings", torch_init.embedding_normal,
                (3, self.n_dim))
            for i, m in enumerate("avl"):
                if m in feats and m in modals:
                    feats[m] = feats[m] + modal_table[i][None, None] * um

        ordered = [feats[m] for m in modals]
        adj = mm_big_adjacency(ordered, umask, modal_weight=self.modal_weight)
        x = jnp.concatenate(ordered, axis=1)          # (B, M*L, n_dim)

        stack = GCNIIStack(
            nlayers=self.nlayers, nhidden=self.nhidden, dropout=self.dropout,
            lamda=self.lamda, alpha=self.alpha, variant=self.variant,
            reason_flag=self.reason_flag, has_fc_in=True,
            dropout_mode="after", post_loop_dropout=False,
            compute_dtype=self.compute_dtype,
            scan_unroll=self.scan_unroll, scan_remat=self.scan_remat,
            spmm=self.spmm, backend=self.backend,
            bwd_block=self.bwd_block, rate_tag=self.rate_tag,
            name="graph_net")
        x_resid, h = stack(x, adj, deterministic=deterministic)
        if self.use_residue:
            h = jnp.concatenate([x_resid, h], axis=-1)   # model_GCN.py:482-483

        parts = [h[:, i * L:(i + 1) * L] for i in range(len(modals))]
        out = jnp.concatenate(parts, axis=-1)            # model_mm.py:112-116
        if self.return_feature:
            return out
        # Faithful quirk: the reference applies *softmax* (not log_softmax)
        # on this unreachable-by-default tail (model_mm.py:120).
        return jax.nn.softmax(TorchDense(self.nclass, name="final_fc")(out), axis=-1)


class MMGCN2(nn.Module):
    """MMGCN2 ablation (graph type "GF2", reference ``model_mm.py:183-258``).

    Per-modal dropout+fc+relu encoders, stacked node matrix, its own
    adjacency family (``create_big_adj`` with the raw-arccos quirk and
    constant 0.99999 cross edges, ``model_mm.py:260-296``), inline GCNII conv
    loop with dropout *before* each conv, per-modality re-split, optional
    residue concat with the raw text features.

    ``new_graph=True`` (``message_passing_relation_graph``) is shape-broken
    upstream (builds an (N, N) graph for 3N nodes) and unsupported here.
    """

    nfeat: int
    nlayers: int
    nhidden: int
    nclass: int
    dropout: float = 0.4
    lamda: float = 0.5
    alpha: float = 0.1
    variant: bool = True
    return_feature: bool = True
    use_residue: bool = True
    modals: str = "avl"
    mm_graph: str = "direct"
    compute_dtype: Optional[str] = None
    scan_unroll: Optional[int] = None
    scan_remat: bool = False
    rate_tag: Optional[str] = None        # traced dropout-rate override tag

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray], qmask: jnp.ndarray,
                 umask: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from mmdfn_tpu.nn.drop_override import Dropout

        modals = [m for m in self.modals]
        B, L = umask.shape

        def enc(x, name):
            x = Dropout(self.dropout, rate_tag=self.rate_tag)(
                x, deterministic=deterministic)
            return nn.relu(TorchDense(self.nhidden, name=name)(x))

        encoded = [enc(feats[m], f"fc_{m}") for m in modals]
        x = jnp.concatenate(encoded, axis=1)            # (B, M*L, H)

        if self.mm_graph in ("single", "window", "fc"):
            # message_passing_wo_speaker family (model_mm.py:298-477) — dead
            # code upstream (forward never calls it); completed here from the
            # encoded node features, matching how the forward feeds its other
            # node-matrix builder (model_mm.py:236-237 passes x, not a/v/l).
            adj = mm_wo_speaker_adjacency(encoded, umask,
                                          scheme=self.mm_graph)
        else:
            # Adjacency from the *raw* (pre-encoder) features, as upstream
            # (model_mm.py:239 passes a, v, l not a_, v_, l_).
            raw = [feats[m] for m in modals]
            adj = mm_big_adjacency(raw, umask, variant="arccos",
                                   cross_constant=0.99999)

        stack = GCNIIStack(
            nlayers=self.nlayers, nhidden=self.nhidden, dropout=self.dropout,
            lamda=self.lamda, alpha=self.alpha, variant=self.variant,
            reason_flag=False, has_fc_in=False,
            dropout_mode="before", post_loop_dropout=True,
            compute_dtype=self.compute_dtype,
            scan_unroll=self.scan_unroll, scan_remat=self.scan_remat,
            rate_tag=self.rate_tag, name="convs")
        _, h = stack(x, adj, deterministic=deterministic)

        parts = [h[:, i * L:(i + 1) * L] for i in range(len(modals))]
        out = jnp.concatenate(parts, axis=-1)
        if self.use_residue:
            out = jnp.concatenate([feats["l"], out], axis=-1)  # model_mm.py:254
        if self.return_feature:
            return out
        out = TorchDense(self.nclass, name="fc_out")(out)
        return jax.nn.log_softmax(out, axis=-1)


class DeepGCNII(nn.Module):
    """Full single-modality GCNII network (reference ``GCNII``,
    ``model_GCN.py:224-285``; ``lyc=True`` gives the GCNII_lyc dropout
    wiring).  Builds its own per-dialogue block adjacency from the inputs."""

    nfeat: int
    nlayers: int
    nhidden: int
    nclass: int
    dropout: float = 0.4
    lamda: float = 0.5
    alpha: float = 0.1
    variant: bool = True
    return_feature: bool = False
    use_residue: bool = True
    reason_flag: bool = False
    lyc: bool = False
    new_graph: bool = False
    compute_dtype: Optional[str] = None
    scan_unroll: Optional[int] = None
    scan_remat: bool = False
    spmm: Optional[Callable] = None
    backend: Optional[str] = None
    bwd_block: Optional[int] = None
    rate_tag: Optional[str] = None        # traced dropout-rate override tag

    @nn.compact
    def __call__(self, x: jnp.ndarray, qmask: jnp.ndarray, umask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        from mmdfn_tpu.graph.adjacency import (
            directed_speaker_adjacency, gcnii_block_adjacency)

        if self.new_graph:
            adj = directed_speaker_adjacency(x, qmask, umask, normalize=True)
        elif self.lyc:
            adj = gcnii_block_adjacency(x, umask, variant="arccos")
        else:
            adj = gcnii_block_adjacency(x, umask, variant="angular")

        stack = GCNIIStack(
            nlayers=self.nlayers, nhidden=self.nhidden, dropout=self.dropout,
            lamda=self.lamda, alpha=self.alpha, variant=self.variant,
            reason_flag=self.reason_flag, has_fc_in=True,
            dropout_mode="after" if self.lyc else "none",
            post_loop_dropout=not self.lyc,
            compute_dtype=self.compute_dtype,
            scan_unroll=self.scan_unroll, scan_remat=self.scan_remat,
            spmm=self.spmm, backend=self.backend,
            bwd_block=self.bwd_block, rate_tag=self.rate_tag, name="stack")
        x_resid, h = stack(x, adj, deterministic=deterministic)
        if self.use_residue:
            h = jnp.concatenate([x_resid, h], axis=-1)
        if self.return_feature:
            return h
        out = TorchDense(self.nclass, name="fc_out")(h)
        return jax.nn.log_softmax(out, axis=-1)
