"""Vectorized dynamic-graph adjacency builders.

This is the heart of the TPU redesign.  The reference rebuilds a dense
``(M·N, M·N)`` cross-modal adjacency *every forward pass* with a python loop
over dialogues and modality pairs (``code/model_mm.py:122-180``) — the #2 hot
spot after the GCN layer loop itself.  Here every builder is a closed-form
batched expression over statically padded ``(B, L, D)`` tensors producing
``(B, M·L, M·L)`` per-dialogue adjacencies that XLA fuses into a handful of
MXU matmuls + VPU elementwise ops.

Batched-block equivalence: the reference's one big graph over the packed
batch is block-diagonal by dialogue (no cross-dialogue edges), and its
symmetric degree normalization therefore factorizes per block — so computing
per-dialogue ``(M·L, M·L)`` adjacencies is mathematically identical to the
reference's global ``(M·N, M·N)`` matrix (verified against a numpy oracle in
tests/test_adjacency.py).

Numerics: ``arccos`` near ±1 is ill-conditioned, so similarity is always
computed in float32 regardless of the compute dtype used elsewhere, matching
the reference's f32 torch ops.  Padding rows/cols are masked *before* degree
normalization: a zero-degree pad row would otherwise produce ``0^-0.5 = inf``
(the reference never sees pads because it packs; we must be explicit).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_SCALE = 0.99999  # reference multiplies cosines by this before arccos
                  # (model_mm.py:149, model_GCN.py:296) to stay in acos domain


def _cos_precision():
    """Matmul precision of the similarity cosines (trace-time env knob,
    benchmarks A/B only).  Default HIGHEST (6 bf16 MXU passes ~ f32): the
    bf16 default puts ~1e-2 into cosines, which arccos amplifies near +/-1.
    ``MMDFN_ADJ_PRECISION=high`` (3 passes) is the measured-A/B candidate."""
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[
        os.environ.get("MMDFN_ADJ_PRECISION", "highest")]


def _safe_unit(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2-normalize, mapping zero vectors (pads) to zero.

    Gradient-safe: ``sqrt`` is evaluated on a value bounded away from zero so
    pad rows don't emit ``0 * inf = nan`` cotangents (a ``where`` on the
    output alone would not stop the nan from the sqrt's own backward).
    """
    x = x.astype(jnp.float32)
    s = jnp.sum(x * x, axis=axis, keepdims=True)
    norm = jnp.sqrt(jnp.where(s > 0, s, 1.0))
    return x / norm


def _safe_arccos(z: jnp.ndarray) -> jnp.ndarray:
    """arccos with exact forward value but gradient clipped away from +/-1.

    ``d/dz arccos = -1/sqrt(1-z^2)`` is -inf at the clip boundary; diagonal
    cosines hit exactly 1.0, so the unprotected backward produces inf/nan.
    """
    zg = jnp.clip(z, -1.0 + 1e-6, 1.0 - 1e-6)
    return jnp.arccos(zg) + jax.lax.stop_gradient(
        jnp.arccos(z) - jnp.arccos(zg))


def angular_similarity(cos: jnp.ndarray) -> jnp.ndarray:
    """``1 - arccos(0.99999 * cos) / pi`` (reference ``model_mm.py:149-151``)."""
    return 1.0 - _safe_arccos(jnp.clip(cos * _SCALE, -1.0, 1.0)) / np.pi


def arccos_similarity(cos: jnp.ndarray) -> jnp.ndarray:
    """Raw ``arccos(0.99999 * cos)`` — the MM_GCN2 / GCNII_lyc variant that
    *omits* the ``1 - x/pi`` map (reference ``model_mm.py:274``,
    ``model_GCN.py:500``).  Kept as a deliberate faithful quirk."""
    return _safe_arccos(jnp.clip(cos * _SCALE, -1.0, 1.0))


def angular_exact_similarity(cos: jnp.ndarray) -> jnp.ndarray:
    """``1 - arccos(clamp(cos)) / pi`` without the 0.99999 scale — the
    ``atom_calculate_edge_weight`` path used by the speaker-chain and
    windowed-clique builders (reference ``model_GCN.py:33-41``), which clamps
    out-of-domain cosines to exactly +/-1 instead of rescaling."""
    return 1.0 - _safe_arccos(jnp.clip(cos, -1.0, 1.0)) / np.pi


_SIM = {
    "angular": angular_similarity,
    "arccos": arccos_similarity,
    "angular_exact": angular_exact_similarity,
}


def intra_modal_similarity(x: jnp.ndarray, umask: jnp.ndarray,
                           variant: str = "angular") -> jnp.ndarray:
    """(B, L, D), (B, L) -> (B, L, L) masked pairwise angular similarity."""
    n = _safe_unit(x)
    # HIGHEST precision: on TPU the default bf16 matmul gives ~1e-2 cosine
    # error, which arccos amplifies near +/-1 (SURVEY.md "hard parts")
    cos = jnp.einsum("bld,bmd->blm", n, n,
                     precision=_cos_precision())
    sim = _SIM[variant](cos)
    m = umask.astype(jnp.float32)
    return sim * (m[:, :, None] * m[:, None, :])


def cross_modal_diag_similarity(x: jnp.ndarray, y: jnp.ndarray,
                                umask: jnp.ndarray,
                                variant: str = "angular") -> jnp.ndarray:
    """(B, L) angular similarity between the same utterance in two modalities
    (reference ``model_mm.py:161-167``)."""
    cos = jnp.sum(_safe_unit(x) * _safe_unit(y), axis=-1)
    return _SIM[variant](cos) * umask.astype(jnp.float32)


def symmetric_normalize(adj: jnp.ndarray, node_mask: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """``D^-1/2 A D^-1/2`` with a zero-degree guard for pad rows.

    Reference: ``model_mm.py:176-178``.  ``node_mask`` (B, N) optionally
    re-zeros pad rows/cols after normalization (degree of a pad row is 0, so
    its d^-1/2 is forced to 0 rather than inf).
    """
    d = jnp.sum(adj, axis=-1)
    # double-where: rsqrt must never see 0 or its backward emits inf * 0 = nan
    dinv = jnp.where(d > 0, jax.lax.rsqrt(jnp.where(d > 0, d, 1.0)), 0.0)
    out = dinv[..., :, None] * adj * dinv[..., None, :]
    if node_mask is not None:
        m = node_mask.astype(adj.dtype)
        out = out * (m[..., :, None] * m[..., None, :])
    return out


def mm_big_adjacency(feats: Sequence[jnp.ndarray], umask: jnp.ndarray,
                     modal_weight: float = 1.0,
                     variant: str = "angular",
                     cross_constant: Optional[float] = None,
                     normalize: bool = True) -> jnp.ndarray:
    """The MM-DFN dynamic cross-modal adjacency, fully vectorized.

    Equivalent of ``MM_GCN.create_big_adj`` (``model_mm.py:122-180``):
    intra-modal blocks are dense angular-similarity matrices recomputed from
    the current features, cross-modal blocks connect only the same utterance
    across modalities (diagonal) scaled by ``modal_weight``, and the whole
    matrix is symmetrically degree-normalized.

    Layout: per-dialogue node index ``m * L + t`` (modality-major within each
    dialogue) — a within-block permutation of the reference's global
    modality-major layout, hence spectrally identical.

    Args:
      feats: list of M arrays (B, L, D) — the modalities present, in the
        reference's canonical order (a, v, l subset).
      umask: (B, L) validity mask.
      modal_weight: scale on cross-modal edges (``--modal_weight``).
      variant: "angular" (MM_GCN) or "arccos" (MM_GCN2's create_big_adj).
      cross_constant: if set, cross-modal diagonal entries are this constant
        instead of similarity * modal_weight (MM_GCN2 uses 0.99999,
        ``model_mm.py:289``).
    Returns:
      (B, M*L, M*L) float32 adjacency (normalized unless ``normalize=False``).
    """
    M = len(feats)
    B, L = umask.shape
    m1 = umask.astype(jnp.float32)
    eye = jnp.eye(L, dtype=jnp.float32)

    rows = []
    for i in range(M):
        blocks = []
        for j in range(M):
            if i == j:
                blocks.append(intra_modal_similarity(feats[i], umask, variant))
            else:
                if cross_constant is not None:
                    dia = jnp.broadcast_to(jnp.float32(cross_constant), (B, L)) * m1
                else:
                    dia = cross_modal_diag_similarity(
                        feats[i], feats[j], umask, variant) * modal_weight
                blocks.append(dia[:, :, None] * eye[None])
        rows.append(jnp.concatenate(blocks, axis=2))
    adj = jnp.concatenate(rows, axis=1)

    if not normalize:
        return adj
    node_mask = jnp.tile(m1, (1, M))
    return symmetric_normalize(adj, node_mask)


def mm_wo_speaker_adjacency(feats: Sequence[jnp.ndarray], umask: jnp.ndarray,
                            scheme: str = "single", window: int = 10,
                            normalize: bool = True) -> jnp.ndarray:
    """MM_GCN2's ``mm_graph`` cross-modal adjacency family, fully vectorized.

    Equivalent of ``MM_GCN2.message_passing_wo_speaker``
    (``model_mm.py:298-477``): every modality block gets identity self-loops
    plus dense intra-dialogue angular-exact similarity edges; cross-modal
    edges between modality pairs follow ``scheme``:

    * ``"single"``: same-utterance diagonal only (``model_mm.py:330-351``).
    * ``"window"``: the reference iterates ``pin in [max(j-w,0),
      min(j+w, len))`` from the lower-indexed modality's ``j`` to the
      higher's ``pin`` (``model_mm.py:352-382``), so the low->high block is
      the asymmetric band ``pin - j in [-w, w-1]`` (the full matrix is still
      symmetric via the mirrored write).
    * ``"fc"``: all ordered pairs ``j <= pin`` from the lower-indexed modality
      to the higher, symmetrized (``model_mm.py:383-407``).

    Deliberate fixes (recorded in DESIGN.md; this function is dead code
    upstream — ``MM_GCN2.forward`` never calls it, ``model_mm.py:236-239``):

    * the ``fc`` branch drops the dialogue offset on the target index
      (``yz = modal_index_bias + pin``, ``model_mm.py:389``), wiring every
      dialogue's cross-modal edges into the *first* dialogue's rows.  We keep
      edges within the dialogue (``start + pin``), which also preserves the
      block-diagonal structure the batched layout (and DP sharding) relies on;
    * the two-modality branch computes ``modal_index_bias = N // 3`` for a
       2-block node matrix (``model_mm.py:413``), splitting mid-modality.  We
      use the true per-modality block size for any M.

    Weights use ``atom_calculate_edge_weight`` semantics — clamp-to-±1 (not
    0.99999-rescale) then ``1 - arccos/pi`` (``model_mm.py:479-487``).
    Normalization is global ``D^-1/2 A D^-1/2`` (``model_mm.py:473-475``),
    which factorizes per dialogue because every edge is intra-dialogue.

    Args:
      feats: M arrays (B, L, D) — the per-modality node features (the
        reference would pass the encoded node matrix split by modality).
      umask: (B, L) validity mask.
    Returns:
      (B, M*L, M*L) float32 adjacency, pads exactly zero.
    """
    if scheme not in ("single", "window", "fc"):
        raise ValueError(f"mm_graph scheme must be single/window/fc, "
                         f"got {scheme!r}")
    M = len(feats)
    B, L = umask.shape
    m1 = umask.astype(jnp.float32)
    pm = m1[:, :, None] * m1[:, None, :]
    eye = jnp.eye(L, dtype=jnp.float32)
    units = [_safe_unit(f) for f in feats]

    i = jnp.arange(L)
    delta = i[:, None] - i[None, :]
    if scheme == "single":
        cross = {(0, 1): delta == 0, (1, 0): delta == 0}
    elif scheme == "window":
        # low->high block [j, pin]: pin - j in [-w, w-1]; delta = j - pin
        lo_hi = jnp.logical_and(delta <= window, delta >= -(window - 1))
        cross = {(0, 1): lo_hi, (1, 0): lo_hi.T}
    else:                                           # fc: row<=col, symmetrized
        cross = {(0, 1): delta <= 0, (1, 0): delta >= 0}

    def cross_mask(a, b):
        return cross[(0, 1)] if a < b else cross[(1, 0)]

    rows = []
    for a in range(M):
        blocks = []
        for b in range(M):
            cos = jnp.einsum("bld,bmd->blm", units[a], units[b],
                             precision=_cos_precision())
            sim = angular_exact_similarity(cos) * pm
            if a == b:
                # off-diagonal dense similarity; diagonal stays at the
                # identity self-loop weight 1 (adj = zeros + eye upstream)
                blocks.append(jnp.where(delta != 0, sim, 0.0)
                              + eye[None] * m1[:, :, None])
            else:
                blocks.append(jnp.where(cross_mask(a, b)[None], sim, 0.0))
        rows.append(jnp.concatenate(blocks, axis=2))
    adj = jnp.concatenate(rows, axis=1)

    if not normalize:
        return adj
    node_mask = jnp.tile(m1, (1, M))
    return symmetric_normalize(adj, node_mask)


def gcnii_block_adjacency(x: jnp.ndarray, umask: jnp.ndarray,
                          variant: str = "angular",
                          per_block_normalize: bool = False) -> jnp.ndarray:
    """Single-modality per-dialogue dense adjacency.

    * ``variant='angular'``: ``GCNII.create_big_adj`` (``model_GCN.py:287-310``)
      — angular similarity blocks, global (= per-block) sym-normalization.
    * ``variant='arccos', per_block_normalize=True``:
      ``GCNII_lyc.message_passing_wo_speaker`` (``model_GCN.py:490-511``) —
      raw arccos blocks, each dialogue block normalized independently.

    With batched per-dialogue blocks the two normalization scopes coincide,
    so ``per_block_normalize`` only exists for documentation parity.
    """
    del per_block_normalize
    adj = intra_modal_similarity(x, umask, variant)
    return symmetric_normalize(adj, umask)


def directed_speaker_adjacency(x: jnp.ndarray, qmask: jnp.ndarray,
                               umask: jnp.ndarray,
                               normalize: bool = True,
                               variant: str = "angular_exact") -> jnp.ndarray:
    """Speaker-chain graph: identity + edges linking consecutive utterances
    of the same speaker, weighted by angular similarity.

    Equivalent of ``message_passing_directed_speaker``
    (``model_GCN.py:85-118`` unnormalized / ``model_GCN.py:348-384`` and
    ``model_mm.py:489-525`` normalized).  All three reference builders
    partition utterances BINARILY — speaker 0 vs everyone else
    (``if speaker[0] == 1``), regardless of n_speakers — so two chains are
    built, not P.  The "consecutive" relation per chain is recovered from
    the same stable argsort permutation the CRN encoder uses: for chain
    members at positions ``t_0 < t_1 < ...``, edges are ``(t_k, t_{k+1})``
    both directions.
    """
    B, L, _ = qmask.shape
    P = 2                                                  # binary partition
    t = jnp.arange(L)[None, None, :]
    valid = umask[:, None, :] > 0                          # (B, 1, L)
    is_spk0 = jnp.logical_and(qmask[:, :, 0][:, None, :] > 0, valid)
    is_rest = jnp.logical_and(jnp.logical_not(is_spk0), valid)
    is_p = jnp.concatenate([is_spk0, is_rest], axis=1)     # (B, 2, L)
    key = jnp.where(is_p, t, t + L)
    perm = jnp.argsort(key, axis=-1)                        # (B, P, L)
    counts = jnp.sum(is_p, axis=-1)                         # (B, P)

    src = perm[:, :, :-1]
    dst = perm[:, :, 1:]
    k = jnp.arange(L - 1)[None, None, :]
    valid = k < (counts[..., None] - 1)                     # pair exists

    n = _safe_unit(x)
    cos = jnp.einsum(
        "bpld,bpld->bpl",
        jnp.take_along_axis(n[:, None].repeat(P, axis=1), src[..., None], axis=2),
        jnp.take_along_axis(n[:, None].repeat(P, axis=1), dst[..., None], axis=2),
    )
    sim = _SIM[variant](cos) * valid

    eye = jnp.eye(L, dtype=jnp.float32)
    adj = jnp.broadcast_to(eye, (B, L, L)) * umask[:, :, None]

    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None, None], src.shape)
    src_s = jnp.where(valid, src, 0)
    dst_s = jnp.where(valid, dst, 0)
    vals = jnp.where(valid, sim, 0.0)
    adj = adj.at[b_idx, src_s, dst_s].add(vals)
    adj = adj.at[b_idx, dst_s, src_s].add(vals)

    if normalize:
        adj = symmetric_normalize(adj, umask)
    return adj


def window_relation_adjacency(x: jnp.ndarray, umask: jnp.ndarray,
                              window: int = 10,
                              variant: str = "angular_exact") -> jnp.ndarray:
    """Windowed-clique graph (``message_passing_relation_graph``,
    ``model_GCN.py:386-409`` / ``model_mm.py:527-550``).

    The reference unions, over every center ``k``, all pairs inside
    ``[max(0,k-w), min(len-1,k+w)]`` — which closed-form reduces to
    "every pair with ``0 < |i-j| <= 2w``", plus the identity diagonal.
    """
    B, L = umask.shape
    i = jnp.arange(L)
    dist = jnp.abs(i[:, None] - i[None, :])
    in_window = jnp.logical_and(dist > 0, dist <= 2 * window)

    n = _safe_unit(x)
    cos = jnp.einsum("bld,bmd->blm", n, n,
                     precision=_cos_precision())
    sim = _SIM[variant](cos)
    m1 = umask.astype(jnp.float32)
    pm = m1[:, :, None] * m1[:, None, :]
    adj = jnp.where(in_window[None], sim, 0.0) * pm
    adj = adj + jnp.eye(L, dtype=jnp.float32)[None] * umask[:, :, None]
    return symmetric_normalize(adj, umask)
