"""Windowed relation-graph construction for the DialogueGCN-style path.

The reference builds COO edge lists per batch with python set manipulation
(``edge_perms``/``batch_graphify``, ``code/model.py:532-611``) feeding
torch-geometric's scatter-based RGCNConv.  The TPU formulation keeps the
graph dense: a ``(B, L, L)`` edge mask (window membership), a ``(B, L, L)``
integer relation-id map (speaker-pair x direction), and a ``(B, L, L)`` edge
weight matrix from the dense MaskedEdgeAttention — all static shapes, no
host-side edge enumeration.

Edge orientation: an entry ``(src=j, dst=i)`` exists iff ``i`` lies in
``[j - window_past, j + window_future]`` (both valid), exactly the pair set
``edge_perms`` enumerates (``model.py:532-550``), including self-loops.
"""

from __future__ import annotations

import jax.numpy as jnp


def window_edge_mask(umask: jnp.ndarray, window_past: int,
                     window_future: int) -> jnp.ndarray:
    """(B, L) -> (B, L, L) float edge mask; [b, src, dst] = 1 iff edge.

    A window of -1 means unbounded on that side (reference
    ``model.py:538-545``).
    """
    B, L = umask.shape
    idx = jnp.arange(L)
    delta = idx[None, :] - idx[:, None]          # dst - src
    ok = jnp.ones((L, L), dtype=bool)
    if window_past != -1:
        ok = jnp.logical_and(ok, delta >= -window_past)
    if window_future != -1:
        ok = jnp.logical_and(ok, delta <= window_future)
    m = umask.astype(jnp.float32)
    return ok[None].astype(jnp.float32) * m[:, :, None] * m[:, None, :]


def relation_type_ids(qmask: jnp.ndarray) -> jnp.ndarray:
    """(B, L, P) speaker one-hots -> (B, L, L) int32 relation ids.

    Reproduces ``edge_type_mapping`` (``model.py:974-980``): relations are
    enumerated as ``(spk_src, spk_dst, direction)`` with ids
    ``2*(spk_src*P + spk_dst) + dir`` and ``dir = 0`` iff ``src < dst``
    (``model.py:592-598``); ``2*P^2`` relations total.
    """
    P = qmask.shape[-1]
    spk = jnp.argmax(qmask, axis=-1)             # (B, L)
    L = spk.shape[1]
    idx = jnp.arange(L)
    direction = (idx[:, None] < idx[None, :])    # src < dst -> dir 0
    dir_bit = jnp.where(direction, 0, 1)
    return (2 * (spk[:, :, None] * P + spk[:, None, :]) + dir_bit[None]).astype(jnp.int32)
