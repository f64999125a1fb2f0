"""Node-axis (tensor/sequence) parallel graph message passing.

Data parallelism covers every production MM-DFN config because the adjacency
is block-diagonal per dialogue (runtime/mesh.py).  This module covers the
stretch regime from SURVEY.md §5.7/§2.8: ONE graph too large for a chip —
e.g. a deep-fusion sweep over giant dialogue buckets, or the whole corpus as
a single graph — where the *node axis* itself must shard across devices.

Design (the ring-attention analogue for graphs, per the scaling-book recipe:
pick a mesh, annotate shardings, let collectives ride ICI):

* nodes shard over the ``model`` mesh axis: each device holds an
  ``(N/k, H)`` block of ``h`` and the matching ``(N, N/k)`` COLUMN block
  of ``adj`` (``adj[:, local]`` — the columns that multiply the node rows
  it owns; for the symmetric normalized adjacency this equals the
  transposed row block);
* ``hi = adj @ h`` becomes: every device computes the full-height partial
  product ``adj[:, local] @ h[local]``, then ``psum_scatter`` reduces
  partials and leaves the OUTPUT sharded by rows — no device ever
  materializes the full ``(N, N)`` matrix or the full ``hi``;
* the GCNII affine update, ReLU, and residuals are purely node-local, so
  the per-layer communication is exactly one reduce-scatter of ``(N, H)``.

Everything is expressed with ``shard_map`` over the shared Mesh from
:mod:`mmdfn_tpu.runtime.mesh`; on a 1-device mesh it degenerates to the
dense path (equality asserted in tests on the virtual 8-device CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:                       # older jax
    from jax.experimental.shard_map import shard_map

from mmdfn_tpu.runtime.mesh import MODEL_AXIS


def sharded_spmm(mesh: Mesh, adj: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """``adj @ h`` with the node axis sharded over the ``model`` mesh axis.

    adj: (N, N) dense (normalized) adjacency; h: (N, H).
    Returns (N, H), sharded the same way as ``h``.

    Each device holds ``adj[:, local]`` (column block) and ``h[local]``;
    the partial product ``adj[:, local] @ h[local]`` is a full-size (N, H)
    partial sum, reduced across devices with ``psum_scatter`` so the result
    lands already sharded by rows.
    """

    def kernel(adj_cols, h_local):
        partial = jnp.einsum("nm,mh->nh", adj_cols, h_local)
        return jax.lax.psum_scatter(partial, MODEL_AXIS,
                                    scatter_dimension=0, tiled=True)

    return shard_map(
        kernel, mesh=mesh,
        in_specs=(P(None, MODEL_AXIS), P(MODEL_AXIS, None)),
        out_specs=P(MODEL_AXIS, None))(adj, h)


def sharded_spmm_batched(mesh: Mesh, adj: jnp.ndarray,
                         h: jnp.ndarray) -> jnp.ndarray:
    """Batched ``adj @ h`` with the NODE axis sharded over ``model``.

    The model-capability entry point for node-sharded tensor parallelism:
    :class:`mmdfn_tpu.nn.gcn.GCNIIStack` calls this per layer when its
    ``spmm`` hook is set (config ``n_model_devices > 1``), so the real
    MMGCN/MM-DFN forward — not a standalone primitive — runs node-sharded.

    adj: (B, N, N); h: (B, N, H).  The node axis is zero-padded up to a
    multiple of the model-axis size (zero adjacency rows/cols are inert, so
    padding is exact), the partial products reduce with one
    ``psum_scatter``, and the result is sliced back to N.
    """
    k = mesh.shape[MODEL_AXIS]
    if k == 1:
        return jnp.einsum("bnm,bmh->bnh", adj, h)
    B, N, H = h.shape
    Np = -(-N // k) * k
    if Np != N:
        adj = jnp.pad(adj, ((0, 0), (0, Np - N), (0, Np - N)))
        h = jnp.pad(h, ((0, 0), (0, Np - N), (0, 0)))

    def kernel(adj_cols, h_local):
        partial = jnp.einsum("bnm,bmh->bnh", adj_cols, h_local)
        return jax.lax.psum_scatter(partial, MODEL_AXIS,
                                    scatter_dimension=1, tiled=True)

    out = shard_map(
        kernel, mesh=mesh,
        in_specs=(P(None, None, MODEL_AXIS), P(None, MODEL_AXIS, None)),
        out_specs=P(None, MODEL_AXIS, None))(adj, h)
    return out[:, :N] if Np != N else out


def sharded_gcnii_stack(mesh: Mesh, adj: jnp.ndarray, h: jnp.ndarray,
                        h0: jnp.ndarray, W: jnp.ndarray, theta: jnp.ndarray,
                        alpha: float, variant: bool = True) -> jnp.ndarray:
    """Deterministic deep GCNII stack with node-sharded message passing.

    One reduce-scatter per layer is the total communication; all affine
    updates are node-local.  ``W``/``theta`` are replicated (tiny).
    """
    H = h.shape[-1]

    def kernel(adj_cols, h_local, h0_local, W_all, theta_all):
        def body(h_loc, xs):
            W_i, theta_i = xs
            partial = jnp.einsum("nm,mh->nh", adj_cols, h_loc)
            # gather rows we own after the reduce: output sharded like input
            hi_local = jax.lax.psum_scatter(partial, MODEL_AXIS,
                                            scatter_dimension=0, tiled=True)
            if variant:
                support = jnp.concatenate([hi_local, h0_local], axis=-1)
                r = (1.0 - alpha) * hi_local + alpha * h0_local
            else:
                support = (1.0 - alpha) * hi_local + alpha * h0_local
                r = support
            out = theta_i * (support @ W_i) + (1.0 - theta_i) * r
            return jax.nn.relu(out), None

        h_out, _ = jax.lax.scan(body, h_local, (W_all, theta_all))
        return h_out

    return shard_map(
        kernel, mesh=mesh,
        in_specs=(P(None, MODEL_AXIS), P(MODEL_AXIS, None),
                  P(MODEL_AXIS, None), P(None, None, None), P(None)),
        out_specs=P(MODEL_AXIS, None))(adj, h, h0, W, theta)
