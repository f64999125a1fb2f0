"""DenseRGCNConv / DenseGraphConv vs COO scatter oracles (PyG 1.4.3 rules)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdfn_tpu.models.relation_net import DenseGraphConv, DenseRGCNConv


def make_graph(rng, L=7, F=5, R=8):
    x = rng.standard_normal((1, L, F)).astype(np.float32)
    edge_mask = (rng.random((1, L, L)) < 0.4).astype(np.float32)
    edge_weight = edge_mask * rng.random((1, L, L)).astype(np.float32)
    rel_ids = rng.integers(0, R, size=(1, L, L)).astype(np.int32)
    return x, edge_mask, edge_weight, rel_ids


def test_dense_rgcn_matches_scatter_mean_oracle(rng):
    """Oracle: per-edge message norm * (x_src @ W_rel), scatter-MEAN over each
    dst's incoming edges (torch-geometric 1.4.3 RGCNConv aggr='mean'), plus
    root weight and bias."""
    L, F, O, R, NB = 7, 5, 4, 8, 3
    x, edge_mask, edge_weight, rel_ids = make_graph(rng, L, F, R)

    m = DenseRGCNConv(F, O, R, num_bases=NB)
    params = m.init(jax.random.PRNGKey(0), jnp.array(x),
                    jnp.array(edge_weight), jnp.array(rel_ids),
                    jnp.array(edge_mask))
    p = params["params"]
    basis = np.asarray(p["basis"])      # (NB, F, O)
    comp = np.asarray(p["comp"])        # (R, NB)
    root = np.asarray(p["root"])
    bias = np.asarray(p["bias"])
    W = np.einsum("rB,Bfo->rfo", comp, basis)   # per-relation weights

    out = np.zeros((L, O), np.float32)
    for dst in range(L):
        msgs = []
        for src in range(L):
            if edge_mask[0, src, dst] > 0:
                msgs.append(edge_weight[0, src, dst]
                            * (x[0, src] @ W[rel_ids[0, src, dst]]))
        agg = np.mean(msgs, axis=0) if msgs else np.zeros(O, np.float32)
        out[dst] = agg + x[0, dst] @ root + bias

    got = m.apply(params, jnp.array(x), jnp.array(edge_weight),
                  jnp.array(rel_ids), jnp.array(edge_mask))
    np.testing.assert_allclose(np.asarray(got[0]), out, atol=1e-5)


def test_dense_graph_conv_matches_scatter_add_oracle(rng):
    """Oracle: GraphConv aggr='add': out[dst] = lin(x[dst]) + sum_src W x[src]."""
    L, F = 6, 4
    x = rng.standard_normal((1, L, F)).astype(np.float32)
    edge_mask = (rng.random((1, L, L)) < 0.5).astype(np.float32)

    m = DenseGraphConv(F)
    params = m.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(edge_mask))
    p = params["params"]
    w_nbr = np.asarray(p["nbr"]["kernel"])
    w_root = np.asarray(p["root"]["kernel"])
    b_root = np.asarray(p["root"]["bias"])

    out = np.zeros((L, F), np.float32)
    for dst in range(L):
        agg = sum((x[0, src] @ w_nbr for src in range(L)
                   if edge_mask[0, src, dst] > 0), np.zeros(F, np.float32))
        out[dst] = agg + x[0, dst] @ w_root + b_root

    got = m.apply(params, jnp.array(x), jnp.array(edge_mask))
    np.testing.assert_allclose(np.asarray(got[0]), out, atol=1e-5)


def test_rgcn_init_bound():
    """All four parameter tensors init within 1/sqrt(num_bases * in)."""
    m = DenseRGCNConv(200, 100, 8, num_bases=30)
    x = jnp.zeros((1, 4, 200))
    e = jnp.zeros((1, 4, 4))
    params = m.init(jax.random.PRNGKey(1), x, e,
                    jnp.zeros((1, 4, 4), jnp.int32), e)["params"]
    bound = 1.0 / np.sqrt(30 * 200)
    for name in ("basis", "comp", "root", "bias"):
        arr = np.asarray(params[name])
        assert np.abs(arr).max() <= bound + 1e-7, name
