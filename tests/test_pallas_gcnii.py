"""Pallas fused GCNII stack vs the XLA scan reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdfn_tpu.graph.adjacency import gcnii_block_adjacency
from mmdfn_tpu.nn.gcn import gcnii_conv
from mmdfn_tpu.ops import gcnii_stack_fused


def scan_reference(adj, h, h0, W, theta, alpha, variant, reason,
                   lstm_ih=None, lstm_hh=None, lstm_b=None):
    """The exact math of GCNIIStack's deterministic layer loop."""
    lstm_h = jnp.zeros_like(h)
    lstm_c = jnp.zeros_like(h)
    H = h.shape[-1]
    for l in range(W.shape[0]):
        q = h
        if reason:
            g = h @ lstm_ih + lstm_h @ lstm_hh + lstm_b
            i, f, gg, o = jnp.split(g, 4, axis=-1)
            lstm_c = jax.nn.sigmoid(f) * lstm_c + jax.nn.sigmoid(i) * jnp.tanh(gg)
            lstm_h = jax.nn.sigmoid(o) * jnp.tanh(lstm_c)
            h = lstm_h
        h = jax.nn.relu(gcnii_conv(h, adj, h0, W[l], theta[l], alpha, variant))
        if reason:
            h = h + q
    return h


def make_problem(rng, B=2, N=11, H=7, nlayers=3, variant=True):
    lengths = rng.integers(N // 2, N + 1, size=B)
    umask = (np.arange(N)[None] < lengths[:, None]).astype(np.float32)
    x = (rng.standard_normal((B, N, H)) * umask[..., None]).astype(np.float32)
    adj = gcnii_block_adjacency(jnp.array(x), jnp.array(umask))
    h = jnp.array(np.abs(x))
    h0 = h
    in_w = 2 * H if variant else H
    W = jnp.array(rng.standard_normal((nlayers, in_w, H)).astype(np.float32)) * 0.3
    theta = jnp.log(0.5 / jnp.arange(1, nlayers + 1) + 1.0)
    return adj, h, h0, W, theta


@pytest.mark.parametrize("variant", [True, False])
def test_fused_matches_scan(rng, variant):
    adj, h, h0, W, theta = make_problem(rng, variant=variant)
    expected = scan_reference(adj, h, h0, W, theta, 0.2, variant, False)
    got = gcnii_stack_fused(adj, h, h0, W, theta, alpha=0.2, variant=variant,
                            reason=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)


def test_fused_matches_scan_reason(rng):
    adj, h, h0, W, theta = make_problem(rng, H=7, nlayers=4)
    H = 7
    lstm_ih = jnp.array(rng.standard_normal((H, 4 * H)).astype(np.float32)) * 0.2
    lstm_hh = jnp.array(rng.standard_normal((H, 4 * H)).astype(np.float32)) * 0.2
    lstm_b = jnp.array(rng.standard_normal((4 * H,)).astype(np.float32)) * 0.1
    expected = scan_reference(adj, h, h0, W, theta, 0.2, True, True,
                              lstm_ih, lstm_hh, lstm_b)
    got = gcnii_stack_fused(adj, h, h0, W, theta, lstm_ih, lstm_hh, lstm_b,
                            alpha=0.2, variant=True, reason=True,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-5)


def test_fused_mxu_sized(rng):
    """Aligned shapes (no padding path) also agree."""
    adj, h, h0, W, theta = make_problem(rng, B=1, N=128, H=128, nlayers=2)
    expected = scan_reference(adj, h, h0, W, theta, 0.1, True, False)
    got = gcnii_stack_fused(adj, h, h0, W, theta, alpha=0.1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-4)
