"""Node-sharded graph message passing vs dense single-device reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdfn_tpu.nn.gcn import gcnii_conv
from mmdfn_tpu.parallel import sharded_gcnii_stack, sharded_spmm
from mmdfn_tpu.runtime.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    # 2 data x 4 model over the virtual 8-device CPU mesh
    return make_mesh(n_data=2, n_model=4)


def test_sharded_spmm_matches_dense(rng, mesh):
    N, H = 32, 16                       # N divisible by model axis (4)
    adj = rng.standard_normal((N, N)).astype(np.float32)
    h = rng.standard_normal((N, H)).astype(np.float32)
    got = sharded_spmm(mesh, jnp.array(adj), jnp.array(h))
    np.testing.assert_allclose(np.asarray(got), adj @ h, atol=1e-4)


def test_sharded_gcnii_stack_matches_dense(rng, mesh):
    N, H, nlayers = 16, 8, 3
    adj = (rng.standard_normal((N, N)).astype(np.float32)) / N
    h = np.abs(rng.standard_normal((N, H))).astype(np.float32)
    W = rng.standard_normal((nlayers, 2 * H, H)).astype(np.float32) * 0.3
    theta = np.log(0.5 / np.arange(1, nlayers + 1) + 1.0).astype(np.float32)

    got = sharded_gcnii_stack(mesh, jnp.array(adj), jnp.array(h),
                              jnp.array(h), jnp.array(W), jnp.array(theta),
                              alpha=0.2, variant=True)

    # dense reference: same math batched with B=1
    ref = jnp.array(h)[None]
    h0 = ref
    for l in range(nlayers):
        ref = jax.nn.relu(gcnii_conv(ref, jnp.array(adj)[None], h0,
                                     jnp.array(W[l]), theta[l], 0.2, True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[0]),
                               atol=1e-4)


def test_sharded_spmm_under_jit(rng, mesh):
    N, H = 16, 8
    adj = rng.standard_normal((N, N)).astype(np.float32)
    h = rng.standard_normal((N, H)).astype(np.float32)
    f = jax.jit(lambda a, x: sharded_spmm(mesh, a, x))
    np.testing.assert_allclose(np.asarray(f(jnp.array(adj), jnp.array(h))),
                               adj @ h, atol=1e-4)


def test_make_mesh_rejects_too_few_devices():
    devs = jax.devices()[:2]
    with pytest.raises(ValueError, match=r"n_data\*n_model=8 devices, found 2"):
        make_mesh(n_data=4, n_model=2, devices=devs)
