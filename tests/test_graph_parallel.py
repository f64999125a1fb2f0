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


# ---------------------------------------------------------------------------
# TP as a MODEL capability (round 3): the real MMGCN / Trainer step runs
# node-sharded when the mesh has a model axis, and matches dense exactly.
# ---------------------------------------------------------------------------

def test_sharded_spmm_batched_matches_dense(rng, mesh):
    from mmdfn_tpu.parallel import sharded_spmm_batched
    B, H = 3, 16
    for N in (32, 30):                 # divisible + zero-pad path (30 % 4)
        adj = rng.standard_normal((B, N, N)).astype(np.float32)
        h = rng.standard_normal((B, N, H)).astype(np.float32)
        got = sharded_spmm_batched(mesh, jnp.array(adj), jnp.array(h))
        ref = np.einsum("bnm,bmh->bnh", adj, h)
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4,
                                   err_msg=f"N={N}")


def _tiny_batch(rng, B, L, n_speakers=2):
    lengths = rng.integers(max(2, L // 2), L + 1, size=B)
    umask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    spk = rng.integers(0, n_speakers, size=(B, L))
    qmask = np.zeros((B, L, n_speakers), np.float32)
    qmask[np.arange(B)[:, None], np.arange(L)[None, :], spk] = 1.0
    qmask *= umask[..., None]
    feat = lambda D: (rng.standard_normal((B, L, D)).astype(np.float32)
                      * umask[..., None])
    return dict(text=feat(100), audio=feat(1582), visual=feat(342),
                qmask=qmask, umask=umask,
                label=(rng.integers(0, 6, size=(B, L))
                       * umask).astype(np.int32))


def test_mmgcn_forward_node_sharded_matches_dense(rng, mesh):
    """The actual MMGCN (MM-DFN core) forward with its GCNII stack routed
    through the node-sharded spmm == the dense forward."""
    from functools import partial

    from mmdfn_tpu.models.mm_gcn import MMGCN
    from mmdfn_tpu.parallel import sharded_spmm_batched

    B, L = 2, 8                        # N = 3*8 = 24, divisible by 4
    batch = _tiny_batch(rng, B, L)
    feats = {m: jnp.asarray(rng.standard_normal((B, L, 200))
                            .astype(np.float32))
             for m in "avl"}
    qmask, umask = jnp.asarray(batch["qmask"]), jnp.asarray(batch["umask"])

    kw = dict(n_dim=200, nlayers=3, nhidden=100, nclass=6, dropout=0.0,
              reason_flag=True)
    dense = MMGCN(**kw)
    tp = MMGCN(**kw, spmm=partial(sharded_spmm_batched, mesh))
    variables = dense.init(jax.random.PRNGKey(0), feats, qmask, umask,
                           deterministic=True)
    ref = dense.apply(variables, feats, qmask, umask, deterministic=True)
    got = tp.apply(variables, feats, qmask, umask, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_trainer_step_with_model_axis_matches_dense(rng):
    """Full flagship train step on a 2x4 (data x model) mesh == the
    single-device step: DP and node-TP compose, loss and updated params
    agree."""
    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.train import Trainer
    from mmdfn_tpu.train.trainer import prepare_inputs
    from mmdfn_tpu.data.batching import Batch

    B, L = 2, 8
    cfg = ExperimentConfig(
        dataset="IEMOCAP", graph_type="GDF", reason_flag=True,
        Deep_GCN_nlayers=2, dropout=0.0, class_weight=False,
        batch_size=B, buckets=(L,))
    batch = _tiny_batch(rng, B, L)
    b = Batch(text=batch["text"], visual=batch["visual"],
              audio=batch["audio"], qmask=batch["qmask"],
              umask=batch["umask"], label=batch["label"])

    dense_tr = Trainer(cfg)
    state_d = dense_tr.init_state()
    tp_tr = Trainer(cfg, mesh=make_mesh(n_data=2, n_model=4))
    state_t = tp_tr.init_state()

    inp_d = prepare_inputs(cfg, b)
    inp_t = tp_tr._put(prepare_inputs(cfg, b))
    state_d, loss_d, _ = dense_tr._train_step(state_d, dict(inp_d),
                                              jax.random.PRNGKey(0))
    state_t, loss_t, _ = tp_tr._train_step(state_t, inp_t,
                                           jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss_t), float(loss_d), atol=1e-5)
    for a, c in zip(jax.tree_util.tree_leaves(state_t.params),
                    jax.tree_util.tree_leaves(state_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-4)
