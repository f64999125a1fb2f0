"""The PRODUCTION configuration under a mesh (VERDICT r4 weak #1 / next #1).

Every earlier mesh test ran the XLA-scan backends at 2-layer toy depth; the
deployed configuration (``config.py:TPU_FAST_KNOBS``: fused Pallas GCNII
train kernel + fused Pallas bi-GRU + ``gcn_bwd_block=2`` + hardware-PRNG
dropout) had never executed multi-device.  These tests run that exact
backend stack at flagship depth (16 GCNII layers, ``reason_flag=True``)
over a virtual CPU mesh, with the kernels in interpreter mode:

* DP parity: the sharded step must reproduce the single-device step (same
  math; only the gradient-psum reduction order differs, so tolerances are
  bf16-accumulation-sized, not exact).
* Config-parallel parity: the vmapped multi-config sweep with the stacked
  config axis sharded over the mesh, production kernels live.
* Live-dropout execution: ``dropout=0.4 + rng_impl='rbg'`` under the mesh.
  Off-TPU the GCNII kernel falls back to the scan for live dropout (the
  interpreter's PRNG is a zero stub, nn/gcn.py:176-179) — the leg still
  pins that the production *flags* compose with the mesh (pallas RNN +
  rbg key plumbing + sharded scan GCN); on real TPU devices the same
  config runs the fused kernel.
* TP execution: on a data x model mesh the GCNII stack runs node-sharded
  (``parallel/graph_parallel.py``) — architecturally exclusive with the
  fused kernel (nn/gcn.py gates on ``spmm is None``) — while the pallas
  RNN + rbg knobs stay live.

Reference counterpart: none (single-GPU, SURVEY.md §2.8); this certifies
the build-side parallelism of the shipped configuration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmdfn_tpu.config import ExperimentConfig
from mmdfn_tpu.runtime.mesh import make_mesh
from mmdfn_tpu.train import Trainer
from mmdfn_tpu.train.vmap_sweep import VmapSweep

# the shipped fast knobs (config.py:TPU_FAST_KNOBS) at flagship depth,
# shrunk only in batch/length (B=4, L=8) to keep the CPU interpreter fast
PROD = dict(dataset="IEMOCAP", graph_type="GDF", reason_flag=True,
            class_weight=True, Deep_GCN_nlayers=16, speaker_weights="3-0-1",
            buckets=(8,), rnn_backend="pallas", gcn_backend="pallas",
            gcn_bwd_block=2, rng_impl="rbg", gcn_compute_dtype="bfloat16",
            rnn_scan_remat=True)


def _batch(B, L, seed=0, n_speakers=2):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(max(2, L // 2), L + 1, size=B)
    umask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    spk = rng.integers(0, n_speakers, size=(B, L))
    qmask = np.zeros((B, L, n_speakers), np.float32)
    qmask[np.arange(B)[:, None], np.arange(L)[None, :], spk] = 1.0
    qmask *= umask[..., None]
    feat = lambda D: jnp.asarray(
        (rng.standard_normal((B, L, D)) * umask[..., None]).astype(np.float32))
    return dict(text=feat(100), audio=feat(1582), visual=feat(342),
                qmask=jnp.asarray(qmask), umask=jnp.asarray(umask),
                label=jnp.asarray((rng.integers(0, 6, size=(B, L))
                                   * umask).astype(np.int32)))


def test_dp_mesh_production_kernels_parity():
    """2 sharded train steps == 2 single-device steps, fused kernels live.

    dropout=0 keeps the kernel on the plain interpreter (deterministic
    math) so the only divergence is the DP gradient-psum reduction order —
    bf16-matmul noise, bounded below well under one Adam step size.
    """
    cfg = ExperimentConfig(batch_size=4, dropout=0.0, rec_dropout=0.0, **PROD)
    batch = _batch(B=4, L=8, seed=1)
    key = jax.random.PRNGKey(0)

    single = Trainer(cfg)
    s1 = single.init_state()
    losses1 = []
    for _ in range(2):
        s1, l, _ = single._train_step(s1, batch, key)
        losses1.append(float(l))

    mesh = make_mesh(n_data=4)
    dp = Trainer(cfg, mesh=mesh)
    s2 = dp.init_state()
    inp = dp._put(batch)
    losses2 = []
    for _ in range(2):
        s2, l, _ = dp._train_step(s2, inp, key)
        losses2.append(float(l))

    np.testing.assert_allclose(losses1, losses2, rtol=5e-4)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params)
    max_diff = max(jax.tree_util.tree_leaves(diffs))
    # measured ~6e-4 after 2 Adam steps (reduction-order noise through the
    # bf16 kernel matmuls, amplified by Adam's sqrt(vhat) normalizer);
    # 3e-3 = an order below anything structurally wrong (lr=3e-4 per step
    # per param would compound, a wrong collective would diverge entirely)
    assert max_diff < 3e-3, f"DP params drifted {max_diff} from single-device"


def test_sharded_vmap_sweep_production_kernels_parity():
    """K=4 config-parallel sweep step, config axis sharded over the mesh,
    fused kernels riding jax.vmap — losses match the unsharded stack."""
    cfg = ExperimentConfig(batch_size=2, dropout=0.0, rec_dropout=0.0, **PROD)
    combos = [dict(lr=1e-4 * (1 + k), l2=1e-5) for k in range(4)]
    batch = _batch(B=2, L=8, seed=5)
    key = jax.random.PRNGKey(0)

    mesh = make_mesh(n_data=4)
    sharded = VmapSweep(cfg, combos, mesh=mesh)
    pk, ok = sharded.init_states()
    fz = sharded._shard_k(jnp.zeros((sharded.K,), jnp.float32))
    _, _, loss_sh, _ = sharded._train_step(
        pk, ok, sharded._replicate(batch), key, fz)

    plain = VmapSweep(cfg, combos)
    p2, o2 = plain.init_states()
    _, _, loss_pl, _ = plain._train_step(
        p2, o2, batch, key, jnp.zeros((plain.K,), jnp.float32))

    np.testing.assert_allclose(np.asarray(loss_sh), np.asarray(loss_pl),
                               rtol=5e-4)


def test_dp_mesh_production_live_dropout_executes():
    """The full production flag set (dropout=0.4, rbg bits) steps under the
    DP mesh.  Off-TPU the GCNII kernel legitimately falls back to the scan
    (interpreter PRNG stub); the pallas RNN kernel and the rbg dropout key
    plumbing stay live and sharded."""
    cfg = ExperimentConfig(batch_size=4, **PROD)  # dropout default 0.4
    mesh = make_mesh(n_data=4)
    tr = Trainer(cfg, mesh=mesh)
    s = tr.init_state()
    inp = tr._put(_batch(B=4, L=8, seed=1))
    s, loss, _ = tr._train_step(s, inp, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_tp_mesh_production_step_executes():
    """data x model (2x2) mesh: GCNII node-sharded over the model axis (the
    TP formulation replaces the fused kernel by design), pallas RNN + rbg
    live; one full train step, finite loss."""
    cfg = ExperimentConfig(batch_size=4, **PROD)
    mesh = make_mesh(n_data=2, n_model=2)
    tr = Trainer(cfg, mesh=mesh)
    s = tr.init_state()
    inp = tr._put(_batch(B=4, L=8, seed=3))
    s, loss, _ = tr._train_step(s, inp, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
