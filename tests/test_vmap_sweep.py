"""Vmapped multi-config sweep: grouping, parity with single-config training."""

import numpy as np
import pytest

import jax

from mmdfn_tpu.config import ExperimentConfig
from mmdfn_tpu.data.datasets import IEMOCAPDataset
from mmdfn_tpu.data.synthetic import make_synthetic_iemocap_pickle
from mmdfn_tpu.train import Trainer
from mmdfn_tpu.train.vmap_sweep import VmapSweep, group_combos


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("d") / "iem.pkl")
    make_synthetic_iemocap_pickle(path, n_train=8, n_test=4, min_len=4,
                                  max_len=10, seed=7)
    return (IEMOCAPDataset(path, True).dialogues(),
            IEMOCAPDataset(path, False).dialogues())


def base_cfg(**over):
    d = dict(epochs=2, batch_size=4, Deep_GCN_nlayers=2, graph_type="GDF",
             reason_flag=True, class_weight=True, buckets=(16,),
             dropout=0.0, seed=2021)
    d.update(over)
    return ExperimentConfig(**d)


def test_group_combos_partitions_by_static_keys():
    """Dropout now rides the config axis (traced rate override), so only the
    layer count forces a static group split: the 8-combo example grid vmaps
    as 2 groups of 4 (it used to be 4 groups of 2)."""
    combos = [dict(Deep_GCN_nlayers=n, dropout=d, lr=lr, l2=1e-4, gamma=0.5)
              for n in (16, 32) for d in (0.2, 0.4) for lr in (1e-4, 3e-4)]
    groups = group_combos(combos)
    assert len(groups) == 2
    assert all(len(g) == 4 for _, g in groups)
    static, group = groups[0]
    assert set(static) == {"Deep_GCN_nlayers"}


def test_reference_grids_vmap_as_one_group_per_layer_count():
    """With dropout stackable, the verbatim reference grids partition into
    exactly one vmapped group per Deep_GCN_nlayers value: IEMOCAP 32 combos
    = 2 x K=16 (run_train_ie.sh:19-52), MELD 48 = 3 x K=16
    (run_train_me.sh:20-52)."""
    from mmdfn_tpu.cli.sweep import combos

    ie = list(combos("IEMOCAP"))
    groups = group_combos(ie)
    assert len(ie) == 32 and len(groups) == 2
    assert all(len(g) == 16 for _, g in groups)
    assert all(set(s) == {"Deep_GCN_nlayers"} for s, _ in groups)

    me = list(combos("MELD"))
    groups = group_combos(me)
    assert len(me) == 48 and len(groups) == 3
    assert all(len(g) == 16 for _, g in groups)


def test_vmap_refuses_non_stackable_varying_key():
    """A combo key outside lr/l2/gamma/dropout that VARIES across the group
    must be refused loudly (it used to be silently trained at the base value
    while results reported the asked-for grid)."""
    with pytest.raises(ValueError, match="alpha"):
        VmapSweep(base_cfg(), [dict(lr=1e-4, l2=1e-4, alpha=0.1),
                               dict(lr=1e-4, l2=1e-4, alpha=0.3)])
    # identical across the group is fine: folded into the shared config
    sweep = VmapSweep(base_cfg(), [dict(lr=1e-4, l2=1e-4, alpha=0.3),
                                   dict(lr=3e-4, l2=1e-4, alpha=0.3)])
    assert sweep.cfg.alpha == 0.3


def test_vmap_refuses_stacked_dropout_for_override_blind_models():
    """Only DialogueGNN's dropout sites consult the traced rate override;
    a non-graph baseline would silently train every config at the shared
    rate while reporting the dropout grid — so there a VARYING dropout is
    refused and an identical one folds into the shared config (with no
    override installed at all)."""
    with pytest.raises(ValueError, match="dropout"):
        VmapSweep(base_cfg(graph_model=False, base_model="GRU",
                           reason_flag=False),
                  [dict(lr=1e-4, l2=1e-4, dropout=0.2),
                   dict(lr=1e-4, l2=1e-4, dropout=0.4)])
    sweep = VmapSweep(base_cfg(graph_model=False, base_model="GRU",
                               reason_flag=False, dropout=0.5),
                      [dict(lr=1e-4, l2=1e-4, dropout=0.2),
                       dict(lr=3e-4, l2=1e-4, dropout=0.2)])
    assert sweep.cfg.dropout == 0.2
    assert sweep.droprate is None


def _histories_match(got, want, loss_atol=2e-3):
    """Same selections/predictions, losses within ulp-drift tolerance.

    Dropout masks and all forward/grad math are exactly equal between the
    override and static paths OUTSIDE vmap (test_drop_override.py pins
    forward AND grads bitwise), but inside the jitted vmapped step the two
    programs differ structurally (traced rate operands vs baked constants),
    so XLA fuses/reassociates reductions differently — an irreducible
    ~1e-4 ulp drift on losses after Adam normalization.  Everything is
    seeded, so the comparison is still deterministic.
    """
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["epoch"] == w["epoch"]
        assert g["test_fscore"] == w["test_fscore"], (g, w)
        assert g["test_acc"] == w["test_acc"], (g, w)
        assert abs(g["train_loss"] - w["train_loss"]) <= loss_atol, (g, w)
        assert abs(g["test_loss"] - w["test_loss"]) <= loss_atol, (g, w)


def test_vmap_stacked_dropout_matches_static(data):
    """Dropout stacked on the config axis (VERDICT r4 next #5): a config
    trained inside a mixed-dropout group via the traced rate override must
    reproduce the same config trained with the rate folded statically —
    slot for slot (identical dropout masks and selections; losses equal up
    to the vmap-program ulp drift, see _histories_match)."""
    train, test = data
    lrs = (3e-3, 1e-4)
    mixed = VmapSweep(base_cfg(dropout=0.4),
                      [dict(lr=lrs[0], l2=1e-4, dropout=0.2),
                       dict(lr=lrs[1], l2=1e-4, dropout=0.4)]).run(
        train, test, verbose=False)
    for k, dp in enumerate((0.2, 0.4)):
        static = VmapSweep(base_cfg(dropout=dp),
                           [dict(lr=lrs[0], l2=1e-4),
                            dict(lr=lrs[1], l2=1e-4)]).run(
            train, test, verbose=False)
        _histories_match(mixed.history[k], static.history[k])
    # a rate-0 config inside a stacked group is still exact (all-keep mask
    # and x*1 scaling, not a skipped draw)
    zmixed = VmapSweep(base_cfg(epochs=1, dropout=0.4),
                       [dict(lr=lrs[0], l2=1e-4, dropout=0.0),
                        dict(lr=lrs[1], l2=1e-4, dropout=0.4)]).run(
        train, test, verbose=False)
    zstatic = VmapSweep(base_cfg(epochs=1, dropout=0.0),
                        [dict(lr=lrs[0], l2=1e-4),
                         dict(lr=lrs[1], l2=1e-4)]).run(
        train, test, verbose=False)
    _histories_match(zmixed.history[0], zstatic.history[0])


def test_vmap_diagnoses_missing_stackable_key():
    """lr/l2 missing from SOME combo is a construction-time ValueError naming
    the key, not a bare KeyError mid-stack-build."""
    with pytest.raises(ValueError, match="'l2'"):
        VmapSweep(base_cfg(), [dict(lr=1e-4, l2=1e-4),
                               dict(lr=3e-4)])
    # gamma is optional (falls back to base_cfg.gamma)
    VmapSweep(base_cfg(), [dict(lr=1e-4, l2=1e-4, gamma=1.0),
                           dict(lr=3e-4, l2=1e-4)])


def test_vmap_group_matches_single_config(data):
    """A config trained inside a vmapped group must match training it alone
    (dropout off so the rng streams are irrelevant)."""
    train, test = data
    cfg = base_cfg()
    combos = [dict(lr=3e-3, l2=1e-4, gamma=0.5),
              dict(lr=1e-4, l2=2e-4, gamma=1.0)]
    sweep = VmapSweep(cfg, combos)
    res = sweep.run(train, test, verbose=False)
    assert len(res.best_test_fscore) == 2

    import dataclasses
    for k, combo in enumerate(combos):
        solo = Trainer(dataclasses.replace(cfg, **combo))
        r = solo.fit(train, test, verbose=False)
        assert r.all_test_fscore == [h["test_fscore"]
                                     for h in res.history[k]], (k, combo)


def test_vmap_configs_diverge(data):
    """Different lr/gamma must actually produce different training curves."""
    train, test = data
    sweep = VmapSweep(base_cfg(epochs=2),
                      [dict(lr=3e-3, l2=1e-4, gamma=0.5),
                       dict(lr=1e-5, l2=1e-4, gamma=0.5)])
    res = sweep.run(train, test, verbose=False)
    assert res.history[0] != res.history[1]


def test_vmap_sweep_sharded_over_mesh_matches_unsharded(data):
    """Config-axis sharding over the 8-device mesh is a pure layout change:
    per-epoch metrics must match the single-device vmapped run exactly."""
    from mmdfn_tpu.runtime.mesh import make_mesh

    train, test = data
    cfg = base_cfg()
    combos = [dict(lr=lr, l2=l2, gamma=g)
              for lr in (3e-3, 1e-3) for l2 in (1e-4, 2e-4)
              for g in (0.5, 1.0)]                       # K=8
    plain = VmapSweep(cfg, combos).run(train, test, verbose=False)
    mesh = make_mesh(n_data=8)
    sharded = VmapSweep(cfg, combos, mesh=mesh).run(train, test,
                                                    verbose=False)
    assert sharded.history == plain.history
    assert sharded.best_test_fscore == plain.best_test_fscore


def test_vmap_sweep_mesh_pads_ragged_config_count(data):
    """K not divisible by the mesh: the config axis auto-pads with frozen
    copies and the padding is dropped from the results."""
    from mmdfn_tpu.runtime.mesh import make_mesh

    train, test = data
    cfg = base_cfg(epochs=1)
    combos = [dict(lr=3e-3, l2=1e-4, gamma=0.5),
              dict(lr=1e-3, l2=2e-4, gamma=1.0),
              dict(lr=1e-4, l2=1e-4, gamma=0.5)]          # K=3 on 8 devices
    sweep = VmapSweep(cfg, combos, mesh=make_mesh(n_data=8))
    assert sweep.K == 8 and sweep.real_K == 3
    res = sweep.run(train, test, verbose=False)
    assert len(res.best_test_fscore) == 3
    assert len(res.history) == 3

    plain = VmapSweep(cfg, combos).run(train, test, verbose=False)
    assert res.history == plain.history


def test_vmap_sweep_resume_reproduces_straight_run(data, tmp_path):
    """Preemption safety for the vmapped sweep (VERDICT r4 missing #4):
    2 epochs + kill + resume == 4 straight epochs, exactly; a finished
    group skips (returns the saved result without training)."""
    train, test = data
    combos = [dict(lr=3e-3, l2=1e-4, gamma=0.5),
              dict(lr=1e-4, l2=2e-4, gamma=1.0)]

    straight = VmapSweep(base_cfg(epochs=4), combos).run(
        train, test, verbose=False)

    d = str(tmp_path / "group")
    VmapSweep(base_cfg(epochs=2), combos).run(      # "preempted" after 2
        train, test, verbose=False, save_dir=d)
    # drop the epoch-2 'final' marker: a real preemption dies mid-run with
    # only 'last' on disk (keeping it would exercise the skip path instead)
    import shutil
    shutil.rmtree(str(tmp_path / "group" / "final"))
    resumed = VmapSweep(base_cfg(epochs=4), combos).run(
        train, test, verbose=False, save_dir=d, resume=True)

    assert resumed.history == straight.history
    assert resumed.best_test_fscore == straight.best_test_fscore
    assert resumed.best_epoch == straight.best_epoch

    # now 'final' exists: rerunning the sweep skips training entirely and
    # reproduces the result from the marker
    again = VmapSweep(base_cfg(epochs=4), combos).run(
        train, test, verbose=False, save_dir=d, resume=True)
    assert again.history == straight.history
    assert again.best_test_fscore == straight.best_test_fscore


def test_vmap_sweep_resume_refuses_wrong_group(data, tmp_path):
    """A checkpoint written for a different combo group must be refused."""
    train, test = data
    d = str(tmp_path / "group")
    VmapSweep(base_cfg(epochs=1), [dict(lr=3e-3, l2=1e-4)]).run(
        train, test, verbose=False, save_dir=d)
    with pytest.raises(ValueError, match="different combo group"):
        VmapSweep(base_cfg(epochs=1), [dict(lr=1e-5, l2=1e-4)]).run(
            train, test, verbose=False, save_dir=d, resume=True)
