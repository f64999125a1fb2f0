"""The framework LEARNS a separable task end-to-end (VERDICT r4 missing #1).

Every parity test pins the math at tiny shapes and ≤6 epochs; none proves a
full training run converges.  The reference's correctness regime is exactly
that — continuous empirical evaluation to 68.18/59.46 weighted-F1 on the
real pickles (``code/run_train_erc.py:558-581``, README:49-59), which this
mount cannot reproduce (feature pickles stripped).  This test is the
build-side stand-in: a synthetic ERC task whose labels are a deterministic
function of the features + a per-speaker nuisance shift
(``data/synthetic.make_separable_iemocap_pickle``), trained through the FULL
flagship pipeline — IEMOCAP GDF, 16 GCNII layers, reason_flag, class
weights, focal loss, dual-patience early stop, and the production quirk
stack (``config.py:TPU_FAST_KNOBS``: pallas RNN kernel, rbg dropout bits;
off-TPU the fused GCNII kernel legitimately falls back to the scan when
dropout is live) — to near-perfect weighted F1 on BOTH splits.

An optimizer-wiring, masking, or quirk-interaction bug that only manifests
over a real run (wrong gradient sign somewhere, leaked padding, a dropout
stream that never varies across steps) caps F1 at chance (~17%) and fails
loudly here.
"""

import jax
import numpy as np
import pytest

from mmdfn_tpu.config import ExperimentConfig
from mmdfn_tpu.data.datasets import IEMOCAPDataset
from mmdfn_tpu.data.synthetic import make_separable_iemocap_pickle
from mmdfn_tpu.train import Trainer


def test_flagship_learns_separable_task(tmp_path):
    pkl = str(tmp_path / "sep.pkl")
    # ~900 train utterances: the task is Bayes-error ~0 but the inputs are
    # 100/1582/342-dim, so a too-small train split turns this into a
    # memorization test (24 dialogues -> train 100 / test ~60)
    make_separable_iemocap_pickle(pkl, n_train=96, n_test=24,
                                  min_len=6, max_len=12, seed=11)
    train = IEMOCAPDataset(pkl, True).dialogues()
    test = IEMOCAPDataset(pkl, False).dialogues()

    cfg = ExperimentConfig(
        dataset="IEMOCAP", graph_type="GDF", reason_flag=True,
        class_weight=True, Deep_GCN_nlayers=16, speaker_weights="3-0-1",
        batch_size=8, buckets=(8,), lr=1e-3, epochs=12, patience=12,
        ).with_tpu_fast()
    trainer = Trainer(cfg)
    res = trainer.fit(train, test, verbose=False)

    # labels are a deterministic function of the features (Bayes error ~0);
    # a correct pipeline reaches ~100 on both splits in a handful of epochs
    assert res.best_test_fscore >= 95.0, (
        f"flagship failed to learn the separable task: best test F1 "
        f"{res.best_test_fscore} (chance ~17) — history {res.history}")
    # train F1 at the selected epoch must also be high: a model that aces
    # test while failing train would mean selection/eval is reading the
    # wrong split
    train_f_at_best = res.history[res.best_epoch]["train_fscore"]
    assert train_f_at_best >= 95.0, (
        f"train F1 at best epoch only {train_f_at_best}: {res.history}")
    # and it must actually have TRAINED to get there (epoch-0 model is at
    # chance; guards against an accidentally-trivial task)
    assert res.history[0]["train_fscore"] < 60.0, (
        "task is trivially solvable without training — not a learning test")
