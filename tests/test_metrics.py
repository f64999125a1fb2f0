"""Metric parity with sklearn (the reference's metric source)."""

import numpy as np
import pytest
from sklearn.metrics import accuracy_score, f1_score as sk_f1

from mmdfn_tpu.train import metrics as M


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("weighted_samples", [False, True])
def test_accuracy_and_f1_match_sklearn(seed, weighted_samples):
    rng = np.random.default_rng(seed)
    n, C = 500, 7
    labels = rng.integers(0, C, size=n)
    preds = rng.integers(0, C, size=n)
    sw = rng.random(n).round() if weighted_samples else None

    np.testing.assert_allclose(
        M.accuracy(labels, preds, sw), accuracy_score(labels, preds, sample_weight=sw)
    )
    for avg in ["weighted", "macro"]:
        np.testing.assert_allclose(
            M.f1_score(labels, preds, C, average=avg, sample_weight=sw),
            sk_f1(labels, preds, average=avg, sample_weight=sw, zero_division=0),
            atol=1e-12,
        )


def test_reference_rounding():
    assert M.reference_rounding(0.68184) == 68.18
    assert M.reference_rounding(0.59462) == 59.46


def test_classification_report_values():
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 4, size=200)
    preds = rng.integers(0, 4, size=200)
    names = ["a", "b", "c", "d"]
    rep = M.classification_report(labels, preds, names)
    from sklearn.metrics import classification_report as sk_rep
    sk = sk_rep(labels, preds, target_names=names, digits=4, zero_division=0)
    # Compare the numeric cells (layout whitespace may differ slightly).
    ours = [tok for tok in rep.split() if tok.replace(".", "").isdigit()]
    theirs = [tok for tok in sk.split() if tok.replace(".", "").isdigit()]
    assert ours == theirs


def test_per_class_accuracy_strings():
    labels = np.array([0, 0, 1, 1, 2])
    preds = np.array([0, 1, 1, 1, 0])
    out = M.per_class_accuracy(labels, preds, ["x", "y", "z"])
    assert out[0] == "ACC"
    assert out[1] == "x: 0.5000"
    assert out[2] == "y: 1.0000"
    assert out[3] == "z: 0.0000"
