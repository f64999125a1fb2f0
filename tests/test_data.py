"""Data layer tests: pickle-format parsing + bucketed batching contract."""

import numpy as np
import pytest

from mmdfn_tpu.data import (
    IEMOCAPDataset, MELDDataset, BucketBatcher,
    make_synthetic_iemocap_pickle, make_synthetic_meld_pickle,
)
from mmdfn_tpu.data.batching import bucket_length, collate
from mmdfn_tpu.data.datasets import FEAT2DIM, train_valid_split, DailyDialogueDataset
from mmdfn_tpu.data.synthetic import make_synthetic_daily_pickle


@pytest.fixture(scope="module")
def iemocap_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "iemocap.pkl"
    make_synthetic_iemocap_pickle(str(p), n_train=6, n_test=3, seed=1)
    return str(p)


@pytest.fixture(scope="module")
def meld_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "meld.pkl"
    make_synthetic_meld_pickle(str(p), n_train=6, n_test=3, seed=1)
    return str(p)


def test_iemocap_parsing(iemocap_path):
    train = IEMOCAPDataset(iemocap_path, train=True)
    test = IEMOCAPDataset(iemocap_path, train=False)
    assert len(train) == 6 and len(test) == 3
    d = train[0]
    assert d.text.shape[1] == FEAT2DIM["textCNN"]
    assert d.audio.shape[1] == FEAT2DIM["IS10"]
    assert d.visual.shape[1] == FEAT2DIM["denseface"]
    assert d.qmask.shape == (len(d), 2)
    assert set(np.unique(d.qmask.sum(-1))) == {1.0}
    assert d.label.shape == (len(d),)


def test_meld_parsing(meld_path):
    train = MELDDataset(meld_path, train=True)
    d = train[0]
    assert d.text.shape[1] == FEAT2DIM["MELD_text"]
    assert d.audio.shape[1] == FEAT2DIM["MELD_audio"]
    assert d.qmask.shape == (len(d), 9)
    assert train.return_labels()  # reference helper parity (dataloader.py:60-64)


def test_daily_parsing(tmp_path):
    p = tmp_path / "daily.pkl"
    make_synthetic_daily_pickle(str(p))
    ds = DailyDialogueDataset("train", str(p))
    d = ds[0]
    assert d.tokens.ndim == 2 and d.qmask.shape[1] == 2


def test_bucket_length():
    assert bucket_length(5) == 16
    assert bucket_length(16) == 16
    assert bucket_length(17) == 24
    assert bucket_length(110) == 128
    assert bucket_length(500) == 500  # beyond last bucket: exact


def test_collate_shapes_and_masks(iemocap_path):
    ds = IEMOCAPDataset(iemocap_path, train=True)
    dialogues = ds.dialogues()[:3]
    batch = collate(dialogues, batch_size=4, bucket=32, n_speakers=2)
    assert batch.text.shape == (4, 32, FEAT2DIM["textCNN"])
    assert batch.umask.shape == (4, 32)
    # 4th row is an all-pad dialogue
    assert batch.umask[3].sum() == 0
    for i, d in enumerate(dialogues):
        assert batch.umask[i].sum() == len(d)
        np.testing.assert_array_equal(batch.label[i, : len(d)], d.label)
        np.testing.assert_array_equal(batch.text[i, : len(d)], d.text)
        assert np.all(batch.text[i, len(d):] == 0)


def test_batcher_reproducible_shuffle(iemocap_path):
    ds = IEMOCAPDataset(iemocap_path, train=True)
    b = BucketBatcher(ds.dialogues(), batch_size=4, n_speakers=2, shuffle=True, seed=7)
    v1 = [batch.vids for batch in b.epoch(0)]
    v2 = [batch.vids for batch in b.epoch(0)]
    v3 = [batch.vids for batch in b.epoch(1)]
    assert v1 == v2
    assert v1 != v3


def test_train_valid_split():
    tr, va = train_valid_split(10, 0.2)
    assert va == [0, 1] and tr == list(range(2, 10))
    tr, va = train_valid_split(10, 0.0)
    assert va == [] and len(tr) == 10
