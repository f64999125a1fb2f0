"""Every graph family trains through the Trainer (gradients flow end-to-end)."""

import pytest

from mmdfn_tpu.config import ExperimentConfig
from mmdfn_tpu.data.datasets import IEMOCAPDataset
from mmdfn_tpu.data.synthetic import make_synthetic_iemocap_pickle
from mmdfn_tpu.train import Trainer


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("g") / "iem.pkl")
    make_synthetic_iemocap_pickle(path, n_train=6, n_test=3, min_len=4,
                                  max_len=8, seed=6)
    return (IEMOCAPDataset(path, True).dialogues(),
            IEMOCAPDataset(path, False).dialogues())


@pytest.mark.parametrize("graph_type,extra", [
    ("GF", {}),
    ("GF2", {}),
    ("GF2", dict(graph_construct="single")),
    ("GF2", dict(graph_construct="window")),
    ("GF2", dict(graph_construct="fc")),
    ("relation", {}),
    ("DeepGCN", {}),
    ("GCN3", {}),
    ("None", {}),
    ("GDF", dict(mm_fusion_mthd="gated")),
])
def test_graph_type_trains(data, graph_type, extra):
    train, test = data
    cfg = ExperimentConfig(
        epochs=2, batch_size=4, Deep_GCN_nlayers=2, graph_type=graph_type,
        lr=3e-3, buckets=(8,), **extra)
    result = Trainer(cfg).fit(train, test, verbose=False)
    losses = [h["train_loss"] for h in result.history]
    assert losses[-1] < losses[0], (graph_type, losses)
