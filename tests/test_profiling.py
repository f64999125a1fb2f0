"""Observability utilities: throughput meter, histograms, JSONL stream."""

import json
import time

import numpy as np

import jax.numpy as jnp

from mmdfn_tpu.runtime.profiling import (JsonlWriter, ThroughputMeter,
                                         annotate, grad_histograms, trace)


def test_throughput_meter():
    m = ThroughputMeter()
    with m.step(4, 40):
        time.sleep(0.01)
    with m.step(4, 32):
        time.sleep(0.01)
    s = m.summary()
    assert s["dialogues"] == 8 and s["utterances"] == 72
    assert s["seconds"] >= 0.02
    assert abs(m.dialogues_per_sec - 8 / m.seconds) < 1e-9


def test_grad_histograms():
    grads = {"layer": {"kernel": jnp.arange(12.0).reshape(3, 4),
                       "bias": jnp.zeros(4)}}
    hists = grad_histograms(grads, bins=8)
    assert len(hists) == 2
    for counts, edges in hists.values():
        assert counts.sum() in (12, 4)
        assert len(edges) == 9


def test_jsonl_writer(tmp_path):
    path = str(tmp_path / "log" / "steps.jsonl")
    w = JsonlWriter(path)
    w.write(dict(step=1, loss=0.5))
    w.write(dict(step=2, loss=np.float32(0.25)))
    w.close()
    rows = [json.loads(l) for l in open(path)]
    assert rows[0]["step"] == 1 and rows[1]["loss"] == 0.25


def test_trace_noop_and_annotate():
    with trace(None):
        with annotate("region"):
            pass


def test_trainer_reports_throughput(tmp_path):
    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.data.datasets import IEMOCAPDataset
    from mmdfn_tpu.data.synthetic import make_synthetic_iemocap_pickle
    from mmdfn_tpu.train import Trainer

    pkl = str(tmp_path / "iem.pkl")
    make_synthetic_iemocap_pickle(pkl, n_train=4, n_test=2, min_len=4,
                                  max_len=8, seed=3)
    tr = Trainer(ExperimentConfig(epochs=1, batch_size=4,
                                  Deep_GCN_nlayers=2, buckets=(8,)))
    res = tr.fit(IEMOCAPDataset(pkl, True).dialogues(),
                 IEMOCAPDataset(pkl, False).dialogues(), verbose=False)
    assert res.history[0]["train_dps"] > 0
    assert res.history[0]["train_ups"] > 0


def test_grad_histograms_device_under_jit():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mmdfn_tpu.runtime.profiling import grad_histograms_device

    grads = {"a": {"kernel": jnp.arange(12.).reshape(3, 4) - 6.0,
                   "bias": jnp.zeros((4,))}}
    out = jax.jit(lambda g: grad_histograms_device(g, bins=8))(grads)
    k = out["['a']['kernel']"]
    assert int(np.asarray(k["counts"]).sum()) == 12
    assert int(k["num"]) == 12
    np.testing.assert_allclose(float(k["min"]), -6.0)
    np.testing.assert_allclose(float(k["sum"]), float(np.arange(12).sum() - 72))
    b = out["['a']['bias']"]                    # all-zero leaf must not nan
    assert int(np.asarray(b["counts"]).sum()) == 4
    assert np.isfinite(np.asarray(b["edges"])).all()
