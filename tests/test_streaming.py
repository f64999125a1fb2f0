"""Streaming inference: prefix-exactness and bucket behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

from mmdfn_tpu.config import ExperimentConfig
from mmdfn_tpu.data.datasets import IEMOCAPDataset
from mmdfn_tpu.data.synthetic import make_synthetic_iemocap_pickle
from mmdfn_tpu.serve import StreamingSession
from mmdfn_tpu.train import Trainer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("s") / "iem.pkl")
    make_synthetic_iemocap_pickle(path, n_train=2, n_test=2, min_len=6,
                                  max_len=10, seed=4)
    trainer = Trainer(ExperimentConfig(
        batch_size=2, Deep_GCN_nlayers=2, graph_type="GDF",
        reason_flag=True, buckets=(16,)))
    state = trainer.init_state()
    test = IEMOCAPDataset(path, False).dialogues()
    return trainer, state, test


def test_streaming_matches_offline_prefix(setup):
    """Prediction at step t == offline forward on the length-t prefix."""
    trainer, state, test = setup
    d = test[0]
    session = StreamingSession(trainer, state, buckets=(4, 8, 16))

    for t in range(len(d)):
        spk = int(np.argmax(d.qmask[t]))
        pred, logp = session.append(d.text[t], d.audio[t], d.visual[t], spk)

        # offline forward on the same prefix, padded to the same bucket
        from mmdfn_tpu.data.batching import bucket_length
        L = bucket_length(t + 1, (4, 8, 16))
        pad = lambda a, D: np.pad(a[: t + 1], ((0, L - t - 1), (0, 0)))[None]
        umask = np.zeros((1, L), np.float32)
        umask[0, : t + 1] = 1
        offline = trainer.model.apply(
            {"params": state.params},
            jnp.asarray(pad(d.text, None)), jnp.asarray(pad(d.qmask, None)),
            jnp.asarray(umask), jnp.asarray(pad(d.audio, None)),
            jnp.asarray(pad(d.visual, None)), deterministic=True)
        np.testing.assert_allclose(logp, np.asarray(offline[0, t]),
                                   atol=1e-6)


def test_streaming_reset_and_overflow(setup):
    trainer, state, test = setup
    session = StreamingSession(trainer, state, buckets=(4,))
    d = test[0]
    for t in range(4):
        session.append(d.text[t], d.audio[t], d.visual[t], 0)
    with pytest.raises(ValueError):
        session.append(d.text[0], d.audio[0], d.visual[0], 0)
    session.reset()
    assert session.t == 0
    pred, _ = session.append(d.text[0], d.audio[0], d.visual[0], 0)
    assert 0 <= pred < 6


def test_measure_latency_smoke(setup):
    from mmdfn_tpu.serve.streaming import measure_latency
    trainer, state, test = setup
    stats = measure_latency(trainer, state, test[:1], buckets=(8, 16))
    assert stats["n"] == len(test[0])
    assert stats["p50_ms"] > 0 and stats["p99_ms"] >= stats["p50_ms"]


def test_latency_bench_module(tmp_path):
    """latency_bench.run produces the committed-artifact schema."""
    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.serve import latency_bench

    cfg = ExperimentConfig(batch_size=2, Deep_GCN_nlayers=2,
                           graph_type="GDF", reason_flag=True, buckets=(16,))
    stats = latency_bench.run(cfg=cfg, n_dialogues=2, min_len=4, max_len=6,
                              buckets=(8,), seed=1)
    for k in ("p50_ms", "p90_ms", "p99_ms", "mean_ms", "n", "platform",
              "model", "buckets"):
        assert k in stats, k
    assert stats["n"] > 0 and stats["p50_ms"] > 0


def test_measure_latency_warmup_dialogues(setup):
    """warmup_dialogues replays unrecorded: n counts only the timed appends."""
    from mmdfn_tpu.serve.streaming import measure_latency
    trainer, state, test = setup
    stats = measure_latency(trainer, state, test[:2], buckets=(16,),
                            warmup_dialogues=1)
    assert stats["n"] == len(test[0]) + len(test[1])
