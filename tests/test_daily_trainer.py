"""End-to-end DailyDialogue training: TokenBatch path through Trainer.fit.

The reference never wires its DailyDialogue loader (``dataloader.py:71-101``)
into a trainer; this exercises the build-side completion of that family —
synthetic 7-tuple pickle -> TokenBucketBatcher -> jitted steps -> metrics,
checkpointing, and CLI dispatch.
"""

import json
import os

import numpy as np
import pytest

from mmdfn_tpu.config import ExperimentConfig
from mmdfn_tpu.data.batching import TokenBucketBatcher
from mmdfn_tpu.data.datasets import DailyDialogueDataset
from mmdfn_tpu.data.synthetic import make_synthetic_daily_pickle
from mmdfn_tpu.train import DailyTrainer


@pytest.fixture(scope="module")
def daily_setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dailytr") / "daily.pkl")
    make_synthetic_daily_pickle(path, n_per_split=(6, 2, 2), min_len=3,
                                max_len=10, max_words=12, vocab_size=80,
                                seed=3)
    cfg = ExperimentConfig(
        dataset="DailyDialogue", data_dir=path, base_model="LSTM",
        batch_size=4, epochs=2, buckets=(12,), vocab_size=80, max_words=12,
        embedding_dim=16, cnn_filters=8, cnn_output_size=24, dropout=0.2,
        windowp=3, windowf=3, loss="NLLLoss", lr=3e-3)
    return cfg, path


def test_daily_fit_end_to_end(daily_setup, tmp_path):
    cfg, path = daily_setup
    trainer = DailyTrainer(cfg)
    train = DailyDialogueDataset("train", path).dialogues()
    valid = DailyDialogueDataset("valid", path).dialogues()
    test = DailyDialogueDataset("test", path).dialogues()

    save_dir = str(tmp_path / "daily_ckpt")
    result = trainer.fit(train, test, valid_dialogues=valid, verbose=False,
                         save_dir=save_dir)
    assert len(result.history) == cfg.epochs
    for row in result.history:
        assert np.isfinite(row["train_loss"])
        assert 0 <= row["test_acc"] <= 100
    # checkpoint written and restorable into a fresh state
    from mmdfn_tpu.runtime import checkpoint as ckpt_lib
    assert ckpt_lib.has_checkpoint(save_dir)
    restored, meta = ckpt_lib.restore_checkpoint(save_dir,
                                                 trainer.init_state())
    m = trainer.evaluate(restored, test)
    assert np.isfinite(m.loss)


def test_daily_token_batcher_static_word_axis(daily_setup):
    """Every batch shares one (B, L<=bucket, W) shape family: W is fixed."""
    cfg, path = daily_setup
    train = DailyDialogueDataset("train", path).dialogues()
    batcher = TokenBucketBatcher(train, batch_size=4, max_words=cfg.max_words,
                                 buckets=cfg.buckets, shuffle=True, seed=1)
    shapes = {b.tokens.shape for b in batcher.epoch(0)}
    assert all(s[0] == 4 and s[2] == cfg.max_words for s in shapes)
    for b in batcher.epoch(0):
        assert b.n_valid == int(b.umask.sum())
        # padding must not leak label/token garbage
        assert (b.tokens[b.umask == 0] == 0).all()
        assert (b.label[b.umask == 0] == 0).all()


def test_daily_cli_dispatch(daily_setup, tmp_path, capsys):
    """--dataset DailyDialogue trains through the reference-flag CLI."""
    cfg, path = daily_setup
    from mmdfn_tpu.cli.run_train_erc import main

    save = str(tmp_path / "daily_cli")
    log = str(tmp_path / "daily.jsonl")
    rc = main(["--dataset", "DailyDialogue", "--data_dir", path,
               "--base_model", "LSTM", "--batch-size", "4", "--epochs", "1",
               "--buckets", "12", "--vocab_size", "80", "--max_words", "12",
               "--embedding_dim", "16", "--cnn_filters", "8",
               "--cnn_output_size", "24", "--windowp", "3", "--windowf", "3",
               "--loss", "NLLLoss", "--save_model_dir", save,
               "--log_jsonl", log])
    assert rc == 0
    rows = [json.loads(l) for l in open(log)]
    assert len(rows) == 1 and np.isfinite(rows[0]["train_loss"])
    assert os.path.isdir(save)


def test_daily_pretrained_embeddings_frozen(daily_setup):
    """Injected GloVe-style table is used verbatim and stays frozen under
    training while other params move (model.py:1421-1423 semantics)."""
    import jax

    cfg, path = daily_setup
    trainer = DailyTrainer(cfg)
    state = trainer.init_state()
    rng = np.random.default_rng(7)
    vectors = rng.standard_normal(
        (cfg.vocab_size, cfg.embedding_dim)).astype(np.float32)
    state = trainer.init_pretrained_embeddings(state, vectors, freeze=True)
    emb = np.asarray(state.params["cnn_feat_extractor"]["embedding"])
    np.testing.assert_array_equal(emb, vectors)

    train = DailyDialogueDataset("train", path).dialogues()
    batches = list(trainer._make_batcher(train))
    key = jax.random.PRNGKey(0)
    fc_before = np.asarray(state.params["cnn_feat_extractor"]["fc"]["kernel"])
    for i, b in enumerate(batches[:3]):
        state, loss, _ = trainer._train_step(
            state, trainer._prepare(b), jax.random.fold_in(key, i))
    emb_after = np.asarray(state.params["cnn_feat_extractor"]["embedding"])
    fc_after = np.asarray(state.params["cnn_feat_extractor"]["fc"]["kernel"])
    np.testing.assert_array_equal(emb_after, vectors)   # frozen
    assert np.abs(fc_after - fc_before).max() > 0       # others train

    with pytest.raises(ValueError):
        trainer.init_pretrained_embeddings(state, vectors[:, :-1])
