"""DailyDialogue family tests: TextCNN/CNN frontend parity + full model."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

from mmdfn_tpu.data.batching import collate_tokens
from mmdfn_tpu.data.datasets import DailyDialogueDataset
from mmdfn_tpu.data.synthetic import make_synthetic_daily_pickle
from mmdfn_tpu.models.daily import (CNNFeatureExtractor, DialogueGCNDailyModel,
                                    TextCNN)


def test_textcnn_matches_torch(rng):
    """Full-width Conv2d + maxpool + fc tail vs a torch oracle."""
    B, L, D = 3, 9, 6
    C, E = 4, 5
    x = rng.standard_normal((B, L, D)).astype(np.float32)

    m = TextCNN(input_dim=D, emb_size=E, out_channels=C, dropout=0.0)
    params = m.init(jax.random.PRNGKey(0), jnp.array(x))

    tx = torch.tensor(x)[:, None]                     # (B, 1, L, D)
    outs = []
    p = params["params"]
    for K in (3, 4, 5):
        w = np.asarray(p[f"conv_k{K}"]["kernel"])     # (K, D, C)
        b = np.asarray(p[f"conv_k{K}"]["bias"])
        tw = torch.tensor(np.transpose(w, (2, 0, 1))[:, None])  # (C,1,K,D)
        conv = F.conv2d(tx, tw, torch.tensor(b))      # (B, C, L-K+1, 1)
        act = torch.relu(conv.squeeze(3))
        outs.append(torch.max_pool1d(act, act.shape[2]).squeeze(2))
    cat = torch.cat(outs, dim=1)
    wf = torch.tensor(np.asarray(p["embd"]["kernel"]))
    bf = torch.tensor(np.asarray(p["embd"]["bias"]))
    expected = torch.relu(cat @ wf + bf).numpy()

    ours = m.apply(params, jnp.array(x))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


def test_cnn_feature_extractor_matches_torch(rng):
    B, L, W = 2, 4, 12
    V, E, Fn, O = 30, 8, 5, 6
    tokens = rng.integers(0, V, size=(B, L, W)).astype(np.int32)
    umask = np.ones((B, L), np.float32)
    umask[1, 2:] = 0

    m = CNNFeatureExtractor(vocab_size=V, embedding_dim=E, output_size=O,
                            filters=Fn, dropout=0.0)
    params = m.init(jax.random.PRNGKey(0), jnp.array(tokens),
                    jnp.array(umask))
    p = params["params"]
    emb = np.asarray(p["embedding"])[tokens.reshape(B * L, W)]  # (BL, W, E)
    te = torch.tensor(np.transpose(emb, (0, 2, 1)))             # (BL, E, W)
    pooled = []
    for K in (3, 4, 5):
        w = np.asarray(p[f"conv{K}"]["kernel"])                 # (K, E, F)
        tw = torch.tensor(np.transpose(w, (2, 1, 0)))           # (F, E, K)
        b = torch.tensor(np.asarray(p[f"conv{K}"]["bias"]))
        c = torch.relu(F.conv1d(te, tw, b))
        pooled.append(torch.max_pool1d(c, c.shape[2]).squeeze(2))
    cat = torch.cat(pooled, 1)
    wf = torch.tensor(np.asarray(p["fc"]["kernel"]))
    bf = torch.tensor(np.asarray(p["fc"]["bias"]))
    feat = torch.relu(cat @ wf + bf).numpy().reshape(B, L, O)
    expected = feat * umask[..., None]

    ours = m.apply(params, jnp.array(tokens), jnp.array(umask))
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-5)


@pytest.fixture(scope="module")
def daily_batch(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("daily") / "daily.pkl")
    make_synthetic_daily_pickle(path, seed=0)
    ds = DailyDialogueDataset("train", path)
    batch = collate_tokens(ds.dialogues()[:4], batch_size=4, bucket=12)
    return batch


@pytest.mark.parametrize("base_model", ["LSTM", "GRU", "None", "DialogRNN"])
def test_daily_model_forward(daily_batch, base_model):
    b = daily_batch
    model = DialogueGCNDailyModel(
        base_model=base_model, D_m=100, D_g=8, D_p=6, D_e=8, D_h=8, D_a=8,
        graph_hidden_size=8, n_speakers=2, max_seq_len=20, window_past=3,
        window_future=3, vocab_size=200, embedding_dim=16, cnn_output_size=100,
        cnn_filters=10, n_classes=7, dropout=0.2)
    params = model.init(jax.random.PRNGKey(0), jnp.array(b.tokens),
                        jnp.array(b.qmask), jnp.array(b.umask))
    logp = model.apply(params, jnp.array(b.tokens), jnp.array(b.qmask),
                       jnp.array(b.umask))
    assert logp.shape == (4, 12, 7)
    valid = np.asarray(b.umask) > 0
    assert np.isfinite(np.asarray(logp)[valid]).all()


def test_daily_model_trains(daily_batch):
    """A few Adam steps through the full daily model reduce the loss."""
    from mmdfn_tpu.losses import masked_nll_loss

    b = daily_batch
    model = DialogueGCNDailyModel(
        base_model="LSTM", D_m=100, D_g=8, D_p=6, D_e=8, D_h=8, D_a=8,
        graph_hidden_size=8, n_speakers=2, max_seq_len=20, window_past=3,
        window_future=3, vocab_size=200, embedding_dim=16, cnn_output_size=100,
        cnn_filters=10, n_classes=7, dropout=0.2)
    tokens, qmask, umask = map(jnp.array, (b.tokens, b.qmask, b.umask))
    label = jnp.array(b.label)
    params = model.init(jax.random.PRNGKey(0), tokens, qmask, umask)["params"]
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logp = model.apply({"params": p}, tokens, qmask, umask)
            return masked_nll_loss(logp, label, umask)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
