"""Baseline model tests: GRUCell parity, DialogueRNN oracle, heads, training."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mmdfn_tpu.models.baselines import (DialogRNNModel, DialogueRNN, GRUModel,
                                        LSTMModel)
from mmdfn_tpu.nn.rnn import GRUCellStep


def test_gru_cell_step_matches_torch(rng):
    D_in, H = 7, 5
    tcell = torch.nn.GRUCell(D_in, H)
    x = rng.standard_normal((3, D_in)).astype(np.float32)
    h = rng.standard_normal((3, H)).astype(np.float32)
    with torch.no_grad():
        th = tcell(torch.tensor(x), torch.tensor(h))

    m = GRUCellStep(hidden_size=H)
    params = {"params": {
        "w_ih": jnp.array(tcell.weight_ih.detach().numpy().T),
        "w_hh": jnp.array(tcell.weight_hh.detach().numpy().T),
        "b_ih": jnp.array(tcell.bias_ih.detach().numpy()),
        "b_hh": jnp.array(tcell.bias_hh.detach().numpy()),
    }}
    ours = m.apply(params, jnp.array(x), jnp.array(h))
    np.testing.assert_allclose(np.asarray(ours), th.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# numpy oracle of the reference DialogueRNN semantics (model.py:168-278):
# per-step global/party/emotion GRU updates with SimpleAttention over the
# growing g_hist, party states selected by argmax(qmask).
def _np_gru_cell(x, h, p):
    xg = x @ p["w_ih"] + p["b_ih"]
    hg = h @ p["w_hh"] + p["b_hh"]
    H = h.shape[-1]
    r = 1 / (1 + np.exp(-(xg[:, :H] + hg[:, :H])))
    z = 1 / (1 + np.exp(-(xg[:, H:2*H] + hg[:, H:2*H])))
    n = np.tanh(xg[:, 2*H:] + r * hg[:, 2*H:])
    return (1 - z) * n + z * h


def _np_dialogue_rnn(U, qmask, cell_params, D_g, D_p, D_e):
    p = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
         for k, v in cell_params.items() if k.endswith("_cell")}
    w_att = np.asarray(cell_params["att_scalar"]["kernel"])  # (D_g, 1)
    B, L, D_m = U.shape
    P = qmask.shape[-1]
    q = np.zeros((B, P, D_p), np.float32)
    e_prev = np.zeros((B, D_e), np.float32)
    g_hist = []
    es = []
    for t in range(L):
        U_t, qm_t = U[:, t], qmask[:, t]
        qm_idx = np.argmax(qm_t, axis=-1)
        q0_sel = q[np.arange(B), qm_idx]
        g_prev = g_hist[-1] if g_hist else np.zeros((B, D_g), np.float32)
        g_ = _np_gru_cell(np.concatenate([U_t, q0_sel], -1), g_prev,
                          p["g_cell"])
        if g_hist:
            hist = np.stack(g_hist, axis=1)            # (B, t, D_g)
            scores = (hist @ w_att)[..., 0]            # (B, t)
            a = np.exp(scores - scores.max(-1, keepdims=True))
            a /= a.sum(-1, keepdims=True)
            c_ = np.einsum("bt,btd->bd", a, hist)
        else:
            c_ = np.zeros((B, D_g), np.float32)
        U_c = np.concatenate([U_t, c_], -1)
        U_c_b = np.repeat(U_c[:, None], P, axis=1).reshape(B * P, -1)
        qs_ = _np_gru_cell(U_c_b, q.reshape(B * P, D_p),
                           p["p_cell"]).reshape(B, P, D_p)
        q = q * (1 - qm_t[..., None]) + qs_ * qm_t[..., None]
        e0 = e_prev if t > 0 else np.zeros((B, D_e), np.float32)
        e_ = _np_gru_cell(q[np.arange(B), qm_idx], e0, p["e_cell"])
        g_hist.append(g_)
        es.append(e_)
        e_prev = e_
    return np.stack(es, axis=1)


def test_dialogue_rnn_matches_oracle(rng):
    B, L, P = 2, 6, 2
    D_m, D_g, D_p, D_e = 5, 4, 3, 4
    U = rng.standard_normal((B, L, D_m)).astype(np.float32)
    spk = rng.integers(0, P, size=(B, L))
    qmask = np.zeros((B, L, P), np.float32)
    qmask[np.arange(B)[:, None], np.arange(L)[None], spk] = 1

    m = DialogueRNN(D_m, D_g, D_p, D_e, context_attention="simple",
                    dropout=0.0)
    params = m.init(jax.random.PRNGKey(0), jnp.array(U), jnp.array(qmask))
    e, alpha = m.apply(params, jnp.array(U), jnp.array(qmask),
                       deterministic=True)
    expected = _np_dialogue_rnn(U, qmask, params["params"]["cell"],
                                D_g, D_p, D_e)
    np.testing.assert_allclose(np.asarray(e), expected, atol=1e-5)
    assert e.shape == (B, L, D_e)


@pytest.mark.parametrize("listener_state", [False, True])
@pytest.mark.parametrize("att", ["simple", "general", "general2", "concat"])
def test_dialogue_rnn_attention_variants(rng, att, listener_state):
    B, L, P = 2, 5, 2
    U = rng.standard_normal((B, L, 6)).astype(np.float32)
    qmask = np.zeros((B, L, P), np.float32)
    qmask[:, :, 0] = 1
    m = DialogueRNN(6, 4, 3, 4, listener_state=listener_state,
                    context_attention=att, D_a=5, dropout=0.0)
    params = m.init(jax.random.PRNGKey(0), jnp.array(U), jnp.array(qmask))
    e, _ = m.apply(params, jnp.array(U), jnp.array(qmask))
    assert np.isfinite(np.asarray(e)).all()


@pytest.mark.parametrize("cls", [GRUModel, LSTMModel])
def test_rnn_baseline_heads(rng, cls):
    B, L, D_m = 2, 6, 10
    U = rng.standard_normal((B, L, D_m)).astype(np.float32)
    umask = np.ones((B, L), np.float32)
    umask[1, 4:] = 0
    qmask = np.zeros((B, L, 2), np.float32)
    m = cls(D_m, D_e=4, D_h=5, n_classes=6, dropout=0.2)
    params = m.init(jax.random.PRNGKey(0), jnp.array(U), jnp.array(qmask),
                    jnp.array(umask))
    logp = m.apply(params, jnp.array(U), jnp.array(qmask), jnp.array(umask))
    assert logp.shape == (B, L, 6)
    np.testing.assert_allclose(np.exp(np.asarray(logp)).sum(-1), 1.0,
                               atol=1e-5)


def test_dialog_rnn_model_forward(rng):
    B, L = 2, 6
    U = rng.standard_normal((B, L, 10)).astype(np.float32)
    umask = np.ones((B, L), np.float32)
    umask[0, 3:] = 0
    U = U * umask[..., None]
    spk = rng.integers(0, 2, size=(B, L))
    qmask = np.zeros((B, L, 2), np.float32)
    qmask[np.arange(B)[:, None], np.arange(L)[None], spk] = 1
    qmask *= umask[..., None]
    m = DialogRNNModel(10, D_g=4, D_p=3, D_e=4, D_h=5, n_classes=6,
                       dropout=0.2, dropout_rec=0.1)
    params = m.init(jax.random.PRNGKey(0), jnp.array(U), jnp.array(qmask),
                    jnp.array(umask))
    logp = m.apply(params, jnp.array(U), jnp.array(qmask), jnp.array(umask))
    assert logp.shape == (B, L, 6)
    assert np.isfinite(np.asarray(logp)[0, :3]).all()


def test_nongraph_training(tmp_path):
    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.data.datasets import IEMOCAPDataset
    from mmdfn_tpu.data.synthetic import make_synthetic_iemocap_pickle
    from mmdfn_tpu.train import Trainer

    path = str(tmp_path / "iem.pkl")
    make_synthetic_iemocap_pickle(path, n_train=6, n_test=3, min_len=4,
                                  max_len=10, seed=1)
    train = IEMOCAPDataset(path, True).dialogues()
    test = IEMOCAPDataset(path, False).dialogues()
    for base in ["GRU", "DialogRNN"]:
        cfg = ExperimentConfig(
            graph_model=False, base_model=base, multi_modal=False, modals="l",
            epochs=2, batch_size=4, lr=3e-3, buckets=(16,), class_weight=True)
        result = Trainer(cfg).fit(train, test, verbose=False)
        losses = [h["train_loss"] for h in result.history]
        assert losses[-1] < losses[0], (base, losses)
