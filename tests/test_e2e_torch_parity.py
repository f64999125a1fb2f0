"""End-to-end parity: full flagship MM-DFN forward vs a torch oracle.

Builds the reference's default GDF path (trimodal, concat_subsequently,
CRN speaker encoder, 2-layer GCNII with reason-LSTM, eval mode) in eager
PyTorch from the documented reference semantics, copies our flax params into
it, and compares final log-probs.  This is the strongest reproduction
guarantee available without the real feature pickles: if every number in the
forward matches, training dynamics (and hence the published F1) can only
differ through the optimizer (covered by test_trainer torch-Adam parity) and
dropout draws.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mmdfn_tpu.models import DialogueGNN

L = 6          # single full-length dialogue (no padding: torch GRUs consume
               # pads in the reference; our BiRNN masks them — a documented
               # deviation that vanishes at full length)
NLAYERS = 2
ALPHA, LAMDA = 0.2, 0.5
SW = (3.0, 0.0, 1.0)


def make_torch_gru(p, prefix, in_dim, H, layers=2):
    gru = torch.nn.GRU(in_dim, H, num_layers=layers, bidirectional=True)
    sd = {}
    for layer in range(layers):
        for di, d in enumerate(("fwd", "bwd")):
            suf = "_reverse" if di else ""
            name = f"l{layer}_{d}"
            sd[f"weight_ih_l{layer}{suf}"] = torch.tensor(
                np.asarray(p[f"w_ih_{name}"]).T)
            sd[f"weight_hh_l{layer}{suf}"] = torch.tensor(
                np.asarray(p[f"w_hh_{name}"]).T)
            sd[f"bias_ih_l{layer}{suf}"] = torch.tensor(
                np.asarray(p[f"b_ih_{name}"]))
            sd[f"bias_hh_l{layer}{suf}"] = torch.tensor(
                np.asarray(p[f"b_hh_{name}"]))
    gru.load_state_dict(sd)
    gru.eval()
    return gru


def _t(a):
    """Pass torch tensors through; convert jax/numpy leaves.  Lets the same
    oracle helpers serve both the fixed-weight forward-parity test and the
    trainable replica in test_train_parity (whose leaves are Parameters)."""
    return a if isinstance(a, torch.Tensor) else torch.tensor(np.asarray(a))


def linear(p):
    w, b = _t(p["kernel"]), _t(p["bias"])
    return lambda x: x @ w + b


def crn(rnn_parties, U, qmask):
    """Reference CRN gather/scatter loops (model.py:1040-1060), seq-first.

    ONE deliberate deviation from the reference is reproduced here: the
    party sub-sequence is truncated to the party's utterance count before
    the bi-GRU, so the backward direction never consumes padding.  The
    reference feeds the full zero-padded buffer to cuDNN, which makes each
    dialogue's CRN features depend on the padded length of the batch it
    happened to land in (batch-composition-dependent outputs) — our build
    is padding-invariant by design (see mmdfn_tpu/nn/rnn.py docstring).
    """
    Lx, H = U.shape
    P = qmask.shape[-1]
    U_p = torch.zeros(Lx, H)
    for p in range(P):
        idx = torch.nonzero(qmask[:, p]).squeeze(-1)
        if len(idx) == 0:
            continue
        sub = U[idx]                                  # truncated, no pads
        out, _ = rnn_parties(sub[:, None])            # (count, 1, 2H)
        U_p[idx] = out[:, 0]
    return U_p


def big_adj(feats):
    """Reference MM_GCN.create_big_adj for one dialogue (model_mm.py:122-180)."""
    M, N = len(feats), feats[0].shape[0]
    adj = torch.zeros(M * N, M * N)
    for i, f in enumerate(feats):
        nrm = f / f.norm(dim=-1, keepdim=True)
        cos = nrm @ nrm.t()
        sim = 1 - torch.acos(torch.clamp(cos * 0.99999, -1, 1)) / np.pi
        adj[i * N:(i + 1) * N, i * N:(i + 1) * N] = sim
        for j, g in enumerate(feats):
            if j == i:
                continue
            gn = g / g.norm(dim=-1, keepdim=True)
            dia = 1 - torch.acos(
                torch.clamp((nrm * gn).sum(-1) * 0.99999, -1, 1)) / np.pi
            adj[i * N:(i + 1) * N, j * N:(j + 1) * N] += torch.diag(dia)
    d = adj.sum(1)
    dinv = d.pow(-0.5)
    return dinv[:, None] * adj * dinv[None, :]


def gcnii_lyc(p, x, adj):
    """fc_in -> nlayers x (reason LSTM step + GCNII conv) -> concat residual."""
    fc = linear(p["fc_in"])
    h = F.relu(fc(x))
    h0 = h
    W = _t(p["conv_w"])
    w_ih = _t(p["reason_w_ih"])
    w_hh = _t(p["reason_w_hh"])
    b_ih = _t(p["reason_b_ih"])
    b_hh = _t(p["reason_b_hh"])
    H = h.shape[-1]
    lh = torch.zeros_like(h)
    lc = torch.zeros_like(h)
    for l in range(W.shape[0]):
        q = h
        g = h @ w_ih + b_ih + lh @ w_hh + b_hh
        i, f, gg, o = torch.split(g, H, dim=-1)
        lc = torch.sigmoid(f) * lc + torch.sigmoid(i) * torch.tanh(gg)
        lh = torch.sigmoid(o) * torch.tanh(lc)
        h = lh
        theta = float(np.log(LAMDA / (l + 1) + 1))
        hi = adj @ h
        support = torch.cat([hi, h0], dim=1)
        r = (1 - ALPHA) * hi + ALPHA * h0
        h = F.relu(theta * (support @ W[l]) + (1 - theta) * r)
        h = h + q
    return torch.cat([x, h], dim=1)


def _graph_head(p, emo_a, emo_v, emo_l):
    """Shared tail: dynamic adjacency -> GCNII -> concat -> classifier."""
    adj = big_adj([emo_a, emo_v, emo_l])
    x = torch.cat([emo_a, emo_v, emo_l], dim=0)
    h = gcnii_lyc(p["graph_model"]["graph_net"], x, adj)
    N = emo_a.shape[0]
    feat = torch.cat([h[:N], h[N:2 * N], h[2 * N:]], dim=1)
    logits = linear(p["smax_fc"])(F.relu(feat))
    return F.log_softmax(logits, dim=-1)


def torch_flagship(params, text, audio, visual, qmask):
    """The complete reference GDF eval forward for one dialogue, seq-first."""
    p = params
    U_a = linear(p["linear_a"])(audio)
    U_v = linear(p["linear_v"])(visual)
    U_l = linear(p["linear_l"])(text)
    parties = make_torch_gru(p["rnn_parties"], "rnn_parties", 200, 100)
    lstm_l = make_torch_gru(p["lstm_l"], "lstm_l", 200, 100)

    emo_a = U_a + SW[0] * crn(parties, U_a, qmask)
    emo_v = U_v + SW[1] * crn(parties, U_v, qmask)
    ctx_l = lstm_l(U_l[:, None])[0][:, 0]
    emo_l = ctx_l + SW[2] * crn(parties, U_l, qmask)

    return _graph_head(p, emo_a, emo_v, emo_l)


def torch_flagship_faithful_pads(params, text, audio, visual, qmask,
                                 true_len):
    """The reference forward as it ACTUALLY behaves on a padded batch row.

    The reference's encoders run on the zero-padded (L_pad, D) buffers: the
    linear layers turn pad rows into bias rows, ``lstm_l`` consumes the whole
    padded sequence (its backward direction reads pads before the real
    utterances), and the CRN feeds each party's zero-padded buffer to cuDNN
    (``model.py:1040-1060``).  Only the graph stage is pad-free (the packed
    node matrix keeps valid utterances only).  This is the one channel where
    the build deliberately deviates (padding-invariant BiRNN, see
    mmdfn_tpu/nn/rnn.py) — this oracle exists to *measure* that deviation.
    """
    p = params
    L_pad = text.shape[0]
    U_a = linear(p["linear_a"])(audio)
    U_v = linear(p["linear_v"])(visual)
    U_l = linear(p["linear_l"])(text)
    parties = make_torch_gru(p["rnn_parties"], "rnn_parties", 200, 100)
    lstm_l = make_torch_gru(p["lstm_l"], "lstm_l", 200, 100)

    def crn_pad(U):
        U_p = torch.zeros(L_pad, U.shape[-1])
        for sp in range(qmask.shape[-1]):
            idx = torch.nonzero(qmask[:, sp]).squeeze(-1)
            if len(idx) == 0:
                continue
            buf = torch.zeros(L_pad, U.shape[-1])
            buf[:len(idx)] = U[idx]
            out, _ = parties(buf[:, None])        # bi-GRU consumes the pads
            U_p[idx] = out[:len(idx), 0]
        return U_p

    emo_a = (U_a + SW[0] * crn_pad(U_a))[:true_len]
    emo_v = (U_v + SW[1] * crn_pad(U_v))[:true_len]
    ctx_l = lstm_l(U_l[:, None])[0][:, 0]         # backward dir reads pads
    emo_l = (ctx_l + SW[2] * crn_pad(U_l))[:true_len]

    return _graph_head(p, emo_a, emo_v, emo_l)


@pytest.mark.parametrize("n_speakers,n_classes,sw", [
    (2, 6, "3-0-1"),          # IEMOCAP flagship
    (9, 7, "0.5-0.5-1.5"),    # MELD flagship (run_train_me.sh weights)
])
def test_flagship_forward_matches_torch_oracle(rng, n_speakers, n_classes,
                                               sw):
    global SW
    sw_list = tuple(float(v) for v in sw.split("-"))
    old_sw, SW = SW, sw_list
    try:
        _run_forward_parity(rng, n_speakers, n_classes, sw)
    finally:
        SW = old_sw


def _run_forward_parity(rng, n_speakers, n_classes, sw):
    model = DialogueGNN(
        base_model="LSTM", D_m=100, D_m_a=1582, D_m_v=342,
        n_speakers=n_speakers, n_classes=n_classes, dropout=0.4,
        graph_type="GDF", reason_flag=True, deep_gcn_nlayers=NLAYERS,
        use_crn_speaker=True, speaker_weights=sw, alpha=ALPHA, lamda=LAMDA)

    text = rng.standard_normal((1, L, 100)).astype(np.float32)
    audio = rng.standard_normal((1, L, 1582)).astype(np.float32)
    visual = rng.standard_normal((1, L, 342)).astype(np.float32)
    spk = rng.integers(0, n_speakers, size=L)
    qmask = np.zeros((1, L, n_speakers), np.float32)
    qmask[0, np.arange(L), spk] = 1
    umask = np.ones((1, L), np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.array(text),
                           jnp.array(qmask), jnp.array(umask),
                           jnp.array(audio), jnp.array(visual),
                           deterministic=True)
    ours = model.apply(variables, jnp.array(text), jnp.array(qmask),
                       jnp.array(umask), jnp.array(audio),
                       jnp.array(visual), deterministic=True)

    with torch.no_grad():
        expected = torch_flagship(
            variables["params"], torch.tensor(text[0]),
            torch.tensor(audio[0]), torch.tensor(visual[0]),
            torch.tensor(qmask[0]))

    np.testing.assert_allclose(np.asarray(ours[0]), expected.numpy(),
                               atol=2e-4)


def test_padded_batch_parity_and_rnn_padding_deviation(rng):
    """Two guarantees on a genuinely padded batch row:

    1. the build matches the *truncated* torch oracle exactly — our outputs
       are padding-invariant (pads never leak into valid positions);
    2. the deviation between truncated semantics and the reference's
       pads-into-cuDNN behavior is MEASURED, not just documented: it must be
       nonzero (the oracle really exercises the channel) and bounded, so the
       one route through which published-F1 reproduction could drift is
       quantified.
    """
    L_pad, true_len = 9, 5
    model = DialogueGNN(
        base_model="LSTM", D_m=100, D_m_a=1582, D_m_v=342,
        n_speakers=2, n_classes=6, dropout=0.4,
        graph_type="GDF", reason_flag=True, deep_gcn_nlayers=NLAYERS,
        use_crn_speaker=True, speaker_weights="3-0-1",
        alpha=ALPHA, lamda=LAMDA)

    umask = np.zeros((1, L_pad), np.float32)
    umask[0, :true_len] = 1
    text = rng.standard_normal((1, L_pad, 100)).astype(np.float32)
    audio = rng.standard_normal((1, L_pad, 1582)).astype(np.float32)
    visual = rng.standard_normal((1, L_pad, 342)).astype(np.float32)
    for x in (text, audio, visual):
        x *= umask[..., None]
    spk = rng.integers(0, 2, size=L_pad)
    qmask = np.zeros((1, L_pad, 2), np.float32)
    qmask[0, np.arange(L_pad), spk] = 1
    qmask *= umask[..., None]

    variables = model.init(jax.random.PRNGKey(0), jnp.array(text),
                           jnp.array(qmask), jnp.array(umask),
                           jnp.array(audio), jnp.array(visual),
                           deterministic=True)
    ours = np.asarray(model.apply(
        variables, jnp.array(text), jnp.array(qmask), jnp.array(umask),
        jnp.array(audio), jnp.array(visual),
        deterministic=True))[0, :true_len]

    with torch.no_grad():
        trunc = torch_flagship(
            variables["params"], torch.tensor(text[0, :true_len]),
            torch.tensor(audio[0, :true_len]),
            torch.tensor(visual[0, :true_len]),
            torch.tensor(qmask[0, :true_len])).numpy()
        faithful = torch_flagship_faithful_pads(
            variables["params"], torch.tensor(text[0]),
            torch.tensor(audio[0]), torch.tensor(visual[0]),
            torch.tensor(qmask[0]), true_len).numpy()

    # (1) build == truncated oracle on the padded batch
    np.testing.assert_allclose(ours, trunc, atol=2e-4)

    # (2) quantified deviation of the documented BiRNN-padding fix
    dev = np.abs(trunc - faithful)
    assert dev.max() > 1e-4, "faithful-pads oracle did not exercise padding"
    assert dev.max() < 0.5, (
        f"padding deviation larger than the documented bound: {dev.max()}")
    print(f"\nRNN-padding deviation on log-probs: max={dev.max():.4f} "
          f"mean={dev.mean():.5f}")
