"""Training-trajectory parity: our jitted step vs a torch replica.

Forward parity (test_e2e_torch_parity) + Adam bit-parity (test_trainer)
compose here into the full guarantee: with identical init and no dropout,
N optimization steps of the flagship MM-DFN produce the same loss trajectory
and parameters in both frameworks — i.e. gradients through the dynamic
adjacency (arccos/normalization), the CRN permutation, the GCNII scan, and
the focal loss (stop-grad pt) all match the reference's autograd.

Covers both flagship configs (IEMOCAP 2-speaker and MELD 9-speaker) over
10 optimizer steps with an explicit per-step drift bound: float32
accumulation drift is allowed to grow linearly per step, so a systematic
gradient mismatch (which compounds multiplicatively) cannot hide inside the
tolerance.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import sys
import os
sys.path.insert(0, os.path.dirname(__file__))
from test_e2e_torch_parity import (ALPHA, LAMDA, NLAYERS, big_adj, crn,
                                   gcnii_lyc, linear, make_torch_gru)

from mmdfn_tpu.config import ExperimentConfig
from mmdfn_tpu.data.batching import Batch
from mmdfn_tpu.train import Trainer

L = 6
STEPS = 10
LR, L2, GAMMA = 1e-3, 1e-4, 0.5
# per-step drift budget on the loss: |ours - theirs| <= DRIFT * (step + 1)
# (measured: <6e-5 absolute at step 10 on both configs; the bound leaves
# ~3x headroom while still catching any systematic gradient mismatch, which
# compounds multiplicatively, within 2-3 steps)
DRIFT = 2e-4


class TorchFlagship(torch.nn.Module):
    """Trainable torch replica of the flagship GDF eval path (dropout off),
    initialized from our flax params."""

    def __init__(self, p, sw):
        super().__init__()
        self.sw = sw
        t = lambda a: torch.nn.Parameter(torch.tensor(np.asarray(a)))
        self.w_la, self.b_la = t(p["linear_a"]["kernel"]), t(p["linear_a"]["bias"])
        self.w_lv, self.b_lv = t(p["linear_v"]["kernel"]), t(p["linear_v"]["bias"])
        self.w_ll, self.b_ll = t(p["linear_l"]["kernel"]), t(p["linear_l"]["bias"])
        self.rnn_parties = make_torch_gru(p["rnn_parties"], "rnn_parties",
                                          200, 100)
        self.lstm_l = make_torch_gru(p["lstm_l"], "lstm_l", 200, 100)
        g = p["graph_model"]["graph_net"]
        self.w_fc, self.b_fc = t(g["fc_in"]["kernel"]), t(g["fc_in"]["bias"])
        self.conv_w = t(g["conv_w"])
        self.r_ih, self.r_hh = t(g["reason_w_ih"]), t(g["reason_w_hh"])
        self.r_bih, self.r_bhh = t(g["reason_b_ih"]), t(g["reason_b_hh"])
        self.w_out, self.b_out = t(p["smax_fc"]["kernel"]), t(p["smax_fc"]["bias"])

    def forward(self, text, audio, visual, qmask):
        # reuse the shared oracle helpers from test_e2e_torch_parity (they
        # pass torch Parameters straight through), so there is exactly ONE
        # encoding of the reference semantics across both parity tests
        sw = self.sw
        U_a = linear(dict(kernel=self.w_la, bias=self.b_la))(audio)
        U_v = linear(dict(kernel=self.w_lv, bias=self.b_lv))(visual)
        U_l = linear(dict(kernel=self.w_ll, bias=self.b_ll))(text)
        emo_a = U_a + sw[0] * crn(self.rnn_parties, U_a, qmask)
        emo_v = U_v + sw[1] * crn(self.rnn_parties, U_v, qmask)
        emo_l = (self.lstm_l(U_l[:, None])[0][:, 0]
                 + sw[2] * crn(self.rnn_parties, U_l, qmask))

        adj = big_adj([emo_a, emo_v, emo_l])
        x = torch.cat([emo_a, emo_v, emo_l], dim=0)
        g = dict(fc_in=dict(kernel=self.w_fc, bias=self.b_fc),
                 conv_w=self.conv_w, reason_w_ih=self.r_ih,
                 reason_w_hh=self.r_hh, reason_b_ih=self.r_bih,
                 reason_b_hh=self.r_bhh)
        h = gcnii_lyc(g, x, adj)
        N = emo_a.shape[0]
        feat = torch.cat([h[:N], h[N:2 * N], h[2 * N:]], dim=1)
        out = linear(dict(kernel=self.w_out, bias=self.b_out))(F.relu(feat))
        return F.log_softmax(out, dim=-1)


def focal(logp, target, gamma=GAMMA):
    logpt = logp.gather(1, target[:, None]).squeeze(1)
    pt = logpt.detach().exp()
    return (-((1 - pt) ** gamma) * logpt).mean()


@pytest.mark.parametrize("dataset,sw", [
    ("IEMOCAP", "3-0-1"),          # run_train_ie.sh flagship
    ("MELD", "0.5-0.5-1.5"),       # run_train_me.sh flagship (9 speakers)
])
def test_training_trajectory_matches_torch(rng, dataset, sw):
    cfg = ExperimentConfig(
        dataset=dataset, graph_type="GDF", reason_flag=True,
        Deep_GCN_nlayers=NLAYERS, dropout=0.0, lr=LR, l2=L2, gamma=GAMMA,
        class_weight=False, batch_size=1, buckets=(L,), speaker_weights=sw)
    trainer = Trainer(cfg)
    info = cfg.info
    n_speakers, n_classes = info["n_speakers"], info["n_classes"]

    text = rng.standard_normal((1, L, info["D_text"])).astype(np.float32)
    audio = rng.standard_normal((1, L, info["D_audio"])).astype(np.float32)
    visual = rng.standard_normal((1, L, info["D_visual"])).astype(np.float32)
    spk = rng.integers(0, n_speakers, size=L)
    qmask = np.zeros((1, L, n_speakers), np.float32)
    qmask[0, np.arange(L), spk] = 1
    umask = np.ones((1, L), np.float32)
    label = rng.integers(0, n_classes, size=(1, L)).astype(np.int32)
    batch = Batch(text=text, visual=visual, audio=audio, qmask=qmask,
                  umask=umask, label=label)

    state = trainer.init_state()
    replica = TorchFlagship(jax.tree_util.tree_map(np.asarray, state.params),
                            sw=cfg.speaker_weight_list)
    opt = torch.optim.Adam(replica.parameters(), lr=LR, weight_decay=L2)

    from mmdfn_tpu.train.trainer import prepare_inputs
    inputs = prepare_inputs(cfg, batch)

    ours, theirs = [], []
    tt = torch.tensor(text[0])
    ta = torch.tensor(audio[0])
    tv = torch.tensor(visual[0])
    tq = torch.tensor(qmask[0])
    ty = torch.tensor(label[0].astype(np.int64))
    for step in range(STEPS):
        state, loss, _ = trainer._train_step(state, dict(inputs),
                                             jax.random.PRNGKey(step))
        ours.append(float(loss))

        opt.zero_grad()
        tloss = focal(replica(tt, ta, tv, tq), ty)
        tloss.backward()
        opt.step()
        theirs.append(float(tloss))

    drift = np.abs(np.asarray(ours) - np.asarray(theirs))
    budget = DRIFT * (np.arange(STEPS) + 1)
    assert (drift <= budget).all(), (
        f"per-step loss drift exceeded budget:\n ours={ours}\n "
        f"theirs={theirs}\n drift={drift.tolist()}\n budget={budget.tolist()}")
    # spot-check a parameter tensor after training
    np.testing.assert_allclose(
        np.asarray(state.params["smax_fc"]["kernel"]),
        replica.w_out.detach().numpy(), atol=2e-4)
