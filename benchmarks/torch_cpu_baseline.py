"""CPU PyTorch reference-equivalent baseline for the flagship MM-DFN step.

The reference repo cannot run here (its feature pickles are stripped from the
mount and its GDF path hard-crashes without CUDA — ``model_mm.py:98,125``), so
this script re-creates the reference's *computational shape* in eager PyTorch,
faithful to how it computes (not what it computes on):

* per-dialogue python loop building the dense (3N, 3N) cross-modal adjacency
  from angular cosine similarity every forward (``model_mm.py:122-180``)
* packed (sum-len, D) node tensor, 16 GCNII layers of ``mm(adj, h)`` + reason
  LSTM step (``model_GCN.py:444-483``)
* per-modality Linear projections, bi-GRU text encoder, CRN party GRU with
  python gather/scatter loops over batch x speaker (``model.py:1040-1154``)
* focal loss on packed log-probs, Adam step (``run_train_erc.py:202-212``)

Run:  python benchmarks/torch_cpu_baseline.py [--batches 8] [--batch-size 32]
Prints one JSON line with dialogues/sec; that number is pinned in bench.py as
the CPU reference baseline.
"""

import argparse
import json
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class GCNIILayer(nn.Module):
    def __init__(self, nfeat):
        super().__init__()
        self.w = nn.Linear(2 * nfeat, nfeat, bias=False)

    def forward(self, adj, h, h0, lamda, alpha, layer):
        theta = float(np.log(lamda / layer + 1))
        hi = torch.mm(adj, h)
        support = torch.cat([hi, h0], dim=1)
        r = (1 - alpha) * hi + alpha * h0
        return theta * self.w(support) + (1 - theta) * r


class FlagshipTorch(nn.Module):
    """Eager reference-equivalent: encoders + dynamic graph + GCNII stack."""

    def __init__(self, d_text=100, d_audio=1582, d_visual=342, hidden=200,
                 d_e=100, nlayers=16, nhidden=100, n_classes=6):
        super().__init__()
        self.linear_a = nn.Linear(d_audio, hidden)
        self.linear_v = nn.Linear(d_visual, hidden)
        self.linear_l = nn.Linear(d_text, hidden)
        self.lstm_l = nn.GRU(hidden, d_e, num_layers=2, bidirectional=True,
                             batch_first=False, dropout=0.4)
        self.rnn_parties = nn.GRU(hidden, d_e, num_layers=2,
                                  bidirectional=True, batch_first=False,
                                  dropout=0.4)
        self.fc_in = nn.Linear(2 * d_e, nhidden)
        self.convs = nn.ModuleList([GCNIILayer(nhidden) for _ in range(nlayers)])
        self.reason = nn.LSTM(nhidden, nhidden, 1)
        self.fc_out = nn.Linear(3 * (2 * d_e + nhidden), n_classes)
        self.nlayers = nlayers

    def crn(self, U, qmask):
        # python gather/scatter loops over batch x party (model.py:1040-1060)
        L, B, H = U.shape
        P = qmask.shape[-1]
        # reference allocates plain zeros at the GRU's output width
        # (model.py:1043) — no extra rnn_parties pass just for the shape
        U_p = torch.zeros(L, B, 2 * self.rnn_parties.hidden_size)
        U_parties = [torch.zeros_like(U) for _ in range(P)]
        for b in range(B):
            for p in range(P):
                idx = torch.nonzero(qmask[:, b, p]).squeeze(-1)
                if len(idx) > 0:
                    U_parties[p][: len(idx), b] = U[idx, b]
        E_parties = [self.rnn_parties(U_parties[p])[0] for p in range(P)]
        for b in range(B):
            for p in range(P):
                idx = torch.nonzero(qmask[:, b, p]).squeeze(-1)
                if len(idx) > 0:
                    U_p[idx, b] = E_parties[p][: len(idx), b]
        return U_p

    def big_adj(self, feats, dia_len):
        # per-dialogue python loop (model_mm.py:122-180)
        M = len(feats)
        N = sum(dia_len)
        adj = torch.zeros((M * N, M * N))
        start = 0
        for L in dia_len:
            for i, f in enumerate(feats):
                sub = f[start:start + L]
                nrm = sub / (sub.norm(dim=-1, keepdim=True) + 1e-8)
                cos = nrm @ nrm.t()
                sim = 1 - torch.acos(torch.clamp(cos * 0.99999, -1, 1)) / np.pi
                o = i * N + start
                adj[o:o + L, o:o + L] = sim
                for j in range(M):
                    if j == i:
                        continue
                    g = feats[j][start:start + L]
                    gn = g / (g.norm(dim=-1, keepdim=True) + 1e-8)
                    dia = (nrm * gn).sum(-1)
                    dsim = 1 - torch.acos(torch.clamp(dia * 0.99999, -1, 1)) / np.pi
                    oj = j * N + start
                    adj[o:o + L, oj:oj + L] += torch.diag(dsim)
            start += L
        d = adj.sum(1)
        dinv = torch.where(d > 0, d.pow(-0.5), torch.zeros_like(d))
        return dinv[:, None] * adj * dinv[None, :]

    def forward(self, text, audio, visual, qmask, dia_len):
        # text/audio/visual: (L, B, D) seq-first like the reference
        U_a = self.linear_a(audio)
        U_v = self.linear_v(visual)
        U_l = self.linear_l(text)
        emo_a = U_a + 3.0 * self.crn(U_a, qmask)
        emo_v = U_v + 0.0 * self.crn(U_v, qmask)
        emo_l = self.lstm_l(U_l)[0] + 1.0 * self.crn(U_l, qmask)

        # simple_batch_graphify: pack valid utterances (model.py:553-565)
        def pack(x):
            return torch.cat([x[: dia_len[b], b] for b in range(x.shape[1])])

        fa, fv, fl = pack(emo_a), pack(emo_v), pack(emo_l)
        adj = self.big_adj([fa, fv, fl], dia_len)
        x = torch.cat([fa, fv, fl], dim=0)
        h = h0 = F.relu(self.fc_in(x))
        state = None
        for i, conv in enumerate(self.convs):
            q, state = self.reason(h[None], state)
            h = F.relu(conv(adj, h, h0, lamda=0.5, alpha=0.2, layer=i + 1)) + q[0]
        N = fa.shape[0]
        out = torch.cat([x, h], dim=1)
        feat = torch.cat([out[:N], out[N:2 * N], out[2 * N:]], dim=1)
        return F.log_softmax(self.fc_out(F.relu(feat)), dim=-1)


def focal_loss(logp, target, gamma=0.5):
    logpt = logp.gather(1, target[:, None]).squeeze(1)
    pt = logpt.detach().exp()
    return (-((1 - pt) ** gamma) * logpt).mean()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--min-len", type=int, default=20)
    ap.add_argument("--max-len", type=int, default=80)
    ap.add_argument("--threads", type=int, default=0,
                    help="0 = torch default (all cores)")
    args = ap.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)
    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    model = FlagshipTorch()
    opt = torch.optim.Adam(model.parameters(), lr=3e-4, weight_decay=1e-4)

    def make_batch():
        B = args.batch_size
        dia_len = [int(rng.integers(args.min_len, args.max_len + 1))
                   for _ in range(B)]
        L = max(dia_len)
        text = torch.randn(L, B, 100)
        audio = torch.randn(L, B, 1582)
        visual = torch.randn(L, B, 342)
        qmask = torch.zeros(L, B, 2)
        for b in range(B):
            spk = rng.integers(0, 2, size=dia_len[b])
            for t, s in enumerate(spk):
                qmask[t, b, s] = 1
        label = torch.from_numpy(
            rng.integers(0, 6, size=sum(dia_len)).astype(np.int64))
        return text, audio, visual, qmask, dia_len, label

    batches = [make_batch() for _ in range(args.batches)]

    # warmup
    t, a, v, q, dl, y = batches[0]
    loss = focal_loss(model(t, a, v, q, dl), y)
    loss.backward()
    opt.zero_grad()

    t0 = time.perf_counter()
    n_dialogues = 0
    for t, a, v, q, dl, y in batches:
        opt.zero_grad()
        loss = focal_loss(model(t, a, v, q, dl), y)
        loss.backward()
        opt.step()
        n_dialogues += len(dl)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "train dialogues/sec (torch CPU reference-equivalent)",
        "value": round(n_dialogues / dt, 3), "unit": "dialogues/sec",
        "n_dialogues": n_dialogues, "seconds": round(dt, 2),
        "threads": torch.get_num_threads()}))


if __name__ == "__main__":
    main()
