"""Adjacency builder parity vs ragged numpy oracles of the reference math.

The oracles re-implement, in plain numpy with per-dialogue loops, the
algorithms described at reference ``model_mm.py:122-180`` (cross-modal big
adjacency), ``model_GCN.py:287-310`` (GCNII block adjacency),
``model_GCN.py:85-118`` (directed speaker graph) and
``model_GCN.py:386-409`` (windowed relation graph), operating on packed
ragged inputs exactly like the reference.  Our batched builders must agree on
every real-node entry and be exactly zero on padding.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mmdfn_tpu.graph import (
    mm_big_adjacency,
    gcnii_block_adjacency,
    directed_speaker_adjacency,
    window_relation_adjacency,
    window_edge_mask,
    relation_type_ids,
)


def np_angular(cos, scale=True):
    c = cos * 0.99999 if scale else np.clip(cos, -1.0, 1.0)
    return 1.0 - np.arccos(np.clip(c, -1, 1)) / np.pi


def oracle_mm_big_adj(feats_packed, dia_len, modal_weight=1.0):
    """Global modality-major (M*N, M*N) adjacency, reference layout."""
    M = len(feats_packed)
    N = feats_packed[0].shape[0]
    adj = np.zeros((M * N, M * N))
    start = 0
    for L in dia_len:
        for m in range(M):
            for n in range(M):
                ms, ns = start + N * m, start + N * n
                if m == n:
                    x = feats_packed[m][start:start + L]
                    nx = x / np.linalg.norm(x, axis=1, keepdims=True)
                    adj[ms:ms + L, ns:ns + L] = np_angular(nx @ nx.T)
                else:
                    x = feats_packed[m][start:start + L]
                    y = feats_packed[n][start:start + L]
                    nx = x / np.linalg.norm(x, axis=1, keepdims=True)
                    ny = y / np.linalg.norm(y, axis=1, keepdims=True)
                    dia = np_angular(np.sum(nx * ny, axis=1)) * modal_weight
                    adj[ms + np.arange(L), ns + np.arange(L)] = dia
        start += L
    d = adj.sum(1)
    dinv = np.where(d > 0, d ** -0.5, 0.0)
    return dinv[:, None] * adj * dinv[None, :]


def _random_batch(rng, dia_len, L_pad, D):
    B = len(dia_len)
    x = np.zeros((B, L_pad, D), np.float32)
    umask = np.zeros((B, L_pad), np.float32)
    for b, L in enumerate(dia_len):
        x[b, :L] = rng.standard_normal((L, D))
        umask[b, :L] = 1
    return x, umask


@pytest.mark.parametrize("n_modals", [2, 3])
def test_mm_big_adjacency_matches_oracle(rng, n_modals):
    dia_len = [5, 3, 7]
    L_pad, D = 9, 6
    feats, packed = [], []
    for _ in range(n_modals):
        x, umask = _random_batch(rng, dia_len, L_pad, D)
        feats.append(x)
        packed.append(np.concatenate([x[b, :L] for b, L in enumerate(dia_len)]))
    mw = 0.7
    ours = np.asarray(mm_big_adjacency([jnp.array(f) for f in feats],
                                       jnp.array(umask), modal_weight=mw))
    oracle = oracle_mm_big_adj(packed, dia_len, modal_weight=mw)

    N = sum(dia_len)
    offs = np.cumsum([0] + dia_len[:-1])
    for b, L in enumerate(dia_len):
        for m in range(n_modals):
            for n in range(n_modals):
                got = ours[b, m * L_pad:m * L_pad + L, n * L_pad:n * L_pad + L]
                want = oracle[m * N + offs[b]: m * N + offs[b] + L,
                              n * N + offs[b]: n * N + offs[b] + L]
                np.testing.assert_allclose(got, want, atol=1e-5)
    # padding never carries weight
    for b, L in enumerate(dia_len):
        for m in range(n_modals):
            sl = slice(m * L_pad + L, (m + 1) * L_pad)
            assert np.all(ours[b, sl, :] == 0)
            assert np.all(ours[b, :, sl] == 0)


def test_mm_big_adjacency_padding_invariance(rng):
    """Growing the pad bucket must not change any real entry."""
    dia_len = [4, 6]
    feats8, umask8 = [], None
    feats12 = []
    for _ in range(3):
        x, umask8 = _random_batch(rng, dia_len, 8, 5)
        feats8.append(x)
        feats12.append(np.pad(x, ((0, 0), (0, 4), (0, 0))))
    umask12 = np.pad(umask8, ((0, 0), (0, 4)))
    a8 = np.asarray(mm_big_adjacency([jnp.array(f) for f in feats8], jnp.array(umask8)))
    a12 = np.asarray(mm_big_adjacency([jnp.array(f) for f in feats12], jnp.array(umask12)))
    for b, L in enumerate(dia_len):
        for m in range(3):
            for n in range(3):
                np.testing.assert_allclose(
                    a8[b, m * 8:m * 8 + L, n * 8:n * 8 + L],
                    a12[b, m * 12:m * 12 + L, n * 12:n * 12 + L], atol=1e-6)


def test_gcnii_block_adjacency_matches_oracle(rng):
    dia_len = [6, 4]
    x, umask = _random_batch(rng, dia_len, 8, 5)
    ours = np.asarray(gcnii_block_adjacency(jnp.array(x), jnp.array(umask)))
    for b, L in enumerate(dia_len):
        xx = x[b, :L]
        nx = xx / np.linalg.norm(xx, axis=1, keepdims=True)
        block = np_angular(nx @ nx.T)
        d = block.sum(1)
        dinv = d ** -0.5
        want = dinv[:, None] * block * dinv[None, :]
        np.testing.assert_allclose(ours[b, :L, :L], want, atol=1e-5)


def test_directed_speaker_adjacency_matches_oracle(rng):
    dia_len = [7, 4]
    L_pad, D, P = 8, 5, 2
    x, umask = _random_batch(rng, dia_len, L_pad, D)
    spk = rng.integers(0, P, size=(len(dia_len), L_pad))
    qmask = np.zeros((len(dia_len), L_pad, P), np.float32)
    qmask[np.arange(len(dia_len))[:, None], np.arange(L_pad)[None], spk] = 1
    qmask *= umask[..., None]

    ours = np.asarray(directed_speaker_adjacency(
        jnp.array(x), jnp.array(qmask), jnp.array(umask), normalize=True))

    for b, L in enumerate(dia_len):
        adj = np.eye(L)
        for p in range(P):
            pos = [t for t in range(L) if spk[b, t] == p]
            for k in range(len(pos) - 1):
                xi, xj = x[b, pos[k]], x[b, pos[k + 1]]
                f = xi @ xj / (np.linalg.norm(xi) * np.linalg.norm(xj))
                aij = np_angular(np.clip(f, -1, 1), scale=False)
                adj[pos[k], pos[k + 1]] = aij
                adj[pos[k + 1], pos[k]] = aij
        d = adj.sum(1)
        dinv = d ** -0.5
        want = dinv[:, None] * adj * dinv[None, :]
        np.testing.assert_allclose(ours[b, :L, :L], want, atol=1e-5)


def test_window_relation_adjacency_matches_oracle(rng):
    dia_len = [9]
    L_pad, D, w = 12, 4, 2
    x, umask = _random_batch(rng, dia_len, L_pad, D)
    ours = np.asarray(window_relation_adjacency(
        jnp.array(x), jnp.array(umask), window=w))

    L = dia_len[0]
    # reference edge-set union (model_GCN.py:391-397)
    edges = set()
    for k in range(L):
        left, right = max(0, k - w), min(L - 1, k + w)
        for i in range(left, right):
            for j in range(i + 1, right + 1):
                edges.add((i, j))
    adj = np.eye(L)
    for i, j in edges:
        xi, xj = x[0, i], x[0, j]
        f = xi @ xj / (np.linalg.norm(xi) * np.linalg.norm(xj))
        aij = np_angular(np.clip(f, -1, 1), scale=False)
        adj[i, j] = adj[j, i] = aij
    d = adj.sum(1)
    dinv = d ** -0.5
    want = dinv[:, None] * adj * dinv[None, :]
    np.testing.assert_allclose(ours[0, :L, :L], want, atol=1e-5)


def test_window_edge_mask_matches_edge_perms():
    """Dense window mask == reference edge_perms enumeration."""
    import itertools

    def edge_perms(l, wp, wf):
        all_perms = set()
        for j in range(l):
            if wp == -1 and wf == -1:
                eff = range(l)
            elif wp == -1:
                eff = range(0, min(l, j + wf + 1))
            elif wf == -1:
                eff = range(max(0, j - wp), l)
            else:
                eff = range(max(0, j - wp), min(l, j + wf + 1))
            for item in eff:
                all_perms.add((j, item))
        return all_perms

    for wp, wf, L in itertools.product([-1, 2, 10], [-1, 3, 10], [5, 8]):
        umask = np.ones((1, L), np.float32)
        mask = np.asarray(window_edge_mask(jnp.array(umask), wp, wf))[0]
        want = edge_perms(L, wp, wf)
        got = {(int(i), int(j)) for i, j in zip(*np.nonzero(mask))}
        assert got == want, (wp, wf, L)


def test_relation_type_ids():
    P = 2
    qmask = np.zeros((1, 3, P), np.float32)
    qmask[0, :, :] = [[1, 0], [0, 1], [1, 0]]  # speakers 0,1,0
    ids = np.asarray(relation_type_ids(jnp.array(qmask)))[0]
    # mapping: '000'->0 '001'->1 '010'->2 '011'->3 '100'->4 '101'->5 '110'->6 '111'->7
    assert ids[0, 1] == 2 * (0 * P + 1) + 0   # src 0(spk0) -> dst 1(spk1), forward
    assert ids[1, 0] == 2 * (1 * P + 0) + 1   # src 1(spk1) -> dst 0(spk0), backward
    assert ids[0, 0] == 2 * (0 * P + 0) + 1   # self loop -> dir bit 1
    assert ids[2, 1] == 2 * (0 * P + 1) + 1


def oracle_mm_wo_speaker(feats_packed, dia_len, scheme, window=10):
    """Packed (M*N, M*N) oracle of ``message_passing_wo_speaker``
    (model_mm.py:298-477) with the two documented fixes: the fc target index
    keeps its dialogue offset (model_mm.py:389 drops it) and the modality
    block size is the true N (model_mm.py:413 uses N*M//3 for M=2)."""
    M = len(feats_packed)
    N = feats_packed[0].shape[0]
    x = np.concatenate(feats_packed, axis=0)          # (M*N, D)

    def w(p, q):
        a, b = x[p], x[q]
        f = float(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
        f = min(1.0, max(-1.0, f))
        return 1.0 - np.arccos(f) / np.pi

    adj = np.eye(M * N)
    start = 0
    for L in dia_len:
        # intra-modal: all pairs within the dialogue, every modality
        for m in range(M):
            for j in range(L - 1):
                for pin in range(L - 1 - j):
                    xz = m * N + start + j
                    yz = xz + pin + 1
                    adj[xz, yz] = adj[yz, xz] = w(xz, yz)
        # cross-modal, per scheme, every modality pair (m < n)
        for m in range(M):
            for n in range(m + 1, M):
                for j in range(L):
                    if scheme == "single":
                        pins = [j]
                    elif scheme == "window":
                        pins = range(max(j - window, 0), min(j + window, L))
                    else:                                           # fc
                        pins = range(j, L)
                    for pin in pins:
                        xz = m * N + start + j
                        yz = n * N + start + pin
                        adj[xz, yz] = adj[yz, xz] = w(xz, yz)
        start += L
    d = adj.sum(1)
    dinv = np.where(d > 0, d ** -0.5, 0.0)
    return dinv[:, None] * adj * dinv[None, :]


@pytest.mark.parametrize("scheme", ["single", "window", "fc"])
@pytest.mark.parametrize("n_modals", [2, 3])
def test_mm_wo_speaker_adjacency_matches_oracle(rng, scheme, n_modals):
    from mmdfn_tpu.graph import mm_wo_speaker_adjacency

    dia_len = [5, 3, 7]
    L_pad, D = 9, 6
    feats, packed = [], []
    for _ in range(n_modals):
        x, umask = _random_batch(rng, dia_len, L_pad, D)
        feats.append(x)
        packed.append(np.concatenate([x[b, :L] for b, L in enumerate(dia_len)]))
    # window=2 so the window actually clips inside these short dialogues
    ours = np.asarray(mm_wo_speaker_adjacency(
        [jnp.array(f) for f in feats], jnp.array(umask),
        scheme=scheme, window=2))
    ref = oracle_mm_wo_speaker(packed, dia_len, scheme, window=2)

    M = n_modals
    for b, L in enumerate(dia_len):
        start = sum(dia_len[:b])
        for m in range(M):
            for n in range(M):
                got = ours[b, m * L_pad:m * L_pad + L, n * L_pad:n * L_pad + L]
                exp = ref[m * len(packed[0]) + start:][:L].T[
                    n * len(packed[0]) + start:][:L].T
                np.testing.assert_allclose(got, exp, atol=2e-5,
                                           err_msg=f"b={b} block ({m},{n})")
    # padding rows/cols exactly zero
    for b, L in enumerate(dia_len):
        for m in range(M):
            pad = ours[b, m * L_pad + L: (m + 1) * L_pad]
            assert not pad.any()


def test_mm_wo_speaker_rejects_unknown_scheme(rng):
    from mmdfn_tpu.graph import mm_wo_speaker_adjacency
    x, umask = _random_batch(rng, [3], 4, 5)
    with pytest.raises(ValueError, match="single/window/fc"):
        mm_wo_speaker_adjacency([jnp.array(x)], jnp.array(umask),
                                scheme="direct")
