"""MaskedEdgeAttention + nodal-attention classifier vs reference oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdfn_tpu.graph.relation import relation_type_ids, window_edge_mask
from mmdfn_tpu.nn.attention import MaskedEdgeAttention, MatchingAttention


def edge_perms_oracle(l, wp, wf):
    """Transliteration of reference edge_perms (model.py:532-550)."""
    out = set()
    arr = np.arange(l)
    for j in range(l):
        if wp == -1 and wf == -1:
            eff = arr
        elif wp == -1:
            eff = arr[: min(l, j + wf + 1)]
        elif wf == -1:
            eff = arr[max(0, j - wp):]
        else:
            eff = arr[max(0, j - wp): min(l, j + wf + 1)]
        for item in eff:
            out.add((j, int(item)))
    return out


@pytest.mark.parametrize("wp,wf", [(2, 2), (3, 1), (-1, 2), (2, -1),
                                   (-1, -1)])
def test_window_edge_mask_matches_edge_perms(wp, wf):
    L = 7
    umask = np.ones((1, L), np.float32)
    mask = np.asarray(window_edge_mask(jnp.array(umask), wp, wf))[0]
    expected = edge_perms_oracle(L, wp, wf)
    got = {(s, d) for s in range(L) for d in range(L) if mask[s, d] > 0}
    assert got == expected


def test_relation_ids_match_mapping():
    """edge_type_mapping semantics (model.py:974-980, 592-598)."""
    L, P = 5, 3
    rng = np.random.default_rng(0)
    spk = rng.integers(0, P, size=L)
    qmask = np.zeros((1, L, P), np.float32)
    qmask[0, np.arange(L), spk] = 1
    ids = np.asarray(relation_type_ids(jnp.array(qmask)))[0]

    mapping = {}
    for j in range(P):
        for k in range(P):
            mapping[f"{j}{k}0"] = len(mapping)
            mapping[f"{j}{k}1"] = len(mapping)
    for s in range(L):
        for d in range(L):
            direction = "0" if s < d else "1"
            expected = mapping[f"{spk[s]}{spk[d]}{direction}"]
            assert ids[s, d] == expected, (s, d)


def test_masked_edge_attention_matches_reference_math(rng):
    """attn1 branch (model.py:439-471): Linear(2De->max_seq_len) scores,
    softmax over sequence positions, window masking with the 1e-10
    denominator leakage, renormalization."""
    L, D, S = 6, 8, 10
    wp = wf = 2
    M = rng.standard_normal((1, L, D)).astype(np.float32)
    umask = np.ones((1, L), np.float32)
    edge_mask = window_edge_mask(jnp.array(umask), wp, wf)

    mod = MaskedEdgeAttention(max_seq_len=S)
    params = mod.init(jax.random.PRNGKey(0), jnp.array(M), edge_mask)
    W = np.asarray(params["params"]["scalar"]["kernel"])    # (D, S)

    # reference math, per dialogue: scale (L, S); softmax over L (dim 0);
    # alpha[channel(src), pos(dst)]; soft mask 1e-10 off-edge; renorm; hard
    scale = M[0] @ W                                        # (L, S)
    e = np.exp(scale - scale.max(axis=0, keepdims=True))
    sm = e / e.sum(axis=0, keepdims=True)                   # softmax over L
    alpha = sm.T[:L]                                        # (src=channel, dst=pos)
    edges = edge_perms_oracle(L, wp, wf)
    soft = np.full((L, L), 1e-10, np.float32)
    hard = np.zeros((L, L), np.float32)
    for (s, d) in edges:
        soft[s, d] = 1.0
        hard[s, d] = 1.0
    masked = alpha * soft
    expected = masked / masked.sum(-1, keepdims=True) * hard

    got = np.asarray(mod.apply(params, jnp.array(M), edge_mask))[0]
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_nodal_attention_matches_per_step_loop(rng):
    """The batched MatchingAttention('general2') equals the reference's
    per-timestep loop (classify_node_features, model.py:647-672)."""
    B, L, D = 2, 6, 10
    M = rng.standard_normal((B, L, D)).astype(np.float32)
    lengths = np.array([6, 4])
    umask = (np.arange(L)[None] < lengths[:, None]).astype(np.float32)

    mod = MatchingAttention(D, D, att_type="general2")
    params = mod.init(jax.random.PRNGKey(0), jnp.array(M), jnp.array(M),
                      jnp.array(umask))
    Wt = np.asarray(params["params"]["transform"]["kernel"])
    bt = np.asarray(params["params"]["transform"]["bias"])

    # per-step oracle: for each t, general2 attention of candidate M[:, t]
    expected = np.zeros_like(M)
    for t in range(L):
        x = M[:, t] @ Wt + bt                           # (B, D)
        M_ = M * umask[..., None]
        score = np.einsum("bd,bld->bl", x, M_) * umask
        score = np.tanh(score)
        e = np.exp(score - score.max(-1, keepdims=True))
        a = e / e.sum(-1, keepdims=True)
        a = a * umask
        a = a / np.maximum(a.sum(-1, keepdims=True), 1e-12)
        expected[:, t] = np.einsum("bl,bld->bd", a, M)

    att, _ = mod.apply(params, jnp.array(M), jnp.array(M), jnp.array(umask))
    np.testing.assert_allclose(np.asarray(att), expected, atol=1e-5)
