"""Parity tests for the fused masked Pallas bi-GRU kernel (ops/pallas_rnn.py).

Run in interpreter mode on CPU (same convention as test_pallas_gcnii).
The oracle is the XLA scan path (nn/rnn.py) that is itself torch-oracled in
test_rnn.py — forward values AND all gradients (xg x2, W_hh x2, b_hh x2)
must agree, plus the full BiRNN module and flagship model must be
indistinguishable between backends.  Both the kernel and the scans use
masked-recurrence semantics (carry frozen where mask==0); the backward
direction walks the same arrays in reverse time (no pre-flipped inputs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdfn_tpu.nn.rnn import BiRNN, _gru_scan
from mmdfn_tpu.ops.pallas_rnn import fused_bigru_layer


def _inputs(rng, B, L, H):
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    return (f(B, L, 3 * H), f(B, L, 3 * H),
            f(H, 3 * H) * 0.3, f(3 * H) * 0.3,
            f(H, 3 * H) * 0.3, f(3 * H) * 0.3)


def _scan_oracle(xg_f, xg_b, w_f, b_f, w_b, b_b, mask):
    """Masked-scan reference: fwd direction forward-time, bwd direction =
    reverse -> gated scan -> reverse (identical semantics to the kernel's
    in-place reverse walk)."""
    B, _, G3 = xg_f.shape
    h0 = jnp.zeros((B, G3 // 3))
    ys_f, _ = _gru_scan(xg_f, w_f, b_f, h0, mask=mask)
    rev = lambda z: z[:, ::-1]
    m_rev = rev(mask) if mask is not None else None
    ys_b_rev, _ = _gru_scan(rev(xg_b), w_b, b_b, h0, mask=m_rev)
    return ys_f, rev(ys_b_rev)


def _mask(rng, B, L, kind):
    if kind == "none":
        return None
    if kind == "prefix":
        lengths = rng.integers(1, L + 1, B)
        return jnp.asarray((np.arange(L)[None, :] < lengths[:, None])
                           .astype(np.float32))
    # arbitrary subset (the CRN party-gating case), at least one valid frame
    m = (rng.random((B, L)) < 0.6)
    m[:, 0] = True
    return jnp.asarray(m.astype(np.float32))


@pytest.mark.parametrize("mask_kind", ["none", "prefix", "subset"])
@pytest.mark.parametrize("B,L,H", [
    (5, 9, 100),     # unaligned everything (B pad exercised; T=3 divides)
    (8, 4, 128),     # aligned
    (1, 1, 100),     # degenerate single-step
    (4, 13, 100),    # prime L > 8: no divisor T, Lp=16 > L time-pad path
])
def test_forward_matches_scan(rng, B, L, H, mask_kind):
    xg_f, xg_b, w_f, b_f, w_b, b_b = _inputs(rng, B, L, H)
    mask = _mask(rng, B, L, mask_kind)
    ref_f, ref_b = _scan_oracle(xg_f, xg_b, w_f, b_f, w_b, b_b, mask)
    ys_f, ys_b = fused_bigru_layer(xg_f, xg_b, w_f, b_f, w_b, b_b, mask,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(ys_f), np.asarray(ref_f),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(ys_b), np.asarray(ref_b),
                               atol=2e-6)


@pytest.mark.parametrize("mask_kind", ["none", "prefix", "subset"])
def test_gradients_match_scan(rng, mask_kind):
    B, L, H = 4, 7, 100
    args = _inputs(rng, B, L, H)
    mask = _mask(rng, B, L, mask_kind)

    def loss_fused(a):
        yf, yb = fused_bigru_layer(*a, mask, interpret=True)
        return jnp.sum(jnp.sin(yf) * 1.3 + jnp.cos(yb))

    def loss_ref(a):
        yf, yb = _scan_oracle(*a, mask)
        return jnp.sum(jnp.sin(yf) * 1.3 + jnp.cos(yb))

    g1 = jax.grad(loss_fused)(args)
    g2 = jax.grad(loss_ref)(args)
    names = ["xg_f", "xg_b", "whh_f", "bhh_f", "whh_b", "bhh_b"]
    for a, b, name in zip(g1, g2, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"grad mismatch for {name}")


def test_masked_frames_quarantined(rng):
    """Non-finite xg values in masked frames must not reach valid outputs
    or any gradient (where-select gating, forward AND backward)."""
    B, L, H = 3, 8, 100
    args = list(_inputs(rng, B, L, H))
    mask = _mask(rng, B, L, "subset")
    poisoned = np.array(args[0])
    poisoned[np.asarray(mask) == 0] = np.inf
    args_p = list(args)
    args_p[0] = jnp.asarray(poisoned)
    poisoned_b = np.array(args[1])
    poisoned_b[np.asarray(mask) == 0] = np.nan
    args_p[1] = jnp.asarray(poisoned_b)

    def loss(a):
        yf, yb = fused_bigru_layer(*a, mask, interpret=True)
        sel = mask[..., None]
        return jnp.sum(jnp.where(sel > 0, yf + yb, 0.0))

    clean_l, clean_g = jax.value_and_grad(lambda a: loss(a))(tuple(args))
    pois_l, pois_g = jax.value_and_grad(lambda a: loss(a))(tuple(args_p))
    assert np.isfinite(float(pois_l))
    np.testing.assert_allclose(float(pois_l), float(clean_l), rtol=1e-6)
    for a, b in zip(pois_g, clean_g):
        assert np.isfinite(np.asarray(a)).all()
        # weight/bias grads must agree; xg grads agree at valid frames and
        # are exact zeros at masked frames in both runs
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_birnn_backend_parity(rng):
    """Full 2-layer BiRNN module: pallas backend == scan backend, on a
    genuinely padded batch."""
    B, L, D, H = 3, 11, 20, 100
    lengths = np.array([11, 6, 1])
    umask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    x = rng.standard_normal((B, L, D)).astype(np.float32) * umask[..., None]

    ref_rnn = BiRNN(H, num_layers=2, bidirectional=True, cell="gru")
    pal_rnn = BiRNN(H, num_layers=2, bidirectional=True, cell="gru",
                    backend="pallas")
    variables = ref_rnn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                             jnp.asarray(umask))
    ref = ref_rnn.apply(variables, jnp.asarray(x), jnp.asarray(umask))
    out = pal_rnn.apply(variables, jnp.asarray(x), jnp.asarray(umask))
    # compare at valid positions (pad rows are garbage-by-contract in both)
    np.testing.assert_allclose(np.asarray(out) * umask[..., None],
                               np.asarray(ref) * umask[..., None], atol=2e-5)


def test_flagship_model_backend_parity(rng):
    """DialogueGNN forward + loss gradient: rnn_backend='pallas' matches the
    default scans end-to-end (encoders, CRN party RNN, graph head)."""
    from mmdfn_tpu.models import DialogueGNN

    B, L = 2, 5
    lengths = np.array([5, 3])
    umask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)
    spk = rng.integers(0, 2, size=(B, L))
    qmask = np.zeros((B, L, 2), np.float32)
    qmask[np.arange(B)[:, None], np.arange(L)[None, :], spk] = 1.0
    qmask *= umask[..., None]
    feat = lambda D: (rng.standard_normal((B, L, D)).astype(np.float32)
                      * umask[..., None])
    text, audio, visual = feat(100), feat(1582), feat(342)
    label = rng.integers(0, 6, size=(B, L))

    kw = dict(base_model="LSTM", D_m=100, D_m_a=1582, D_m_v=342,
              n_speakers=2, n_classes=6, dropout=0.0, graph_type="GDF",
              reason_flag=True, deep_gcn_nlayers=2, use_crn_speaker=True,
              speaker_weights="3-0-1", alpha=0.2, lamda=0.5)
    ref_model = DialogueGNN(**kw)
    pal_model = DialogueGNN(**kw, rnn_backend="pallas")

    js = lambda a: jnp.asarray(a)
    variables = ref_model.init(jax.random.PRNGKey(0), js(text), js(qmask),
                               js(umask), js(audio), js(visual),
                               deterministic=True)

    def nll(model, params):
        lp = model.apply({"params": params}, js(text), js(qmask), js(umask),
                         js(audio), js(visual), deterministic=True)
        mask = js(umask)
        picked = jnp.take_along_axis(lp, js(label)[..., None],
                                     axis=-1)[..., 0]
        return -jnp.sum(picked * mask) / jnp.sum(mask)

    ref_loss, ref_grad = jax.value_and_grad(
        lambda p: nll(ref_model, p))(variables["params"])
    pal_loss, pal_grad = jax.value_and_grad(
        lambda p: nll(pal_model, p))(variables["params"])

    np.testing.assert_allclose(float(pal_loss), float(ref_loss), atol=1e-5)
    flat_r = jax.tree_util.tree_leaves(ref_grad)
    flat_p = jax.tree_util.tree_leaves(pal_grad)
    for a, b in zip(flat_p, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
