"""GCNII stack tests vs a numpy loop oracle of the reference layer math."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmdfn_tpu.nn.gcn import GCNIIStack, gcnii_conv
from mmdfn_tpu.models import MMGCN, DeepGCNII, MMGCN2


def np_lstm_step(x, h, c, w_ih, w_hh, b_ih, b_hh):
    g = x @ w_ih + b_ih + h @ w_hh + b_hh
    i, f, gg, o = np.split(g, 4, axis=-1)
    sig = lambda v: 1 / (1 + np.exp(-v))
    c2 = sig(f) * c + sig(i) * np.tanh(gg)
    h2 = sig(o) * np.tanh(c2)
    return h2, c2


def oracle_stack(x, adj, p, nlayers, H, alpha, lamda, variant, reason,
                 has_fc_in=True):
    """numpy transliteration of the reference GCNII loop
    (model_GCN.py:444-483, eval mode: no dropout)."""
    if has_fc_in:
        h = np.maximum(x @ p["fc_in"]["kernel"] + p["fc_in"]["bias"], 0)
    else:
        h = x
    h0 = h
    lstm_h = np.zeros_like(h)
    lstm_c = np.zeros_like(h)
    for i in range(nlayers):
        theta = math.log(lamda / (i + 1) + 1)
        if reason:
            q = h
            h, lstm_c = np_lstm_step(h, lstm_h, lstm_c, p["reason_w_ih"],
                                     p["reason_w_hh"], p["reason_b_ih"],
                                     p["reason_b_hh"])
            lstm_h = h
        hi = np.einsum("bnm,bmh->bnh", adj, h)
        if variant:
            support = np.concatenate([hi, h0], -1)
            r = (1 - alpha) * hi + alpha * h0
        else:
            support = (1 - alpha) * hi + alpha * h0
            r = support
        h = np.maximum(theta * (support @ p["conv_w"][i]) + (1 - theta) * r, 0)
        if reason:
            h = h + q
    return h


@pytest.mark.parametrize("variant", [True, False])
@pytest.mark.parametrize("reason", [True, False])
def test_gcnii_stack_matches_oracle(rng, variant, reason):
    B, N, F, H, nlayers = 2, 6, 5, 4, 3
    alpha, lamda = 0.2, 0.5
    x = rng.standard_normal((B, N, F)).astype(np.float32)
    a = rng.random((B, N, N)).astype(np.float32)
    adj = (a + a.transpose(0, 2, 1)) / 2

    stack = GCNIIStack(nlayers=nlayers, nhidden=H, dropout=0.0, lamda=lamda,
                       alpha=alpha, variant=variant, reason_flag=reason)
    params = stack.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(adj))
    _, ours = stack.apply(params, jnp.array(x), jnp.array(adj),
                          deterministic=True)

    p = jax.tree.map(np.asarray, params["params"])
    want = oracle_stack(x, adj, p, nlayers, H, alpha, lamda, variant, reason)
    np.testing.assert_allclose(np.asarray(ours), want, atol=1e-5)


def test_gcnii_conv_theta_indexing():
    """theta must use 1-based layer index: log(lamda/l + 1), l=1..n."""
    B, N, H = 1, 2, 2
    h = jnp.ones((B, N, H))
    adj = jnp.eye(N)[None]
    W = jnp.zeros((2 * H, H))
    out = gcnii_conv(h, adj, h, W, jnp.log(0.5 / 1 + 1), 0.0, True)
    np.testing.assert_allclose(np.asarray(out), (1 - math.log(1.5)) * np.ones((B, N, H)), atol=1e-6)


def test_mmgcn_shapes_and_padding_invariance(rng):
    B, L, D, H, P = 2, 6, 8, 4, 2
    lengths = [6, 3]
    umask = (np.arange(L)[None] < np.array(lengths)[:, None]).astype(np.float32)
    feats = {m: (rng.standard_normal((B, L, D)) * umask[..., None]).astype(np.float32)
             for m in "avl"}
    spk = rng.integers(0, P, size=(B, L))
    qmask = np.zeros((B, L, P), np.float32)
    qmask[np.arange(B)[:, None], np.arange(L)[None], spk] = 1
    qmask *= umask[..., None]

    model = MMGCN(n_dim=D, nlayers=3, nhidden=H, nclass=6, dropout=0.0,
                  use_speaker=True, reason_flag=True)
    params = model.init(jax.random.PRNGKey(0),
                        {k: jnp.array(v) for k, v in feats.items()},
                        jnp.array(qmask), jnp.array(umask))
    out = model.apply(params, {k: jnp.array(v) for k, v in feats.items()},
                      jnp.array(qmask), jnp.array(umask))
    assert out.shape == (B, L, 3 * (D + H))

    # pad growth must not change valid outputs
    pad = 3
    feats2 = {k: np.pad(v, ((0, 0), (0, pad), (0, 0))) for k, v in feats.items()}
    qmask2 = np.pad(qmask, ((0, 0), (0, pad), (0, 0)))
    umask2 = np.pad(umask, ((0, 0), (0, pad)))
    out2 = model.apply(params, {k: jnp.array(v) for k, v in feats2.items()},
                       jnp.array(qmask2), jnp.array(umask2))
    for b, n in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(out)[b, :n],
                                   np.asarray(out2)[b, :n], atol=2e-5)


def test_mmgcn_bimodal(rng):
    B, L, D, H = 2, 4, 6, 3
    umask = np.ones((B, L), np.float32)
    qmask = np.zeros((B, L, 2), np.float32)
    qmask[..., 0] = 1
    feats = {m: rng.standard_normal((B, L, D)).astype(np.float32) for m in "al"}
    model = MMGCN(n_dim=D, nlayers=2, nhidden=H, nclass=6, dropout=0.0, modals="al")
    params = model.init(jax.random.PRNGKey(0),
                        {k: jnp.array(v) for k, v in feats.items()},
                        jnp.array(qmask), jnp.array(umask))
    out = model.apply(params, {k: jnp.array(v) for k, v in feats.items()},
                      jnp.array(qmask), jnp.array(umask))
    assert out.shape == (B, L, 2 * (D + H))


def test_deep_gcnii_and_mmgcn2_forward(rng):
    B, L, D, H = 2, 5, 6, 4
    umask = np.ones((B, L), np.float32)
    qmask = np.zeros((B, L, 2), np.float32)
    qmask[..., 0] = 1
    x = rng.standard_normal((B, L, D)).astype(np.float32)

    net = DeepGCNII(nfeat=D, nlayers=2, nhidden=H, nclass=6, dropout=0.0,
                    return_feature=False, use_residue=True)
    params = net.init(jax.random.PRNGKey(0), jnp.array(x), jnp.array(qmask),
                      jnp.array(umask))
    out = net.apply(params, jnp.array(x), jnp.array(qmask), jnp.array(umask))
    assert out.shape == (B, L, 6)
    np.testing.assert_allclose(np.asarray(jnp.exp(out)).sum(-1), 1.0, atol=1e-5)

    feats = {m: rng.standard_normal((B, L, D)).astype(np.float32) for m in "avl"}
    m2 = MMGCN2(nfeat=D, nlayers=2, nhidden=H, nclass=6, dropout=0.0)
    p2 = m2.init(jax.random.PRNGKey(1),
                 {k: jnp.array(v) for k, v in feats.items()},
                 jnp.array(qmask), jnp.array(umask))
    out2 = m2.apply(p2, {k: jnp.array(v) for k, v in feats.items()},
                    jnp.array(qmask), jnp.array(umask))
    assert out2.shape == (B, L, D + 3 * H)


def test_gcnii_stack_bf16_compute_close_to_f32():
    """compute_dtype='bfloat16' is a layout/speed change, not a different
    network: same params, outputs within bf16 rounding of the f32 stack."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mmdfn_tpu.nn.gcn import GCNIIStack

    rng = np.random.default_rng(0)
    B, N, H, L = 2, 24, 8, 16
    x = jnp.asarray(rng.standard_normal((B, N, H)).astype(np.float32))
    adj = jnp.asarray(rng.standard_normal((B, N, N)).astype(np.float32)) / N

    kw = dict(nlayers=L, nhidden=H, dropout=0.0, alpha=0.2, reason_flag=True,
              has_fc_in=True, dropout_mode="after")
    f32 = GCNIIStack(**kw)
    params = f32.init(jax.random.PRNGKey(0), x, adj)["params"]
    _, h32 = f32.apply({"params": params}, x, adj)
    bf = GCNIIStack(**kw, compute_dtype="bfloat16")
    _, hbf = bf.apply({"params": params}, x, adj)

    assert hbf.dtype == jnp.float32          # cast back at the boundary
    denom = np.maximum(np.abs(np.asarray(h32)), 1e-3)
    rel = np.abs(np.asarray(hbf) - np.asarray(h32)) / denom
    # bf16 has ~3 significant digits; 16 recurrent layers of random weights
    # compound the rounding, so the tail is loose while the bulk stays tight
    assert rel.max() < 0.3, rel.max()
    assert np.median(rel) < 0.02


def test_flagship_forward_with_bf16_gcn():
    """The flagship model accepts gcn_compute_dtype and stays close to f32."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import dataclasses
    from mmdfn_tpu.config import ExperimentConfig
    from mmdfn_tpu.models.dialogue_gnn import DialogueGNN

    cfg = ExperimentConfig(graph_type="GDF", reason_flag=True,
                           Deep_GCN_nlayers=4, batch_size=2)
    rng = np.random.default_rng(1)
    B, L = 2, 6
    umask = jnp.ones((B, L))
    qmask = jax.nn.one_hot(jnp.asarray(rng.integers(0, 2, (B, L))), 2)
    f = lambda D: jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    args = (f(100), qmask, umask, f(1582), f(342))

    m32 = DialogueGNN.from_config(cfg)
    params = m32.init(jax.random.PRNGKey(0), *args, deterministic=True)["params"]
    out32 = m32.apply({"params": params}, *args, deterministic=True)
    mbf = DialogueGNN.from_config(
        dataclasses.replace(cfg, gcn_compute_dtype="bfloat16"))
    outbf = mbf.apply({"params": params}, *args, deterministic=True)
    # log-probs: absolute comparison is the meaningful one
    assert np.abs(np.asarray(outbf) - np.asarray(out32)).max() < 0.15
    assert np.isfinite(np.asarray(outbf)).all()


def test_gcnii_stack_unroll_invariant():
    """scan_unroll is a pure execution-plan knob: full unroll, unroll=2 and
    the CPU auto default produce bit-identical outputs and gradients."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mmdfn_tpu.nn.gcn import GCNIIStack

    rng = np.random.default_rng(5)
    B, N, H, nlayers = 2, 7, 6, 3
    x = jnp.asarray(rng.standard_normal((B, N, H)).astype(np.float32))
    adj = jnp.asarray(np.abs(rng.standard_normal((B, N, N)))
                      .astype(np.float32)) / N

    def run(unroll):
        m = GCNIIStack(nlayers=nlayers, nhidden=H, reason_flag=True,
                       scan_unroll=unroll)
        params = m.init(jax.random.PRNGKey(0), x, adj)["params"]

        def loss(p):
            _, h = m.apply({"params": p}, x, adj)
            return jnp.sum(h ** 2)

        return loss(params), jax.grad(loss)(params)

    l_auto, g_auto = run(None)          # CPU auto -> unroll=2
    l_full, g_full = run(nlayers)       # full straight-line
    l_two, g_two = run(2)
    assert float(l_auto) == float(l_full) == float(l_two)
    for ga, gb in zip(jax.tree.leaves(g_auto), jax.tree.leaves(g_full)):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
    for ga, gb in zip(jax.tree.leaves(g_auto), jax.tree.leaves(g_two)):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


def test_gcnii_stack_scan_remat_close():
    """scan_remat recomputes the layer in backward: same forward values; the
    gradients agree to float-associativity level (XLA fuses the replayed ops
    differently, so unlike the RNN remat they are not bit-equal)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mmdfn_tpu.nn.gcn import GCNIIStack

    rng = np.random.default_rng(7)
    B, N, H, nlayers = 2, 7, 6, 3
    x = jnp.asarray(rng.standard_normal((B, N, H)).astype(np.float32))
    adj = jnp.asarray(np.abs(rng.standard_normal((B, N, N)))
                      .astype(np.float32)) / N

    def run(remat):
        m = GCNIIStack(nlayers=nlayers, nhidden=H, reason_flag=True,
                       scan_remat=remat)
        params = m.init(jax.random.PRNGKey(0), x, adj)["params"]

        def loss(p):
            _, h = m.apply({"params": p}, x, adj)
            return jnp.sum(h ** 2)

        _, hh = m.apply({"params": params}, x, adj)
        return hh, loss(params), jax.grad(loss)(params)

    h0, l0, g0 = run(False)
    h1, l1, g1 = run(True)
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    assert float(l0) == float(l1)
    for ga, gb in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-5, atol=1e-5)
