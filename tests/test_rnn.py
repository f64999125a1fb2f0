"""RNN parity tests vs torch.nn.GRU/LSTM with copied weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mmdfn_tpu.nn import BiRNN, LSTMCellStep, crn_party_delta


def copy_torch_rnn_params(trnn, params, num_layers, bidirectional, n_gates):
    """Overwrite flax BiRNN params with a torch RNN module's weights."""
    p = dict(params["params"])
    dirs = ["fwd", "bwd"] if bidirectional else ["fwd"]
    for layer in range(num_layers):
        for di, d in enumerate(dirs):
            suffix = "_reverse" if di == 1 else ""
            name = f"l{layer}_{d}"
            p[f"w_ih_{name}"] = jnp.array(
                getattr(trnn, f"weight_ih_l{layer}{suffix}").detach().numpy().T)
            p[f"w_hh_{name}"] = jnp.array(
                getattr(trnn, f"weight_hh_l{layer}{suffix}").detach().numpy().T)
            p[f"b_ih_{name}"] = jnp.array(
                getattr(trnn, f"bias_ih_l{layer}{suffix}").detach().numpy())
            p[f"b_hh_{name}"] = jnp.array(
                getattr(trnn, f"bias_hh_l{layer}{suffix}").detach().numpy())
    return {"params": p}


@pytest.mark.parametrize("cell,n_gates", [("gru", 3), ("lstm", 4)])
@pytest.mark.parametrize("num_layers,bidirectional", [(1, False), (2, True)])
def test_birnn_matches_torch(rng, cell, n_gates, num_layers, bidirectional):
    B, L, D, H = 3, 7, 5, 4
    x = rng.standard_normal((B, L, D)).astype(np.float32)

    tcls = torch.nn.GRU if cell == "gru" else torch.nn.LSTM
    trnn = tcls(input_size=D, hidden_size=H, num_layers=num_layers,
                bidirectional=bidirectional, batch_first=True)
    with torch.no_grad():
        t_out, _ = trnn(torch.tensor(x))

    m = BiRNN(hidden_size=H, num_layers=num_layers,
              bidirectional=bidirectional, cell=cell, dropout=0.0)
    params = m.init(jax.random.PRNGKey(0), jnp.array(x))
    params = copy_torch_rnn_params(trnn, params, num_layers, bidirectional, n_gates)
    # full-length mask: flip_valid == full flip == torch's unpadded behavior
    umask = jnp.ones((B, L))
    ours = m.apply(params, jnp.array(x), umask)
    np.testing.assert_allclose(np.asarray(ours), t_out.numpy(), atol=2e-5)


def test_birnn_padding_invariance(rng):
    """Valid-position outputs must not change when padding grows."""
    B, L, D, H = 2, 6, 5, 4
    lengths = np.array([4, 6])
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    umask = (np.arange(L)[None] < lengths[:, None]).astype(np.float32)
    x = x * umask[..., None]

    m = BiRNN(hidden_size=H, num_layers=2, bidirectional=True, cell="gru")
    params = m.init(jax.random.PRNGKey(1), jnp.array(x))
    out1 = m.apply(params, jnp.array(x), jnp.array(umask))

    pad = 5
    x2 = np.concatenate([x, np.zeros((B, pad, D), np.float32)], axis=1)
    umask2 = np.concatenate([umask, np.zeros((B, pad), np.float32)], axis=1)
    out2 = m.apply(params, jnp.array(x2), jnp.array(umask2))

    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(out1)[b, : lengths[b]],
            np.asarray(out2)[b, : lengths[b]], atol=1e-6)


def test_lstm_cell_step_matches_torch(rng):
    H = 6
    tcell = torch.nn.LSTMCell(H, H)
    x = rng.standard_normal((3, H)).astype(np.float32)
    h = rng.standard_normal((3, H)).astype(np.float32)
    c = rng.standard_normal((3, H)).astype(np.float32)
    with torch.no_grad():
        th, tc = tcell(torch.tensor(x), (torch.tensor(h), torch.tensor(c)))

    m = LSTMCellStep(hidden_size=H)
    params = m.init(jax.random.PRNGKey(0), jnp.array(x), (jnp.array(h), jnp.array(c)))
    p = {"params": {
        "w_ih": jnp.array(tcell.weight_ih.detach().numpy().T),
        "w_hh": jnp.array(tcell.weight_hh.detach().numpy().T),
        "b_ih": jnp.array(tcell.bias_ih.detach().numpy()),
        "b_hh": jnp.array(tcell.bias_hh.detach().numpy()),
    }}
    out, (nh, nc) = m.apply(p, jnp.array(x), (jnp.array(h), jnp.array(c)))
    np.testing.assert_allclose(np.asarray(nh), th.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(nc), tc.numpy(), atol=1e-5)


def test_crn_party_delta_matches_loop_oracle(rng):
    """Vectorized CRN gather/RNN/scatter == the reference's python-loop
    algorithm (model.py:1040-1060) run with the same shared RNN."""
    B, L, P, D, H = 3, 8, 2, 5, 4
    lengths = np.array([8, 5, 3])
    umask = (np.arange(L)[None] < lengths[:, None]).astype(np.float32)
    x = (rng.standard_normal((B, L, D)) * umask[..., None]).astype(np.float32)
    spk = rng.integers(0, P, size=(B, L))
    qmask = np.zeros((B, L, P), np.float32)
    qmask[np.arange(B)[:, None], np.arange(L)[None], spk] = 1.0
    qmask *= umask[..., None]

    rnn = BiRNN(hidden_size=H, num_layers=2, bidirectional=True, cell="gru")
    params = rnn.init(jax.random.PRNGKey(0), jnp.zeros((1, L, D)))

    ours = crn_party_delta(
        lambda xx, mm, deterministic=True: rnn.apply(params, xx, mm),
        jnp.array(x), jnp.array(qmask), jnp.array(umask))

    # Loop oracle: left-pack each (b, p), run rnn, scatter back.
    expect = np.zeros((B, L, 2 * H), np.float32)
    for b in range(B):
        for p in range(P):
            idx = [t for t in range(int(lengths[b])) if qmask[b, t, p] == 1]
            if not idx:
                continue
            packed = np.zeros((1, L, D), np.float32)
            packed[0, : len(idx)] = x[b, idx]
            pmask = np.zeros((1, L), np.float32)
            pmask[0, : len(idx)] = 1.0
            E = np.asarray(rnn.apply(params, jnp.array(packed), jnp.array(pmask)))
            for k, t in enumerate(idx):
                expect[b, t] = E[0, k]
    np.testing.assert_allclose(np.asarray(ours), expect, atol=1e-5)


def test_birnn_bf16_compute_close_to_f32():
    """compute_dtype='bfloat16' reuses the same f32 params and stays within
    bf16 rounding of the f32 scans (output cast back to f32)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mmdfn_tpu.nn.rnn import BiRNN

    rng = np.random.default_rng(3)
    B, L, D, H = 2, 12, 6, 5
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    umask = jnp.asarray((rng.random((B, L)) < 0.8).astype(np.float32))

    kw = dict(hidden_size=H, num_layers=2, bidirectional=True, cell="gru")
    m32 = BiRNN(**kw)
    params = m32.init(jax.random.PRNGKey(0), x, umask)["params"]
    y32 = m32.apply({"params": params}, x, umask)
    ybf = BiRNN(**kw, compute_dtype="bfloat16").apply({"params": params},
                                                      x, umask)
    assert ybf.dtype == jnp.float32
    assert np.abs(np.asarray(ybf) - np.asarray(y32)).max() < 0.05


def test_birnn_fused_directions_identical():
    """fuse_directions=True is the same math in one scan: identical params
    tree, bit-identical outputs for GRU and LSTM, with and without umask."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mmdfn_tpu.nn.rnn import BiRNN

    rng = np.random.default_rng(7)
    B, L, D, H = 3, 11, 6, 5
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    umask = jnp.asarray(
        (np.arange(L)[None, :] < rng.integers(3, L + 1, B)[:, None])
        .astype(np.float32))

    for cell in ("gru", "lstm"):
        for um in (umask, None):
            kw = dict(hidden_size=H, num_layers=2, bidirectional=True,
                      cell=cell)
            ref = BiRNN(**kw)
            params = ref.init(jax.random.PRNGKey(0), x, um)["params"]
            fused = BiRNN(**kw, fuse_directions=True)
            # same parameter tree (fused is a pure execution-plan change)
            p2 = fused.init(jax.random.PRNGKey(0), x, um)["params"]
            assert jax.tree.structure(params) == jax.tree.structure(p2)
            y_ref = ref.apply({"params": params}, x, um)
            y_fused = fused.apply({"params": params}, x, um)
            np.testing.assert_array_equal(np.asarray(y_ref),
                                          np.asarray(y_fused))


def test_flip_valid_matmul_matches_gather():
    """The float one-hot-matmul path of flip_valid is bit-identical to the
    integer gather path, keeps pads in place, and is an involution."""
    import numpy as np
    import jax.numpy as jnp
    from mmdfn_tpu.utils.masking import flip_valid

    rng = np.random.default_rng(11)
    B, L, D = 4, 9, 5
    lengths = rng.integers(1, L + 1, B)
    umask = jnp.asarray((np.arange(L)[None, :] < lengths[:, None])
                        .astype(np.float32))
    x = rng.standard_normal((B, L, D)).astype(np.float32)

    got = np.asarray(flip_valid(jnp.asarray(x), umask))
    # oracle: integer-gather semantics
    expect = x.copy()
    for b in range(B):
        n = int(lengths[b])
        expect[b, :n] = x[b, :n][::-1]
    np.testing.assert_array_equal(got, expect)
    # involution: flipping twice restores the input exactly
    np.testing.assert_array_equal(
        np.asarray(flip_valid(flip_valid(jnp.asarray(x), umask), umask)), x)
    # 2-D inputs take the same path
    got2 = np.asarray(flip_valid(jnp.asarray(x[..., 0]), umask))
    np.testing.assert_array_equal(got2, expect[..., 0])
    # integer dtype falls back to the gather path with equal semantics
    xi = (x * 100).astype(np.int32)
    goti = np.asarray(flip_valid(jnp.asarray(xi), umask))
    expecti = xi.copy()
    for b in range(B):
        n = int(lengths[b])
        expecti[b, :n] = xi[b, :n][::-1]
    np.testing.assert_array_equal(goti, expecti)


def test_birnn_scan_remat_identical_grads():
    """scan_remat replays the same math in backward: outputs and gradients
    match the non-remat scans to ULP-level for GRU and LSTM.  (Bit-exact
    until round 3; the masked scan body fuses differently under
    jax.checkpoint on XLA:CPU — same ops, different FMA grouping.)"""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mmdfn_tpu.nn.rnn import BiRNN

    rng = np.random.default_rng(13)
    B, L, D, H = 2, 10, 5, 4
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    umask = jnp.asarray(
        (np.arange(L)[None, :] < rng.integers(2, L + 1, B)[:, None])
        .astype(np.float32))

    for cell in ("gru", "lstm"):
        kw = dict(hidden_size=H, num_layers=2, bidirectional=True, cell=cell)
        ref = BiRNN(**kw)
        params = ref.init(jax.random.PRNGKey(0), x, umask)["params"]
        rem = BiRNN(**kw, scan_remat=True)

        def loss(m, p):
            return jnp.sum(m.apply({"params": p}, x, umask) ** 2)

        l0, g0 = jax.value_and_grad(lambda p: loss(ref, p))(params)
        l1, g1 = jax.value_and_grad(lambda p: loss(rem, p))(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=2e-6)
        for ga, gb in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                       atol=1e-5, rtol=1e-5)


def test_permutation_paths_quarantine_nonfinite_pads():
    """A non-finite value parked in a padded frame must not poison valid
    outputs of flip_valid or crn_party_delta (the 0*inf=NaN trap: one-hot
    matmuls sum over pad entries unless the inputs are where-selected)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mmdfn_tpu.nn.rnn import BiRNN, crn_party_delta
    from mmdfn_tpu.utils.masking import flip_valid

    rng = np.random.default_rng(17)
    B, L, D, P = 2, 8, 5, 2
    lengths = np.array([5, 3])
    umask = jnp.asarray((np.arange(L)[None, :] < lengths[:, None])
                        .astype(np.float32))
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    x_poison = x.copy()
    x_poison[0, 5:] = np.inf            # pads carry inf
    x_poison[1, 3:] = np.nan            # and NaN

    # flip_valid: valid rows equal the clean result, pads pass through
    got = np.asarray(flip_valid(jnp.asarray(x_poison), umask))
    clean = np.asarray(flip_valid(jnp.asarray(x), umask))
    for b in range(B):
        n = int(lengths[b])
        np.testing.assert_array_equal(got[b, :n], clean[b, :n])

    # crn_party_delta: valid outputs finite and equal to the clean run
    spk = rng.integers(0, P, (B, L))
    qmask = np.zeros((B, L, P), np.float32)
    qmask[np.arange(B)[:, None], np.arange(L)[None, :], spk] = 1.0
    qmask *= np.asarray(umask)[..., None]
    rnn = BiRNN(hidden_size=4, num_layers=1, bidirectional=True, cell="gru")
    params = rnn.init(jax.random.PRNGKey(0), jnp.asarray(x), umask)["params"]

    def crn(inp):
        return crn_party_delta(
            lambda z, m, deterministic=True: rnn.apply({"params": params}, z, m),
            jnp.asarray(inp), jnp.asarray(qmask), umask)

    out_clean = np.asarray(crn(x))
    out_poison = np.asarray(crn(x_poison))
    for b in range(B):
        n = int(lengths[b])
        assert np.isfinite(out_poison[b, :n]).all()
        np.testing.assert_array_equal(out_poison[b, :n], out_clean[b, :n])
