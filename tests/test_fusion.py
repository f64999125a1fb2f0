"""Fusion baselines vs torch oracles (reference model_fusion.py semantics)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mmdfn_tpu.nn.fusion import LMF, MFN, TFN


def test_mfn_matches_torch_loop(rng):
    """Delta-memory attention recurrence (model_fusion.py:62-120), eval mode."""
    B, L, d, dh, mem_dim, h = 2, 5, 6, 4, 3, 5
    x = rng.standard_normal((B, L, 3 * d)).astype(np.float32)

    m = MFN(d=d, dh=dh, mem_dim=mem_dim, h_att=h, h_gamma=h)
    params = m.init(jax.random.PRNGKey(0), jnp.array(x))["params"]
    p = {k: np.asarray(v) for k, v in params.items()}

    def lstm_cell(prefix, xt, hc):
        h_, c_ = hc
        g = (xt @ torch.tensor(p[f"{prefix}_w_ih"])
             + torch.tensor(p[f"{prefix}_b_ih"])
             + h_ @ torch.tensor(p[f"{prefix}_w_hh"])
             + torch.tensor(p[f"{prefix}_b_hh"]))
        i, f, gg, o = torch.split(g, dh, dim=-1)
        c2 = torch.sigmoid(f) * c_ + torch.sigmoid(i) * torch.tanh(gg)
        return torch.sigmoid(o) * torch.tanh(c2), c2

    def dense(prefix, v):
        return v @ torch.tensor(p[f"{prefix}_kernel"]) + torch.tensor(
            p[f"{prefix}_bias"])

    tx = torch.tensor(x).transpose(0, 1)              # (L, B, 3d) seq-first
    h_l = h_a = h_v = torch.zeros(B, dh)
    c_l = c_a = c_v = torch.zeros(B, dh)
    mem = torch.zeros(B, mem_dim)
    outs = []
    with torch.no_grad():
        for t in range(L):
            x_l, x_a, x_v = (tx[t, :, :d], tx[t, :, d:2 * d], tx[t, :, 2 * d:])
            prev_cs = torch.cat([c_l, c_a, c_v], dim=1)
            h_l, c_l = lstm_cell("lstm_l", x_l, (h_l, c_l))
            h_a, c_a = lstm_cell("lstm_a", x_a, (h_a, c_a))
            h_v, c_v = lstm_cell("lstm_v", x_v, (h_v, c_v))
            new_cs = torch.cat([c_l, c_a, c_v], dim=1)
            c_star = torch.cat([prev_cs, new_cs], dim=1)
            att = F.softmax(dense("att1_fc2",
                                  F.relu(dense("att1_fc1", c_star))), dim=1)
            attended = att * c_star
            c_hat = torch.tanh(dense("att2_fc2",
                                     F.relu(dense("att2_fc1", attended))))
            both = torch.cat([attended, mem], dim=1)
            g1 = torch.sigmoid(dense("gamma1_fc2",
                                     F.relu(dense("gamma1_fc1", both))))
            g2 = torch.sigmoid(dense("gamma2_fc2",
                                     F.relu(dense("gamma2_fc1", both))))
            mem = g1 * mem + g2 * c_hat
            outs.append(torch.cat([h_l, h_a, h_v, mem], dim=-1))
    expected = torch.stack(outs).transpose(0, 1).numpy()   # (B, L, ...)

    got = m.apply({"params": params}, jnp.array(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_tfn_matches_torch_kron(rng):
    """Outer-product fusion flattening must equal the reference's double-bmm
    Kronecker construction (model_fusion.py:189-207)."""
    B, D, H = 3, 7, 4
    a = rng.standard_normal((B, D)).astype(np.float32)
    v = rng.standard_normal((B, D)).astype(np.float32)
    t = rng.standard_normal((B, D)).astype(np.float32)

    m = TFN(input_dims=(D, D, D), hidden_dims=(H, H, H), dropouts=0.0,
            post_fusion_dim=5, output_dim=5)
    params = m.init(jax.random.PRNGKey(0), jnp.array(a), jnp.array(v),
                    jnp.array(t))["params"]
    p = params

    def sub(name, x):
        return torch.tensor(x) @ torch.tensor(np.asarray(p[name]["kernel"])) \
            + torch.tensor(np.asarray(p[name]["bias"]))

    with torch.no_grad():
        ah, vh, th = sub("audio_subnet", a), sub("video_subnet", v), \
            sub("text_subnet", t)
        one = torch.ones(B, 1)
        a1 = torch.cat([one, ah], dim=1)
        v1 = torch.cat([one, vh], dim=1)
        t1 = torch.cat([one, th], dim=1)
        fusion = torch.bmm(a1.unsqueeze(2), v1.unsqueeze(1))      # (B,A,V)
        fusion = fusion.view(B, -1, 1)
        fusion = torch.bmm(fusion, t1.unsqueeze(1)).view(B, -1)   # (B,A*V*T)
        h1 = F.relu(fusion @ torch.tensor(np.asarray(
            p["post_fusion_layer_1"]["kernel"])) + torch.tensor(np.asarray(
                p["post_fusion_layer_1"]["bias"])))
        expected = F.relu(h1 @ torch.tensor(np.asarray(
            p["post_fusion_layer_2"]["kernel"])) + torch.tensor(np.asarray(
                p["post_fusion_layer_2"]["bias"]))).numpy()

    got = m.apply({"params": params}, jnp.array(a), jnp.array(v),
                  jnp.array(t), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_lmf_matches_torch_factors(rng):
    """Low-rank factor fusion (model_fusion.py:261-306)."""
    B, D, H, O, R = 3, 6, 5, 4, 2
    a = rng.standard_normal((B, D)).astype(np.float32)
    v = rng.standard_normal((B, D)).astype(np.float32)
    t = rng.standard_normal((B, D)).astype(np.float32)

    m = LMF(input_dims=(D, D, D), hidden_dims=(H, H, H), output_dim=O,
            rank=R)
    params = m.init(jax.random.PRNGKey(0), jnp.array(a), jnp.array(v),
                    jnp.array(t))["params"]
    p = params

    def sub(name, x):
        return torch.tensor(x) @ torch.tensor(np.asarray(p[name]["kernel"])) \
            + torch.tensor(np.asarray(p[name]["bias"]))

    with torch.no_grad():
        one = torch.ones(B, 1)
        a1 = torch.cat([one, sub("audio_subnet", a)], dim=1)
        v1 = torch.cat([one, sub("video_subnet", v)], dim=1)
        t1 = torch.cat([one, sub("text_subnet", t)], dim=1)
        af = torch.tensor(np.asarray(p["audio_factor"]))
        vf = torch.tensor(np.asarray(p["video_factor"]))
        tf = torch.tensor(np.asarray(p["text_factor"]))
        fa = torch.matmul(a1, af)          # (R, B, O)
        fv = torch.matmul(v1, vf)
        ft = torch.matmul(t1, tf)
        zy = fa * fv * ft
        fw = torch.tensor(np.asarray(p["fusion_weights"]))
        fb = torch.tensor(np.asarray(p["fusion_bias"]))
        expected = (torch.matmul(fw, zy.permute(1, 0, 2)).squeeze(1)
                    + fb).numpy()

    got = m.apply({"params": params}, jnp.array(a), jnp.array(v),
                  jnp.array(t), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)
