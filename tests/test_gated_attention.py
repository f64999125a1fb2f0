"""MMGatedAttention vs torch oracle (reference model.py:718-781, eval)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mmdfn_tpu.nn.attention import MMGatedAttention


def lin(p, name, x):
    return x @ torch.tensor(np.asarray(p[name]["kernel"])) + torch.tensor(
        np.asarray(p[name]["bias"]))


@pytest.mark.parametrize("modals", ["avl", "av", "al", "vl"])
def test_general_gated_matches_torch(rng, modals):
    B, L, D = 2, 4, 6
    a = rng.standard_normal((B, L, D)).astype(np.float32)
    v = rng.standard_normal((B, L, D)).astype(np.float32)
    l = rng.standard_normal((B, L, D)).astype(np.float32)

    m = MMGatedAttention(D, D, att_type="general", dropout=0.0)
    params = m.init(jax.random.PRNGKey(0), jnp.array(a), jnp.array(v),
                    jnp.array(l), modals=modals)["params"]
    p = params

    ta, tv, tl = torch.tensor(a), torch.tensor(v), torch.tensor(l)
    with torch.no_grad():
        ha = torch.tanh(lin(p, "transform_a", ta)) if "a" in modals else ta
        hv = torch.tanh(lin(p, "transform_v", tv)) if "v" in modals else tv
        hl = torch.tanh(lin(p, "transform_l", tl)) if "l" in modals else tl
        parts = []
        if "a" in modals and "v" in modals:
            z = torch.sigmoid(lin(p, "transform_av",
                                  torch.cat([ta, tv, ta * tv], dim=-1)))
            h_av = z * ha + (1 - z) * hv
            if "l" not in modals:
                expected = h_av
            parts.append(h_av)
        if "a" in modals and "l" in modals:
            z = torch.sigmoid(lin(p, "transform_al",
                                  torch.cat([ta, tl, ta * tl], dim=-1)))
            h_al = z * ha + (1 - z) * hl
            if "v" not in modals:
                expected = h_al
            parts.append(h_al)
        if "v" in modals and "l" in modals:
            z = torch.sigmoid(lin(p, "transform_vl",
                                  torch.cat([tv, tl, tv * tl], dim=-1)))
            h_vl = z * hv + (1 - z) * hl
            if "a" not in modals:
                expected = h_vl
            parts.append(h_vl)
        if len(modals) == 3:
            expected = torch.cat(parts, dim=-1)

    got = m.apply({"params": params}, jnp.array(a), jnp.array(v),
                  jnp.array(l), modals=modals, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=1e-5)


def test_av_bg_fusion_matches_torch(rng):
    B, L, D = 2, 3, 5
    a = rng.standard_normal((B, L, D)).astype(np.float32)
    v = rng.standard_normal((B, L, D)).astype(np.float32)
    l = rng.standard_normal((B, L, D)).astype(np.float32)

    m = MMGatedAttention(D, D, att_type="av_bg_fusion", dropout=0.0)
    params = m.init(jax.random.PRNGKey(0), jnp.array(a), jnp.array(v),
                    jnp.array(l), modals="avl")["params"]
    p = params

    ta, tv, tl = torch.tensor(a), torch.tensor(v), torch.tensor(l)
    with torch.no_grad():
        Wa = torch.sigmoid(lin(p, "transform_al",
                               torch.cat([ta, tl], dim=-1)))
        hma = Wa * lin(p, "scalar_al", ta)
        Wv = torch.sigmoid(lin(p, "transform_vl",
                               torch.cat([tv, tl], dim=-1)))
        hmv = Wv * lin(p, "scalar_vl", tv)
        expected = torch.cat([tl, hma, hmv], dim=-1).numpy()

    got = m.apply({"params": params}, jnp.array(a), jnp.array(v),
                  jnp.array(l), modals="avl", deterministic=True)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)
