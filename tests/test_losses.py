"""Loss parity tests against independently-written torch oracles.

The oracles implement the math described by the reference (``code/loss.py``)
directly in torch so we can check both values and the gradient-detachment
semantics of the focal modulation factor.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from mmdfn_tpu.losses import focal_loss, masked_nll_loss, masked_mse_loss


def torch_focal(logp, target, gamma, alpha=None):
    logpt = logp.gather(1, target.view(-1, 1)).view(-1)
    pt = logpt.detach().exp()
    if alpha is not None:
        logpt = logpt * alpha.gather(0, target)
    return (-1 * (1 - pt) ** gamma * logpt).mean()


@pytest.mark.parametrize("gamma", [0.0, 0.5, 2.0])
@pytest.mark.parametrize("with_alpha", [False, True])
def test_focal_matches_torch(rng, gamma, with_alpha):
    N, C = 37, 6
    logits = rng.standard_normal((N, C)).astype(np.float32)
    logp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    target = rng.integers(0, C, size=N)
    alpha = rng.uniform(0.5, 2.0, size=C).astype(np.float32) if with_alpha else None

    ours = focal_loss(jnp.array(logp), jnp.array(target), mask=None,
                      gamma=gamma, alpha=alpha)
    theirs = torch_focal(torch.tensor(logp), torch.tensor(target), gamma,
                         torch.tensor(alpha) if with_alpha else None)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_focal_mask_equals_packed(rng):
    """Masked padded focal == focal over the packed valid subset."""
    B, L, C = 4, 9, 6
    logp = np.log(jax.nn.softmax(rng.standard_normal((B, L, C))).__array__())
    target = rng.integers(0, C, size=(B, L))
    lengths = rng.integers(1, L + 1, size=B)
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)

    masked = focal_loss(jnp.array(logp), jnp.array(target), jnp.array(mask), gamma=0.7)
    packed_lp = np.concatenate([logp[b, : lengths[b]] for b in range(B)])
    packed_t = np.concatenate([target[b, : lengths[b]] for b in range(B)])
    packed = focal_loss(jnp.array(packed_lp), jnp.array(packed_t), None, gamma=0.7)
    np.testing.assert_allclose(float(masked), float(packed), rtol=1e-6)


def test_focal_modulation_is_detached(rng):
    """(1-pt)^gamma must carry no gradient (reference detaches pt)."""
    C = 4
    logits = jnp.array(rng.standard_normal((8, C)), dtype=jnp.float32)
    target = jnp.array(rng.integers(0, C, size=8))

    def f(z):
        return focal_loss(jax.nn.log_softmax(z), target, gamma=2.0)

    g = jax.grad(f)(logits)

    zt = torch.tensor(np.asarray(logits), requires_grad=True)
    loss = torch_focal(tF.log_softmax(zt, -1), torch.tensor(np.asarray(target)), 2.0)
    loss.backward()
    np.testing.assert_allclose(np.asarray(g), zt.grad.numpy(), atol=1e-5)


@pytest.mark.parametrize("weighted", [False, True])
def test_masked_nll_matches_torch(rng, weighted):
    B, L, C = 5, 7, 6
    logp = np.log(jax.nn.softmax(rng.standard_normal((B, L, C))).__array__()).astype(np.float32)
    target = rng.integers(0, C, size=(B, L))
    mask = (rng.random((B, L)) < 0.7).astype(np.float32)
    mask[:, 0] = 1.0
    weight = rng.uniform(0.5, 2.0, size=C).astype(np.float32) if weighted else None

    ours = masked_nll_loss(jnp.array(logp), jnp.array(target), jnp.array(mask), weight)

    pred = torch.tensor(logp).view(-1, C)
    tgt = torch.tensor(target).view(-1)
    m = torch.tensor(mask).view(-1, 1)
    w = torch.tensor(weight) if weighted else None
    nll = torch.nn.NLLLoss(weight=w, reduction="sum")
    if w is None:
        theirs = nll(pred * m, tgt) / m.sum()
    else:
        theirs = nll(pred * m, tgt) / (w[tgt] * m.squeeze()).sum()
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_masked_mse(rng):
    pred = rng.standard_normal(40).astype(np.float32)
    target = rng.standard_normal(40).astype(np.float32)
    mask = (rng.random(40) < 0.6).astype(np.float32)
    ours = masked_mse_loss(jnp.array(pred), jnp.array(target), jnp.array(mask))
    theirs = (((torch.tensor(pred) * torch.tensor(mask)) - torch.tensor(target)) ** 2).sum() / torch.tensor(mask).sum()
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)
