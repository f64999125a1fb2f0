"""Loss functions — pure, mask-aware ports of the reference semantics.

Reference: ``code/loss.py``.  The reference operates on packed ``(N, C)``
log-prob tensors (all valid utterances concatenated); we operate on padded
``(..., C)`` tensors plus a validity mask, which is mathematically identical
(masked means/sums) but statically shaped for XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def focal_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    gamma: float = 0.0,
    alpha: Optional[jnp.ndarray] = None,
    size_average: bool = True,
) -> jnp.ndarray:
    """Focal loss over log-probabilities.

    Matches reference ``FocalLoss`` (``code/loss.py:5-34``) exactly:

    * input is *log*-probabilities (the model ends in log_softmax);
    * ``pt = exp(logpt)`` is detached from the graph (reference wraps it in
      ``Variable(logpt.data.exp())``, so the modulation factor ``(1-pt)^g``
      carries no gradient) — we use ``stop_gradient`` for parity;
    * per-class ``alpha`` weights scale ``logpt`` before modulation;
    * mean (or sum) reduction over the valid elements.

    Args:
      log_probs: (..., C) log-probabilities.
      targets:   (...,) int class ids.
      mask:      (...,) optional 0/1 validity mask (None = all valid).
      gamma:     focusing parameter.
      alpha:     optional (C,) per-class weights.
    """
    logpt = jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    pt = jax.lax.stop_gradient(jnp.exp(logpt))
    if alpha is not None:
        at = jnp.asarray(alpha)[targets]
        logpt = logpt * at
    loss = -1.0 * (1.0 - pt) ** gamma * logpt
    if mask is None:
        return jnp.mean(loss) if size_average else jnp.sum(loss)
    mask = mask.astype(loss.dtype)
    total = jnp.sum(loss * mask)
    if size_average:
        return total / jnp.maximum(jnp.sum(mask), 1.0)
    return total


def masked_nll_loss(
    log_probs: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked negative log-likelihood.

    Matches reference ``MaskedNLLLoss`` (``code/loss.py:38-58``): NLL summed
    over masked elements, normalized by ``sum(mask)`` (unweighted) or by
    ``sum(weight[target] * mask)`` (weighted).
    """
    logpt = jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    mask = mask.astype(logpt.dtype)
    if weight is None:
        num = -jnp.sum(logpt * mask)
        den = jnp.maximum(jnp.sum(mask), 1.0)
    else:
        w = jnp.asarray(weight)[targets]
        num = -jnp.sum(w * logpt * mask)
        den = jnp.maximum(jnp.sum(w * mask), 1e-8)
    return num / den


def masked_mse_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked MSE — reference ``MaskedMSELoss`` (``code/loss.py:61-74``).

    Kept for capability parity (the reference's AVEC regression leftover).
    """
    mask = mask.astype(pred.dtype)
    return jnp.sum(((pred * mask) - target) ** 2) / jnp.maximum(jnp.sum(mask), 1.0)
