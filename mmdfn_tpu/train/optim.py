"""Optimizers matching the reference's torch semantics.

The reference uses ``optim.Adam(model.parameters(), lr=args.lr,
weight_decay=args.l2)`` (``code/run_train_erc.py:512``).  Torch's Adam with
``weight_decay`` is *coupled* L2: the decay term ``l2 * param`` is added to the
gradient **before** the Adam moment updates — unlike optax's ``adamw`` which
decays after.  ``torch_adam`` reproduces the torch ordering exactly.
"""

from __future__ import annotations

import optax


def torch_adam(lr: float, weight_decay: float = 0.0, b1: float = 0.9,
               b2: float = 0.999, eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam with coupled (pre-moment) L2, bit-matching ``torch.optim.Adam``."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)
