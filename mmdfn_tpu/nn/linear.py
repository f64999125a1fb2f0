"""Dense layer with torch nn.Linear default initialization."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from mmdfn_tpu.utils import torch_init


class TorchDense(nn.Module):
    """``flax.linen.Dense`` with torch-default U(-1/sqrt(fan_in), ·) init.

    Used everywhere the reference uses ``nn.Linear`` so the loss landscape at
    init matches the published training runs.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_init.linear_kernel, (fan_in, self.features)
        )
        y = jnp.dot(x, kernel)
        if self.use_bias:
            bias = self.param(
                "bias", torch_init.linear_bias(fan_in), (self.features,)
            )
            y = y + bias
        return y
