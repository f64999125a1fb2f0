"""On-TPU vision frontend: compact DenseNet over face crops.

BASELINE.json stretch config counterpart of the reference's frozen
"denseface" 342-d features (``run_train_erc.py:359``) — those came from an
offline DenseNet run over detected faces.  This module is a trainable
DenseNet-BC in flax: dense blocks where each layer's input is the concat of
all previous feature maps (growth-rate channels per layer), transition
layers that halve channels and spatial dims, global average pooling head.

TPU notes: NHWC layout (XLA's native conv layout on TPU), 3x3 convs lower to
implicit GEMMs on the MXU, and the concat-growth pattern is pure fusion food
for XLA.  BatchNorm is replaced by GroupNorm so the module is batch-size
independent (serving uses B=1) and needs no running-stat state.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mmdfn_tpu.nn.linear import TorchDense


def _gn(name: str):
    """GroupNorm with a group count that divides any channel width (DenseNet
    growth patterns produce widths like 24/56/120 that fixed group sizes
    reject)."""

    class _AdaptiveGN(nn.Module):
        @nn.compact
        def __call__(self, x):
            C = x.shape[-1]
            groups = next(g for g in (8, 4, 2, 1) if C % g == 0)
            return nn.GroupNorm(num_groups=groups, name="gn")(x)

    return _AdaptiveGN(name=name)


class _DenseLayer(nn.Module):
    growth: int

    @nn.compact
    def __call__(self, x):
        h = _gn("norm")(x)
        h = nn.relu(h)
        h = nn.Conv(4 * self.growth, (1, 1), use_bias=False,
                    name="conv1x1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.growth, (3, 3), use_bias=False, name="conv3x3")(h)
        return jnp.concatenate([x, h], axis=-1)


class _Transition(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = _gn("norm")(x)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name="conv")(h)
        return nn.avg_pool(h, (2, 2), strides=(2, 2))


class DenseNetFrontend(nn.Module):
    """(B, L, H, W, C) face crops -> (B, L, out_dim) utterance features."""

    out_dim: int = 342
    growth: int = 12
    block_config: Sequence[int] = (4, 8, 6)
    stem_channels: int = 32

    @nn.compact
    def __call__(self, frames: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        B, L, H, W, C = frames.shape
        x = frames.reshape(B * L, H, W, C)
        x = nn.Conv(self.stem_channels, (3, 3), use_bias=False,
                    name="stem")(x)
        ch = self.stem_channels
        for bi, n_layers in enumerate(self.block_config):
            for li in range(n_layers):
                x = _DenseLayer(self.growth, name=f"block{bi}_layer{li}")(x)
                ch += self.growth
            if bi < len(self.block_config) - 1:
                ch = ch // 2
                x = _Transition(ch, name=f"trans{bi}")(x)
        x = _gn("final_norm")(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))                  # global average pool
        out = TorchDense(self.out_dim, name="head")(x)
        return out.reshape(B, L, self.out_dim)
