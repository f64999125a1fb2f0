"""PyTorch-default parameter initializers for flax modules.

The reference model's published F1 numbers were obtained with PyTorch's
default inits (``nn.Linear``: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias; ``nn.GRU``/``nn.LSTM``: U(-1/sqrt(hidden), 1/sqrt(hidden))
for all parameters; ``nn.Embedding``: N(0, 1); the custom GCNII
``GraphConvolution`` layer: U(-1/sqrt(out_features), 1/sqrt(out_features)),
see reference ``code/model_GCN.py:172-174``).  Flax defaults (lecun_normal,
zeros-bias) differ, which measurably shifts where these small models converge
— so every module in this package initializes with the equivalents below.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def linear_kernel(key, shape, dtype=jnp.float32):
    """torch nn.Linear weight init for a flax Dense kernel of shape (in, out).

    torch draws U(-k, k) with k = 1/sqrt(fan_in) (kaiming_uniform with
    a=sqrt(5) collapses to this bound).
    """
    fan_in = shape[0]
    k = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)


def conv_kernel(key, shape, dtype=jnp.float32):
    """torch nn.Conv1d/2d weight init for a flax Conv kernel
    (*spatial, in_ch, out_ch): U(-k, k), k = 1/sqrt(in_ch * prod(spatial))."""
    fan_in = int(np.prod(shape[:-1]))
    k = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)


def linear_bias(fan_in):
    """torch nn.Linear bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        k = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)

    return init


def rnn_uniform(hidden_size):
    """torch RNN (GRU/LSTM) init: all params U(-1/sqrt(H), 1/sqrt(H))."""

    def init(key, shape, dtype=jnp.float32):
        k = 1.0 / np.sqrt(hidden_size)
        return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)

    return init


def uniform_by_bound(bound):
    """U(-bound, bound) initializer (GCNII GraphConvolution weights)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def embedding_normal(key, shape, dtype=jnp.float32):
    """torch nn.Embedding init: N(0, 1)."""
    return jax.random.normal(key, shape, dtype)


def xavier_normal(key, shape, dtype=jnp.float32):
    """torch xavier_normal_ (used by LMF factors, model_fusion.py:268-271)."""
    fan_in, fan_out = _compute_fans(shape)
    std = np.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def _compute_fans(shape):
    # torch treats dim 0 as fan_out and the rest as fan_in for >=2D tensors;
    # for 3D factor tensors (rank, in, out) torch uses receptive-field style
    # fans: fan_in = shape[1]*rf, fan_out = shape[0]*rf with rf = prod(shape[2:])
    if len(shape) < 2:
        return shape[0], shape[0]
    receptive = int(np.prod(shape[2:])) if len(shape) > 2 else 1
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    return fan_in, fan_out
