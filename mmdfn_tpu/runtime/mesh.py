"""Device mesh and sharding layout for distributed training.

The reference is strictly single-process single-GPU (``code/run_train_erc.py``
hard-codes ``CUDA_VISIBLE_DEVICES=0``; no ``torch.distributed`` anywhere) — so
there is no communication layer to port.  The TPU-native scaling story is
defined here once and reused everywhere:

* A 1-D (or 2-D) ``jax.sharding.Mesh`` with a ``"data"`` axis (and an optional
  ``"model"`` axis for the stretch tensor-parallel configs).
* Batches shard on their leading (dialogue) axis over ``"data"`` — the MM-DFN
  adjacency is block-diagonal per dialogue, so data parallelism is exact
  graph parallelism: no cross-shard edges ever exist.
* Parameters and optimizer state are replicated; XLA inserts the gradient
  ``psum`` over ICI automatically when the jitted step's outputs demand
  replicated params.

Every model component stays collective-free (pure per-shard functions); only
this module mentions the mesh.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    With one chip this degenerates to a 1x1 mesh and every sharding below
    becomes a no-op — the same jitted step serves single-chip and pod runs.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(
            f"mesh needs n_data*n_model={need} devices, found {len(devices)}; "
            f"on CPU set XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{need} (before jax initializes) for a virtual mesh")
    use = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(use, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (dialogue/batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device-put every array in ``tree`` with its batch axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)
