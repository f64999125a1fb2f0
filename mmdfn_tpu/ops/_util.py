"""Shared helpers for the Pallas kernel modules."""

from __future__ import annotations

# Platforms on which the Mosaic TPU kernels run natively.  'axon' is the
# remote-TPU tunnel plugin used in this environment; everywhere else the
# kernels run in interpreter mode (CI = XLA:CPU).  Keep this tuple the
# single source of truth — nn/rnn.py and nn/gcn.py both branch on it.
TPU_PLATFORMS = ("tpu", "axon")


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_to(a, *dims):
    """Zero-pad each trailing edge of ``a`` up to the given per-axis sizes
    (the kernel-operand tile-alignment pad; dims must be >= a.shape)."""
    import jax.numpy as jnp
    return jnp.pad(a, [(0, d - s) for s, d in zip(a.shape, dims)])


def on_tpu() -> bool:
    """True when the PROCESS-DEFAULT backend is a TPU.

    Trace-time resolution — a jit explicitly targeting a platform other
    than the process default will pick the wrong kernel mode (documented
    caveat, same as GCNIIStack.scan_unroll auto-resolution; the library
    never does cross-backend jits and the failure is a loud compile error
    in the TPU-default/CPU-target direction).
    """
    import jax
    return jax.default_backend() in TPU_PLATFORMS
