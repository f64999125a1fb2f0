"""Traced dropout-rate override: stack the dropout rate on a sweep axis.

Both reference sweep grids vary ``--dropout`` (``script/run_train_ie.sh:19-52``
dp {0.2, 0.4}; ``run_train_me.sh`` dp {0.4, 0.2}), but a Flax module's rate is
a static constructor attribute, so the vmapped multi-config sweep
(:mod:`mmdfn_tpu.train.vmap_sweep`) historically had to split the grid into
per-dropout groups.  The rate is data-like — a bernoulli threshold — so it can
ride the stacked config axis instead: this module provides

* :class:`DropRate` — the traced per-config rate triple (the XLA bernoulli
  threshold plus the integer keep-threshold / keep-scale the fused Pallas
  GCNII kernel consumes, precomputed host-side in exact float64 so the
  in-kernel draws are bit-identical with a static-rate run);
* :func:`override` — a trace-time context that carries the traced rate to
  every dropout site whose static rate was constructed from the swept config
  field (sites opt in via a ``rate_tag`` attribute — rates NOT derived from
  the swept field, e.g. ``rec_dropout`` or the fixed fusion-attention rates,
  never consult it);
* :class:`Dropout` — a drop-in for ``flax.linen.Dropout`` (identical draws:
  one ``make_rng('dropout')``, ``bernoulli(key, 1-rate, x.shape)``,
  ``x/keep`` scaling) that honors the override.

The context is consulted at TRACE time only: under ``jax.vmap`` the override
holds a per-config tracer, so one compiled executable trains K different
dropout rates simultaneously.  With no override installed every code path is
byte-identical to the static behavior (zero overhead).
"""

from __future__ import annotations

import contextlib
from typing import NamedTuple, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class DropRate(NamedTuple):
    """Per-config dropout rate as traced scalars (or stacked (K,) arrays).

    ``thresh``/``inv_keep`` exist for the fused Pallas GCNII train kernel
    (``ops/pallas_gcnii_train.py``), whose hardware-PRNG draw is a uint32
    threshold test: ``keep = bits < thresh``.  They are precomputed host-side
    (exact integer math, matching the kernel's static-rate formula
    ``min(int((1-rate) * 2**32), 2**32-1)`` bit for bit) because computing
    the threshold from a traced float32 rate would quantize it to the f32
    mantissa (~2**-24 draw skew vs a static-rate run).
    """

    rate: jnp.ndarray       # f32 — the drop probability (reporting)
    keep: jnp.ndarray       # f32 — 1-rate, rounded ONCE from float64 so it
                            #        equals the static path's python-float
                            #        keep bit for bit (computing 1-rate from
                            #        a traced f32 rate in-graph is 1 ulp off:
                            #        1f - f32(0.2) != f32(0.8))
    thresh: jnp.ndarray     # i32 — bit pattern of the uint32 keep threshold
    inv_keep: jnp.ndarray   # f32 — 1/(1-rate); exactly 1.0 marks rate == 0
                            #        (the kernel's keep-all guard)


def _thresh_int(rate: float) -> int:
    # identical to the static-rate path in ops/pallas_gcnii_train.py
    return min(int((1.0 - float(rate)) * (1 << 32)), (1 << 32) - 1)


def make_drop_rate(rates: Union[float, Sequence[float]]) -> DropRate:
    """Host-side constructor; accepts one rate or a (K,) stack of rates."""
    arr = np.atleast_1d(np.asarray(rates, np.float64))
    if np.any(arr < 0.0) or np.any(arr >= 1.0):
        raise ValueError(f"dropout rates must be in [0, 1); got {arr}")
    thresh = np.asarray([_thresh_int(r) for r in arr], np.uint64)
    thresh_i32 = thresh.astype(np.uint32).view(np.int32)
    keep = (1.0 - arr).astype(np.float32)
    inv_keep = (1.0 / (1.0 - arr)).astype(np.float32)
    scalar = np.ndim(rates) == 0
    pick = (lambda a: a[0]) if scalar else (lambda a: a)
    return DropRate(rate=jnp.asarray(pick(arr.astype(np.float32))),
                    keep=jnp.asarray(pick(keep)),
                    thresh=jnp.asarray(pick(thresh_i32)),
                    inv_keep=jnp.asarray(pick(inv_keep)))


# ---------------------------------------------------------------------------
# trace-time override context (a plain stack: tracing is single-threaded per
# transform, and the tracer captured here is closed over by the traced fns)
_STACK: list = []


@contextlib.contextmanager
def override(rates: dict):
    """Install ``{tag: DropRate}`` for the duration of a traced forward."""
    _STACK.append(dict(rates))
    try:
        yield
    finally:
        _STACK.pop()


def get(tag: Optional[str]) -> Optional[DropRate]:
    """The innermost override for ``tag`` (None when absent / untagged)."""
    if tag is None:
        return None
    for frame in reversed(_STACK):
        if tag in frame:
            return frame[tag]
    return None


def resolve(tag: Optional[str], static_rate: float):
    """(keep, inv_keep, override_or_None) for a dropout site.

    ``keep``/``inv_keep`` are python floats on the static path, traced f32
    scalars under an override — computed host-side either way so the two
    paths run IDENTICAL arithmetic (an in-graph ``1 - rate`` or ``x / keep``
    with a traced operand diverges from the constant-folded static graph by
    1 ulp: f32 complement rounding, and XLA's divide-by-constant ->
    multiply-by-reciprocal rewrite).
    """
    ov = get(tag)
    if ov is not None:
        return ov.keep, ov.inv_keep, ov
    k = 1.0 - static_rate
    return k, (1.0 / k if k > 0.0 else 1.0), None


def dropout(x: jnp.ndarray, key, keep, inv_keep) -> jnp.ndarray:
    """Functional inverted dropout; operands may be static or traced.

    ``mask = bernoulli(key, keep, x.shape)`` draws exactly like
    ``flax.linen.Dropout``; the kept values scale by an explicit
    ``inv_keep`` MULTIPLY (not ``x / keep``) so static and traced rates
    compile to the same arithmetic (see :func:`resolve`).
    """
    mask = jax.random.bernoulli(key, keep, x.shape)
    # cast keeps a traced f32 scale from promoting a lower-precision input
    # (a python-float scale stays weakly typed and would not)
    return jnp.where(mask, x * jnp.asarray(inv_keep, x.dtype), 0.0)


class Dropout(nn.Module):
    """Override-aware drop-in for ``flax.linen.Dropout``.

    Static behavior (no override installed, or ``rate_tag=None``) matches
    flax exactly, including the no-RNG fast paths at rate 0 and 1; with an
    override the traced rate replaces the static one and the draw always
    happens (a traced rate of 0 yields an all-keep mask and exact ``x/1``
    scaling, so a rate-0 config inside a stacked group is still bitwise
    equal to its static run).
    """

    rate: float
    rate_tag: Optional[str] = None

    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        ov = get(self.rate_tag)
        if deterministic or (ov is None and self.rate == 0.0):
            return x
        if ov is None and self.rate == 1.0:
            return jnp.zeros_like(x)
        keep, inv, _ = resolve(self.rate_tag, self.rate)
        return dropout(x, self.make_rng("dropout"), keep, inv)
