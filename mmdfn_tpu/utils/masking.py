"""Static-shape masking utilities.

Everything in this framework is padded to bucketed static shapes; these
helpers are the single place where mask/length conversions and pad-safe
sequence reversals live.  All functions are jit-safe (no data-dependent
shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lengths_from_mask(umask):
    """(B, L) 0/1 mask -> (B,) int32 lengths.

    Mirrors the reference's ``lengths = (umask[j]==1).nonzero()[-1]+1``
    (``code/run_train_erc.py:194``) but stays on-device and vectorized.
    Assumes masks are left-contiguous (all real utterances precede padding),
    which the data layer guarantees.
    """
    return jnp.sum(umask > 0, axis=-1).astype(jnp.int32)


def mask_from_lengths(lengths, max_len):
    """(B,) lengths -> (B, max_len) float mask."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)


def pair_mask(umask):
    """(B, L) -> (B, L, L) outer-product validity mask for adjacencies."""
    m = umask.astype(jnp.float32)
    return m[:, :, None] * m[:, None, :]


def flip_valid(x, umask):
    """Reverse each sequence within its valid region, keeping pads in place.

    Replaces the reference's per-dialogue python flip loop ``_reverse_seq``
    (``code/model.py:1008-1017``) with a gather: position ``t`` maps to
    ``len-1-t`` for ``t < len`` and stays put otherwise.  This makes backward
    RNN scans padding-invariant (the reference instead runs cuDNN RNNs over
    trailing pads — a batch-composition-dependent quirk we deliberately fix;
    see DESIGN.md "faithful vs fixed").

    Args:
      x: (B, L, ...) batch-first sequences.
      umask: (B, L) validity mask.
    Returns:
      x with each valid prefix reversed.
    """
    B, L = x.shape[0], x.shape[1]
    lengths = lengths_from_mask(umask)
    t = jnp.arange(L)[None, :]
    src = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    if jnp.issubdtype(x.dtype, jnp.floating) and L <= 128:
        # Permutation as a one-hot matmul: each output row sums exactly one
        # 1.0*value term, so Precision.HIGHEST makes it bit-identical to the
        # gather while running on the MXU — TPU gathers are HBM-bound and
        # their backward is a scatter-add (measured 0.35 ms/step of the
        # flagship's 8.7 ms inside the encoder-RNN flips alone).  Gated to
        # L <= 128: the (B, L, L) matrix's traffic grows quadratically and
        # was only measured a win at flagship L.  Pad rows bypass the
        # matmul entirely (the where below), so a non-finite value parked
        # in a pad frame cannot poison valid rows through 0*inf — the same
        # quarantine the gather gave (double-where, see CLAUDE.md traps).
        # A non-finite in a VALID frame NaNs every valid row here (0*inf
        # across the one-hot), where the gather only contaminated rows that
        # read it — accepted: a valid-frame non-finite was already fatal
        # either way (it enters the RNN carry and the loss); this path just
        # fails batch-wide instead of row-wise.  (Round 3: only the
        # DialogueRNN baselines still route through here — the encoder
        # BiRNN/CRN paths use mask-gated recurrences with no flips at all.)
        valid = (t < lengths[:, None])                        # (B, L)
        flat = x.reshape(B, L, -1)
        flat = jnp.where(valid[..., None], flat, 0.0)
        onehot = jax.nn.one_hot(src, L, dtype=x.dtype)        # (B, L, L)
        out = jnp.einsum("blm,bmd->bld", onehot, flat,
                         precision=jax.lax.Precision.HIGHEST)
        out = jnp.where(valid[..., None], out, x.reshape(B, L, -1))
        return out.reshape(x.shape)
    return jnp.take_along_axis(
        x, src.reshape(B, L, *([1] * (x.ndim - 2))).astype(jnp.int32), axis=1
    ) if x.ndim > 2 else jnp.take_along_axis(x, src, axis=1)
