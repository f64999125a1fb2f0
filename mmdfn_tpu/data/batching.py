"""Length-bucketed, statically padded batch assembly.

TPU/XLA compiles one executable per distinct input shape.  The reference pads
each batch to its own max dialogue length (``dataloader.py:31-34``), which on
TPU would trigger a recompile for nearly every batch.  We instead round the
batch's max length up to a small set of bucket boundaries so an epoch touches
only a handful of compiled specializations, and always pad the batch dimension
to a fixed ``batch_size`` (short batches carry all-zero ``umask`` rows that
every downstream consumer masks out).

An optional native C++ packer (``mmdfn_tpu.data._native``) accelerates the
host-side copy loop; the numpy path is the reference implementation.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence

import numpy as np

DEFAULT_BUCKETS = (16, 24, 32, 48, 64, 96, 128, 160, 200)


def bucket_length(max_len: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if max_len <= b:
            return b
    return int(max_len)


@dataclass
class Batch:
    """One statically shaped batch of dialogues (batch-first layout).

    The reference collate contract (``dataloader.py:31-34``) is sequence-first
    ``(L, B, D)``; we use batch-first ``(B, L, D)`` throughout, the natural
    layout for batched TPU matmuls and for sharding the batch axis.
    """

    text: np.ndarray    # (B, L, D_text) float32
    visual: np.ndarray  # (B, L, D_visual)
    audio: np.ndarray   # (B, L, D_audio)
    qmask: np.ndarray   # (B, L, n_speakers)
    umask: np.ndarray   # (B, L) float32: 1 = real utterance
    label: np.ndarray   # (B, L) int32 (0 at pads; mask before use)
    vids: List[str] = dataclasses.field(default_factory=list)

    @property
    def n_valid(self) -> int:
        return int(self.umask.sum())


def _pack_numpy(arrs: List[np.ndarray], B: int, L: int, D: int,
                dtype=np.float32) -> np.ndarray:
    out = np.zeros((B, L, D), dtype=dtype)
    for i, a in enumerate(arrs):
        out[i, : a.shape[0]] = a
    return out


def _pack(arrs: List[np.ndarray], B: int, L: int, D: int, dtype=np.float32) -> np.ndarray:
    if dtype is np.float32:
        from mmdfn_tpu.data import _native
        out = _native.pack_f32(arrs, B, L, D)
        if out is not None:
            return out
    return _pack_numpy(arrs, B, L, D, dtype)


def collate(dialogues: Sequence, batch_size: int, bucket: int,
            n_speakers: int) -> Batch:
    """Pad a list of dialogues into one static (batch_size, bucket) Batch."""
    assert len(dialogues) <= batch_size
    d0 = dialogues[0]
    D_t, D_v, D_a = d0.text.shape[1], d0.visual.shape[1], d0.audio.shape[1]
    B, L = batch_size, bucket
    text = _pack([d.text for d in dialogues], B, L, D_t)
    visual = _pack([d.visual for d in dialogues], B, L, D_v)
    audio = _pack([d.audio for d in dialogues], B, L, D_a)
    qmask = _pack([d.qmask for d in dialogues], B, L, n_speakers)

    from mmdfn_tpu.data import _native
    packed = _native.pack_masks_labels([d.label for d in dialogues], B, L)
    if packed is not None:
        umask, label = packed
    else:
        umask = np.zeros((B, L), dtype=np.float32)
        label = np.zeros((B, L), dtype=np.int32)
        for i, d in enumerate(dialogues):
            n = len(d)
            umask[i, :n] = 1.0
            label[i, :n] = d.label
    return Batch(text=text, visual=visual, audio=audio, qmask=qmask,
                 umask=umask, label=label, vids=[d.vid for d in dialogues])


@dataclass
class TokenBatch:
    """Statically shaped batch of token-id dialogues (DailyDialogue)."""

    tokens: np.ndarray  # (B, L, W) int32
    qmask: np.ndarray   # (B, L, n_speakers)
    umask: np.ndarray   # (B, L)
    label: np.ndarray   # (B, L) int32
    vids: List[str] = dataclasses.field(default_factory=list)

    @property
    def n_valid(self) -> int:
        return int(self.umask.sum())


def collate_tokens(dialogues: Sequence, batch_size: int, bucket: int,
                   n_speakers: int = 2,
                   max_words: Optional[int] = None) -> TokenBatch:
    """Pad TokenDialogue samples to one static (B, L, W) batch."""
    assert len(dialogues) <= batch_size
    W = max_words or max(d.tokens.shape[1] for d in dialogues)
    B, L = batch_size, bucket
    tokens = np.zeros((B, L, W), dtype=np.int32)
    qmask = np.zeros((B, L, n_speakers), dtype=np.float32)
    umask = np.zeros((B, L), dtype=np.float32)
    label = np.zeros((B, L), dtype=np.int32)
    for i, d in enumerate(dialogues):
        n, w = d.tokens.shape
        tokens[i, :n, :min(w, W)] = d.tokens[:, :W]
        qmask[i, :n] = d.qmask
        umask[i, :n] = 1.0
        label[i, :n] = d.label
    return TokenBatch(tokens=tokens, qmask=qmask, umask=umask, label=label,
                      vids=[d.vid for d in dialogues])


class BucketBatcher:
    """Epoch iterator over bucketed static batches.

    Train epochs shuffle dialogue order with a numpy ``Generator`` seeded from
    (base_seed, epoch) so runs are reproducible; eval keeps dataset order
    (matching the reference's sequential test loader).
    """

    def __init__(self, dialogues: Sequence, batch_size: int, n_speakers: int,
                 buckets: Sequence[int] = DEFAULT_BUCKETS,
                 shuffle: bool = False, seed: int = 2021,
                 sort_by_length: bool = False):
        self.dialogues = list(dialogues)
        self.batch_size = batch_size
        self.n_speakers = n_speakers
        self.buckets = tuple(buckets)
        self.shuffle = shuffle
        self.seed = seed
        self.sort_by_length = sort_by_length

    def epoch(self, epoch_idx: int = 0) -> Iterator[Batch]:
        order = np.arange(len(self.dialogues))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch_idx))
            rng.shuffle(order)
        if self.sort_by_length:
            # Length-sorted batching minimizes padding waste (a TPU-side
            # optimization the reference does not have); combined with the
            # shuffle above it shuffles *within* length-sorted chunks.
            order = order[np.argsort([len(self.dialogues[i]) for i in order],
                                     kind="stable")]
        for s in range(0, len(order), self.batch_size):
            chunk = [self.dialogues[i] for i in order[s:s + self.batch_size]]
            L = bucket_length(max(len(d) for d in chunk), self.buckets)
            yield self._collate(chunk, L)

    def _collate(self, chunk, L):
        return collate(chunk, self.batch_size, L, self.n_speakers)

    def __iter__(self) -> Iterator[Batch]:
        return self.epoch(0)

    def num_batches(self) -> int:
        n = len(self.dialogues)
        return (n + self.batch_size - 1) // self.batch_size


class TokenBucketBatcher(BucketBatcher):
    """Bucketed batcher over :class:`TokenDialogue` samples (DailyDialogue).

    ``max_words`` is FIXED across the epoch so every batch shares one static
    word-axis width — a per-batch max (the torch-ish formulation) would give
    each batch its own (B, L, W) shape and recompile the TextCNN per batch.
    """

    def __init__(self, dialogues: Sequence, batch_size: int, max_words: int,
                 buckets: Sequence[int] = DEFAULT_BUCKETS,
                 shuffle: bool = False, seed: int = 2021,
                 sort_by_length: bool = False, n_speakers: int = 2):
        super().__init__(dialogues, batch_size, n_speakers, buckets,
                         shuffle, seed, sort_by_length)
        self.max_words = max_words

    def _collate(self, chunk, L):
        return collate_tokens(chunk, self.batch_size, L, self.n_speakers,
                              max_words=self.max_words)


def make_epoch_batches(dialogues, batch_size, n_speakers, epoch=0,
                       shuffle=False, seed=2021,
                       buckets=DEFAULT_BUCKETS) -> List[Batch]:
    return list(BucketBatcher(dialogues, batch_size, n_speakers, buckets,
                              shuffle, seed).epoch(epoch))
