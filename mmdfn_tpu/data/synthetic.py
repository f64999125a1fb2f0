"""Synthetic fixture generators in the exact reference pickle formats.

The real IEMOCAP/MELD feature pickles are not shipped (see the reference
mount's ``.MISSING_LARGE_BLOBS``), so tests and benchmarks build tiny (or
benchmark-sized) synthetic pickles with the *exact* tuple layout the reference
dataloaders parse (``code/dataloader.py:12-14`` / ``:40-42``) and the exact
feature dims (``run_train_erc.py:359-362``).  This exercises our ingestion
code against the real on-disk contract.
"""

from __future__ import annotations

import pickle
from typing import Optional, Tuple

import numpy as np

from mmdfn_tpu.data.datasets import FEAT2DIM


def _dialogue_lengths(rng, n, lo, hi):
    return [int(rng.integers(lo, hi + 1)) for _ in range(n)]


def make_synthetic_iemocap_pickle(
    path: str,
    n_train: int = 8,
    n_test: int = 4,
    min_len: int = 4,
    max_len: int = 24,
    n_classes: int = 6,
    seed: int = 0,
) -> Tuple[list, list]:
    """Write a 9-tuple IEMOCAP-format pickle of random dialogues."""
    rng = np.random.default_rng(seed)
    D_t, D_a, D_v = FEAT2DIM["textCNN"], FEAT2DIM["IS10"], FEAT2DIM["denseface"]
    videoIDs, videoSpeakers, videoLabels = {}, {}, {}
    videoText, videoAudio, videoVisual, videoSentence = {}, {}, {}, {}
    train_vids, test_vids = [], []
    for i, L in enumerate(_dialogue_lengths(rng, n_train + n_test, min_len, max_len)):
        vid = f"Ses0{i}"
        videoIDs[vid] = [f"{vid}_utt{j}" for j in range(L)]
        videoSpeakers[vid] = [("M" if rng.random() < 0.5 else "F") for _ in range(L)]
        videoLabels[vid] = [int(rng.integers(0, n_classes)) for _ in range(L)]
        videoText[vid] = rng.standard_normal((L, D_t)).astype(np.float32)
        videoAudio[vid] = rng.standard_normal((L, D_a)).astype(np.float32)
        videoVisual[vid] = rng.standard_normal((L, D_v)).astype(np.float32)
        videoSentence[vid] = [f"utterance {j}" for j in range(L)]
        (train_vids if i < n_train else test_vids).append(vid)
    payload = (videoIDs, videoSpeakers, videoLabels, videoText, videoAudio,
               videoVisual, videoSentence, train_vids, test_vids)
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return train_vids, test_vids


def make_separable_iemocap_pickle(
    path: str,
    n_train: int = 24,
    n_test: int = 8,
    min_len: int = 4,
    max_len: int = 16,
    n_classes: int = 6,
    seed: int = 0,
    noise: float = 0.25,
    speaker_shift: float = 1.0,
) -> Tuple[list, list]:
    """Write an IEMOCAP-format pickle whose labels are LEARNABLE.

    Unlike :func:`make_synthetic_iemocap_pickle` (labels independent of
    features — only memorization is possible), every utterance's features
    are a per-class prototype plus noise, with an additive per-speaker
    nuisance shift, so the emotion is a deterministic function of the
    features and generalizes to held-out dialogues:

    ``feat_m[t] = proto_m[y_t] + speaker_shift * spk_m[s_t] + noise * eps``

    Prototypes are unit-norm random directions per modality; at the default
    ``noise=0.25`` the Bayes error is ~0, so a correct end-to-end pipeline
    must reach ~100% weighted F1 on BOTH splits — the build-side stand-in
    for the reference's continuous empirical-evaluation regime
    (``code/run_train_erc.py:558-581``; the real feature pickles are absent
    from the mount, ``/root/reference/.MISSING_LARGE_BLOBS``).  Any
    optimizer-wiring, masking, or quirk-interaction bug that only shows up
    over a real training run fails this where random-label fixtures can't.
    """
    rng = np.random.default_rng(seed)
    D_t, D_a, D_v = FEAT2DIM["textCNN"], FEAT2DIM["IS10"], FEAT2DIM["denseface"]

    def protos(n, D):
        p = rng.standard_normal((n, D))
        return (p / np.linalg.norm(p, axis=1, keepdims=True)).astype(np.float32)

    proto = {m: protos(n_classes, D) for m, D in
             (("t", D_t), ("a", D_a), ("v", D_v))}
    spk_shift = {m: protos(2, D) * speaker_shift for m, D in
                 (("t", D_t), ("a", D_a), ("v", D_v))}

    videoIDs, videoSpeakers, videoLabels = {}, {}, {}
    videoText, videoAudio, videoVisual, videoSentence = {}, {}, {}, {}
    train_vids, test_vids = [], []
    for i, L in enumerate(_dialogue_lengths(rng, n_train + n_test,
                                            min_len, max_len)):
        vid = f"Ses0{i}"
        spk_idx = rng.integers(0, 2, size=L)
        labels = rng.integers(0, n_classes, size=L)
        videoIDs[vid] = [f"{vid}_utt{j}" for j in range(L)]
        videoSpeakers[vid] = ["MF"[s] for s in spk_idx]
        videoLabels[vid] = [int(y) for y in labels]
        feats = {}
        for m, D in (("t", D_t), ("a", D_a), ("v", D_v)):
            eps = rng.standard_normal((L, D)).astype(np.float32)
            feats[m] = (proto[m][labels] + spk_shift[m][spk_idx]
                        + noise * eps).astype(np.float32)
        videoText[vid], videoAudio[vid], videoVisual[vid] = (
            feats["t"], feats["a"], feats["v"])
        videoSentence[vid] = [f"utterance {j}" for j in range(L)]
        (train_vids if i < n_train else test_vids).append(vid)
    payload = (videoIDs, videoSpeakers, videoLabels, videoText, videoAudio,
               videoVisual, videoSentence, train_vids, test_vids)
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return train_vids, test_vids


def make_synthetic_meld_pickle(
    path: str,
    n_train: int = 8,
    n_test: int = 4,
    min_len: int = 3,
    max_len: int = 16,
    n_classes: int = 7,
    n_speakers: int = 9,
    seed: int = 0,
) -> Tuple[list, list]:
    """Write a 10-tuple MELD-format pickle (qmask already one-hot)."""
    rng = np.random.default_rng(seed)
    D_t, D_a, D_v = FEAT2DIM["MELD_text"], FEAT2DIM["MELD_audio"], FEAT2DIM["denseface"]
    videoIDs, videoSpeakers, videoLabels = {}, {}, {}
    videoText, videoAudio, videoVisual, videoSentence = {}, {}, {}, {}
    train_vids, test_vids = [], []
    for i, L in enumerate(_dialogue_lengths(rng, n_train + n_test, min_len, max_len)):
        vid = i
        videoIDs[vid] = [f"dia{i}_utt{j}" for j in range(L)]
        spk = np.zeros((L, n_speakers), dtype=np.float32)
        spk[np.arange(L), rng.integers(0, n_speakers, size=L)] = 1.0
        videoSpeakers[vid] = spk
        videoLabels[vid] = [int(rng.integers(0, n_classes)) for _ in range(L)]
        videoText[vid] = rng.standard_normal((L, D_t)).astype(np.float32)
        videoAudio[vid] = rng.standard_normal((L, D_a)).astype(np.float32)
        videoVisual[vid] = rng.standard_normal((L, D_v)).astype(np.float32)
        videoSentence[vid] = [f"utterance {j}" for j in range(L)]
        (train_vids if i < n_train else test_vids).append(vid)
    payload = (videoIDs, videoSpeakers, videoLabels, videoText, videoAudio,
               videoVisual, videoSentence, train_vids, test_vids, None)
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return train_vids, test_vids


def make_synthetic_daily_pickle(
    path: str,
    n_per_split: Tuple[int, int, int] = (6, 2, 2),
    min_len: int = 3,
    max_len: int = 12,
    max_words: int = 20,
    vocab_size: int = 200,
    n_classes: int = 7,
    seed: int = 0,
):
    """Write a 7-tuple DailyDialogue-format pickle (token-id features)."""
    rng = np.random.default_rng(seed)
    Speakers, Features, ActLabels, EmotionLabels = {}, {}, {}, {}
    ids = [[], [], []]
    n_total = sum(n_per_split)
    for i, L in enumerate(_dialogue_lengths(rng, n_total, min_len, max_len)):
        conv = f"conv{i}"
        Speakers[conv] = [str(int(rng.integers(0, 2))) for _ in range(L)]
        Features[conv] = rng.integers(1, vocab_size, size=(L, max_words)).astype(np.int64)
        ActLabels[conv] = [int(rng.integers(0, 4)) for _ in range(L)]
        EmotionLabels[conv] = [int(rng.integers(0, n_classes)) for _ in range(L)]
        split = 0 if i < n_per_split[0] else (1 if i < n_per_split[0] + n_per_split[1] else 2)
        ids[split].append(conv)
    payload = (Speakers, Features, ActLabels, EmotionLabels, ids[0], ids[1], ids[2])
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    return tuple(ids)
