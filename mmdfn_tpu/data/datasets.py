"""Dataset ingestion: reference-format feature pickles -> numpy dialogues.

The reference loads precomputed per-utterance features from pickle files
(``code/dataloader.py``): IEMOCAP is a 9-tuple of dicts keyed by dialogue id
(``dataloader.py:12-14``), MELD a 10-tuple (``dataloader.py:40-42``),
DailyDialogue a 7-tuple (``dataloader.py:75-76``).  We parse the exact same
formats but convert once to numpy and keep dialogues host-side; batching
(static padding + bucketing) lives in :mod:`mmdfn_tpu.data.batching`.

Feature dims (reference ``run_train_erc.py:359-362``):
  IEMOCAP: audio IS10 1582, text textCNN 100, visual denseface 342
  MELD:    audio 300, text 600, visual 342
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

FEAT2DIM = {
    "IS10": 1582,
    "3DCNN": 512,
    "textCNN": 100,
    "bert": 768,
    "denseface": 342,
    "MELD_text": 600,
    "MELD_audio": 300,
}


@dataclass
class Dialogue:
    """One conversation: per-utterance features + speaker one-hots + labels."""

    vid: str
    text: np.ndarray     # (len, D_text) float32
    visual: np.ndarray   # (len, D_visual)
    audio: np.ndarray    # (len, D_audio)
    qmask: np.ndarray    # (len, n_speakers) one-hot float32
    label: np.ndarray    # (len,) int32

    def __len__(self) -> int:
        return self.text.shape[0]


def _as2d(x) -> np.ndarray:
    a = np.asarray(x, dtype=np.float32)
    if a.ndim == 1:
        a = a[:, None]
    return a


class IEMOCAPDataset:
    """IEMOCAP 6-way trimodal ERC (reference ``dataloader.py:9-34``).

    Speakers come as 'M'/'F' character lists; qmask is the 2-way one-hot
    ``[1,0]`` for 'M' / ``[0,1]`` for 'F' (``dataloader.py:23``).
    """

    n_speakers = 2
    n_classes = 6
    target_names = ["hap", "sad", "neu", "ang", "exc", "fru"]

    def __init__(self, path: str, train: bool = True):
        with open(path, "rb") as f:
            (self.videoIDs, self.videoSpeakers, self.videoLabels, self.videoText,
             self.videoAudio, self.videoVisual, self.videoSentence, self.trainVid,
             self.testVid) = pickle.load(f, encoding="latin1")
        self.keys = list(self.trainVid if train else self.testVid)

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, index: int) -> Dialogue:
        vid = self.keys[index]
        speakers = self.videoSpeakers[vid]
        qmask = np.array(
            [[1.0, 0.0] if s == "M" else [0.0, 1.0] for s in speakers],
            dtype=np.float32,
        )
        return Dialogue(
            vid=vid,
            text=_as2d(self.videoText[vid]),
            visual=_as2d(self.videoVisual[vid]),
            audio=_as2d(self.videoAudio[vid]),
            qmask=qmask,
            label=np.asarray(self.videoLabels[vid], dtype=np.int32),
        )

    def dialogues(self) -> List[Dialogue]:
        return [self[i] for i in range(len(self))]


class MELDDataset:
    """MELD 7-way trimodal ERC (reference ``dataloader.py:37-68``).

    The pickle carries a 10th field (unused, ``dataloader.py:42``); qmask is
    already a 9-way one-hot matrix per utterance (``dataloader.py:52``).
    """

    n_speakers = 9
    n_classes = 7
    target_names = ["neu", "sur", "fea", "sad", "joy", "dis", "ang"]

    def __init__(self, path: str, train: bool = True):
        with open(path, "rb") as f:
            (self.videoIDs, self.videoSpeakers, self.videoLabels, self.videoText,
             self.videoAudio, self.videoVisual, self.videoSentence, self.trainVid,
             self.testVid, self._extra) = pickle.load(f, encoding="latin1")
        self.keys = list(self.trainVid if train else self.testVid)

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, index: int) -> Dialogue:
        vid = self.keys[index]
        return Dialogue(
            vid=str(vid),
            text=_as2d(self.videoText[vid]),
            visual=_as2d(self.videoVisual[vid]),
            audio=_as2d(self.videoAudio[vid]),
            qmask=np.asarray(self.videoSpeakers[vid], dtype=np.float32),
            label=np.asarray(self.videoLabels[vid], dtype=np.int32),
        )

    def return_labels(self) -> List[int]:
        out: List[int] = []
        for key in self.keys:
            out += list(self.videoLabels[key])
        return out

    def dialogues(self) -> List[Dialogue]:
        return [self[i] for i in range(len(self))]


@dataclass
class TokenDialogue:
    """DailyDialogue sample: token-id features for the trainable TextCNN."""

    vid: str
    tokens: np.ndarray   # (len, max_words) int32 token ids
    qmask: np.ndarray    # (len, 2)
    label: np.ndarray    # (len,)

    def __len__(self) -> int:
        return self.tokens.shape[0]


class DailyDialogueDataset:
    """DailyDialogue act/emotion dataset (reference ``dataloader.py:71-101``)."""

    n_speakers = 2
    n_classes = 7

    def __init__(self, split: str, path: str):
        with open(path, "rb") as f:
            (self.Speakers, self.Features, self.ActLabels, self.EmotionLabels,
             self.trainId, self.testId, self.validId) = pickle.load(f)
        if split == "train":
            self.keys = list(self.trainId)
        elif split == "test":
            self.keys = list(self.testId)
        elif split == "valid":
            self.keys = list(self.validId)
        else:
            raise ValueError(f"unknown split {split!r}")

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, index: int) -> TokenDialogue:
        conv = self.keys[index]
        speakers = self.Speakers[conv]
        qmask = np.array(
            [[1.0, 0.0] if s == "0" else [0.0, 1.0] for s in speakers],
            dtype=np.float32,
        )
        return TokenDialogue(
            vid=str(conv),
            tokens=np.asarray(self.Features[conv], dtype=np.int32),
            qmask=qmask,
            label=np.asarray(self.EmotionLabels[conv], dtype=np.int32),
        )

    def dialogues(self) -> List[TokenDialogue]:
        return [self[i] for i in range(len(self))]


def train_valid_split(n: int, valid_rate: float):
    """Index split mirroring reference ``get_train_valid_sampler``
    (``run_train_erc.py:29-33``): first ``valid_rate`` fraction is validation,
    rest is train (both then shuffled per-epoch by the batcher)."""
    split = int(valid_rate * n)
    idx = list(range(n))
    return idx[split:], idx[:split]
