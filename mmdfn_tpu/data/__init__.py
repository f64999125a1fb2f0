from mmdfn_tpu.data.datasets import (
    IEMOCAPDataset,
    MELDDataset,
    DailyDialogueDataset,
    FEAT2DIM,
)
from mmdfn_tpu.data.batching import Batch, BucketBatcher, make_epoch_batches
from mmdfn_tpu.data.synthetic import (
    make_synthetic_iemocap_pickle,
    make_synthetic_meld_pickle,
)

__all__ = [
    "IEMOCAPDataset",
    "MELDDataset",
    "DailyDialogueDataset",
    "FEAT2DIM",
    "Batch",
    "BucketBatcher",
    "make_epoch_batches",
    "make_synthetic_iemocap_pickle",
    "make_synthetic_meld_pickle",
]
