from mmdfn_tpu.utils import torch_init
from mmdfn_tpu.utils.masking import (
    lengths_from_mask,
    mask_from_lengths,
    pair_mask,
    flip_valid,
)

__all__ = [
    "torch_init",
    "lengths_from_mask",
    "mask_from_lengths",
    "pair_mask",
    "flip_valid",
]
