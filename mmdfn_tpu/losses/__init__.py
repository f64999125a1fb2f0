from mmdfn_tpu.losses.losses import (
    focal_loss,
    masked_nll_loss,
    masked_mse_loss,
)

__all__ = ["focal_loss", "masked_nll_loss", "masked_mse_loss"]
