"""Training engines (SURVEY.md §2 L6)."""

from sincformer_tpu.train.losses import (  # noqa: F401
    si_snr_loss,
    multi_resolution_stft_loss,
    mse_mask_loss,
    PerceptualSTOILoss,
    perceptual_stoi_loss,
)
from sincformer_tpu.train.curriculum import CurriculumScheduler  # noqa: F401
