"""Oracle T-F masks (SURVEY.md §2 L2)."""

from sincformer_tpu.masks.irm import compute_irm, apply_irm  # noqa: F401
from sincformer_tpu.masks.pcirm import (  # noqa: F401
    compute_correlation_coefficients,
    compute_phase_differences,
    compute_pcirm,
    compute_pcirm_from_signals,
    apply_pcirm,
)
from sincformer_tpu.masks.opt_pcirm import (  # noqa: F401
    compute_snr_boundaries,
    quantize_pcirm,
    compute_opt_pcirm,
    apply_opt_pcirm,
)
