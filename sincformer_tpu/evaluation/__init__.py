"""5-metric evaluation suite (SURVEY.md §2 L7).

Two tiers per metric:
  * ``compute_*`` — host-callable, reference-compatible entry points used by
    the CLI (same fallback semantics as the reference when the optional
    pystoi/pesq libs are absent).
  * ``*_jax`` — jit/vmap-able batched device versions used for PSO fitness,
    perceptual losses, and the sharded evaluation grid.
"""

from sincformer_tpu.evaluation.stoi import (  # noqa: F401
    compute_stoi, stoi_jax, stoi_full)
from sincformer_tpu.evaluation.pesq import compute_pesq, pesq_proxy_jax  # noqa: F401
from sincformer_tpu.evaluation.ssnr import (  # noqa: F401
    compute_ssnr, compute_ssnr_improvement, ssnr_jax)
from sincformer_tpu.evaluation.csii import compute_csii, csii_jax  # noqa: F401
from sincformer_tpu.evaluation.ncm import compute_ncm, ncm_jax  # noqa: F401
