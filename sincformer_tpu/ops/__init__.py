"""Custom TPU kernels (Pallas) for ops XLA doesn't schedule well."""

from sincformer_tpu.ops.meddis_pallas import meddis_pallas  # noqa: F401
