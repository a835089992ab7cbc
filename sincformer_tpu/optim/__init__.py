"""Classical optimizers (SURVEY.md §2 L3)."""

from sincformer_tpu.optim.pso import ParticleSwarmOptimizer  # noqa: F401
