"""Backend dispatch helpers shared by the ops package.

One canonical "should this op take its TPU/Pallas path" predicate: an
explicit ``jax_default_device`` pin wins (the test suite pins the CPU
backend for deterministic parity even though the TPU plugin stays
registered), else the process default backend decides. Previously this
logic was duplicated across six ops modules (round-4 review) — a dispatch
rule fix now lands in exactly one place.
"""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    """True when jitted ops without an explicit device will land on TPU."""
    dev = jax.config.jax_default_device
    platform = getattr(dev, "platform", None) or jax.default_backend()
    return platform == "tpu"
