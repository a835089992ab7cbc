"""Ideal Ratio Mask — Z = (S²/(S²+N²))^p (reference masks/irm.py:17-52).

Vectorised jnp; works on any shape / batch layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_irm(clean_mag, noise_mag, p: float = 0.5, eps: float = 1e-10):
    """IRM in [0, 1]. ``clean_mag``/``noise_mag`` are per-T-F magnitudes
    (squared inside, matching irm.py:31-34)."""
    clean_power = jnp.abs(clean_mag) ** 2
    noise_power = jnp.abs(noise_mag) ** 2
    ratio = clean_power / (clean_power + noise_power + eps)
    return jnp.clip(ratio ** p, 0.0, 1.0)


def apply_irm(noisy_tf, irm):
    """Enhanced = IRM ⊙ Noisy (irm.py:40-52)."""
    return noisy_tf * irm
