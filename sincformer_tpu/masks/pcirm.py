"""Phase-Correlation Ideal Ratio Mask (reference masks/pcirm.py).

Z = ρs·|Cs·cosφ1|² / (ρs·|Cs·cosφ1|² + ρn·|Zn·cosφ2|²)

Both the 2-D (per-unit scalar) and 3-D (per-frame inner product) correlation
branches of the reference are kept (pcirm.py:48-66) — including the
degenerate behaviour of the 2-D branch on positive magnitudes documented in
SURVEY.md §0.3, since the wired pipelines rely on it.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_correlation_coefficients(noisy_frames, clean_frames, noise_frames,
                                     eps: float = 1e-10,
                                     per_unit: bool | None = None):
    """ρs, ρn per T-F unit (reference pcirm.py:22-72).

    2-D input (C, T) → elementwise normalised product (pcirm.py:48-56);
    ≥3-D input (..., C, T, L) → inner product over the last sample axis
    (pcirm.py:57-66). ``per_unit`` overrides the ndim dispatch — pass
    ``True`` for *batched* per-unit magnitudes (B, C, T), which must use the
    elementwise branch like the unbatched pipelines do.
    """
    if per_unit is None:
        per_unit = noisy_frames.ndim < 3
    if not per_unit:
        inner_s = jnp.sum(noisy_frames * clean_frames, axis=-1)
        norm_ns = jnp.sqrt(jnp.sum(noisy_frames ** 2, axis=-1) + eps)
        norm_cs = jnp.sqrt(jnp.sum(clean_frames ** 2, axis=-1) + eps)
        rho_s = inner_s / (norm_ns * norm_cs)
        inner_n = jnp.sum(noisy_frames * noise_frames, axis=-1)
        norm_zn = jnp.sqrt(jnp.sum(noise_frames ** 2, axis=-1) + eps)
        rho_n = inner_n / (norm_ns * norm_zn)
    else:
        rho_s = (noisy_frames * clean_frames) / (
            jnp.sqrt(noisy_frames ** 2 + eps) * jnp.sqrt(clean_frames ** 2 + eps))
        rho_n = (noisy_frames * noise_frames) / (
            jnp.sqrt(noisy_frames ** 2 + eps) * jnp.sqrt(noise_frames ** 2 + eps))
    rho_s = jnp.clip(jnp.abs(rho_s), 0.0, 1.0)
    rho_n = jnp.clip(jnp.abs(rho_n), 0.0, 1.0)
    return rho_s, rho_n


def compute_phase_differences(noisy_phase, clean_phase, noise_phase):
    """φ1 = clean−noisy, φ2 = noise−noisy (reference pcirm.py:75-92)."""
    return clean_phase - noisy_phase, noise_phase - noisy_phase


def compute_pcirm(clean_mag, noise_mag, rho_s, rho_n, phi1, phi2,
                  eps: float = 1e-10):
    """Eq. 5 soft mask in [0, 1] (reference pcirm.py:95-127)."""
    speech = rho_s * (jnp.abs(clean_mag) * jnp.abs(jnp.cos(phi1))) ** 2
    noise = rho_n * (jnp.abs(noise_mag) * jnp.abs(jnp.cos(phi2))) ** 2
    return jnp.clip(speech / (speech + noise + eps), 0.0, 1.0)


def compute_pcirm_from_signals(noisy_frames, clean_frames, noise_frames,
                               noisy_phase, clean_phase, noise_phase,
                               clean_mag, noise_mag, eps: float = 1e-10):
    """Convenience wrapper (reference pcirm.py:130-158)."""
    rho_s, rho_n = compute_correlation_coefficients(
        noisy_frames, clean_frames, noise_frames, eps)
    phi1, phi2 = compute_phase_differences(noisy_phase, clean_phase,
                                           noise_phase)
    pcirm = compute_pcirm(clean_mag, noise_mag, rho_s, rho_n, phi1, phi2, eps)
    return pcirm, rho_s, rho_n, phi1, phi2


def apply_pcirm(noisy_tf, pcirm):
    """Enhanced = PCIRM ⊙ Noisy (pcirm.py:161-173)."""
    return noisy_tf * pcirm
