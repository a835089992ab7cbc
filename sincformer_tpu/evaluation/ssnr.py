"""Segmental SNR (reference ``evaluation/ssnr.py``).

Per-frame 10·log10(Σclean² / Σ(clean−enh)²), clipped to [-10, 35] dB, silent
frames (clean power < 1e-10) excluded, mean over remaining frames.
Vectorised with a masked mean so it jits with static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sincformer_tpu import config as cfg
from sincformer_tpu.utils.signal import frame_signal


def ssnr_jax(clean: jnp.ndarray, enhanced: jnp.ndarray,
             frame_size: int = 160, hop: int = 80,
             upper_bound: float = 35.0, lower_bound: float = -10.0
             ) -> jnp.ndarray:
    """Batched SSNR matching ssnr.py:26-92 exactly (incl. the
    error_power<1e-10 → upper-bound rule and silent-frame skipping).

    Args:
        clean, enhanced: (N,) equal-length waveforms.

    Returns:
        scalar SSNR in dB (0.0 when no voiced frames, like the reference).
    """
    cf = frame_signal(clean, frame_size, hop)     # (T, L)
    ef = frame_signal(enhanced, frame_size, hop)
    speech_power = jnp.sum(cf ** 2, axis=-1)
    error_power = jnp.sum((cf - ef) ** 2, axis=-1)
    snr = 10.0 * jnp.log10(jnp.maximum(speech_power, 1e-30)
                           / jnp.maximum(error_power, 1e-30))
    snr = jnp.where(error_power < 1e-10, upper_bound, snr)
    snr = jnp.clip(snr, lower_bound, upper_bound)
    voiced = speech_power >= 1e-10
    count = jnp.sum(voiced)
    total = jnp.sum(jnp.where(voiced, snr, 0.0))
    return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)


def compute_ssnr(clean_signal, enhanced_signal, fs: int | None = None,
                 frame_size: int | None = None, hop_size: int | None = None,
                 upper_bound: float = 35.0, lower_bound: float = -10.0
                 ) -> float:
    """Reference-compatible host entry point (ssnr.py:26-92)."""
    acfg = cfg.DEFAULT.audio
    frame_size = frame_size or acfg.frame_size
    hop_size = hop_size or acfg.hop_size
    m = min(len(clean_signal), len(enhanced_signal))
    if (m - frame_size) // hop_size + 1 < 1:
        return 0.0
    clean = jnp.asarray(np.asarray(clean_signal[:m], np.float64), jnp.float32)
    enhanced = jnp.asarray(np.asarray(enhanced_signal[:m], np.float64),
                           jnp.float32)
    return float(ssnr_jax(clean, enhanced, frame_size, hop_size,
                          upper_bound, lower_bound))


def compute_ssnr_improvement(clean_signal, noisy_signal, enhanced_signal,
                             fs: int | None = None) -> float:
    """Output SSNR − input SSNR (ssnr.py:95-111)."""
    return (compute_ssnr(clean_signal, enhanced_signal, fs)
            - compute_ssnr(clean_signal, noisy_signal, fs))
