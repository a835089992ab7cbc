"""Normalized Covariance Metric (reference ``evaluation/ncm.py``).

GFTB-filter both signals → Hilbert envelopes per channel → normalised
covariance → frequency-importance-weighted mean. The per-channel Python loop
of the reference (ncm.py:98-104) becomes one batched FFT-Hilbert + one
vectorised covariance over all 64 channels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sincformer_tpu import config as cfg
from sincformer_tpu.dsp.gammatone import GammatoneFilterbank
from sincformer_tpu.utils.signal import hilbert_envelope

_GFB_CACHE: dict = {}


def _gfb(fs: int) -> GammatoneFilterbank:
    if fs not in _GFB_CACHE:
        _GFB_CACHE[fs] = GammatoneFilterbank(sample_rate=fs)
    return _GFB_CACHE[fs]


def _channel_weights(center_freqs: np.ndarray) -> np.ndarray:
    """Speech-band importance weighting (ncm.py:107-119), normalised."""
    w = np.ones(len(center_freqs))
    for i, f in enumerate(center_freqs):
        if f < 300:
            w[i] = 0.3
        elif f < 1000:
            w[i] = 0.8
        elif f < 3400:
            w[i] = 1.0
        else:
            w[i] = 0.5
    return w / np.sum(w)


def ncm_jax(clean: jnp.ndarray, enhanced: jnp.ndarray,
            fs: int = 8000) -> jnp.ndarray:
    """Jittable NCM for equal-length (N,) waveforms."""
    gfb = _gfb(fs)
    cfb = gfb.filter(clean)        # (C, N)
    efb = gfb.filter(enhanced)
    env_c = hilbert_envelope(cfb)
    env_e = hilbert_envelope(efb)
    xc = env_c - jnp.mean(env_c, axis=-1, keepdims=True)
    xe = env_e - jnp.mean(env_e, axis=-1, keepdims=True)
    cov = jnp.mean(xc * xe, axis=-1)
    var_c = jnp.mean(xc ** 2, axis=-1)
    var_e = jnp.mean(xe ** 2, axis=-1)
    denom = jnp.sqrt(var_c * var_e)
    ncc = jnp.where(denom < 1e-10, 0.0, cov / jnp.maximum(denom, 1e-10))
    ncc = jnp.clip(ncc, -1.0, 1.0)
    w = jnp.asarray(_channel_weights(gfb.center_freqs), jnp.float32)
    return jnp.clip(jnp.sum(w * jnp.maximum(ncc, 0.0)), 0.0, 1.0)


def compute_ncm(clean_signal, enhanced_signal, fs: int | None = None,
                gfb=None) -> float:
    """Reference-compatible host entry point (ncm.py:58-124)."""
    acfg = cfg.DEFAULT.audio
    fs = fs or acfg.sample_rate
    m = min(len(clean_signal), len(enhanced_signal))
    if m < 64:
        return 0.0
    clean = jnp.asarray(np.asarray(clean_signal[:m], np.float64), jnp.float32)
    enhanced = jnp.asarray(np.asarray(enhanced_signal[:m], np.float64),
                           jnp.float32)
    return float(ncm_jax(clean, enhanced, fs))
