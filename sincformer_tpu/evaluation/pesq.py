"""PESQ (ITU-T P.862) wrapper + log-spectral-distortion proxy.

Mirrors the reference (``evaluation/pesq_eval.py``): true PESQ comes from the
C ``pesq`` library when installed; otherwise the simplified LSD-based proxy
(pesq_eval.py:51-85) is used — the same affine map into [-0.5, 4.5]. The
proxy is also provided as a jit/vmap-able device function for batched grid
evaluation (:func:`pesq_proxy_jax`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sincformer_tpu import config as cfg
from sincformer_tpu.utils.signal import frame_signal


def pesq_proxy_jax(clean: jnp.ndarray, enhanced: jnp.ndarray,
                   fs: int = 8000) -> jnp.ndarray:
    """Batched LSD→PESQ proxy identical to ``_pesq_simplified``
    (pesq_eval.py:51-85): 32 ms frames, 50% hop, log-spectral distortion,
    affine map 4.5 − 0.5·LSD clipped to [-0.5, 4.5].
    """
    frame_size = int(0.032 * fs)
    hop = frame_size // 2
    cf = frame_signal(clean, frame_size, hop)
    ef = frame_signal(enhanced, frame_size, hop)
    cs = jnp.abs(jnp.fft.rfft(cf, axis=-1))
    es = jnp.abs(jnp.fft.rfft(ef, axis=-1))
    lsd = jnp.sqrt(jnp.mean(
        (jnp.log(cs + 1e-10) - jnp.log(es + 1e-10)) ** 2, axis=-1))
    approx = 4.5 - jnp.mean(lsd) * 0.5
    return jnp.clip(approx, -0.5, 4.5)


def _pesq_lsd_proxy(clean: np.ndarray, enhanced: np.ndarray,
                    fs: int) -> float:
    """The reference's fallback (pesq_eval.py:51-85), host entry point."""
    frame_size = int(0.032 * fs)
    if min(len(clean), len(enhanced)) < frame_size:
        return 1.0
    return float(pesq_proxy_jax(jnp.asarray(clean, jnp.float32),
                                jnp.asarray(enhanced, jnp.float32), fs))


def compute_pesq(clean_signal, enhanced_signal, fs: int | None = None,
                 mode: str | None = None, impl: str | None = None) -> float:
    """Reference-compatible PESQ entry point (pesq_eval.py:19-48).

    Implementation chain (``impl`` / ``config.EvalConfig.pesq_impl``):
    "auto" → ITU C library if installed, else native P.862
    (evaluation/p862.py); "clib" / "native" / "proxy" force one source.
    """
    acfg = cfg.DEFAULT.audio
    ecfg = cfg.DEFAULT.eval
    fs = fs or acfg.sample_rate
    mode = mode or ecfg.pesq_mode
    impl = impl or getattr(ecfg, "pesq_impl", "auto")
    m = min(len(clean_signal), len(enhanced_signal))
    clean = np.asarray(clean_signal[:m], np.float64)
    enhanced = np.asarray(enhanced_signal[:m], np.float64)
    if impl in ("auto", "clib"):
        try:
            from pesq import pesq as _pesq
            return float(_pesq(fs, clean, enhanced, mode))
        except ImportError:
            if impl == "clib":
                raise
        except Exception as e:  # P.862 C code can fail on very short input
            print(f"PESQ computation failed: {e}")
            return 0.0
    if impl in ("auto", "native"):
        try:
            from sincformer_tpu.evaluation.p862 import pesq_p862
            return pesq_p862(clean, enhanced, fs)
        except Exception as e:
            if impl == "native":
                raise
            print(f"native P.862 failed ({e}); falling back to LSD proxy")
    return _pesq_lsd_proxy(clean, enhanced, fs)
