"""Coherence Speech Intelligibility Index (reference ``evaluation/csii.py``).

Three-level CSII: magnitude-squared coherence (Welch, 16 ms hamming, 50%
overlap, 256-pt FFT) weighted by an SII-like band-importance function,
averaged over three amplitude regions.

NOTE (parity): the reference computes the *same* whole-signal coherence for
each amplitude level (csii.py:190-196 — the region indices only gate the
"enough samples" check), so the three levels are identical unless a region is
too small. We reproduce that behaviour exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sincformer_tpu import config as cfg
from sincformer_tpu.utils.signal import frame_signal, hamming_window


def _sii_weights(n_freq: int, fs: int, num_fft: int) -> np.ndarray:
    """Piecewise band-importance weights (csii.py:71-97), normalised."""
    freqs = np.arange(n_freq) * fs / num_fft
    w = np.ones(n_freq)
    w[freqs < 4000] = 0.9
    w[freqs < 2000] = 1.0
    w[freqs < 1000] = 0.8
    w[freqs < 500] = 0.5
    w[freqs < 200] = 0.0
    w[freqs >= 4000] = 0.4
    return w / (np.sum(w) + 1e-10)


def msc_jax(x: jnp.ndarray, y: jnp.ndarray, frame_size: int, hop: int,
            num_fft: int) -> jnp.ndarray:
    """Welch magnitude-squared coherence |Pxy|²/(Pxx·Pyy)
    (csii.py:25-68), batched over frames on device."""
    win = hamming_window(frame_size, periodic=False)
    xf = frame_signal(x, frame_size, hop) * win
    yf = frame_signal(y, frame_size, hop) * win
    xs = jnp.fft.rfft(xf, n=num_fft, axis=-1)
    ys = jnp.fft.rfft(yf, n=num_fft, axis=-1)
    pxx = jnp.mean(jnp.abs(xs) ** 2, axis=-2)
    pyy = jnp.mean(jnp.abs(ys) ** 2, axis=-2)
    pxy = jnp.mean(xs * jnp.conj(ys), axis=-2)
    msc = jnp.abs(pxy) ** 2 / (pxx * pyy + 1e-10)
    return jnp.clip(msc, 0.0, 1.0)


def csii_jax(clean: jnp.ndarray, enhanced: jnp.ndarray,
             fs: int = 8000) -> jnp.ndarray:
    """Jittable CSII for the (common) case where all three amplitude regions
    are large enough — then all levels share the whole-signal coherence
    (see module note), so CSII = Σ w·MSC."""
    frame_size = int(0.016 * fs)
    hop = frame_size // 2
    num_fft = 256
    msc = msc_jax(clean, enhanced, frame_size, hop, num_fft)
    w = jnp.asarray(_sii_weights(num_fft // 2 + 1, fs, num_fft), jnp.float32)
    return jnp.clip(jnp.sum(w * msc), 0.0, 1.0)


def compute_csii(clean_signal, enhanced_signal, fs: int | None = None,
                 num_levels: int = 3) -> float:
    """Reference-compatible three-level CSII (csii.py:145-200), including the
    small-region zero rule."""
    acfg = cfg.DEFAULT.audio
    fs = fs or acfg.sample_rate
    m = min(len(clean_signal), len(enhanced_signal))
    clean = np.asarray(clean_signal[:m], np.float64)
    enhanced = np.asarray(enhanced_signal[:m], np.float64)

    frame_size = int(0.016 * fs)
    hop = frame_size // 2
    num_fft = 256
    n_freq = num_fft // 2 + 1
    w = _sii_weights(n_freq, fs, num_fft)

    # amplitude-region split (csii.py:100-142)
    nf = (m - frame_size) // hop + 1
    if nf < num_levels:
        regions = [np.arange(m)] * num_levels
    else:
        rms = np.sqrt(np.mean(
            np.stack([clean[i * hop:i * hop + frame_size]
                      for i in range(nf)]) ** 2, axis=1))
        order = np.argsort(rms)
        per = nf // num_levels
        regions = []
        for lvl in range(num_levels):
            lo = lvl * per
            hi = nf if lvl == num_levels - 1 else (lvl + 1) * per
            idx = []
            for fi in order[lo:hi]:
                s = fi * hop
                idx.extend(range(s, min(s + frame_size, m)))
            regions.append(np.array(idx))

    if nf < 1:
        return 0.0
    msc = np.asarray(msc_jax(jnp.asarray(clean, jnp.float32),
                             jnp.asarray(enhanced, jnp.float32),
                             frame_size, hop, num_fft))
    whole = float(np.clip(np.sum(w * msc), 0.0, 1.0))

    levels = []
    for idx in regions:
        idx = idx[idx < m]
        if len(idx) < frame_size:
            levels.append(0.0)
        else:
            levels.append(whole)
    return float(np.mean(levels))
