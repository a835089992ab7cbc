"""Seedable synthetic speech/noise generators (reference main.py:51-66).

Used by the zero-data `demo` CLI, tests, and benchmarks.
"""

from __future__ import annotations

import numpy as np

from sincformer_tpu import config as cfg


def synthetic_speech(duration: float = 2.0, fs: int | None = None
                     ) -> np.ndarray:
    """Formant-sum "speech": 5 sinusoids × √|sin 3 Hz| envelope, peak-normed
    (exactly the reference demo signal, main.py:51-63)."""
    fs = fs or cfg.DEFAULT.audio.sample_rate
    t = np.linspace(0, duration, int(fs * duration), endpoint=False)
    clean = (0.5 * np.sin(2 * np.pi * 250 * t)
             + 0.3 * np.sin(2 * np.pi * 500 * t)
             + 0.2 * np.sin(2 * np.pi * 1000 * t)
             + 0.15 * np.sin(2 * np.pi * 2000 * t)
             + 0.1 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)
    envelope = np.abs(np.sin(2 * np.pi * 3 * t)) ** 0.5
    clean = clean * envelope
    return (clean / np.max(np.abs(clean))).astype(np.float32)


def synthetic_noise(num_samples: int, scale: float = 0.3,
                    seed: int | None = None) -> np.ndarray:
    """White noise (reference main.py:66 / pipeline fallback noise)."""
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(num_samples) * scale).astype(np.float32)
