"""SincNet parameterised band-pass layer.

Capability-parity with the reference (``agents/perception.py:23-118``;
Ravanelli & Bengio 2018): the layer learns only (low, band) cutoffs per
filter, ERB-initialised; hamming-windowed sinc band-pass kernels are
synthesised *inside the forward pass* (cheap elementwise math) and applied
as one grouped conv — the filter synthesis fuses into the conv epilogue
under XLA, so the learnable filterbank costs the same as a fixed one.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from sincformer_tpu import config as cfg


def _erb_init_points(out_channels: int, sample_rate: int,
                     min_low_hz: float, min_band_hz: float) -> np.ndarray:
    """ERB-spaced init frequencies (reference perception.py:50-59, which uses
    the 21.4·log10(1+f/228.7) ERB-number variant)."""
    low_hz = min_low_hz
    high_hz = sample_rate / 2 - min_band_hz
    erb_low = 21.4 * math.log10(1 + low_hz / 228.7)
    erb_high = 21.4 * math.log10(1 + high_hz / 228.7)
    erb_points = np.linspace(erb_low, erb_high, out_channels + 1)
    return 228.7 * (10 ** (erb_points / 21.4) - 1)


class SincConv1d(nn.Module):
    """(B, N) or (B, 1, N) waveform → (B, out_channels, T) band-pass bank."""

    out_channels: int = 64
    kernel_size: int = 251
    sample_rate: int = 8000
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0
    stride: int = 1
    channels_last: bool = False   # emit (B, T, C) straight from the conv —
                                  # saves a 0.5 GB/batch transpose pass for
                                  # consumers in channels-last layout

    @nn.compact
    def __call__(self, waveform: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size + (1 - self.kernel_size % 2)  # force odd
        hz = _erb_init_points(self.out_channels, self.sample_rate,
                              self.min_low_hz, self.min_band_hz)
        low_hz = self.param("low_hz",
                            lambda *_: jnp.asarray(hz[:-1], jnp.float32))
        band_hz = self.param("band_hz",
                             lambda *_: jnp.asarray(np.diff(hz), jnp.float32))

        low = self.min_low_hz + jnp.abs(low_hz)                    # (C,)
        high = jnp.clip(low + self.min_band_hz + jnp.abs(band_hz),
                        max=self.sample_rate / 2.0)
        f_low = (low / self.sample_rate)[:, None]
        f_high = (high / self.sample_rate)[:, None]

        # left half of the symmetric sinc kernel (perception.py:74-108)
        half = (k - 1) // 2
        n_left = (2 * math.pi * np.arange(-half, 0)
                  / self.sample_rate)[None, :]                     # (1, half)
        n_left = jnp.asarray(n_left, jnp.float32)
        band_left = ((jnp.sin(f_high * n_left) - jnp.sin(f_low * n_left))
                     / (n_left / 2.0 + 1e-8))
        band_center = 2.0 * (f_high - f_low)                       # (C, 1)
        band_right = band_left[:, ::-1]
        kernel = jnp.concatenate([band_left, band_center, band_right],
                                 axis=1)                           # (C, k)

        window = jnp.asarray(
            0.54 - 0.46 * np.cos(2 * math.pi * np.arange(k) / k),
            jnp.float32)
        kernel = kernel * window
        kernel = kernel / (jnp.sum(jnp.abs(kernel), axis=1,
                                   keepdims=True) + 1e-8)

        if waveform.ndim == 2:
            waveform = waveform[:, None, :]                        # (B,1,N)
        # synthesis stays f32 (sin/normalise precision); the conv runs in
        # the waveform's dtype so bf16 inference works end-to-end
        y = jax.lax.conv_general_dilated(
            waveform, kernel[:, None, :].astype(waveform.dtype),
            window_strides=(self.stride,),
            padding=[(k // 2, k // 2)],
            dimension_numbers=("NCW", "OIW",
                               "NWC" if self.channels_last else "NCW"))
        return y                                        # (B,C,T) | (B,T,C)
