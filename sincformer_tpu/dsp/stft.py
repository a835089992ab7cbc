"""Batched STFT / iSTFT with torch-compatible semantics.

The reference uses two different STFTs:

  * DCSE: ``torch.stft(center=True, pad_mode='reflect')`` with a periodic
    hann window padded to ``n_fft`` (conformer_pipeline.py:196-211).
  * DNN inference: a manual uncentered rfft loop with a *symmetric* hann
    window of ``frame_size`` (pipeline.py:886-894).

Both are provided here as single fused XLA computations: frame (gather) →
window (elementwise, fused) → one batched rFFT. Layout is (batch, T, F) to
match the models' time-major convention.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sincformer_tpu.utils.signal import (frame_signal, hann_window,
                                         num_frames, overlap_add)


def _padded_window(window, n_fft: int) -> np.ndarray:
    """Center-pad a win_length window to n_fft (torch.stft behaviour).
    Host NumPy: windows are compile-time constants, never traced values."""
    window = np.asarray(window, np.float32)
    win_length = window.shape[0]
    left = (n_fft - win_length) // 2
    return np.pad(window, (left, n_fft - win_length - left))


def stft(x: jnp.ndarray, n_fft: int = 256, hop: int = 80,
         win_length: int = 160, window: jnp.ndarray | None = None,
         center: bool = True) -> jnp.ndarray:
    """Complex STFT matching ``torch.stft`` (conformer_pipeline.py:196-202).

    Args:
        x: (..., N) real waveform.
        n_fft: FFT size.
        hop: hop length.
        win_length: window length (padded to n_fft).
        window: window of shape (win_length,); default periodic hann.
        center: reflect-pad by n_fft//2 on both sides (torch default).

    Returns:
        complex64 array (..., T, n_fft//2+1) with T = N//hop + 1 when centered.
    """
    if window is None:
        window = hann_window(win_length, periodic=True)
    w = _padded_window(window, n_fft)
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x, n_fft, hop)          # (..., T, n_fft)
    return jnp.fft.rfft(frames * w, n=n_fft, axis=-1)


def istft(spec: jnp.ndarray, n_fft: int = 256, hop: int = 80,
          win_length: int = 160, window: jnp.ndarray | None = None,
          length: int | None = None, center: bool = True,
          eps: float = 1e-11) -> jnp.ndarray:
    """Inverse STFT matching ``torch.istft`` (conformer_pipeline.py:205-211).

    Overlap-adds windowed inverse rFFTs and normalises by the summed squared
    window (COLA normalisation).

    Args:
        spec: (..., T, n_fft//2+1) complex spectrogram.
        length: target output length (before-center-trim semantics of torch).

    Returns:
        (..., length) real waveform.
    """
    if window is None:
        window = hann_window(win_length, periodic=True)
    w = _padded_window(window, n_fft)
    t = spec.shape[-2]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * w  # (..., T, n_fft)
    total = (t - 1) * hop + n_fft
    y = overlap_add(frames, hop, total)
    # window-square normalisation
    wsq = jnp.tile(jnp.asarray(w * w), (t, 1))
    norm = overlap_add(wsq, hop, total)
    y = y / jnp.maximum(norm, eps)
    if center:
        y = y[..., n_fft // 2:]
    if length is not None:
        out_len = y.shape[-1]
        if out_len >= length:
            y = y[..., :length]
        else:
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, length - out_len)])
    return y


def stft_uncentered(x: jnp.ndarray, frame_size: int = 160, hop: int = 80,
                    n_fft: int = 256,
                    window: jnp.ndarray | None = None) -> jnp.ndarray:
    """Uncentered STFT used by the DNN inference path (pipeline.py:886-894):
    symmetric hann window of frame_size, zero-padded rfft to n_fft.

    Returns:
        (..., T, n_fft//2+1) complex, T = (N - frame_size)//hop + 1.
    """
    if window is None:
        window = hann_window(frame_size, periodic=False)
    frames = frame_signal(x, frame_size, hop)
    return jnp.fft.rfft(frames * window, n=n_fft, axis=-1)


def istft_uncentered(spec: jnp.ndarray, out_len: int, frame_size: int = 160,
                     hop: int = 80, n_fft: int = 256,
                     window: jnp.ndarray | None = None,
                     eps: float = 1e-8) -> jnp.ndarray:
    """Masked-frame overlap-add reconstruction matching the DNN inference
    path (pipeline.py:917-934): irfft → truncate to frame_size → ×window →
    OLA → divide by summed window².
    """
    if window is None:
        window = hann_window(frame_size, periodic=False)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)[..., :frame_size] * window
    t = spec.shape[-2]
    y = overlap_add(frames, hop, out_len)
    wsq = jnp.tile(window * window, (t, 1))
    norm = overlap_add(wsq, hop, out_len)
    norm = jnp.where(norm < eps, 1.0, norm)
    return y / norm


def stft_frame_count(n_samples: int, hop: int = 80, center: bool = True,
                     frame_size: int = 160) -> int:
    """Frame-count helper for both conventions."""
    if center:
        return n_samples // hop + 1
    return num_frames(n_samples, frame_size, hop)
