"""Windowing / framing / transform primitives shared across the DSP stack.

Everything here is a pure ``jnp`` function with static shapes so it can be
jitted, vmapped, and fused by XLA.  Framing is expressed as a gather with a
precomputed index grid — XLA lowers this to an efficient strided copy and the
downstream rFFT/matmul batches over the frame axis (one big kernel instead of
the reference's per-frame Python loops, e.g. gammatone.py:185-192).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


# ─── Windows ─────────────────────────────────────────────────────────────────

def hamming_window(n: int, periodic: bool = False) -> jnp.ndarray:
    """Hamming window.

    ``periodic=False`` matches ``scipy.signal.windows.hamming`` (used by the
    reference's feature extractors, features.py:69) with the N-1 denominator;
    ``periodic=True`` matches ``torch.hamming_window`` defaults.
    """
    denom = n if periodic else n - 1
    k = np.arange(n)
    return (0.54 - 0.46 * np.cos(2.0 * np.pi * k / denom)).astype(np.float32)


def hann_window(n: int, periodic: bool = True) -> jnp.ndarray:
    """Hann window.

    ``periodic=True`` matches ``torch.hann_window`` (used by the reference's
    DCSE STFT, conformer_pipeline.py:198); ``periodic=False`` matches
    ``np.hanning`` (used in the DNN inference path, pipeline.py:886).
    """
    denom = n if periodic else n - 1
    k = np.arange(n)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / denom)).astype(np.float32)


# ─── Framing ─────────────────────────────────────────────────────────────────

def num_frames(n_samples: int, frame_size: int, hop: int) -> int:
    """The reference's universal uncentered frame count convention
    ``(N - L)//H + 1`` (gammatone.py:151, ssnr.py:53, features.py:159)."""
    return max(0, (n_samples - frame_size) // hop + 1)


def frame_signal(x: jnp.ndarray, frame_size: int, hop: int) -> jnp.ndarray:
    """Slice ``x`` into overlapping frames along its last axis.

    Args:
        x: (..., N) signal.
        frame_size: samples per frame.
        hop: hop between frame starts.

    Returns:
        (..., T, frame_size) with T = (N - frame_size)//hop + 1.
    """
    n = x.shape[-1]
    t = num_frames(n, frame_size, hop)
    if t == 0:
        return jnp.zeros(x.shape[:-1] + (0, frame_size), dtype=x.dtype)
    # index grid: (T, frame_size)
    idx = (np.arange(t)[:, None] * hop + np.arange(frame_size)[None, :])
    return x[..., idx]


def overlap_add(frames: jnp.ndarray, hop: int, out_len: int) -> jnp.ndarray:
    """Inverse of :func:`frame_signal`: sum overlapping frames.

    Args:
        frames: (..., T, L) frames.
        hop: hop size used when framing.
        out_len: output length (extra tail is dropped, shortfall zero-padded).

    Returns:
        (..., out_len) signal.
    """
    t, length = frames.shape[-2], frames.shape[-1]
    if t == 0:
        return jnp.zeros(frames.shape[:-2] + (out_len,), frames.dtype)
    batch = frames.shape[:-2]
    # Scatter-free formulation: pad the frame length to k·hop, split every
    # frame into k hop-sized blocks, and overlap-add becomes k SHIFTED
    # CONTIGUOUS adds of (T·hop)-long planes — static-slice updates XLA
    # fuses into pad+add, instead of a gather/scatter (which round-2
    # profiling showed costing ~28 % of DCSE end-to-end inside iSTFT).
    k = -(-length // hop)
    frames_p = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1)
                       + [(0, k * hop - length)])
    parts = frames_p.reshape(batch + (t, k, hop))
    pad_to = max((t - 1) * hop + length, out_len, (t + k - 1) * hop)
    out = jnp.zeros(batch + (pad_to,), dtype=frames.dtype)
    for j in range(k):
        plane = parts[..., :, j, :].reshape(batch + (t * hop,))
        out = out.at[..., j * hop:(j + t) * hop].add(plane)
    return out[..., :out_len]


# ─── DCT ─────────────────────────────────────────────────────────────────────

@functools.lru_cache(maxsize=32)
def dct_matrix(n: int, n_out: int | None = None) -> jnp.ndarray:
    """Orthonormal DCT-II matrix, rows = output coefficients.

    ``y = D @ x`` equals ``scipy.fftpack.dct(x, type=2, norm='ortho')[:n_out]``
    (the reference's cepstral transform, features.py:218,320,374).
    Materialised as a matmul so batched DCTs ride the MXU.
    """
    n_out = n_out or n
    k = np.arange(n_out)[:, None]
    j = np.arange(n)[None, :]
    d = np.cos(np.pi * k * (2 * j + 1) / (2 * n)) * 2.0
    # scipy ortho norm: f0 = sqrt(1/(4N)), fk = sqrt(1/(2N))
    d = d * np.where(k == 0, np.sqrt(1.0 / (4.0 * n)), np.sqrt(1.0 / (2.0 * n)))
    return d.astype(np.float32)


def dct_ortho(x: jnp.ndarray, n_out: int | None = None) -> jnp.ndarray:
    """DCT-II (ortho) along the last axis, truncated to ``n_out`` coeffs."""
    d = dct_matrix(x.shape[-1], n_out)
    return jnp.einsum("kn,...n->...k", d, x)


# ─── Resampling ──────────────────────────────────────────────────────────────

def resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resampler matching the reference's librosa-less
    fallback (pipeline.py:62-66). Host-side NumPy (data loading only)."""
    if sr_in == sr_out:
        return x
    new_len = int(len(x) * sr_out / sr_in)
    idx = np.linspace(0, len(x) - 1, new_len)
    return np.interp(idx, np.arange(len(x)), x).astype(np.float32)


def resample_poly_fft(x: jnp.ndarray, sr_in: int, sr_out: int) -> jnp.ndarray:
    """FFT-domain resampler (jit-able) for metric-internal rate conversion
    (e.g. STOI's 10 kHz analysis rate). Matches scipy.signal.resample
    semantics for real inputs along the last axis."""
    if sr_in == sr_out:
        return x
    n = x.shape[-1]
    m = int(round(n * sr_out / sr_in))
    spec = jnp.fft.rfft(x, axis=-1)
    n_bins_out = m // 2 + 1
    n_bins_in = spec.shape[-1]
    if n_bins_out <= n_bins_in:
        spec = spec[..., :n_bins_out]
        # Nyquist handling for even input lengths downsampling
        if m % 2 == 0 and n_bins_out < n_bins_in:
            spec = spec.at[..., -1].set(spec[..., -1].real * 2.0 + 0.0j)
    else:
        pad = [(0, 0)] * (spec.ndim - 1) + [(0, n_bins_out - n_bins_in)]
        spec = jnp.pad(spec, pad)
    out = jnp.fft.irfft(spec, n=m, axis=-1) * (m / n)
    return out.astype(x.dtype)


def hilbert_envelope(x: jnp.ndarray) -> jnp.ndarray:
    """|analytic signal| along the last axis (NCM's temporal envelope,
    evaluation/ncm.py:25-32). FFT-based, batched."""
    n = x.shape[-1]
    spec = jnp.fft.fft(x, axis=-1)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1.0
        h[1:n // 2] = 2.0
    else:
        h[0] = 1.0
        h[1:(n + 1) // 2] = 2.0
    analytic = jnp.fft.ifft(spec * jnp.asarray(h), axis=-1)
    return jnp.abs(analytic)


def pcm_to_float(wav: jnp.ndarray) -> jnp.ndarray:
    """Dequantize an int16 PCM wire tensor to float32 on DEVICE (trace-time
    dtype dispatch — a no-op for float input).

    Serving transfers audio to the accelerator as raw int16 PCM (its
    native container format) and dequantizes inside the jitted program:
    half the host→device bytes of float32, exact for PCM-sourced audio.
    Used by every pipeline's enhance path; StreamingEnhancer forwards
    int16 input through untouched.
    """
    if wav.dtype == jnp.int16:
        return wav.astype(jnp.float32) * (1.0 / 32768.0)
    return wav


def float_to_pcm(wav: jnp.ndarray) -> jnp.ndarray:
    """Quantize float32 audio in [-1, 1] to int16 PCM on DEVICE.

    Inverse of :func:`pcm_to_float` (up to the ±0.5 LSB rounding floor,
    ~90 dB SNR — below any enhancement metric's sensitivity). Serving
    uses it to bring enhanced audio back over the host↔device wire as
    int16: half the device→host bytes of float32, and the natural
    container when the caller writes PCM16 WAV output anyway.
    """
    scaled = jnp.clip(wav * 32768.0, -32768.0, 32767.0)
    return jnp.round(scaled).astype(jnp.int16)
