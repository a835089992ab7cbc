"""Short-Time Objective Intelligibility.

Three implementations, mirroring and extending the reference
(``evaluation/stoi.py``):

  * :func:`stoi_jax` — jit/vmap-able per-frame spectral-correlation STOI,
    numerically identical to the reference's pystoi-less fallback
    (stoi.py:53-99). This is what the reference itself computes in any
    environment without pystoi, and it is the PSO fitness function
    (opt_pcirm.py:146-183) — batched on device here.
  * :func:`stoi_full` — faithful Taal et al. (2011) STOI (the pystoi
    algorithm: 10 kHz analysis rate, silent-frame removal, 15 one-third
    octave bands, 384 ms segments, -15 dB clipping). Host NumPy/SciPy.
  * :func:`compute_stoi` — reference-compatible dispatcher: pystoi if
    installed, else the simplified fallback (bit-parity with the reference
    as it runs in this environment).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sincformer_tpu import config as cfg
from sincformer_tpu.utils.signal import frame_signal, hann_window


# ─── Simplified STOI (reference fallback, jittable) ──────────────────────────

def _stoi_frames(clean: jnp.ndarray, enhanced: jnp.ndarray, fs: int):
    """Shared framing/normalisation for the simplified STOI."""
    frame_len = int(0.0256 * fs)
    hop = frame_len // 2
    clean = clean / (jnp.sqrt(jnp.mean(clean ** 2)) + 1e-10)
    enhanced = enhanced / (jnp.sqrt(jnp.mean(enhanced ** 2)) + 1e-10)
    win = jnp.asarray(np.hanning(frame_len), jnp.float32)  # symmetric
    cf = frame_signal(clean, frame_len, hop) * win
    ef = frame_signal(enhanced, frame_len, hop) * win
    return cf, ef


def stoi_jax(clean: jnp.ndarray, enhanced: jnp.ndarray,
             fs: int = 8000) -> jnp.ndarray:
    """Per-frame spectral-correlation STOI, numerically matching the
    reference fallback ``_stoi_simplified`` (stoi.py:53-99).

    Fully batched: every frame's rFFT, clipping and correlation run as one
    fused device computation. vmap over leading axes for batch evaluation.

    Args:
        clean, enhanced: (N,) waveforms (equal length; pre-trim on host).

    Returns:
        scalar STOI in [0, 1].
    """
    cf, ef = _stoi_frames(clean, enhanced, fs)
    cs = jnp.abs(jnp.fft.rfft(cf, axis=-1))     # (T, F)
    es = jnp.abs(jnp.fft.rfft(ef, axis=-1))
    clean_energy = jnp.sqrt(jnp.sum(cs ** 2, axis=-1, keepdims=True) + 1e-10)
    en = es / (jnp.sqrt(jnp.sum(es ** 2, axis=-1, keepdims=True)) + 1e-10)
    en = en * clean_energy
    num = jnp.sum(cs * en, axis=-1)
    den = jnp.sqrt(jnp.sum(cs ** 2, axis=-1) * jnp.sum(en ** 2, axis=-1)) + 1e-10
    corr = jnp.clip(num / den, -1.0, 1.0)
    return jnp.clip(jnp.mean(corr), 0.0, 1.0)


# ─── Full STOI (Taal 2011 / pystoi algorithm) ────────────────────────────────

_FS_STOI = 10000
_N_FRAME = 256
_NFFT = 512
_NUMBAND = 15
_MINFREQ = 150.0
_N_SEG = 30
_BETA = -15.0
_DYN_RANGE = 40.0


@functools.lru_cache(maxsize=2)
def _third_octave_bands():
    """One-third octave band matrix (NUMBAND, NFFT//2+1), pystoi-style."""
    f = np.linspace(0, _FS_STOI, _NFFT + 1)[: _NFFT // 2 + 1]
    k = np.arange(_NUMBAND)
    cf = 2.0 ** (k / 3.0) * _MINFREQ
    lo = 2.0 ** ((2 * k - 1) / 6.0) * _MINFREQ
    hi = 2.0 ** ((2 * k + 1) / 6.0) * _MINFREQ
    obm = np.zeros((_NUMBAND, len(f)))
    for i in range(_NUMBAND):
        f_bin_lo = np.argmin((f - lo[i]) ** 2)
        f_bin_hi = np.argmin((f - hi[i]) ** 2)
        obm[i, f_bin_lo:f_bin_hi] = 1.0
    return obm, cf


def _remove_silent_frames(x, y, dyn_range, framelen, hop):
    """Drop frames whose clean energy is >dyn_range below the max frame."""
    w = np.hanning(framelen + 2)[1:-1]
    n = (len(x) - framelen) // hop + 1
    starts = np.arange(n) * hop
    xf = np.stack([x[s:s + framelen] for s in starts]) * w
    yf = np.stack([y[s:s + framelen] for s in starts]) * w
    energies = 20 * np.log10(np.linalg.norm(xf, axis=1) + 1e-16)
    mask = energies > (np.max(energies) - dyn_range)
    xf, yf = xf[mask], yf[mask]
    # re-overlap-add the retained frames
    out_len = (len(xf) - 1) * hop + framelen if len(xf) else 0
    xs = np.zeros(out_len)
    ys = np.zeros(out_len)
    for i in range(len(xf)):
        s = i * hop
        xs[s:s + framelen] += xf[i]
        ys[s:s + framelen] += yf[i]
    return xs, ys


def stoi_full(clean, enhanced, fs: int = 8000, extended: bool = False) -> float:
    """Faithful Taal et al. 2011 STOI (the pystoi algorithm), host-side.

    Use for gold intelligibility numbers; matches pystoi to float precision
    on common signals. Not jittable (silent-frame removal is data-dependent).
    """
    from scipy.signal import resample_poly

    x = np.asarray(clean, np.float64)
    y = np.asarray(enhanced, np.float64)
    m = min(len(x), len(y))
    x, y = x[:m], y[:m]
    if fs != _FS_STOI:
        g = np.gcd(int(fs), _FS_STOI)
        x = resample_poly(x, _FS_STOI // g, fs // g)
        y = resample_poly(y, _FS_STOI // g, fs // g)
    hop = _N_FRAME // 2
    if len(x) < _N_FRAME:
        return 0.0
    x, y = _remove_silent_frames(x, y, _DYN_RANGE, _N_FRAME, hop)
    if len(x) < _N_FRAME:
        return 0.0

    w = np.hanning(_N_FRAME + 2)[1:-1]
    n = (len(x) - _N_FRAME) // hop + 1
    starts = np.arange(n) * hop
    xf = np.stack([x[s:s + _N_FRAME] for s in starts]) * w
    yf = np.stack([y[s:s + _N_FRAME] for s in starts]) * w
    xs = np.abs(np.fft.rfft(xf, n=_NFFT, axis=1))
    ys = np.abs(np.fft.rfft(yf, n=_NFFT, axis=1))

    obm, _ = _third_octave_bands()
    xb = np.sqrt(obm @ (xs ** 2).T)     # (bands, frames)
    yb = np.sqrt(obm @ (ys ** 2).T)
    if xb.shape[1] < _N_SEG:
        return 0.0

    if extended:
        # extended STOI (Jensen & Taal 2016): row/column normalised
        # segments, no clipping; d_m = (1/N) Σ_n x̃_nᵀỹ_n over the N=30
        # doubly-normalised frame columns. Dividing by N (not the band
        # count) is what makes ESTOI(x, x) = 1 — the analytic self-score
        # anchor that the independent witness cross-check enforces
        # (tests/test_stoi_cross.py; both transcriptions originally
        # carried the same 1/J slip, worth remembering).
        scores = []
        for m0 in range(_N_SEG, xb.shape[1] + 1):
            xseg = xb[:, m0 - _N_SEG:m0]
            yseg = yb[:, m0 - _N_SEG:m0]
            xn = (xseg - xseg.mean(1, keepdims=True))
            xn /= (np.linalg.norm(xn, axis=1, keepdims=True) + 1e-16)
            yn = (yseg - yseg.mean(1, keepdims=True))
            yn /= (np.linalg.norm(yn, axis=1, keepdims=True) + 1e-16)
            xn = (xn - xn.mean(0, keepdims=True))
            xn /= (np.linalg.norm(xn, axis=0, keepdims=True) + 1e-16)
            yn = (yn - yn.mean(0, keepdims=True))
            yn /= (np.linalg.norm(yn, axis=0, keepdims=True) + 1e-16)
            scores.append(np.sum(xn * yn) / _N_SEG)
        return float(np.mean(scores))

    c = 10 ** (-_BETA / 20.0)
    d = []
    for m0 in range(_N_SEG, xb.shape[1] + 1):
        xseg = xb[:, m0 - _N_SEG:m0]
        yseg = yb[:, m0 - _N_SEG:m0]
        alpha = np.sqrt(np.sum(xseg ** 2, axis=1, keepdims=True)
                        / (np.sum(yseg ** 2, axis=1, keepdims=True) + 1e-16))
        ay = yseg * alpha
        yprime = np.minimum(ay, xseg * (1 + c))
        xm = xseg - xseg.mean(1, keepdims=True)
        ym = yprime - yprime.mean(1, keepdims=True)
        corr = np.sum(xm * ym, axis=1) / (
            np.linalg.norm(xm, axis=1) * np.linalg.norm(ym, axis=1) + 1e-16)
        d.append(np.mean(corr))
    return float(np.mean(d))


def stoi_full_jax(clean: jnp.ndarray, enhanced: jnp.ndarray,
                  fs: int = 8000) -> jnp.ndarray:
    """Jittable full Taal-2011 STOI (fixed shapes, masked silent frames).

    Device variant of :func:`stoi_full` for batched fitness/eval (vmap-able).
    Silent-frame removal is expressed with fixed shapes: a stable
    compaction (valid frames first) followed by the same
    re-overlap-add + re-frame the host algorithm performs, with segment
    validity masks in place of dynamic lengths. The only numerical
    difference vs :func:`stoi_full` is the FFT-domain resampler to 10 kHz
    (polyphase on host).
    """
    from sincformer_tpu.utils.signal import resample_poly_fft

    x = jnp.asarray(clean, jnp.float32)
    y = jnp.asarray(enhanced, jnp.float32)
    if fs != _FS_STOI:
        x = resample_poly_fft(x, fs, _FS_STOI)
        y = resample_poly_fft(y, fs, _FS_STOI)
    hop = _N_FRAME // 2
    w = jnp.asarray(np.hanning(_N_FRAME + 2)[1:-1], jnp.float32)
    xf = frame_signal(x, _N_FRAME, hop) * w            # (T, L)
    yf = frame_signal(y, _N_FRAME, hop) * w
    t = xf.shape[0]

    energies = 20.0 * jnp.log10(
        jnp.linalg.norm(xf, axis=1) + 1e-16)
    valid = energies > (jnp.max(energies) - _DYN_RANGE)  # (T,)

    # stable compaction: valid frames first, original order preserved;
    # invalid frames zeroed so the re-overlap-add tail is silent
    order = jnp.argsort(jnp.logical_not(valid), stable=True)
    keep = valid[order][:, None]
    xf = xf[order] * keep
    yf = yf[order] * keep
    n_valid = jnp.sum(valid)

    # re-overlap-add the retained frames and re-frame (exactly the host
    # algorithm's reconstruction, _remove_silent_frames + re-framing)
    from sincformer_tpu.utils.signal import overlap_add
    total = (t - 1) * hop + _N_FRAME
    xol = overlap_add(xf, hop, total)
    yol = overlap_add(yf, hop, total)
    xf = frame_signal(xol, _N_FRAME, hop) * w
    yf = frame_signal(yol, _N_FRAME, hop) * w

    xs = jnp.abs(jnp.fft.rfft(xf, n=_NFFT, axis=1))
    ys = jnp.abs(jnp.fft.rfft(yf, n=_NFFT, axis=1))
    obm, _ = _third_octave_bands()
    obm = jnp.asarray(obm, jnp.float32)
    xb = jnp.sqrt(jnp.einsum("bf,tf->bt", obm, xs ** 2))   # (bands, T)
    yb = jnp.sqrt(jnp.einsum("bf,tf->bt", obm, ys ** 2))

    # sliding segments of N=30 compacted frames; segment m covers
    # [m, m+30) and is valid when m+30 <= n_valid
    n_seg = t - _N_SEG + 1
    if n_seg < 1:
        return jnp.asarray(0.0)
    seg_idx = (np.arange(n_seg)[:, None]
               + np.arange(_N_SEG)[None, :])               # (M, 30)
    xseg = xb[:, seg_idx]                                  # (bands, M, 30)
    yseg = yb[:, seg_idx]
    seg_valid = (jnp.arange(n_seg) + _N_SEG) <= n_valid    # (M,)

    c = 10.0 ** (-_BETA / 20.0)
    alpha = jnp.sqrt(jnp.sum(xseg ** 2, -1, keepdims=True)
                     / (jnp.sum(yseg ** 2, -1, keepdims=True) + 1e-16))
    yprime = jnp.minimum(yseg * alpha, xseg * (1 + c))
    xm = xseg - jnp.mean(xseg, -1, keepdims=True)
    ym = yprime - jnp.mean(yprime, -1, keepdims=True)
    corr = (jnp.sum(xm * ym, -1)
            / (jnp.linalg.norm(xm, axis=-1)
               * jnp.linalg.norm(ym, axis=-1) + 1e-16))    # (bands, M)
    per_seg = jnp.mean(corr, axis=0)                       # (M,)
    denom = jnp.maximum(jnp.sum(seg_valid), 1)
    return jnp.sum(jnp.where(seg_valid, per_seg, 0.0)) / denom


# ─── Dispatcher (reference-compatible) ───────────────────────────────────────

def compute_stoi(clean_signal, enhanced_signal, fs: int | None = None,
                 extended: bool = False, method: str = "auto") -> float:
    """Reference-compatible STOI entry point (evaluation/stoi.py:24-50).

    ``method``:
      * ``auto`` — pystoi if installed, else the simplified fallback
        (exactly the reference's behaviour in this environment);
      * ``full`` — built-in Taal-2011 implementation;
      * ``simplified`` — force the fallback.
    """
    acfg = cfg.DEFAULT.audio
    fs = fs or acfg.sample_rate
    m = min(len(clean_signal), len(enhanced_signal))
    clean = np.asarray(clean_signal[:m], np.float64)
    enhanced = np.asarray(enhanced_signal[:m], np.float64)

    if method == "auto":
        try:
            from pystoi import stoi as _pystoi
            return float(_pystoi(clean, enhanced, fs, extended=extended))
        except ImportError:
            method = "simplified"
    if method == "full":
        return stoi_full(clean, enhanced, fs, extended=extended)
    frame_len = int(0.0256 * fs)
    if m < frame_len:
        return 0.0
    return float(stoi_jax(jnp.asarray(clean, jnp.float32),
                          jnp.asarray(enhanced, jnp.float32), fs))
