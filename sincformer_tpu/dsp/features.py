"""AMS / RASTA-PLP / MFCC / GFCC feature extraction, fully vectorised.

Semantics match the reference (``signal_processing/features.py``) exactly —
including its quirks (documented inline) — but every per-frame Python loop
becomes a batched gather + rFFT + matmul:

  * AMS: the per-frame double loop (features.py:60-97, 428-434) → one framed
    rFFT and a (bands × bins) matmul.
  * RASTA-PLP: per-band scipy lfilter loop (features.py:197-199) → one
    lax.scan carrying all 21 bark bands.
  * MFCC/GFCC per-frame loops (features.py:448-476) → framed rFFT + mel
    matmul / cumsum-windowed channel energies + DCT matmul.

Parity note (SURVEY.md §0.3 class): with the reference's constants, the AMS
analysis window per frame is 4×160 = 640 samples → 80 decimated samples,
which is shorter than one 128-sample AMS segment, so per-frame AMS features
are identically zero in the reference (features.py:56-64 breaks immediately).
We reproduce that faithfully — the generic :func:`extract_ams` handles longer
inputs correctly, and zero-segment inputs yield zeros just like the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from sincformer_tpu import config as cfg
from sincformer_tpu.dsp.gammatone import GammatoneFilterbank
from sincformer_tpu.utils.signal import (dct_matrix, frame_signal,
                                         hamming_window, num_frames)


# ═══ AMS ═════════════════════════════════════════════════════════════════════

@functools.lru_cache(maxsize=4)
def _ams_band_weights(fs: int, fcfg: cfg.FeatureConfig = cfg.DEFAULT.features):
    """(num_bands, n_bins) triangular modulation-band matrix
    (features.py:74-96)."""
    n_bins = fcfg.ams_fft_size // 2 + 1
    mod_fs = fs / fcfg.ams_decimate
    freq_bins = np.arange(n_bins) * mod_fs / fcfg.ams_fft_size
    centers = np.linspace(fcfg.ams_low_hz, fcfg.ams_high_hz,
                          fcfg.ams_num_bands + 2)
    w = np.zeros((fcfg.ams_num_bands, n_bins), dtype=np.float32)
    for b in range(fcfg.ams_num_bands):
        lo, mid, hi = centers[b], centers[b + 1], centers[b + 2]
        rise = (freq_bins >= lo) & (freq_bins <= mid)
        fall = (freq_bins > mid) & (freq_bins <= hi)
        w[b, rise] = (freq_bins[rise] - lo) / (mid - lo + 1e-10)
        w[b, fall] = (hi - freq_bins[fall]) / (hi - mid + 1e-10)
    return w


def extract_ams(signal: jnp.ndarray, fs: int | None = None,
                num_bands: int | None = None,
                fcfg: cfg.FeatureConfig = cfg.DEFAULT.features) -> jnp.ndarray:
    """AMS features of a (…, L) segment (features.py:27-102).

    rectify → decimate ×8 → 128-sample segments (hop 64) → hamming →
    256-pt rFFT magnitude → 15 triangular bands → mean over segments.
    Returns (…, num_bands); zeros when no complete segment fits.
    """
    fs = fs or cfg.DEFAULT.audio.sample_rate
    nb = num_bands or fcfg.ams_num_bands
    x = jnp.abs(jnp.asarray(signal, jnp.float32))
    dec = x[..., ::fcfg.ams_decimate]
    seg_len, overlap = fcfg.ams_segments, fcfg.ams_overlap
    hop = seg_len - overlap
    n_segs = num_frames(dec.shape[-1], seg_len, hop)
    if n_segs == 0:
        return jnp.zeros(x.shape[:-1] + (nb,), jnp.float32)
    segs = frame_signal(dec, seg_len, hop)                 # (..., S, 128)
    win = hamming_window(seg_len, periodic=False)
    mag = jnp.abs(jnp.fft.rfft(segs * win, n=fcfg.ams_fft_size, axis=-1))
    bands = jnp.einsum("bn,...sn->...sb", _ams_band_weights(fs, fcfg), mag)
    return jnp.mean(bands, axis=-2)


# ═══ RASTA-PLP ═══════════════════════════════════════════════════════════════

def hz_to_bark(f):
    """6·arcsinh(f/600) (features.py:109-111)."""
    return 6.0 * np.arcsinh(np.asarray(f) / 600.0)


def bark_to_hz(z):
    """600·sinh(z/6) (features.py:114-116)."""
    return 600.0 * np.sinh(np.asarray(z) / 6.0)


def rasta_filter(x: jnp.ndarray) -> jnp.ndarray:
    """RASTA IIR band-pass along the last axis (features.py:119-130):
    num=[0.2,0.1,0,-0.1,-0.2], den=[1,-0.98]. The FIR part is a causal conv;
    the single-pole IIR is a lax.scan carrying all leading dims at once."""
    b = jnp.asarray([0.2, 0.1, 0.0, -0.1, -0.2], jnp.float32)
    # causal FIR: y_fir[n] = Σ b[k]·x[n-k]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(4, 0)])
    fir = sum(b[k] * xp[..., 4 - k: xp.shape[-1] - k] for k in range(5))

    def step(y_prev, f_t):
        y = f_t + 0.98 * y_prev
        return y, y

    init = jnp.zeros(x.shape[:-1], x.dtype)
    _, y = jax.lax.scan(step, init, jnp.moveaxis(fir, -1, 0))
    return jnp.moveaxis(y, 0, -1)


@functools.lru_cache(maxsize=4)
def _bark_filterbank(fs: int, fft_size: int, num_filters: int):
    """(num_filters, fft//2+1) triangular bark filterbank + band centers
    (features.py:161-181)."""
    bark_lo = hz_to_bark(0.0)
    bark_hi = hz_to_bark(fs / 2.0)
    bark_centers = np.linspace(bark_lo, bark_hi, num_filters + 2)
    hz_centers = bark_to_hz(bark_centers)
    freq_bins = np.arange(fft_size // 2 + 1) * fs / fft_size
    fb = np.zeros((num_filters, fft_size // 2 + 1), dtype=np.float32)
    for i in range(num_filters):
        lo, mid, hi = hz_centers[i], hz_centers[i + 1], hz_centers[i + 2]
        rise = (freq_bins >= lo) & (freq_bins <= mid)
        fall = (freq_bins > mid) & (freq_bins <= hi)
        fb[i, rise] = (freq_bins[rise] - lo) / (mid - lo + 1e-10)
        fb[i, fall] = (hi - freq_bins[fall]) / (hi - mid + 1e-10)
    # equal-loudness weights from band centers (features.py:204-209)
    f = bark_to_hz(bark_centers[1:-1])
    eq = (f ** 2 / (f ** 2 + 1.6e5)).astype(np.float32)
    return fb, eq


def extract_rasta_plp(signal: jnp.ndarray, fs: int | None = None,
                      num_coeffs: int | None = None,
                      fcfg: cfg.FeatureConfig = cfg.DEFAULT.features,
                      acfg: cfg.AudioConfig = cfg.DEFAULT.audio) -> jnp.ndarray:
    """Per-utterance RASTA-PLP coefficients (features.py:133-220).

    power spectrum → bark bands → log → RASTA IIR → exp → equal loudness →
    cube root → mean over frames → DCT-13.
    Accepts (…, N); returns (…, num_coeffs).
    """
    fs = fs or acfg.sample_rate
    nc = num_coeffs or fcfg.rasta_num_coeff
    frame, hop, fft = acfg.frame_size, acfg.hop_size, acfg.fft_size
    x = jnp.asarray(signal, jnp.float32)
    if x.shape[-1] < frame:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, frame - x.shape[-1])])
    frames = frame_signal(x, frame, hop) * hamming_window(frame, False)
    power = jnp.abs(jnp.fft.rfft(frames, n=fft, axis=-1)) ** 2  # (...,T,F)
    fb, eq = _bark_filterbank(fs, fft, fcfg.rasta_num_bands)
    bark = jnp.einsum("bf,...tf->...bt", fb, power)             # (...,B,T)
    log_spec = jnp.log(bark + 1e-10)
    rasta = rasta_filter(log_spec)
    loud = (jnp.exp(rasta) * eq[..., :, None]) ** (1.0 / 3.0)
    mean_spec = jnp.mean(loud, axis=-1)                          # (...,B)
    d = dct_matrix(fcfg.rasta_num_bands, nc)
    return jnp.einsum("kb,...b->...k", d, mean_spec)


# ═══ MFCC ════════════════════════════════════════════════════════════════════

def hz_to_mel(f):
    """2595·log10(1+f/700) (features.py:227-229)."""
    return 2595.0 * np.log10(1 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    """700·(10^(m/2595)−1) (features.py:232-234)."""
    return 700.0 * (10 ** (np.asarray(m) / 2595.0) - 1)


@functools.lru_cache(maxsize=4)
def mel_filterbank(num_filters: int, fft_size: int, fs: int) -> jnp.ndarray:
    """Integer-bin mel filterbank identical to the reference
    (features.py:237-264), including the floor((fft+1)·hz/fs) bin mapping."""
    mel_pts = np.linspace(hz_to_mel(0), hz_to_mel(fs / 2), num_filters + 2)
    hz_pts = mel_to_hz(mel_pts)
    bins = np.floor((fft_size + 1) * hz_pts / fs).astype(int)
    fb = np.zeros((num_filters, fft_size // 2 + 1), dtype=np.float32)
    for i in range(num_filters):
        for j in range(bins[i], bins[i + 1]):
            if j < fb.shape[1]:
                fb[i, j] = (j - bins[i]) / (bins[i + 1] - bins[i] + 1e-10)
        for j in range(bins[i + 1], bins[i + 2]):
            if j < fb.shape[1]:
                fb[i, j] = (bins[i + 2] - j) / (bins[i + 2] - bins[i + 1] + 1e-10)
    return fb


def pre_emphasis(x: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """pre[0]=x[0], pre[n]=x[n]−0.97·x[n−1] (features.py:290)."""
    return jnp.concatenate([x[..., :1], x[..., 1:] - coef * x[..., :-1]],
                           axis=-1)


def _mfcc_frames(signal: jnp.ndarray, fs: int,
                 fcfg: cfg.FeatureConfig, acfg: cfg.AudioConfig,
                 num_coeffs: int) -> jnp.ndarray:
    """Per-frame MFCC matrix (…, T, num_coeffs)."""
    frame, hop = acfg.frame_size, acfg.hop_size
    pre = pre_emphasis(jnp.asarray(signal, jnp.float32))
    if pre.shape[-1] < frame:
        pre = jnp.pad(pre, [(0, 0)] * (pre.ndim - 1)
                      + [(0, frame - pre.shape[-1])])
    frames = frame_signal(pre, frame, hop) * hamming_window(frame, False)
    power = jnp.abs(jnp.fft.rfft(frames, n=fcfg.mfcc_fft_size, axis=-1)) ** 2
    fb = mel_filterbank(fcfg.mfcc_num_filters, fcfg.mfcc_fft_size, fs)
    mel = jnp.einsum("mf,...tf->...tm", fb, power)
    log_e = jnp.log(mel + 1e-10)
    d = dct_matrix(fcfg.mfcc_num_filters, num_coeffs)
    return jnp.einsum("km,...tm->...tk", d, log_e)


def extract_mfcc(signal: jnp.ndarray, fs: int | None = None,
                 num_coeffs: int | None = None,
                 fcfg: cfg.FeatureConfig = cfg.DEFAULT.features,
                 acfg: cfg.AudioConfig = cfg.DEFAULT.audio) -> jnp.ndarray:
    """Mean-over-frames MFCC vector (features.py:267-323)."""
    fs = fs or acfg.sample_rate
    nc = num_coeffs or fcfg.mfcc_num_coeff
    return jnp.mean(_mfcc_frames(signal, fs, fcfg, acfg, nc), axis=-2)


# ═══ GFCC ════════════════════════════════════════════════════════════════════

def extract_gfcc(signal: jnp.ndarray, fs: int | None = None,
                 num_coeffs: int | None = None, gfb=None,
                 fcfg: cfg.FeatureConfig = cfg.DEFAULT.features,
                 acfg: cfg.AudioConfig = cfg.DEFAULT.audio) -> jnp.ndarray:
    """Mean-over-frames GFCC vector (features.py:330-379): GFTB → 10 ms
    channel energies → cube root → DCT-13."""
    fs = fs or acfg.sample_rate
    nc = num_coeffs or fcfg.gfcc_num_coeff
    gfb = gfb or GammatoneFilterbank(sample_rate=fs)
    filtered = gfb.filter(signal)                       # (..., C, N)
    hop = fs // fcfg.gfcc_decimate_rate
    n = filtered.shape[-1]
    nf = signal.shape[-1] // hop
    if nf == 0:
        return jnp.zeros(jnp.shape(signal)[:-1] + (nc,), jnp.float32)
    # per-frame mean energy over [n·hop, n·hop+hop) clipped to N
    energy2 = jnp.abs(filtered) ** 2
    frames = frame_signal(energy2, hop, hop)[..., :nf, :]  # (...,C,nf,hop)
    ce = jnp.mean(frames, axis=-1)                       # (..., C, nf)
    compressed = jnp.sign(ce) * jnp.abs(ce) ** (1.0 / 3.0)
    d = dct_matrix(gfb.num_channels, nc)
    coeffs = jnp.einsum("kc,...cn->...nk", d, compressed)
    return jnp.mean(coeffs, axis=-2)


# ═══ Unified FeatureExtractor ════════════════════════════════════════════════

class FeatureExtractor:
    """[AMS | RASTA-PLP | MFCC | GFCC] per-frame features + context
    (features.py:386-516). Every stage is batched over frames on device.
    """

    def __init__(self, fs: int | None = None,
                 fcfg: cfg.FeatureConfig = cfg.DEFAULT.features,
                 acfg: cfg.AudioConfig = cfg.DEFAULT.audio):
        self.fs = fs or acfg.sample_rate
        self.fcfg = fcfg
        self.acfg = acfg
        self.gfb = GammatoneFilterbank(sample_rate=self.fs)
        self.context = fcfg.context_frames

    @property
    def raw_feature_dim(self) -> int:
        return self.fcfg.raw_dim

    @property
    def feature_dim(self) -> int:
        return self.fcfg.dim

    def extract_frame_features(self, signal: jnp.ndarray) -> jnp.ndarray:
        """(N,) → (T, 54) concatenated features (features.py:400-482)."""
        acfg, fcfg, fs = self.acfg, self.fcfg, self.fs
        frame, hop = acfg.frame_size, acfg.hop_size
        x = jnp.asarray(signal, jnp.float32)
        if x.shape[-1] < frame:
            x = jnp.pad(x, (0, frame - x.shape[-1]))
        n = x.shape[-1]
        t = num_frames(n, frame, hop)

        filtered = self.gfb.filter(x)                    # (C, N)

        # ── AMS: 4-frame (640-sample) window per frame (features.py:427-434).
        # Frames whose window would be truncated below one frame are zero
        # (the reference's `continue`); with default constants every window
        # yields zero AMS anyway (see module docstring).
        win_len = frame * 4
        ams = jnp.zeros((t, fcfg.ams_num_bands), jnp.float32)
        full = num_frames(n, win_len, hop)               # windows fully inside
        if full > 0 and (win_len // fcfg.ams_decimate) >= fcfg.ams_segments:
            segs = frame_signal(x, win_len, hop)[:full]
            ams = ams.at[:full].set(extract_ams(segs, fs, fcfg=fcfg))
        # trailing truncated windows: length ≥ frame → computed on the
        # truncated segment; shorter → zeros. With default constants all are
        # zeros, matching the reference bit-for-bit.

        # ── RASTA-PLP: whole utterance, tiled (features.py:436-438)
        plp = extract_rasta_plp(x, fs, fcfg=fcfg, acfg=acfg)
        rasta = jnp.tile(plp[None, :], (t, 1))

        # ── MFCC per frame (features.py:440-456)
        mfcc = _mfcc_frames(x, fs, fcfg, acfg, fcfg.mfcc_num_coeff)[:t]

        # ── GFCC per frame: dec_hop window centred on frame centre
        # (features.py:458-476)
        dec_hop = fs // fcfg.gfcc_decimate_rate
        centers = np.arange(t) * hop + frame // 2
        ch_start = np.maximum(0, centers - dec_hop // 2)
        ch_end = np.minimum(n, centers + dec_hop // 2)
        # windowed mean via cumulative sum of per-channel energy
        energy2 = jnp.abs(filtered) ** 2                 # (C, N)
        csum = jnp.concatenate(
            [jnp.zeros(energy2.shape[:-1] + (1,)),
             jnp.cumsum(energy2, axis=-1)], axis=-1)     # (C, N+1)
        seg_sum = csum[:, ch_end] - csum[:, ch_start]    # (C, T)
        seg_len = jnp.asarray(np.maximum(ch_end - ch_start, 1), jnp.float32)
        ce = (seg_sum / seg_len).T                       # (T, C)
        valid = jnp.asarray(ch_end > ch_start)[:, None]
        compressed = jnp.sign(ce) * jnp.abs(ce) ** (1.0 / 3.0)
        d = dct_matrix(self.gfb.num_channels, fcfg.gfcc_num_coeff)
        gfcc = jnp.where(valid, compressed @ d.T, 0.0)

        return jnp.concatenate([ams, rasta, mfcc, gfcc], axis=-1)

    def add_context(self, features: jnp.ndarray) -> jnp.ndarray:
        """(T, D) → (T, D·(2·ctx+1)) edge-padded context stacking
        (features.py:484-505), as one gather."""
        t = features.shape[0]
        ctx = self.context
        padded = jnp.pad(features, ((ctx, ctx), (0, 0)), mode="edge")
        idx = np.arange(t)[:, None] + np.arange(2 * ctx + 1)[None, :]
        return padded[idx].reshape(t, -1)
