"""Audio I/O and SNR mixing (host-side NumPy).

Semantics match the reference loaders exactly
(``training/pipeline.py:33-94``, duplicated at
``conformer_pipeline.py:115-150``): soundfile if available → scipy.io.wavfile
fallback with int16/int32 scaling; mono mixdown; librosa resample → linear
interp fallback; SNR mixing with noise tiling.
"""

from __future__ import annotations

import numpy as np

from sincformer_tpu import config as cfg
from sincformer_tpu.utils.signal import resample_linear


def load_audio(filepath: str, target_sr: int | None = None,
               use_native: bool = True) -> np.ndarray:
    """Load a WAV file, mono, resampled to ``target_sr`` float32.

    Fast path: the native C++ decoder (native/wavio.cpp) when built; then
    soundfile; then scipy — same numeric contract throughout.
    """
    target_sr = target_sr or cfg.DEFAULT.audio.sample_rate
    if use_native and filepath.lower().endswith(".wav"):
        from sincformer_tpu.data import native
        got = native.wav_read_mono(filepath)
        if got is not None:
            audio, sr = got
            if sr != target_sr:
                audio = native.resample_linear(audio, sr, target_sr)
            return audio.astype(np.float32)
    try:
        import soundfile as sf
        audio, sr = sf.read(filepath, dtype="float32")
    except Exception:
        from scipy.io import wavfile
        sr, audio = wavfile.read(filepath)
        if audio.dtype == np.int16:
            audio = audio.astype(np.float32) / 32768.0
        elif audio.dtype == np.int32:
            audio = audio.astype(np.float32) / 2147483648.0
        else:
            audio = audio.astype(np.float32)
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    if sr != target_sr:
        try:
            import librosa
            audio = librosa.resample(audio, orig_sr=sr, target_sr=target_sr)
        except ImportError:
            audio = resample_linear(audio, sr, target_sr)
    return audio.astype(np.float32)


def add_noise_at_snr(clean: np.ndarray, noise: np.ndarray,
                     snr_db: float) -> np.ndarray:
    """Mix clean + scaled noise at the target SNR
    (reference pipeline.py:71-94: tile noise, power-ratio scale)."""
    clean = np.asarray(clean, np.float32)
    noise = np.asarray(noise, np.float32)
    if len(noise) < len(clean):
        noise = np.tile(noise, int(np.ceil(len(clean) / len(noise))))
    noise = noise[:len(clean)]
    clean_power = np.mean(clean ** 2) + 1e-10
    noise_power = np.mean(noise ** 2) + 1e-10
    scale = np.sqrt(clean_power / (noise_power * 10.0 ** (snr_db / 10.0)))
    return (clean + scale * noise).astype(np.float32)
