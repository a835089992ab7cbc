"""ctypes bindings to the native audio runtime (native/wavio.cpp).

Auto-builds ``libsincwav.so`` with make on first use if a toolchain is
available; every entry point has a pure-Python fallback, so the framework
works with or without the native library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsincwav.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.wav_num_samples.restype = ctypes.c_long
    lib.wav_num_samples.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_int)]
    lib.wav_read_mono.restype = ctypes.c_long
    lib.wav_read_mono.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_long]
    lib.resample_linear.restype = None
    lib.resample_linear.argtypes = [ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_long,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_long]
    lib.mix_snr.restype = None
    lib.mix_snr.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                            ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
    lib.batch_pad.restype = None
    lib.batch_pad.argtypes = [ctypes.POINTER(ctypes.c_float),
                              ctypes.POINTER(ctypes.c_long), ctypes.c_long,
                              ctypes.c_long, ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def wav_read_mono(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Decode a WAV file to mono float32. Returns (samples, sr) or None."""
    lib = _load()
    if lib is None:
        return None
    sr = ctypes.c_int(0)
    n = lib.wav_num_samples(path.encode(), ctypes.byref(sr))
    if n <= 0:
        return None
    buf = np.empty(n, np.float32)
    got = lib.wav_read_mono(path.encode(), _fptr(buf), n)
    if got <= 0:
        return None
    return buf[:got], int(sr.value)


def resample_linear(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Native linear resampler; falls back to NumPy."""
    lib = _load()
    if sr_in == sr_out:
        return np.asarray(x, np.float32)
    n_out = int(len(x) * sr_out / sr_in)
    if lib is None:
        from sincformer_tpu.utils.signal import resample_linear as _py
        return _py(np.asarray(x, np.float32), sr_in, sr_out)
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(n_out, np.float32)
    lib.resample_linear(_fptr(x), len(x), _fptr(out), n_out)
    return out


def mix_snr(clean: np.ndarray, noise: np.ndarray,
            snr_db: float) -> Optional[np.ndarray]:
    """Native SNR mixing (tiles noise); None when the lib is absent."""
    lib = _load()
    if lib is None:
        return None
    clean = np.ascontiguousarray(clean, np.float32)
    noise = np.ascontiguousarray(noise, np.float32)
    out = np.empty(len(clean), np.float32)
    lib.mix_snr(_fptr(clean), len(clean), _fptr(noise), len(noise),
                float(snr_db), _fptr(out))
    return out


def batch_pad(signals, max_len: int) -> Optional[np.ndarray]:
    """Native right-zero-padded batch assembly; None when lib absent."""
    lib = _load()
    if lib is None:
        return None
    lens = np.asarray([len(s) for s in signals], np.int64)
    flat = np.ascontiguousarray(np.concatenate(
        [np.asarray(s, np.float32) for s in signals]))
    out = np.empty((len(signals), max_len), np.float32)
    lib.batch_pad(_fptr(flat),
                  lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
                  len(signals), max_len, _fptr(out))
    return out
