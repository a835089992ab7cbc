"""Cross-validation of stoi_full against an independent transcription.

VERDICT r3 #4(b): the self-frozen golden tables only catch drift from
yesterday's output; two INDEPENDENTLY written implementations of the Taal
2011 algorithm (evaluation/stoi.py::stoi_full — vectorised, resampling
dispatcher — vs evaluation/stoi_indep.py — plain-NumPy transcription of
the paper, no shared code) agreeing to ~1e-10 is evidence both match the
STANDARD: a transcription bug in either (band edges, window convention,
silent-frame mask, clipping constant, segment hop) would break agreement.

All inputs are generated at the algorithm's native 10 kHz so NO resampler
is in the path — the cross-check isolates the core algorithm.
"""

import numpy as np
import pytest

from sincformer_tpu.evaluation.stoi import stoi_full
from sincformer_tpu.evaluation.stoi_indep import stoi_independent

FS = 10000


def _speech(seconds=2.0, seed=0):
    """Formant-sum pseudo-speech with amplitude modulation and pauses —
    enough structure for band/segment/silence paths to all engage."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(FS * seconds)) / FS
    x = np.zeros_like(t)
    for f in (210.0, 640.0, 1150.0, 2400.0, 3300.0):
        x += rng.uniform(0.3, 1.0) * np.sin(2 * np.pi * f * t
                                            + rng.uniform(0, 2 * np.pi))
    x *= 0.4 + 0.6 * np.sin(2 * np.pi * 3.1 * t) ** 2
    # insert a real pause so silent-frame removal has work to do
    pause = slice(int(0.9 * FS), int(1.15 * FS))
    x[pause] *= 0.001
    return x / np.max(np.abs(x))


def _cases():
    rng = np.random.default_rng(42)
    clean = _speech()
    noise = rng.standard_normal(len(clean))
    cases = {}
    for snr in (-5.0, 0.0, 5.0, 10.0, 20.0):
        a = np.sqrt(np.mean(clean ** 2)
                    / (10 ** (snr / 10) * np.mean(noise ** 2)))
        cases[f"awgn_{snr:+.0f}dB"] = clean + a * noise
    # lowpass smearing (moving average) — correlated distortion
    k = np.ones(25) / 25
    cases["lowpass"] = np.convolve(clean, k, mode="same")
    # hard clipping
    cases["clipped"] = np.clip(clean, -0.2, 0.2)
    # small constant gain (should be invariant through normalisation)
    cases["gain"] = 0.1 * clean + 0.01 * noise
    return clean, cases


class TestCrossImplementation:
    def test_identical_inputs_score_one(self):
        clean = _speech(seed=3)
        a = stoi_full(clean, clean, FS)
        b = stoi_independent(clean, clean, FS)
        assert a == pytest.approx(1.0, abs=1e-9)
        assert b == pytest.approx(1.0, abs=1e-9)

    def test_agreement_across_degradations(self):
        clean, cases = _cases()
        for name, deg in cases.items():
            a = stoi_full(clean, deg, FS)
            b = stoi_independent(clean, deg, FS)
            assert np.isfinite(a) and np.isfinite(b), name
            assert abs(a - b) < 1e-6, (name, a, b)

    def test_agreement_with_heavy_silence(self):
        """Mostly-silent signal: the silent-frame masks must agree
        exactly or scores diverge wildly."""
        clean = _speech(seconds=3.0, seed=7)
        clean[int(0.3 * FS):int(1.6 * FS)] *= 1e-4
        rng = np.random.default_rng(1)
        deg = clean + 0.05 * rng.standard_normal(len(clean))
        a = stoi_full(clean, deg, FS)
        b = stoi_independent(clean, deg, FS)
        assert abs(a - b) < 1e-6, (a, b)

    def test_agreement_odd_lengths(self):
        """Lengths that don't divide the hop exercise the framing
        boundary conventions ((N-L)//H+1 in both)."""
        clean = _speech(seconds=1.7123, seed=9)
        rng = np.random.default_rng(2)
        deg = clean + 0.1 * rng.standard_normal(len(clean))
        for cut in (0, 1, 127, 255):
            c, d = clean[:len(clean) - cut], deg[:len(deg) - cut]
            a = stoi_full(c, d, FS)
            b = stoi_independent(c, d, FS)
            assert abs(a - b) < 1e-6, (cut, a, b)

    def test_extended_stoi_agreement(self):
        """ESTOI path (time- then band-normalized inner products): same
        cross-implementation bar as classic STOI."""
        clean, cases = _cases()
        for name, deg in cases.items():
            a = stoi_full(clean, deg, FS, extended=True)
            b = stoi_independent(clean, deg, FS, extended=True)
            assert np.isfinite(a) and np.isfinite(b), name
            assert abs(a - b) < 1e-6, (name, a, b)
        # identical inputs → 1.0 on both
        assert stoi_full(clean, clean, FS, extended=True) == pytest.approx(
            1.0, abs=1e-9)
        assert stoi_independent(clean, clean, FS,
                                extended=True) == pytest.approx(1.0,
                                                                abs=1e-9)

    def test_scores_monotone_in_snr_on_both(self):
        clean, cases = _cases()
        snrs = [-5.0, 0.0, 5.0, 10.0, 20.0]
        a = [stoi_full(clean, cases[f"awgn_{s:+.0f}dB"], FS) for s in snrs]
        b = [stoi_independent(clean, cases[f"awgn_{s:+.0f}dB"], FS)
             for s in snrs]
        assert a == sorted(a)
        assert b == sorted(b)
