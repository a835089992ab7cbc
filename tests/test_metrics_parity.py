"""Metric parity vs the reference (STOI/PESQ fallbacks, SSNR, CSII, NCM)."""

import numpy as np

from sincformer_tpu.evaluation import (compute_csii, compute_ncm,
                                       compute_pesq, compute_ssnr,
                                       compute_ssnr_improvement, compute_stoi)
from sincformer_tpu.evaluation.stoi import stoi_full


def _pair(rng, n=8000):
    t = np.arange(n) / 8000.0
    clean = (np.sin(2 * np.pi * 300 * t) * np.abs(np.sin(2 * np.pi * 3 * t))
             ).astype(np.float64)
    enhanced = clean + 0.2 * rng.standard_normal(n)
    return clean, enhanced


class TestSTOI:
    def test_parity_fallback(self, ref_modules, rng):
        ref = ref_modules["evaluation.stoi"]
        clean, enh = _pair(rng)
        ours = compute_stoi(clean, enh)
        theirs = ref.compute_stoi(clean, enh)  # falls back (pystoi absent)
        assert abs(ours - theirs) < 1e-3

    def test_identity_is_high(self, rng):
        clean, _ = _pair(rng)
        assert compute_stoi(clean, clean) > 0.99
        assert stoi_full(clean, clean) > 0.999

    def test_full_stoi_ordering(self, rng):
        clean, _ = _pair(rng)
        slight = clean + 0.05 * rng.standard_normal(len(clean))
        heavy = clean + 1.0 * rng.standard_normal(len(clean))
        assert stoi_full(clean, slight) > stoi_full(clean, heavy)

    def test_full_stoi_range(self, rng):
        clean, enh = _pair(rng)
        s = stoi_full(clean, enh)
        assert 0.0 <= s <= 1.0


class TestSSNR:
    def test_parity(self, ref_modules, rng):
        ref = ref_modules["evaluation.ssnr"]
        clean, enh = _pair(rng)
        assert abs(compute_ssnr(clean, enh) - ref.compute_ssnr(clean, enh)) < 1e-3
        assert abs(compute_ssnr_improvement(clean, enh * 0.5, enh)
                   - ref.compute_ssnr_improvement(clean, enh * 0.5, enh)) < 1e-3

    def test_perfect_is_upper_bound(self, rng):
        clean, _ = _pair(rng)
        assert compute_ssnr(clean, clean) == 35.0


class TestPESQ:
    def test_parity_fallback(self, ref_modules, rng):
        ref = ref_modules["evaluation.pesq_eval"]
        clean, enh = _pair(rng)
        assert abs(compute_pesq(clean, enh)
                   - ref.compute_pesq(clean, enh)) < 1e-3

    def test_range(self, rng):
        clean, enh = _pair(rng)
        assert -0.5 <= compute_pesq(clean, enh) <= 4.5


class TestCSII:
    def test_parity(self, ref_modules, rng):
        ref = ref_modules["evaluation.csii"]
        clean, enh = _pair(rng)
        assert abs(compute_csii(clean, enh)
                   - ref.compute_csii(clean, enh)) < 1e-3

    def test_identity(self, rng):
        clean, _ = _pair(rng)
        assert compute_csii(clean, clean) > 0.9


class TestNCM:
    def test_parity(self, ref_modules, rng):
        ref = ref_modules["evaluation.ncm"]
        clean, enh = _pair(rng)
        assert abs(compute_ncm(clean, enh)
                   - ref.compute_ncm(clean, enh)) < 2e-3

    def test_identity(self, rng):
        clean, _ = _pair(rng)
        assert compute_ncm(clean, clean) > 0.95
