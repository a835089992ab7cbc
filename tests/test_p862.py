"""Native P.862 (PESQ) narrowband tests.

Three layers:
  1. algorithm properties that must hold for any correct P.862
     implementation (ceiling, scale invariance, SNR monotonicity,
     delay robustness),
  2. golden regression vectors (self-anchored — they pin today's scores so
     silent numeric drift is caught; they are NOT ITU ground truth),
  3. an oracle test against the ITU C library that runs automatically in
     any environment where ``pesq`` is installed (skipped here — absent).
"""

import numpy as np
import pytest

from sincformer_tpu.data.audio import add_noise_at_snr
from sincformer_tpu.data.synthetic import synthetic_speech
from sincformer_tpu.evaluation.p862 import pesq_p862
from sincformer_tpu.evaluation.pesq import compute_pesq


def _corpus():
    rng = np.random.default_rng(862)
    clean = synthetic_speech(2.0)
    noise = rng.standard_normal(len(clean)).astype(np.float32)
    return clean, noise


class TestProperties:
    def test_identical_scores_ceiling(self):
        clean, _ = _corpus()
        assert pesq_p862(clean, clean) == pytest.approx(4.5)

    def test_level_alignment_scale_invariance(self):
        clean, noise = _corpus()
        noisy = add_noise_at_snr(clean, noise, 5.0)
        a = pesq_p862(clean, noisy)
        b = pesq_p862(clean, noisy * 8.0)
        c = pesq_p862(clean * 0.1, noisy)
        assert a == pytest.approx(b, abs=1e-6)
        assert a == pytest.approx(c, abs=0.05)

    def test_snr_monotone(self):
        clean, noise = _corpus()
        scores = [pesq_p862(clean, add_noise_at_snr(clean, noise, snr))
                  for snr in (30, 20, 10, 0)]
        assert all(a > b for a, b in zip(scores, scores[1:])), scores
        assert scores[0] > 2.5 and scores[-1] < 2.0

    def test_time_alignment_compensates_delay(self):
        """A pure delay is a (near-)transparent condition under P.862."""
        clean, _ = _corpus()
        delayed = np.concatenate(
            [np.zeros(64, np.float32), clean])[:len(clean)]
        assert pesq_p862(clean, delayed) > 3.9

    def test_range_and_floor(self):
        clean, noise = _corpus()
        s = pesq_p862(clean, noise[:len(clean)])   # unrelated signal
        assert -0.5 <= s <= 2.0

    def test_short_signal_guard(self):
        clean, _ = _corpus()
        assert pesq_p862(clean[:100], clean[:100]) == 1.0


class TestGoldenRegression:
    # Regenerate ONLY with an intentional algorithm change:
    #   python -c "from tests.test_p862 import _print_golden; _print_golden()"
    GOLDEN = {30: 3.3342, 10: 2.1360, 0: 1.7343}

    def test_pinned_scores(self):
        clean, noise = _corpus()
        for snr, want in self.GOLDEN.items():
            got = pesq_p862(clean, add_noise_at_snr(clean, noise, snr))
            assert got == pytest.approx(want, abs=1e-3), (snr, got)


class TestImplChain:
    def test_auto_uses_native_without_clib(self):
        clean, noise = _corpus()
        noisy = add_noise_at_snr(clean, noise, 5.0)
        pytest.importorskip("pesq", reason="") if False else None
        try:
            import pesq  # noqa: F401
            has_clib = True
        except ImportError:
            has_clib = False
        if has_clib:
            pytest.skip("C library present; auto routes to it")
        assert compute_pesq(clean, noisy) == pytest.approx(
            pesq_p862(clean, noisy), abs=1e-6)

    def test_proxy_explicit(self):
        clean, noise = _corpus()
        noisy = add_noise_at_snr(clean, noise, 5.0)
        a = compute_pesq(clean, noisy, impl="proxy")
        assert -0.5 <= a <= 4.5


class TestOracleWhenAvailable:
    def test_against_itu_c_library(self):
        """Runs in any environment with the `pesq` package: validates the
        native implementation tracks the ITU code."""
        itu = pytest.importorskip("pesq")
        clean, noise = _corpus()
        for snr in (20, 10, 0):
            noisy = add_noise_at_snr(clean, noise, snr)
            ref = itu.pesq(8000, np.float64(clean), np.float64(noisy), "nb")
            ours = pesq_p862(clean, noisy)
            # tracking bound (band tables are formula-constructed, see
            # evaluation/p862.py docstring); tighten after table validation
            assert abs(ours - ref) < 0.35, (snr, ours, ref)


def _print_golden():
    clean, noise = _corpus()
    print({snr: round(pesq_p862(clean, add_noise_at_snr(clean, noise, snr)),
                      4) for snr in (30, 10, 0)})
