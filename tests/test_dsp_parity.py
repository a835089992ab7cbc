"""Golden parity tests: our vectorised DSP vs the reference's NumPy loops.

These import the reference implementation directly (read-only) and assert
numeric agreement — the bit-faithfulness bar from SURVEY.md §7 "hard parts".
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sincformer_tpu.dsp import (GammatoneFilterbank, MeddisHairCell,
                                erb_space, gammatone_impulse_response)
from sincformer_tpu.dsp.features import (extract_ams, extract_mfcc,
                                         extract_rasta_plp, FeatureExtractor)
from sincformer_tpu.masks import (compute_irm, compute_pcirm,
                                  compute_correlation_coefficients,
                                  compute_phase_differences,
                                  compute_snr_boundaries, quantize_pcirm)


def _signal(rng, n=4000):
    t = np.arange(n) / 8000.0
    x = (0.5 * np.sin(2 * np.pi * 250 * t) + 0.3 * np.sin(2 * np.pi * 800 * t)
         + 0.1 * rng.standard_normal(n))
    return x.astype(np.float32)


class TestGammatoneParity:
    def test_erb_space(self, ref_modules):
        ref = ref_modules["signal_processing.gammatone"]
        np.testing.assert_allclose(erb_space(50, 4000, 64),
                                   ref.erb_space(50, 4000, 64), rtol=1e-10)

    def test_impulse_response(self, ref_modules):
        ref = ref_modules["signal_processing.gammatone"]
        np.testing.assert_allclose(
            gammatone_impulse_response(1000.0, 8000),
            ref.gammatone_impulse_response(1000.0, 8000), rtol=1e-6)

    def test_filter(self, ref_modules, rng):
        ref = ref_modules["signal_processing.gammatone"]
        x = _signal(rng, 2000)
        ours = np.asarray(GammatoneFilterbank().filter(x))
        theirs = ref.GammatoneFilterbank().filter(x.astype(np.float64))
        np.testing.assert_allclose(ours, theirs, atol=2e-4)

    def test_tf_magnitudes(self, ref_modules, rng):
        ref = ref_modules["signal_processing.gammatone"]
        x = _signal(rng, 2000)
        m_ours, p_ours = GammatoneFilterbank().get_tf_magnitudes(x)
        m_ref, p_ref = ref.GammatoneFilterbank().get_tf_magnitudes(
            x.astype(np.float64))
        np.testing.assert_allclose(np.asarray(m_ours), m_ref,
                                   rtol=5e-3, atol=1e-4)
        # phases compared via complex exponential (wraparound-safe)
        np.testing.assert_allclose(np.exp(1j * np.asarray(p_ours)),
                                   np.exp(1j * p_ref), atol=2e-2)


class TestHaircellParity:
    def test_process(self, ref_modules, rng):
        ref = ref_modules["signal_processing.haircell"]
        x = _signal(rng, 1000) * 10
        ours = np.asarray(MeddisHairCell().process(x))
        theirs = ref.MeddisHairCell().process(x.astype(np.float64))
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)

    def test_filterbank_frames(self, ref_modules, rng):
        ref = ref_modules["signal_processing.haircell"]
        fb = np.abs(rng.standard_normal((4, 800))).astype(np.float32) * 5
        ours = np.asarray(MeddisHairCell().process_to_frames(fb))
        theirs = ref.MeddisHairCell().process_to_frames(fb.astype(np.float64))
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


class TestMaskParity:
    def test_irm(self, ref_modules, rng):
        ref = ref_modules["masks.irm"]
        c = np.abs(rng.standard_normal((64, 20)))
        n = np.abs(rng.standard_normal((64, 20)))
        np.testing.assert_allclose(np.asarray(compute_irm(c, n)),
                                   ref.compute_irm(c, n), rtol=1e-5)

    def test_pcirm(self, ref_modules, rng):
        ref = ref_modules["masks.pcirm"]
        ns = np.abs(rng.standard_normal((64, 20)))
        cs = np.abs(rng.standard_normal((64, 20)))
        zn = np.abs(rng.standard_normal((64, 20)))
        p_ns = rng.uniform(-np.pi, np.pi, (64, 20))
        p_cs = rng.uniform(-np.pi, np.pi, (64, 20))
        p_zn = rng.uniform(-np.pi, np.pi, (64, 20))
        rs, rn = compute_correlation_coefficients(ns, cs, zn)
        rs_r, rn_r = ref.compute_correlation_coefficients(ns, cs, zn)
        np.testing.assert_allclose(np.asarray(rs), rs_r, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(rn), rn_r, rtol=1e-5)
        f1, f2 = compute_phase_differences(p_ns, p_cs, p_zn)
        f1_r, f2_r = ref.compute_phase_differences(p_ns, p_cs, p_zn)
        ours = np.asarray(compute_pcirm(cs, zn, rs, rn, f1, f2))
        theirs = ref.compute_pcirm(cs, zn, rs_r, rn_r, f1_r, f2_r)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)

    def test_opt_pcirm_steps(self, ref_modules):
        ref = ref_modules["masks.opt_pcirm"]
        steps, n_exp = compute_snr_boundaries()
        steps_r, n_exp_r = ref.compute_snr_boundaries()
        np.testing.assert_allclose(steps, steps_r, rtol=1e-10)
        assert abs(n_exp - n_exp_r) < 1e-10

    def test_quantize(self, ref_modules, rng):
        ref = ref_modules["masks.opt_pcirm"]
        steps, _ = compute_snr_boundaries()
        pcirm = rng.uniform(0, 1, (64, 30))
        for mid in [None, 0.37]:
            ours = np.asarray(quantize_pcirm(pcirm, steps, mid))
            theirs = ref.quantize_pcirm(pcirm, steps, mid)
            np.testing.assert_allclose(ours, theirs, rtol=1e-6)


class TestFeatureParity:
    def test_ams(self, ref_modules, rng):
        ref = ref_modules["signal_processing.features"]
        # long segment → real (non-zero) AMS values
        x = _signal(rng, 8000)
        ours = np.asarray(extract_ams(x))
        theirs = ref.extract_ams(x.astype(np.float64))
        np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=1e-3)

    def test_ams_short_is_zero(self, ref_modules, rng):
        ref = ref_modules["signal_processing.features"]
        x = _signal(rng, 640)  # the per-frame AMS window
        ours = np.asarray(extract_ams(x))
        theirs = ref.extract_ams(x.astype(np.float64))
        assert np.all(theirs == 0.0)  # reference quirk (SURVEY §0.3 class)
        assert np.all(ours == 0.0)

    def test_mfcc(self, ref_modules, rng):
        ref = ref_modules["signal_processing.features"]
        x = _signal(rng, 4000)
        ours = np.asarray(extract_mfcc(x))
        theirs = ref.extract_mfcc(x.astype(np.float64))
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)

    def test_rasta_plp(self, ref_modules, rng):
        ref = ref_modules["signal_processing.features"]
        x = _signal(rng, 4000)
        ours = np.asarray(extract_rasta_plp(x))
        theirs = ref.extract_rasta_plp(x.astype(np.float64))
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)

    def test_frame_features(self, ref_modules, rng):
        ref = ref_modules["signal_processing.features"]
        x = _signal(rng, 2400)
        fe_ours = FeatureExtractor()
        fe_ref = ref.FeatureExtractor()
        ours = np.asarray(fe_ours.extract_frame_features(x))
        theirs = fe_ref.extract_frame_features(x.astype(np.float64))
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, rtol=5e-3, atol=5e-3)

    def test_context(self, ref_modules, rng):
        ref = ref_modules["signal_processing.features"]
        feats = rng.standard_normal((17, 54)).astype(np.float32)
        ours = np.asarray(FeatureExtractor().add_context(feats))
        theirs = ref.FeatureExtractor().add_context(feats)
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)
