"""Validation-calibrated output gain.

The SI-SNR term that dominates both the DCSE triple loss and the flagship
curriculum loss is scale-invariant, so the models' absolute output level is
only weakly anchored and drifts with long training (measured: the 150-epoch
extended run's oracle gain drifted to 1.256, costing 2.2 dB segmental SNR —
scripts/probe_gain_drift.py). The trainers now recompute a geometric-mean
oracle gain on the validation set every epoch, persist it in the checkpoint
sidecar, and inference applies it. These tests pin: persistence, the
enhance-path application, load_model pickup, the env kill-switch, and
post-hoc calibration idempotence.
"""

import numpy as np
import pytest

from sincformer_tpu.data import (WaveformDataset, synthetic_noise,
                                 synthetic_speech)
from sincformer_tpu.models.dcse import SpeechEnhancer
from sincformer_tpu.train.agent_trainer import SincformerPipeline
from sincformer_tpu.train.dcse_trainer import DCSEPipeline
from sincformer_tpu.train.state import read_train_meta


def tiny_metacog():
    from sincformer_tpu.train.agent_trainer import default_metacog
    return default_metacog(
        encoder_channels=32, cpea_hidden=16, cpea_channels=8,
        d_model=32, msa_blocks=1, num_heads=2, d_ff=64, kernel_size=7,
        dropout=0.0, memory_slots=4, sinc_kernel_size=65)


@pytest.fixture(scope="module")
def trained_sinc(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gaincal_sinc")
    rng = np.random.default_rng(0)
    clean = [synthetic_speech(0.5) * (0.7 + 0.6 * rng.random())
             for _ in range(6)]
    noises = {"white": synthetic_noise(8000, seed=1)}
    pipe = SincformerPipeline(model=tiny_metacog(), model_dir=str(tmp))
    pipe.train(clean, clean[:2], noises, epochs=1, batch_size=2,
               max_len=4000, verbose=False, use_curriculum=False)
    pipe.save_model("sincformer_final")
    return pipe, tmp, clean, noises


class TestSincformerGain:
    def test_training_persists_gain(self, trained_sinc):
        pipe, tmp, _, _ = trained_sinc
        assert np.isfinite(pipe.output_gain) and pipe.output_gain > 0
        for fam in ("best_sincformer", "sincformer_final"):
            meta = read_train_meta(str(tmp), fam)
            assert meta is not None and "output_gain" in meta, fam
            assert np.isfinite(meta["output_gain"]) and meta["output_gain"] > 0
        # the best-val tracking keys coexist with the gain (merge, not
        # clobber)
        meta = read_train_meta(str(tmp), "best_sincformer")
        assert "best_val" in meta and "output_gain" in meta

    def test_enhance_applies_gain(self, trained_sinc):
        pipe, _, clean, _ = trained_sinc
        rng = np.random.default_rng(3)
        noisy = (clean[0][:4000]
                 + 0.3 * rng.standard_normal(4000).astype(np.float32))
        saved = pipe.output_gain
        try:
            pipe.output_gain = 1.0
            base = pipe.enhance_signal(noisy)
            pipe.output_gain = 1.7
            scaled = pipe.enhance_signal(noisy)
        finally:
            pipe.output_gain = saved
        np.testing.assert_allclose(scaled, 1.7 * base, rtol=1e-5, atol=1e-7)

    def test_load_model_picks_up_gain(self, trained_sinc):
        pipe, tmp, _, _ = trained_sinc
        fresh = SincformerPipeline(model=tiny_metacog(), model_dir=str(tmp))
        fresh.load_model()
        meta = read_train_meta(str(tmp), "sincformer_final")
        assert fresh.output_gain == pytest.approx(meta["output_gain"])

    def test_env_override_disables(self, trained_sinc, monkeypatch):
        pipe, tmp, _, _ = trained_sinc
        monkeypatch.setenv("SINCFORMER_OUTPUT_GAIN", "off")
        fresh = SincformerPipeline(model=tiny_metacog(), model_dir=str(tmp))
        fresh.load_model()
        assert fresh.output_gain == 1.0

    def test_env_override_forces_value(self, trained_sinc, monkeypatch):
        pipe, tmp, _, _ = trained_sinc
        monkeypatch.setenv("SINCFORMER_OUTPUT_GAIN", "1.25")
        fresh = SincformerPipeline(model=tiny_metacog(), model_dir=str(tmp))
        fresh.load_model()
        assert fresh.output_gain == pytest.approx(1.25)

    def test_calibrate_gain_idempotent(self, trained_sinc):
        """After one calibration pass the residual oracle gain is ~1, so a
        second pass is a no-op — the fit actually converged."""
        pipe, tmp, clean, noises = trained_sinc
        fresh = SincformerPipeline(model=tiny_metacog(), model_dir=str(tmp))
        fresh.load_model()
        g1 = fresh.calibrate_gain(clean[:4], noises, batch_size=2,
                                  max_len=4000, persist=False)
        g2 = fresh.calibrate_gain(clean[:4], noises, batch_size=2,
                                  max_len=4000, persist=False)
        assert np.isfinite(g1) and g1 > 0
        assert g2 == pytest.approx(g1, rel=1e-3)

    def test_calibrate_gain_persists(self, trained_sinc):
        pipe, tmp, clean, noises = trained_sinc
        fresh = SincformerPipeline(model=tiny_metacog(), model_dir=str(tmp))
        fresh.load_model()
        g = fresh.calibrate_gain(clean[:4], noises, batch_size=2,
                                 max_len=4000)
        meta = read_train_meta(str(tmp), "sincformer_final")
        assert meta["output_gain"] == pytest.approx(g)


class TestHeldoutNoise:
    def test_disjoint_crops(self):
        """Val/calibration crops (noise[:n] of the rotated array) must be
        disjoint from training crops (noise[:n] of the original) for any
        n ≤ half the array — same samples, different leading window."""
        from sincformer_tpu.data.loader import heldout_noises
        noises = {"white": np.arange(100, dtype=np.float32)}
        h = heldout_noises(noises)
        assert h["white"].shape == (100,)
        assert np.array_equal(np.sort(h["white"]), np.arange(100))
        assert np.array_equal(h["white"][:50], noises["white"][50:])

    def test_training_val_uses_heldout_crops(self, tmp_path, monkeypatch):
        """The flagship train loop must route its val mixing through
        heldout_noises (the memorized-realization bias fix)."""
        import sincformer_tpu.data.loader as loader
        calls = []
        orig = loader.heldout_noises
        monkeypatch.setattr(loader, "heldout_noises",
                            lambda n: calls.append(1) or orig(n))
        rng = np.random.default_rng(0)
        clean = [synthetic_speech(0.5) for _ in range(4)]
        noises = {"white": synthetic_noise(8000, seed=1)}
        pipe = SincformerPipeline(model=tiny_metacog(),
                                  model_dir=str(tmp_path))
        pipe.train(clean, clean[:2], noises, epochs=1, batch_size=2,
                   max_len=4000, verbose=False, use_curriculum=False)
        assert calls, "train() no longer mixes val with held-out noise"


class TestDCSEGain:
    def test_train_persist_load_roundtrip(self, tmp_path):
        model = SpeechEnhancer(n_freq=129, d_model=32, num_blocks=1,
                               num_heads=2, d_ff=64, kernel_size=7,
                               dropout=0.0)
        pipe = DCSEPipeline(model=model, model_dir=str(tmp_path))
        rng = np.random.default_rng(5)
        sigs = [synthetic_speech(0.5) * (0.8 + 0.4 * rng.random())
                for _ in range(6)]
        noises = {"white": synthetic_noise(8000, seed=2)}
        ds = WaveformDataset.from_arrays(sigs, noises, max_len=4000)
        pipe.train(ds, ds, epochs=1, batch_size=2, verbose=False)
        pipe.save_model("conformer_final")
        assert np.isfinite(pipe.output_gain) and pipe.output_gain > 0
        meta = read_train_meta(str(tmp_path), "conformer_final")
        assert meta["output_gain"] == pytest.approx(pipe.output_gain)

        fresh = DCSEPipeline(model=model, model_dir=str(tmp_path))
        fresh.load_model()
        assert fresh.output_gain == pytest.approx(pipe.output_gain)

        noisy = sigs[0][:4000] + 0.2 * rng.standard_normal(4000).astype(
            np.float32)
        saved = fresh.output_gain
        fresh.output_gain = 1.0
        base = fresh.enhance_signal(noisy)
        fresh.output_gain = saved
        out = fresh.enhance_signal(noisy)
        np.testing.assert_allclose(out, saved * base, rtol=1e-5, atol=1e-7)

        # post-hoc calibration composes with the loaded gain and converges
        g1 = fresh.calibrate_gain(ds, batch_size=2, persist=False)
        g2 = fresh.calibrate_gain(ds, batch_size=2, persist=False)
        assert g2 == pytest.approx(g1, rel=1e-3)


class TestEvalGainEstimator:
    """Round-4 review of the per-epoch gain estimate (both trainers):

    (a) α must be computed over TRUE samples only — batches are zero-
        padded and model output on the pad region inflates the α
        denominator, biasing the persisted gain low for every short
        utterance;
    (b) degenerate utterances (silent clean → α ≈ 0) must be EXCLUDED
        like calibrate_gain does, not clipped into the mean where one
        silent val utterance drags the gain by exp(log(1e-3)/N);
    (c) the loop aggregates (sum, count) across batches — one geometric
        mean, not a mean of unequal-size batch means.
    """

    def _batch(self, rng, T=4000, n1=2500):
        c = np.zeros((2, T), np.float32)
        c[0] = synthetic_speech(0.5)
        c[1, :n1] = synthetic_speech(0.5)[:n1]
        noisy = c + rng.standard_normal((2, T)).astype(np.float32) * 0.05
        noisy[1, n1:] = 0.0
        return noisy, c, np.array([T, n1], np.int64)

    def test_sincformer_alpha_masked_to_true_length(self, trained_sinc):
        import jax
        import jax.numpy as jnp
        pipe, _, _, _ = trained_sinc
        noisy, c, lengths = self._batch(np.random.default_rng(3))
        # expected: α over the true samples of the ACTUAL eval-path output
        _, aux = pipe._loss(pipe.state.params, pipe.state.model_state,
                            jnp.asarray(noisy), jnp.asarray(c),
                            jax.random.PRNGKey(0), False,
                            jnp.asarray(1.0), jnp.asarray(1.0))
        enh = np.asarray(aux["enh_wav"])
        exp = []
        for i, n in enumerate(lengths):
            e, cc = enh[i, :n], c[i, :n]
            exp.append(np.log(np.dot(cc, e) / (np.dot(e, e) + 1e-12)))
        step = pipe._make_eval_step()
        _, _, lg_sum, lg_cnt = step(pipe.state, jnp.asarray(noisy),
                                    jnp.asarray(c), jnp.asarray(lengths))
        assert int(lg_cnt) == 2
        np.testing.assert_allclose(float(lg_sum), sum(exp),
                                   rtol=1e-4, atol=1e-5)
        # and the mask MATTERS: claiming full length for the short row
        # must move the estimate (the padded region carries model output)
        _, _, lg_full, _ = step(pipe.state, jnp.asarray(noisy),
                                jnp.asarray(c),
                                jnp.asarray([len(c[0])] * 2))
        assert abs(float(lg_full) - float(lg_sum)) > 1e-6

    def test_sincformer_degenerate_excluded(self, trained_sinc):
        import jax.numpy as jnp
        pipe, _, _, _ = trained_sinc
        noisy, c, lengths = self._batch(np.random.default_rng(4))
        c[1] = 0.0                     # silent clean → α ≈ 0 → excluded
        step = pipe._make_eval_step()
        _, _, lg_sum, lg_cnt = step(pipe.state, jnp.asarray(noisy),
                                    jnp.asarray(c), jnp.asarray(lengths))
        assert int(lg_cnt) == 1
        assert np.isfinite(float(lg_sum))

    def test_dcse_alpha_masked_and_degenerate_excluded(self, tmp_path):
        import jax.numpy as jnp
        model = SpeechEnhancer(n_freq=129, d_model=32, num_blocks=1,
                               num_heads=2, d_ff=64, kernel_size=7,
                               dropout=0.0)
        pipe = DCSEPipeline(model=model, model_dir=str(tmp_path))
        pipe.init_state(epochs=1, steps_per_epoch=1, example_len=4000)
        noisy, c, lengths = self._batch(np.random.default_rng(5))
        step = pipe._make_eval_step()
        _, _, lg_sum, lg_cnt = step(pipe.state.params,
                                    pipe.state.model_state,
                                    jnp.asarray(noisy), jnp.asarray(c),
                                    jnp.asarray(lengths))
        assert int(lg_cnt) == 2 and np.isfinite(float(lg_sum))
        _, _, lg_full, _ = step(pipe.state.params, pipe.state.model_state,
                                jnp.asarray(noisy), jnp.asarray(c),
                                jnp.asarray([len(c[0])] * 2))
        assert abs(float(lg_full) - float(lg_sum)) > 1e-6
        c2 = c.copy()
        c2[1] = 0.0
        _, _, _, cnt2 = step(pipe.state.params, pipe.state.model_state,
                             jnp.asarray(noisy), jnp.asarray(c2),
                             jnp.asarray(lengths))
        assert int(cnt2) == 1
