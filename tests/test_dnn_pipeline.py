"""Classic DNN pipeline tests: preprocessing parity, training, inference."""

import numpy as np
import pytest

from sincformer_tpu.data import synthetic_noise, synthetic_speech
from sincformer_tpu.train.dnn_trainer import DNNPipeline, FrameDataset


@pytest.fixture(scope="module")
def tiny_data():
    rng = np.random.default_rng(0)
    clean = [synthetic_speech(0.6) * (0.8 + 0.4 * rng.random())
             for _ in range(6)]
    noises = {"white": synthetic_noise(8000, seed=1)}
    return clean, noises


class TestPreprocessing:
    def test_feature_mask_shapes(self, tiny_data, tmp_path):
        clean, noises = tiny_data
        pipe = DNNPipeline(mask_type="pcirm", use_rbm_pretrain=False,
                           model_dir=str(tmp_path),
                           cache_dir=str(tmp_path / "cache"))
        train, test = pipe.prepare_arrays(clean, noises)
        assert train.features.shape[1] == 594
        assert train.masks.shape[1] == 64
        assert np.all(train.masks >= 0) and np.all(train.masks <= 1)
        assert np.all(np.abs(train.features) <= 10.0)
        # test set reuses train normalisation stats
        np.testing.assert_allclose(test.feat_mean, train.feat_mean)

    def test_cache_roundtrip(self, tiny_data, tmp_path):
        clean, noises = tiny_data
        pipe = DNNPipeline(mask_type="irm", use_rbm_pretrain=False,
                           model_dir=str(tmp_path),
                           cache_dir=str(tmp_path / "cache"))
        t1, _ = pipe.prepare_arrays(clean[:2], noises, use_cache=True)
        t2, _ = pipe.prepare_arrays(clean[:2], noises, use_cache=True)
        np.testing.assert_allclose(t1.features, t2.features, atol=1e-6)

    def test_mask_types(self, tiny_data, tmp_path):
        clean, noises = tiny_data
        for mt in ("irm", "pcirm", "opt_pcirm"):
            pipe = DNNPipeline(mask_type=mt, use_rbm_pretrain=False,
                               model_dir=str(tmp_path))
            train, _ = pipe.prepare_arrays(clean[:2], noises)
            assert len(train) > 0
            if mt == "opt_pcirm":
                uniq = np.unique(np.round(train.masks, 4))
                assert len(uniq) <= 3  # quantized to 3 steps


class TestDNNTraining:
    def test_training_converges(self, tiny_data, tmp_path):
        clean, noises = tiny_data
        pipe = DNNPipeline(mask_type="pcirm", use_rbm_pretrain=False,
                           model_dir=str(tmp_path))
        train, test = pipe.prepare_arrays(clean, noises)
        hist = pipe.train(train, test, epochs=5, batch_size=64,
                          verbose=False)
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]
        assert int(pipe.state.nan_count) == 0

    def test_rbm_pretrain_path(self, tiny_data, tmp_path):
        clean, noises = tiny_data
        pipe = DNNPipeline(mask_type="irm", use_rbm_pretrain=True,
                           model_dir=str(tmp_path),
                           dcfg=__import__("sincformer_tpu.config",
                                           fromlist=["DNNConfig"]
                                           ).DNNConfig(hidden_units=32,
                                                       hidden_layers=2,
                                                       epochs=2))
        train, test = pipe.prepare_arrays(clean[:3], noises)
        import sincformer_tpu.config as cfgmod
        hist = pipe.train(train, test, epochs=2, batch_size=64,
                          verbose=False)
        assert np.isfinite(hist[-1]["train_loss"])

    def test_kill_and_resume(self, tiny_data, tmp_path):
        """VERDICT r3 #10: DNN resume restores params + optimizer + the
        host schedule state (LR, plateau counter, best val) and SKIPS the
        RBM pretrain — protecting the expensive pretrain stage."""
        clean, noises = tiny_data
        pipe = DNNPipeline(mask_type="pcirm", use_rbm_pretrain=False,
                           model_dir=str(tmp_path))
        train, test = pipe.prepare_arrays(clean, noises)
        hist1 = pipe.train(train, test, epochs=3, batch_size=64,
                           verbose=False)
        assert len(hist1) == 3
        saved_step = int(pipe.state.step)
        assert saved_step > 0

        from sincformer_tpu.train.state import (checkpoint_step,
                                                newest_checkpoint)
        ck = newest_checkpoint(str(tmp_path),
                               ("best_pcirm", "dnn_pcirm_final"))
        assert ck is not None
        ck_step = checkpoint_step(ck)

        pipe2 = DNNPipeline(mask_type="pcirm", use_rbm_pretrain=False,
                            model_dir=str(tmp_path))
        train2, test2 = pipe2.prepare_arrays(clean, noises)
        hist2 = pipe2.train(train2, test2, epochs=6, batch_size=64,
                            verbose=False, resume=True)
        # picked up at the epoch after the checkpointed one, ran to 6
        assert hist2[0]["epoch"] > 0
        assert hist2[-1]["epoch"] == 5
        # optimizer really continued past the checkpoint
        assert int(pipe2.state.step) > ck_step
        # schedule state restored: starting LR equals the saved epoch's LR
        assert hist2[0]["lr"] == pytest.approx(
            hist1[hist2[0]["epoch"] - 1]["lr"])
        assert all(np.isfinite(h["train_loss"]) for h in hist2)

    def test_resume_skips_rbm_pretrain(self, tiny_data, tmp_path,
                                       monkeypatch):
        clean, noises = tiny_data
        import sincformer_tpu.config as cfgmod
        dcfg = cfgmod.DNNConfig(hidden_units=32, hidden_layers=2)
        pipe = DNNPipeline(mask_type="irm", use_rbm_pretrain=True,
                           model_dir=str(tmp_path), dcfg=dcfg)
        train, test = pipe.prepare_arrays(clean[:3], noises)
        pipe.train(train, test, epochs=2, batch_size=64, verbose=False)

        pipe2 = DNNPipeline(mask_type="irm", use_rbm_pretrain=True,
                            model_dir=str(tmp_path), dcfg=dcfg)

        def _boom(*a, **k):
            raise AssertionError("RBM pretrain ran during resume")
        monkeypatch.setattr(pipe2, "_rbm_pretrain", _boom)
        train2, test2 = pipe2.prepare_arrays(clean[:3], noises)
        hist = pipe2.train(train2, test2, epochs=3, batch_size=64,
                           verbose=False, resume=True)
        assert hist and hist[-1]["epoch"] == 2

    def test_enhance_and_checkpoint(self, tiny_data, tmp_path):
        clean, noises = tiny_data
        pipe = DNNPipeline(mask_type="pcirm", use_rbm_pretrain=False,
                           model_dir=str(tmp_path))
        train, test = pipe.prepare_arrays(clean[:4], noises)
        pipe.train(train, test, epochs=2, batch_size=64, verbose=False)
        noisy = clean[0] + 0.2 * np.random.default_rng(3).standard_normal(
            len(clean[0])).astype(np.float32)
        out = pipe.enhance_signal(noisy)
        assert out.shape == noisy.shape
        assert np.all(np.isfinite(out))

        pipe.save_model()
        pipe2 = DNNPipeline(mask_type="pcirm", use_rbm_pretrain=False,
                            model_dir=str(tmp_path))
        pipe2.load_model()
        out2 = pipe2.enhance_signal(noisy)
        np.testing.assert_allclose(out, out2, atol=1e-5)

    def test_enhance_parity_with_reference_interp(self, tiny_data,
                                                  ref_modules, tmp_path):
        """The gammatone→STFT interpolation + masked iSTFT reconstruction
        must match the reference formula for a FIXED mask."""
        import jax.numpy as jnp
        from sincformer_tpu.dsp.stft import istft_uncentered, stft_uncentered
        from sincformer_tpu.dsp.gammatone import erb_space

        rng = np.random.default_rng(5)
        noisy = rng.standard_normal(4000).astype(np.float64)
        t = (4000 - 160) // 80 + 1
        mask64 = rng.uniform(0, 1, (t, 64))

        # ours (vectorised)
        spec = stft_uncentered(jnp.asarray(noisy, jnp.float32))
        centers = erb_space(50, 4000, 64)
        stft_freqs = np.linspace(0, 4000, 129)
        import jax
        stft_mask = jax.vmap(lambda row: jnp.interp(
            jnp.asarray(stft_freqs), jnp.asarray(centers), row,
            left=row[0], right=row[-1]))(jnp.asarray(mask64, jnp.float32))
        ours = np.asarray(istft_uncentered(spec[:t] * stft_mask, 4000))

        # reference formula re-run (NumPy, from pipeline.py:896-934)
        window = np.hanning(160)
        stft_np = np.stack([np.fft.rfft(noisy[i * 80:i * 80 + 160] * window,
                                        n=256) for i in range(t)])
        m = np.stack([np.interp(stft_freqs, centers, mask64[i],
                                left=mask64[i, 0], right=mask64[i, -1])
                      for i in range(t)])
        enhanced = np.zeros(4000)
        wsum = np.zeros(4000)
        for i in range(t):
            fr = np.fft.irfft(stft_np[i] * m[i], n=256)[:160]
            enhanced[i * 80:i * 80 + 160] += fr * window
            wsum[i * 80:i * 80 + 160] += window ** 2
        wsum[wsum < 1e-8] = 1.0
        theirs = enhanced / wsum
        np.testing.assert_allclose(ours, theirs, atol=5e-4)


class TestBatchedEnhance:
    def test_mixed_length_batch_matches_serial(self, tiny_data, tmp_path):
        """Round-4 review #4: rows padded to a common length must use
        their OWN valid-frame counts — batched output over a mixed-length
        bucket equals the serial enhance_signal of each unpadded row."""
        clean, noises = tiny_data
        pipe = DNNPipeline(mask_type="pcirm", use_rbm_pretrain=False,
                           model_dir=str(tmp_path))
        train, test = pipe.prepare_arrays(clean[:4], noises)
        pipe.train(train, test, epochs=1, batch_size=64, verbose=False)
        rng = np.random.default_rng(5)
        lens = [4000, 3210, 2400]
        sigs = [rng.standard_normal(n).astype(np.float32) * 0.3
                for n in lens]
        q = 4000
        batch = np.stack([np.pad(s, (0, q - len(s))) for s in sigs])
        out_b = pipe.enhance_batch(batch, lengths=np.asarray(lens))
        for row, s in enumerate(sigs):
            serial = pipe.enhance_signal(s, pad_quantum=q)
            # rtol covers vmap-vs-single fusion-order float noise; a
            # valid-frame mask bug shows up as O(1) magnitude differences
            np.testing.assert_allclose(out_b[row, :len(s)], serial,
                                       rtol=2e-3, atol=1e-4,
                                       err_msg=str(lens[row]))

    def test_enhance_batch_matches_single(self, tiny_data, tmp_path):
        clean, noises = tiny_data
        pipe = DNNPipeline(mask_type="irm", use_rbm_pretrain=False,
                           model_dir=str(tmp_path))
        train, test = pipe.prepare_arrays(clean[:3], noises)
        pipe.train(train, test, epochs=1, batch_size=64, verbose=False)
        rng = np.random.default_rng(9)
        noisy = np.stack([c + 0.2 * rng.standard_normal(len(c))
                          .astype(np.float32) for c in clean[:3]])
        batch_out = pipe.enhance_batch(noisy)
        for b in range(3):
            single = pipe.enhance_signal(noisy[b],
                                         pad_quantum=noisy.shape[1])
            np.testing.assert_allclose(batch_out[b], single,
                                       rtol=1e-4, atol=1e-3)
