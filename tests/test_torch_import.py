"""Torch-checkpoint migration: converted models must match the reference
forward pass numerically — the switch-over guarantee for reference users."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_models(ref_modules):
    import importlib
    return (importlib.import_module("models.dnn"),
            importlib.import_module("training.conformer_pipeline"))


class TestDNNImport:
    def test_forward_parity(self, ref_models, rng):
        ref_dnn_mod, _ = ref_models
        from sincformer_tpu.compat import import_dnn_state_dict
        from sincformer_tpu.models.dnn import SpeechEnhancementDNN

        tmodel = ref_dnn_mod.SpeechEnhancementDNN(
            input_dim=100, hidden_dim=64, output_dim=16,
            num_hidden_layers=3, dropout=0.2).eval()
        variables = import_dnn_state_dict(tmodel.state_dict())
        ours = SpeechEnhancementDNN(input_dim=100, hidden_dim=64,
                                    output_dim=16, num_hidden_layers=3)

        x = rng.standard_normal((5, 100)).astype(np.float32)
        with torch.no_grad():
            theirs = tmodel(torch.from_numpy(x)).numpy()
        mine = np.asarray(ours.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(mine, theirs, atol=1e-5)


class TestDCSEImport:
    def test_forward_parity(self, ref_models, rng):
        _, ref_cp = ref_models
        from sincformer_tpu.compat import import_dcse_state_dict
        from sincformer_tpu.models.dcse import SpeechEnhancer

        tmodel = ref_cp.SpeechEnhancer(n_freq=33, d_model=32, num_blocks=2,
                                       num_heads=2, d_ff=64, kernel_size=7,
                                       dropout=0.0).eval()
        variables = import_dcse_state_dict(tmodel.state_dict(), num_blocks=2)
        ours = SpeechEnhancer(n_freq=33, d_model=32, num_blocks=2,
                              num_heads=2, d_ff=64, kernel_size=7,
                              dropout=0.0, conv_norm="batch")

        re = rng.standard_normal((2, 12, 33)).astype(np.float32)
        im = rng.standard_normal((2, 12, 33)).astype(np.float32)
        with torch.no_grad():
            er_t, ei_t, mag_t = tmodel(torch.from_numpy(re),
                                       torch.from_numpy(im))
        er, ei, mag = ours.apply(variables, jnp.asarray(re),
                                 jnp.asarray(im), deterministic=True)
        np.testing.assert_allclose(np.asarray(mag), mag_t.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(er), er_t.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(ei), ei_t.numpy(), atol=1e-4)

    def test_checkpoint_file_roundtrip(self, ref_models, tmp_path, rng):
        """Save a reference-format .pt, load via load_reference_checkpoint,
        enhance a waveform — the actual migration flow."""
        _, ref_cp = ref_models
        from sincformer_tpu.compat import load_reference_checkpoint
        from sincformer_tpu.dsp.stft import istft, stft
        from sincformer_tpu.models.dcse import SpeechEnhancer

        tmodel = ref_cp.SpeechEnhancer(n_freq=129, d_model=32, num_blocks=2,
                                       num_heads=2, d_ff=64, kernel_size=7,
                                       dropout=0.0).eval()
        path = str(tmp_path / "conformer_final.pt")
        torch.save({"model_state": tmodel.state_dict(),
                    "model_class": "SpeechEnhancer"}, path)

        loaded = load_reference_checkpoint(path)
        assert loaded["kind"] == "dcse"
        ours = SpeechEnhancer(n_freq=129, d_model=32, num_blocks=2,
                              num_heads=2, d_ff=64, kernel_size=7,
                              dropout=0.0, conv_norm="batch")
        wav = rng.standard_normal(4000).astype(np.float32)
        spec = stft(jnp.asarray(wav)[None])
        er, ei, _ = ours.apply(loaded["variables"], spec.real, spec.imag,
                               deterministic=True)
        out = istft(er + 1j * ei, length=4000)

        # reference end-to-end on the same waveform
        t_re, t_im = ref_cp.batch_stft(torch.from_numpy(wav)[None],
                                       256, 80, 160)
        with torch.no_grad():
            ter, tei, _ = tmodel(t_re, t_im)
        t_out = ref_cp.batch_istft(ter, tei, 256, 80, 160, 4000).numpy()[0]
        np.testing.assert_allclose(np.asarray(out[0]), t_out, atol=1e-4)


class TestEvaluateDiscoversTorch:
    def test_grid_discovery_of_pt_file(self, ref_models, tmp_path, rng):
        """evaluate's discovery loads a reference-format .pt directly."""
        _, ref_cp = ref_models
        from sincformer_tpu.evaluation.grid import discover_pipelines

        tmodel = ref_cp.SpeechEnhancer(n_freq=129, d_model=32, num_blocks=1,
                                       num_heads=2, d_ff=64, kernel_size=7,
                                       dropout=0.0).eval()
        torch.save({"model_state": tmodel.state_dict(),
                    "model_class": "SpeechEnhancer"},
                   str(tmp_path / "conformer_final.pt"))
        pipes = discover_pipelines(str(tmp_path))
        assert "conformer" in pipes
        out = pipes["conformer"].enhance_signal(
            rng.standard_normal(4000).astype(np.float32))
        assert out.shape == (4000,)
        assert np.all(np.isfinite(out))


class TestExportRoundTrip:
    def test_export_then_torch_forward_matches(self, ref_models, tmp_path,
                                               rng):
        """Train-here → export .pt → load in the torch reference → same
        forward output. Closes the migration loop in both directions."""
        _, ref_cp = ref_models
        from sincformer_tpu.compat import save_reference_checkpoint
        from sincformer_tpu.models.dcse import SpeechEnhancer
        import jax

        ours = SpeechEnhancer(n_freq=33, d_model=32, num_blocks=2,
                              num_heads=2, d_ff=64, kernel_size=7,
                              dropout=0.0, conv_norm="batch")
        re = rng.standard_normal((2, 12, 33)).astype(np.float32)
        im = rng.standard_normal((2, 12, 33)).astype(np.float32)
        variables = ours.init(jax.random.PRNGKey(3), jnp.asarray(re),
                              jnp.asarray(im))
        path = str(tmp_path / "exported.pt")
        save_reference_checkpoint(variables, path)

        tmodel = ref_cp.SpeechEnhancer(n_freq=33, d_model=32, num_blocks=2,
                                       num_heads=2, d_ff=64, kernel_size=7,
                                       dropout=0.0)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        tmodel.load_state_dict(ckpt["model_state"])
        tmodel.eval()

        mine = ours.apply(variables, jnp.asarray(re), jnp.asarray(im),
                          deterministic=True)
        with torch.no_grad():
            theirs = tmodel(torch.from_numpy(re), torch.from_numpy(im))
        np.testing.assert_allclose(np.asarray(mine[0]), theirs[0].numpy(),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(mine[2]), theirs[2].numpy(),
                                   atol=2e-5)

    def test_layer_norm_model_rejected(self, rng):
        from sincformer_tpu.compat import export_dcse_state_dict
        from sincformer_tpu.models.dcse import SpeechEnhancer
        import jax

        ours = SpeechEnhancer(n_freq=33, d_model=32, num_blocks=1,
                              num_heads=2, d_ff=64, kernel_size=7,
                              dropout=0.0)  # default conv_norm="layer"
        v = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 33)),
                      jnp.zeros((1, 4, 33)))
        with pytest.raises(ValueError, match="conv_norm='batch'"):
            export_dcse_state_dict(v)


class TestMetricLevelGridParity:
    """Round-1 VERDICT #7: the checkpoint-import bridge was only verified
    at tensor level (1e-4 forward parity). This runs the SAME weights
    through both frameworks' full enhancement stacks (stft → model → istft)
    on the same (clean, noise, SNR) cells and asserts the evaluation
    metrics (STOI / SSNR / PESQ-proxy) agree to < 1e-3 — the acceptance
    bar from BASELINE.md, now measured instead of implied."""

    def test_same_weights_same_metrics(self, ref_models, tmp_path, rng):
        _, ref_cp = ref_models
        from sincformer_tpu.compat.torch_export import (
            save_reference_checkpoint)
        from sincformer_tpu.data.audio import add_noise_at_snr
        from sincformer_tpu.data.synthetic import synthetic_speech
        from sincformer_tpu.evaluation import (compute_pesq, compute_ssnr,
                                               compute_stoi)
        from sincformer_tpu.models.dcse import default_speech_enhancer
        from sincformer_tpu.train.dcse_trainer import DCSEPipeline

        kw = dict(num_blocks=2, d_model=64, d_ff=128, num_heads=2,
                  kernel_size=7, dropout=0.0)
        pipe = DCSEPipeline(model=default_speech_enhancer(
            conv_norm="batch", **kw), model_dir=str(tmp_path))
        pipe.init_state(epochs=1, steps_per_epoch=1, example_len=8000)

        pt = str(tmp_path / "conformer_final.pt")
        save_reference_checkpoint(pipe._variables(), pt)
        tmodel = ref_cp.SpeechEnhancer(n_freq=129, **kw).eval()
        tmodel.load_state_dict(
            torch.load(pt, map_location="cpu",
                       weights_only=True)["model_state"])

        def enhance_torch(noisy):
            with torch.no_grad():
                t = torch.from_numpy(noisy.astype(np.float32)).unsqueeze(0)
                re, im = ref_cp.batch_stft(t, 256, 80, 160)
                er, ei, _ = tmodel(re, im)
                return ref_cp.batch_istft(er, ei, 256, 80, 160,
                                          len(noisy)).squeeze(0).numpy()

        clean = [synthetic_speech(1.0), synthetic_speech(1.0) * 0.7]
        noise = rng.standard_normal(16000).astype(np.float32)
        metrics = {"stoi": compute_stoi, "ssnr": compute_ssnr,
                   "pesq": lambda c, e: compute_pesq(c, e, impl="proxy")}
        max_delta = {k: 0.0 for k in metrics}
        for c in clean:
            for snr in (0.0, 5.0):
                noisy = add_noise_at_snr(c, noise, snr)
                ours = pipe.enhance_signal(noisy, pad_quantum=len(noisy))
                theirs = enhance_torch(noisy)
                # waveform-level agreement first (diagnoses any drift)
                assert np.max(np.abs(ours - theirs)) < 5e-4
                for k, fn in metrics.items():
                    d = abs(fn(c, ours) - fn(c, theirs))
                    max_delta[k] = max(max_delta[k], d)
        for k, d in max_delta.items():
            assert d < 1e-3, (k, d)
