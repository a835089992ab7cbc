"""Native C++ audio runtime vs the Python implementations."""

import numpy as np
import pytest
from scipy.io import wavfile

from sincformer_tpu.data import add_noise_at_snr, load_audio
from sincformer_tpu.data import native


@pytest.fixture(scope="module")
def built():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


class TestWavDecode:
    @pytest.mark.parametrize("dtype,scale", [
        (np.int16, 32767), (np.int32, 2147483647), (np.float32, 1.0)])
    def test_roundtrip_formats(self, built, tmp_path, rng, dtype, scale):
        x = np.clip(rng.standard_normal(4321) * 0.5, -0.9, 0.9)
        path = str(tmp_path / f"t_{np.dtype(dtype).name}.wav")
        if dtype is np.float32:
            wavfile.write(path, 8000, x.astype(np.float32))
        else:
            wavfile.write(path, 8000, (x * scale).astype(dtype))
        out = native.wav_read_mono(path)
        assert out is not None
        samples, sr = out
        assert sr == 8000
        assert len(samples) == 4321
        np.testing.assert_allclose(samples, x, atol=2e-4)

    def test_stereo_mixdown(self, built, tmp_path, rng):
        x = (rng.standard_normal((1000, 2)) * 0.3).astype(np.float32)
        path = str(tmp_path / "stereo.wav")
        wavfile.write(path, 16000, x)
        samples, sr = native.wav_read_mono(path)
        np.testing.assert_allclose(samples, x.mean(axis=1), atol=1e-6)

    def test_load_audio_native_path(self, built, tmp_path, rng):
        """load_audio via native decoder == scipy fallback incl. resample."""
        x = (rng.standard_normal(16000) * 0.4).astype(np.float32)
        path = str(tmp_path / "a.wav")
        wavfile.write(path, 16000, x)
        a = load_audio(path, 8000, use_native=True)
        b = load_audio(path, 8000, use_native=False)
        assert len(a) == len(b) == 8000
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_missing_file(self, built):
        assert native.wav_read_mono("/nonexistent/x.wav") is None


class TestHostOps:
    def test_resample_matches_numpy(self, built, rng):
        x = rng.standard_normal(5000).astype(np.float32)
        ours = native.resample_linear(x, 16000, 8000)
        idx = np.linspace(0, len(x) - 1, 2500)
        ref = np.interp(idx, np.arange(len(x)), x)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_mix_snr_matches_python(self, built, rng):
        clean = rng.standard_normal(4000).astype(np.float32)
        noise = rng.standard_normal(1500).astype(np.float32)
        ours = native.mix_snr(clean, noise, 5.0)
        ref = add_noise_at_snr(clean, noise, 5.0)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_batch_pad(self, built, rng):
        sigs = [rng.standard_normal(n).astype(np.float32)
                for n in (100, 250, 40)]
        out = native.batch_pad(sigs, 250)
        assert out.shape == (3, 250)
        np.testing.assert_allclose(out[0, :100], sigs[0])
        assert np.all(out[0, 100:] == 0)
        np.testing.assert_allclose(out[1], sigs[1])
        np.testing.assert_allclose(out[2, :40], sigs[2])
