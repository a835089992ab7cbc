"""STFT/iSTFT parity with torch (the DCSE reference transform) and
round-trip properties."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sincformer_tpu.dsp.stft import (istft, istft_uncentered, stft,
                                     stft_frame_count, stft_uncentered)


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


class TestTorchParity:
    def test_stft_matches_torch(self, torch, rng):
        x = rng.standard_normal(12345).astype(np.float32)
        ours = np.asarray(stft(jnp.asarray(x)[None, :])[0])
        ts = torch.stft(torch.from_numpy(x), n_fft=256, hop_length=80,
                        win_length=160, window=torch.hann_window(160),
                        return_complex=True).transpose(0, 1).numpy()
        assert ours.shape == ts.shape
        np.testing.assert_allclose(ours, ts, atol=1e-4)

    def test_istft_matches_torch(self, torch, rng):
        x = rng.standard_normal(8000).astype(np.float32)
        spec = torch.stft(torch.from_numpy(x), n_fft=256, hop_length=80,
                          win_length=160, window=torch.hann_window(160),
                          return_complex=True)
        tw = torch.istft(spec, n_fft=256, hop_length=80, win_length=160,
                         window=torch.hann_window(160), length=8000).numpy()
        ow = np.asarray(istft(jnp.asarray(
            spec.transpose(0, 1).numpy())[None], length=8000)[0])
        np.testing.assert_allclose(ow, tw, atol=1e-4)

    def test_frame_counts(self):
        assert stft_frame_count(16000) == 201           # centered N//hop+1
        assert stft_frame_count(16000, center=False) == 199


class TestRoundTrip:
    def test_centered_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 6400)), jnp.float32)
        y = istft(stft(x), length=6400)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)

    def test_uncentered_identity_mask(self, rng):
        """istft_uncentered(stft_uncentered(x)) reconstructs the windowed
        interior (the DNN inference transform, pipeline.py:886-934)."""
        x = jnp.asarray(rng.standard_normal(4000), jnp.float32)
        spec = stft_uncentered(x)
        y = np.asarray(istft_uncentered(spec, 4000))
        # interior reconstructs; edges are attenuated by the hann taper
        np.testing.assert_allclose(y[160:3840], np.asarray(x)[160:3840],
                                   atol=1e-4)

    def test_batched_consistency(self, rng):
        xs = rng.standard_normal((3, 4000)).astype(np.float32)
        batch = np.asarray(stft(jnp.asarray(xs)))
        singles = [np.asarray(stft(jnp.asarray(x)[None])[0]) for x in xs]
        for b in range(3):
            np.testing.assert_allclose(batch[b], singles[b], atol=1e-6)
