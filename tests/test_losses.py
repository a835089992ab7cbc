"""Loss function tests, incl. parity with the reference torch losses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sincformer_tpu.train.losses import (PerceptualSTOILoss,
                                         mse_mask_loss,
                                         multi_resolution_stft_loss,
                                         perceptual_stoi_loss, si_snr_loss)


def _pair(rng, b=2, n=8000):
    clean = rng.standard_normal((b, n)).astype(np.float32)
    est = clean + 0.3 * rng.standard_normal((b, n)).astype(np.float32)
    return jnp.asarray(est), jnp.asarray(clean)


class TestSISNR:
    def test_parity_with_reference(self, ref_modules, rng):
        import torch
        import importlib
        ref_cp = importlib.import_module("training.conformer_pipeline")
        est, tgt = _pair(rng)
        ours = float(si_snr_loss(est, tgt))
        theirs = float(ref_cp.si_snr_loss(torch.from_numpy(np.asarray(est)),
                                          torch.from_numpy(np.asarray(tgt))))
        assert abs(ours - theirs) < 1e-3

    def test_perfect_estimate(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4000)), jnp.float32)
        assert float(si_snr_loss(x, x)) < -70  # −SI-SNR → very negative

    def test_gradient(self, rng):
        est, tgt = _pair(rng, b=1, n=2000)
        g = jax.grad(lambda e: si_snr_loss(e, tgt))(est)
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.sum(jnp.abs(g))) > 0

    def test_masked_equals_trimmed(self, rng):
        est, tgt = _pair(rng, b=1, n=2000)
        est_p = jnp.pad(est, ((0, 0), (0, 500)))
        tgt_p = jnp.pad(tgt, ((0, 0), (0, 500)))
        mask = jnp.pad(jnp.ones((1, 2000)), ((0, 0), (0, 500)))
        full = float(si_snr_loss(est, tgt))
        masked = float(si_snr_loss(est_p, tgt_p, sample_mask=mask))
        assert abs(full - masked) < 1e-4


class TestMRSTFT:
    def test_parity_with_reference(self, ref_modules, rng):
        import torch
        import importlib
        ref_cp = importlib.import_module("training.conformer_pipeline")
        est, tgt = _pair(rng)
        ours = float(multi_resolution_stft_loss(est, tgt))
        loss_mod = ref_cp.MultiResolutionSTFTLoss()
        theirs = float(loss_mod(torch.from_numpy(np.asarray(est)),
                                torch.from_numpy(np.asarray(tgt))))
        assert abs(ours - theirs) / max(abs(theirs), 1e-6) < 2e-2

    def test_zero_at_identity(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4000)), jnp.float32)
        assert float(multi_resolution_stft_loss(x, x)) < 1e-5


class TestMSEMask:
    def test_basic(self, rng):
        a = jnp.asarray(rng.uniform(0, 1, (4, 10, 64)), jnp.float32)
        b = jnp.asarray(rng.uniform(0, 1, (4, 10, 64)), jnp.float32)
        ours = float(mse_mask_loss(a, b))
        assert abs(ours - float(jnp.mean((a - b) ** 2))) < 1e-7

    def test_frame_mask(self, rng):
        a = jnp.asarray(rng.uniform(0, 1, (1, 10, 8)), jnp.float32)
        b = jnp.asarray(rng.uniform(0, 1, (1, 10, 8)), jnp.float32)
        m = jnp.asarray(np.concatenate([np.ones((1, 6)), np.zeros((1, 4))],
                                       axis=1), jnp.float32)
        masked = float(mse_mask_loss(a, b, m))
        trimmed = float(jnp.mean((a[:, :6] - b[:, :6]) ** 2))
        assert abs(masked - trimmed) < 1e-6


class TestPerceptualSTOI:
    def test_parity_with_reference(self, ref_modules, rng):
        import torch
        import importlib
        ref_losses = importlib.import_module("training.losses")
        spec_c = np.abs(rng.standard_normal((2, 129, 90))).astype(np.float32)
        spec_e = spec_c + 0.1 * np.abs(
            rng.standard_normal((2, 129, 90))).astype(np.float32)
        ours = float(perceptual_stoi_loss(jnp.asarray(spec_e),
                                          jnp.asarray(spec_c)))
        ref_loss = ref_losses.PerceptualSTOILoss()
        theirs = float(ref_loss(torch.from_numpy(spec_e),
                                torch.from_numpy(spec_c)))
        assert abs(ours - theirs) < 1e-3

    def test_identity_maximises(self, rng):
        spec = jnp.asarray(np.abs(rng.standard_normal((1, 129, 90))),
                           jnp.float32)
        ident = float(perceptual_stoi_loss(spec, spec))
        noisy = float(perceptual_stoi_loss(
            spec + jnp.asarray(np.abs(rng.standard_normal((1, 129, 90))),
                               jnp.float32), spec))
        assert ident < noisy  # more negative = better


class TestAdversarial:
    def test_gan_losses(self, rng):
        from sincformer_tpu.train.adversarial import (
            MultiScaleDiscriminator, discriminator_loss,
            feature_matching_loss, generator_loss)
        disc = MultiScaleDiscriminator()
        real = jnp.asarray(np.abs(rng.standard_normal((2, 64, 129))),
                           jnp.float32)
        fake = jnp.asarray(np.abs(rng.standard_normal((2, 64, 129))),
                           jnp.float32)
        params = disc.init(jax.random.PRNGKey(0), real)
        out_r = disc.apply(params, real)
        out_f = disc.apply(params, fake)
        assert len(out_r) == 3
        d = float(discriminator_loss(out_r, out_f))
        g = float(generator_loss(out_f))
        fm = float(feature_matching_loss(out_r, out_f))
        assert d > 0 and g > 0 and fm > 0

    def test_normed_conv_weight_norm(self, rng):
        """_NormedConv's effective kernel has per-output-channel L2 norm
        equal to |gain| (the weight-norm conditioning the reference gets
        from spectral_norm, losses.py:162,169) — and scaling the raw V
        parameter must NOT change the output (norm invariance)."""
        from sincformer_tpu.train.adversarial import _NormedConv
        conv = _NormedConv(features=8, kernel_size=5, stride=1)
        x = jnp.asarray(rng.standard_normal((2, 32, 4)), jnp.float32)
        params = conv.init(jax.random.PRNGKey(0), x)
        v = params["params"]["kernel_v"]
        g = params["params"]["gain"]
        w = (v / jnp.sqrt(jnp.sum(v ** 2, axis=(0, 1)) + 1e-12)) * g
        norms = jnp.sqrt(jnp.sum(w ** 2, axis=(0, 1)))
        assert float(jnp.max(jnp.abs(norms - jnp.abs(g)))) < 1e-5
        # output invariant to rescaling V (only the direction matters)
        y1 = conv.apply(params, x)
        params2 = jax.tree.map(lambda p: p, params)
        params2["params"]["kernel_v"] = v * 7.3
        y2 = conv.apply(params2, x)
        assert float(jnp.max(jnp.abs(y1 - y2))) < 1e-4

    def test_discriminator_gradient(self, rng):
        from sincformer_tpu.train.adversarial import (
            MultiScaleDiscriminator, discriminator_loss)
        disc = MultiScaleDiscriminator()
        real = jnp.asarray(np.abs(rng.standard_normal((1, 32, 129))),
                           jnp.float32)
        fake = real * 0.5
        params = disc.init(jax.random.PRNGKey(0), real)

        def loss(p):
            return discriminator_loss(disc.apply(p, real),
                                      disc.apply(p, fake))

        g = jax.grad(loss)(params)
        total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
        assert total > 0
