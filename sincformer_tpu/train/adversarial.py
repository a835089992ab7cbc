"""Multi-scale spectral adversarial loss (reference ``training/losses.py:150-289``).

HiFi-GAN-style: 3 Conv1d sub-discriminators at {1×, 2×, 4×} temporal
downsampling, LSGAN losses, feature matching. The reference's spectral
normalisation (losses.py:162,169) is replaced by weight normalisation
(``_NormedConv``: W = g·V/‖V‖ per output channel) — spectral norm's power
iteration is a host-unfriendly sequential op on TPU; weight norm gives
the same Lipschitz-style conditioning as one elementwise rescale on
device (documented deviation; normalisation asserted by
tests/test_losses.py::TestNormedConv).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from sincformer_tpu import config as cfg


class _NormedConv(nn.Module):
    """Conv over time with weight normalisation: W = g · V/‖V‖ per output
    channel (Salimans & Kingma 2016). This is the conditioning the
    reference gets from ``nn.utils.spectral_norm`` (losses.py:162,169) —
    weight norm bounds each output channel's kernel energy with one
    elementwise rescale at trace time, where spectral norm's power
    iteration is a sequential host-unfriendly op on TPU."""
    features: int
    kernel_size: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        v = self.param("kernel_v", nn.initializers.lecun_normal(),
                       (self.kernel_size, cin, self.features))
        g = self.param("gain", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2,
                                axis=(0, 1)) + 1e-12)
        w = (v.astype(jnp.float32) / norm) * g
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(self.stride,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"))
        return y + b.astype(y.dtype)


class SubDiscriminator(nn.Module):
    """Single-scale discriminator (reference losses.py:150-180):
    Conv1d stack (stride 2 except last) + LeakyReLU, returning the logit map
    and intermediate features for feature matching.

    Input layout: (B, T, F) — time-major, features = spectrogram bins.
    """
    channels: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        feats = []
        for i, ch in enumerate(self.channels):
            stride = 2 if i < len(self.channels) - 1 else 1
            x = _NormedConv(ch, 5, stride, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
            feats.append(x)
        x = _NormedConv(1, 3, 1, name="head")(x)
        return x, feats


class MultiScaleDiscriminator(nn.Module):
    """3 discriminators at 1×/2×/4× average-pooled scales
    (reference losses.py:183-213)."""

    @nn.compact
    def __call__(self, spec):
        """spec: (B, T, F) magnitude spectrogram → list of (logits, feats)."""
        outs = []
        x = spec
        channel_sets = [(64, 128, 256, 512), (64, 128, 256), (32, 64, 128)]
        for i, chs in enumerate(channel_sets):
            outs.append(SubDiscriminator(chs, name=f"disc_{i}")(x))
            if i < len(channel_sets) - 1:
                x = nn.avg_pool(x, window_shape=(4,), strides=(2,),
                                padding="SAME")
        return outs


def discriminator_loss(disc_outs_real, disc_outs_fake) -> jnp.ndarray:
    """LSGAN D loss averaged over scales (reference losses.py:215-243)."""
    total = 0.0
    for (real_logits, _), (fake_logits, _) in zip(disc_outs_real,
                                                  disc_outs_fake):
        total = total + (jnp.mean((real_logits - 1.0) ** 2)
                         + jnp.mean(fake_logits ** 2))
    return total / len(disc_outs_real)


def generator_loss(disc_outs_fake) -> jnp.ndarray:
    """LSGAN G loss averaged over scales (reference losses.py:245-267)."""
    total = 0.0
    for fake_logits, _ in disc_outs_fake:
        total = total + jnp.mean((fake_logits - 1.0) ** 2)
    return total / len(disc_outs_fake)


def feature_matching_loss(disc_outs_real, disc_outs_fake) -> jnp.ndarray:
    """L1 between real/fake intermediate features
    (reference losses.py:269-289). Real features are stop-gradiented."""
    total = 0.0
    for (_, real_feats), (_, fake_feats) in zip(disc_outs_real,
                                                disc_outs_fake):
        for rf, ff in zip(real_feats, fake_feats):
            total = total + jnp.mean(
                jnp.abs(ff - jax.lax.stop_gradient(rf)))
    return total / len(disc_outs_real)
