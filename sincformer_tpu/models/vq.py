"""Vector quantization with straight-through estimator.

Capability-parity with the reference (``models/vq.py``): M=3 learnable
centroids in [0,1], nearest-neighbour assignment, STE gradient
(``stop_gradient`` form), codebook + β·commitment loss, utilisation stats.
The (N, M) distance computation is one broadcasted subtract — vectorised
over the whole mask tensor.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sincformer_tpu import config as cfg


class VectorQuantizer(nn.Module):
    """Scalar-value VQ over mask tensors (reference vq.py:28-122)."""

    num_centroids: int = 3
    commitment_weight: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """Returns (quantized, indices, total_vq_loss)."""
        centroids = self.param(
            "centroids",
            lambda key, shape: jnp.linspace(0.0, 1.0, self.num_centroids),
            (self.num_centroids,))
        d = (x[..., None] - centroids) ** 2                # (..., M)
        indices = jnp.argmin(d, axis=-1)
        quantized = centroids[indices]
        codebook_loss = jnp.mean(
            (jax.lax.stop_gradient(x) - quantized) ** 2)
        commitment_loss = self.commitment_weight * jnp.mean(
            (x - jax.lax.stop_gradient(quantized)) ** 2)
        # straight-through: forward quantized, backward identity
        quantized = x + jax.lax.stop_gradient(quantized - x)
        return quantized, indices, commitment_loss + codebook_loss

    @staticmethod
    def get_utilization(indices: jnp.ndarray,
                        num_centroids: int = 3) -> jnp.ndarray:
        """Fraction of assignments per centroid (reference vq.py:108-122)."""
        one_hot = jax.nn.one_hot(indices.reshape(-1), num_centroids)
        return jnp.mean(one_hot, axis=0)


def sorted_centroids(params) -> jnp.ndarray:
    """Centroid values sorted ascending (reference vq.py:99-106)."""
    import flax
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    for k, v in flat.items():
        if k[-1] == "centroids":
            return jnp.sort(v)
    raise KeyError("no centroids parameter found")


class VQMaskQuantizer(nn.Module):
    """mask_estimator → soft mask → VQ → quantized mask
    (reference vq.py:125-162)."""

    mask_estimator: nn.Module
    num_centroids: int = 3
    commitment_weight: float = 0.25

    @nn.compact
    def __call__(self, x, return_soft: bool = False, **est_kwargs):
        soft_mask = self.mask_estimator(x, **est_kwargs)
        quantized, _indices, vq_loss = VectorQuantizer(
            self.num_centroids, self.commitment_weight, name="vq")(soft_mask)
        if return_soft:
            return quantized, soft_mask, vq_loss
        return quantized, vq_loss
