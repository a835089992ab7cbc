"""Mask Synthesis Agent — fused features → Conformer → bounded polar mask.

Capability-parity with the reference (``agents/msa.py:20-177``): fuse
[z_real ‖ z_imag ‖ ρs ‖ ρn ‖ φ1 ‖ φ2 ‖ log1p-normalised noisy STFT re+im]
→ 2-layer fusion MLP → ComplexConformer → magnitude/phase heads →
sigmoid magnitude × tanh·(π/8) phase.

DCSE-lesson deviations (deliberate, cited):
  * NO identity-bias trap: the reference initialises the magnitude bias to
    5.0 (sigmoid≈0.993, msa.py:96-99) which its own post-mortem calls "Bug
    12" territory; we use default init (mask starts ≈0.5 attenuation,
    conformer_pipeline.py:25-27 recommends exactly this).
  * the fused latent feeds the Conformer as a (d_model) feature stream via a
    clean projection instead of the reference's n_freq=d_model//2 shape hack
    (msa.py:51-58).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from sincformer_tpu.models.conformer import ConformerBlock


class MaskSynthesisAgent(nn.Module):
    """(z_real, z_imag, cpea_outputs, stft_re, stft_im) → (mask_re, mask_im)."""

    latent_dim: int = 256
    cpea_dim: int = 64
    d_model: int = 256
    n_freq: int = 129
    num_blocks: int = 4
    num_heads: int = 4
    d_ff: int = 1024
    kernel_size: int = 31
    dropout: float = 0.1
    phase_bound_div: float = 8.0   # π/8, reference msa.py:163-168
    attn_impl: str = "xla"   # "xla" | "flash" (Pallas, ops/attention.py)

    @nn.compact
    def __call__(self, z_real, z_imag, cpea_outputs: Dict,
                 noisy_stft_real, noisy_stft_imag,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # channels-first latents → (B, T, D)
        z_r = jnp.swapaxes(z_real, 1, 2)
        z_i = jnp.swapaxes(z_imag, 1, 2)

        # log1p-magnitude normalisation of the raw STFT (msa.py:133-137)
        mag = jnp.sqrt(noisy_stft_real ** 2 + noisy_stft_imag ** 2 + 1e-8)
        norm = jnp.log1p(mag) / mag
        n_r = noisy_stft_real * norm
        n_i = noisy_stft_imag * norm

        fused = jnp.concatenate(
            [z_r, z_i, cpea_outputs["rho_s"], cpea_outputs["rho_n"],
             cpea_outputs["phi1"], cpea_outputs["phi2"], n_r, n_i], axis=-1)

        x = nn.Dense(self.d_model, name="fusion1")(fused)
        x = nn.LayerNorm(name="fusion_ln1")(x)
        x = nn.gelu(x)
        x = nn.Dense(self.d_model, name="fusion2")(x)
        x = nn.LayerNorm(name="fusion_ln2")(x)

        for i in range(self.num_blocks):
            x = ConformerBlock(self.d_model, self.num_heads, self.d_ff,
                               self.kernel_size, self.dropout,
                               attn_impl=self.attn_impl,
                               name=f"block_{i}")(x, deterministic)

        h = nn.Dense(self.d_model, name="head_hidden")(x)
        h = nn.gelu(h)
        mag_logit = nn.Dense(self.n_freq, name="mag_head")(h)
        phase_logit = nn.Dense(self.n_freq, name="phase_head")(h)

        mask_mag = nn.sigmoid(mag_logit)
        mask_phase = jnp.tanh(phase_logit) * (math.pi / self.phase_bound_div)
        return (mask_mag * jnp.cos(mask_phase),
                mask_mag * jnp.sin(mask_phase))
