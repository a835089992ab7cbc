"""DCSE SpeechEnhancer — direct STFT → Conformer → bounded polar mask.

Capability-parity with the reference's golden architecture
(``training/conformer_pipeline.py:218-301``):

    concat(re, im) → LayerNorm → Linear(2F→d) → 4×ConformerBlock →
    LayerNorm → sigmoid magnitude head + tanh·π/6 phase head →
    polar→cartesian → complex multiply with the noisy STFT.

The bounded polar mask (magnitude ∈ [0,1]: attenuate-only; phase ∈
[-π/6, π/6]: small correction) is the reference's key inductive bias and is
kept exactly. ~4.3 M params at the default size.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from sincformer_tpu import config as cfg
from sincformer_tpu.models.conformer import ConformerBlock


class SpeechEnhancer(nn.Module):
    """(noisy_real, noisy_imag): (B, T, F) → (enh_real, enh_imag, mask_mag)."""

    n_freq: int = 129
    d_model: int = 256
    num_blocks: int = 4
    num_heads: int = 4
    d_ff: int = 1024
    kernel_size: int = 31
    dropout: float = 0.15
    phase_bound_div: float = 6.0
    conv_norm: str = "layer"
    attn_impl: str = "xla"   # "xla" | "flash" (Pallas, ops/attention.py)
    fused_ffn: bool = False  # Pallas fused FF modules (ops/fused_ffn.py)
    remat: bool = False   # jax.checkpoint each block: trade FLOPs for HBM

    @nn.compact
    def __call__(self, noisy_real, noisy_imag, deterministic: bool = True,
                 mask: Optional[jnp.ndarray] = None):
        x = jnp.concatenate([noisy_real, noisy_imag], axis=-1)
        x = nn.LayerNorm(name="input_norm")(x)
        x = nn.Dense(self.d_model, name="input_proj")(x)
        block_cls = (nn.remat(ConformerBlock, static_argnums=(2,))
                     if self.remat else ConformerBlock)
        for i in range(self.num_blocks):
            x = block_cls(self.d_model, self.num_heads, self.d_ff,
                          self.kernel_size, self.dropout,
                          self.conv_norm, self.attn_impl, self.fused_ffn,
                          name=f"block_{i}")(
                x, deterministic, mask)
        x = nn.LayerNorm(name="output_norm")(x)

        mask_mag = nn.sigmoid(nn.Dense(self.n_freq, name="mag_head")(x))
        mask_phase = (jnp.tanh(nn.Dense(self.n_freq, name="phase_head")(x))
                      * (math.pi / self.phase_bound_div))

        mask_real = mask_mag * jnp.cos(mask_phase)
        mask_imag = mask_mag * jnp.sin(mask_phase)
        enh_real = mask_real * noisy_real - mask_imag * noisy_imag
        enh_imag = mask_real * noisy_imag + mask_imag * noisy_real
        return enh_real, enh_imag, mask_mag


def default_speech_enhancer(dcfg: cfg.DCSEConfig = cfg.DEFAULT.dcse,
                            acfg: cfg.AudioConfig = cfg.DEFAULT.audio,
                            **overrides) -> SpeechEnhancer:
    kw = dict(n_freq=acfg.n_freq, d_model=dcfg.d_model,
              num_blocks=dcfg.num_blocks, num_heads=dcfg.num_heads,
              d_ff=dcfg.ff_dim, kernel_size=dcfg.kernel_size,
              dropout=dcfg.dropout, phase_bound_div=dcfg.phase_bound_div,
              attn_impl=getattr(dcfg, "attn_impl", "xla"),
              fused_ffn=getattr(dcfg, "fused_ffn", False))
    kw.update(overrides)
    return SpeechEnhancer(**kw)
