"""SincformerMetacog — the WIRED multi-agent enhancement model.

The reference ships PA/CPEA/MSA/MAA/Memory as orphaned modules and its DCSE
docstring records why its own integration attempt failed
(conformer_pipeline.py:7-12). This module performs the integration the
reference never finished, following the dataflow reconstructed in
SURVEY.md §3.6 and applying the DCSE stability lessons:

    waveform ── PerceptionAgent → (z_real, z_imag, σ)
                ├ σ ─ MAA → routing over {SOFT, RESAMPLE, HARD(VQ), ESCALATE}
                ├ pooled(z) ─ EpisodicMemory → gated mask-magnitude bias
                └ z ─ CPEA → {ρ̂s, ρ̂n, φ̂1, φ̂2}
    (z, CPEA, noisy STFT) ── MSA → bounded polar mask (mag, phase)
    mag+memory-bias → strategies {soft, dropout-resample, VQ-hard, passthrough}
    routed mag × e^{i·phase} ⊙ STFT → iSTFT → enhanced

Integration decisions (each cited to the reference evidence):
  * routing is differentiable — Gumbel-softmax straight-through by default
    (the README's promise, absent from the reference code, maa.py:102-108);
  * RESAMPLE = second stochastic MSA pass averaged (reference docstring
    maa.py:9-11), only materialised when ``enable_resample`` (costly);
  * HARD = VQ-STE quantized magnitude (models/vq.py), the differentiable
    replacement for the OPT-PCIRM fallback;
  * ESCALATE = unity mask (pass-through) + the frame flagged in outputs for
    human review (maa.py:13);
  * no identity-bias init traps anywhere (msa.py Bug 12 post-mortem);
  * PA latent is average-pooled onto the 100 Hz STFT grid (perception.py's
    16× stride leaves a 5× rate mismatch the reference never resolved).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from sincformer_tpu.agents.cpea import CorrelationPhaseEstimationAgent
from sincformer_tpu.agents.maa import MetacognitiveArbitrationAgent
from sincformer_tpu.agents.memory import EpisodicMemory
from sincformer_tpu.agents.msa import MaskSynthesisAgent
from sincformer_tpu.agents.perception import (PerceptionAgent,
                                              PerceptionAgentMXU)
from sincformer_tpu.models.vq import VectorQuantizer


class SincformerMetacog(nn.Module):
    """(B, T, F) complex-STFT components + (B, N) waveform → enhanced STFT.

    The caller owns STFT/iSTFT (so the model composes with any train step);
    `apply` returns a dict with the enhanced spectrogram, routing stats, and
    auxiliary losses.
    """

    encoder_channels: int = 256
    cpea_hidden: int = 128
    cpea_layers: int = 2
    cpea_channels: int = 64
    cpea_impl: str = "lstm"   # "lstm" (parity) | "ssm" (BiLRU, TPU-fast)
    d_model: int = 256
    n_freq: int = 129
    msa_blocks: int = 4
    num_heads: int = 4
    d_ff: int = 1024
    kernel_size: int = 31
    dropout: float = 0.1
    vq_centroids: int = 3
    vq_commitment: float = 0.25
    memory_slots: int = 64
    episodic_slots: int = 16      # writable bank (continual adaptation)
    routing: str = "gumbel"
    attn_impl: str = "xla"   # threaded into every ConformerBlock (MSA)
    pa_impl: str = "mxu"     # "mxu" (frame-rate GEMM encoder, TPU-fast) |
                             # "reference" (stride-2 cascade parity)
    pa_fine_act: str = "gelu"  # mxu fine-stream activation (gelu | mulaw)
    pa_fine_feats: str = "single"  # "single" | "dual" (v5: + normalized
                                   # fine-chunk stream; perception.py)
    enable_resample: bool = True
    sample_rate: int = 8000
    sinc_kernel_size: int = 251
    hop: int = 80

    @nn.compact
    def __call__(self, waveform: jnp.ndarray, stft_real: jnp.ndarray,
                 stft_imag: jnp.ndarray, train: bool = False,
                 use_vq: bool = True,
                 gumbel_tau: float | jnp.ndarray | None = None
                 ) -> Dict[str, jnp.ndarray]:
        # ── Perception ───────────────────────────────────────────────────
        if self.pa_impl == "mxu":
            pa = PerceptionAgentMXU(self.encoder_channels, self.sample_rate,
                                    self.sinc_kernel_size, self.hop,
                                    fine_act=self.pa_fine_act,
                                    fine_feats=self.pa_fine_feats,
                                    name="pa")
        else:
            pa = PerceptionAgent(self.encoder_channels, self.sample_rate,
                                 self.sinc_kernel_size, self.hop, name="pa")
        z_real, z_imag, sigma = pa(waveform)          # (B, D, T'), (B,1,T')

        # align latent frames to the STFT grid (T = N//hop + 1, T' = N//hop)
        t = min(z_real.shape[-1], stft_real.shape[-2])
        z_real_t = z_real[..., :t]
        z_imag_t = z_imag[..., :t]
        sigma_t = sigma[..., :t]
        sr = stft_real[:, :t]
        si = stft_imag[:, :t]

        # ── CPEA ─────────────────────────────────────────────────────────
        cpea = CorrelationPhaseEstimationAgent(
            self.encoder_channels, self.cpea_hidden, self.cpea_layers,
            self.cpea_channels, impl=self.cpea_impl,
            name="cpea")(z_real_t, channels_first=True)

        # ── MSA (bounded polar mask) ─────────────────────────────────────
        msa = MaskSynthesisAgent(
            self.encoder_channels, self.cpea_channels, self.d_model,
            self.n_freq, self.msa_blocks, self.num_heads, self.d_ff,
            self.kernel_size, self.dropout, attn_impl=self.attn_impl,
            name="msa")
        mask_r, mask_i = msa(z_real_t, z_imag_t, cpea, sr, si,
                             deterministic=not train)
        mask_mag = jnp.sqrt(mask_r ** 2 + mask_i ** 2 + 1e-12)
        mask_phase = jnp.arctan2(mask_i, mask_r)

        # ── Episodic memory bias on the magnitude ────────────────────────
        pooled = jnp.mean(z_real_t, axis=-1)          # (B, D)
        # during training, WRITE the current environment's mask statistics
        # into the episodic bank (keys: env embedding, values: per-freq mean
        # mask — "recent mask statistics", reference memory.py:7-9)
        write_value = (jnp.mean(mask_mag, axis=1)
                       if (train and self.episodic_slots > 0) else None)
        mem = EpisodicMemory(self.encoder_channels, self.n_freq,
                             self.memory_slots,
                             episodic_slots=self.episodic_slots,
                             name="memory")(
            pooled, train=train, write_value=write_value)
        mask_mag = jnp.clip(mask_mag + mem["bias"][:, None, :], 0.0, 1.0)

        # ── Strategies ───────────────────────────────────────────────────
        soft = mask_mag
        # RESAMPLE: dropout-ensemble second MSA pass (maa.py:9-11). Active
        # in training, and at inference whenever the caller supplies a
        # dropout rng (apply(..., rngs={'dropout': key}) opts in).
        if self.enable_resample and (train or self.has_rng("dropout")):
            mask_r2, mask_i2 = msa(z_real_t, z_imag_t, cpea, sr, si,
                                   deterministic=False)
            mag2 = jnp.clip(jnp.sqrt(mask_r2 ** 2 + mask_i2 ** 2 + 1e-12)
                            + mem["bias"][:, None, :], 0.0, 1.0)
            resample = 0.5 * (soft + mag2)
        else:
            resample = soft                            # deterministic = soft

        vq = VectorQuantizer(self.vq_centroids, self.vq_commitment,
                             name="vq")
        hard, _vq_idx, vq_loss = vq(mask_mag)
        if not use_vq:
            hard = mask_mag
            vq_loss = 0.0 * vq_loss
        escalate = jnp.ones_like(mask_mag)             # pass-through

        # ── MAA routing ──────────────────────────────────────────────────
        maa = MetacognitiveArbitrationAgent(routing=self.routing,
                                            name="maa")
        routing = maa(sigma_t, train=train, tau=gumbel_tau)
        route = routing["route"]                       # (B, T, 4)

        strategies = jnp.stack([soft, resample, hard, escalate],
                               axis=-1)                # (B, T, F, 4)
        final_mag = jnp.einsum("btfk,btk->btf", strategies, route)

        final_r = final_mag * jnp.cos(mask_phase)
        final_i = final_mag * jnp.sin(mask_phase)
        enh_r = final_r * sr - final_i * si
        enh_i = final_r * si + final_i * sr

        # pad masked frames back to the full STFT length (edge frame repeat)
        t_full = stft_real.shape[-2]
        if t_full > t:
            pad = t_full - t
            enh_r = jnp.concatenate(
                [enh_r, jnp.repeat(enh_r[:, -1:], pad, axis=1)], axis=1)
            enh_i = jnp.concatenate(
                [enh_i, jnp.repeat(enh_i[:, -1:], pad, axis=1)], axis=1)

        return {
            "enhanced_real": enh_r,
            "enhanced_imag": enh_i,
            "mask_mag": final_mag,
            "mask_phase": mask_phase,
            "vq_loss": vq_loss,
            "sigma": sigma_t,
            "decisions": routing["decisions"],
            "route_probs": routing["probs"],
            "confidence": routing["confidence"],
            "memory_gate": mem["gate"],
            "memory_top": mem["top_indices"],
            "cpea": cpea,
        }
