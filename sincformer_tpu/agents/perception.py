"""Perception Agent — SincNet learned front-end with uncertainty.

Capability-parity with the reference (``agents/perception.py:132-254``):
SincConv(64) → GroupNorm/GELU → 3 residual stride-2 conv blocks → stride-2
downsample (16× total) → complex latent (z_real, z_imag) + σ from a clamped
log-variance head.

Integration fix (the reference never wired PA, SURVEY.md §3.6): 16×
downsampling gives a 500 Hz latent rate while the STFT grid is 100 Hz; a
final 5× average pool aligns the latent to the 80-sample STFT hop so the
agents can be fused per-frame downstream.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from sincformer_tpu import config as cfg
from sincformer_tpu.agents.sincnet import SincConv1d


class _ConvBlock(nn.Module):
    """Residual conv block: main(7-conv stride s → GN → GELU → 3-conv → GN)
    + 1×1-projected skip, then GELU (reference perception.py:121-129,
    192-206). Layout inside: (B, T, C) — flax Conv is channels-last."""
    out_ch: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        main = nn.Conv(self.out_ch, (7,), strides=(self.stride,),
                       padding="SAME", name="conv1")(x)
        main = nn.GroupNorm(num_groups=min(16, self.out_ch), name="gn1")(main)
        main = nn.gelu(main)
        main = nn.Conv(self.out_ch, (3,), padding="SAME", name="conv2")(main)
        main = nn.GroupNorm(num_groups=min(16, self.out_ch), name="gn2")(main)
        skip = nn.Conv(self.out_ch, (1,), strides=(self.stride,),
                       name="skip")(x)
        skip = nn.GroupNorm(num_groups=min(16, self.out_ch),
                            name="gn_skip")(skip)
        return nn.gelu(main + skip)


class PerceptionAgentMXU(nn.Module):
    """MXU-dominated PerceptionAgent reformulation (round-3 perf work, v2).

    Same contract as :class:`PerceptionAgent` — (B, N) waveform →
    (z_real, z_imag, σ) on the 100 Hz STFT grid — but the compute is
    reorganised for the TPU systolic array instead of translating the
    reference's stride-2 cascade (reference agents/perception.py:132-254):

      * SincConv stays (the learnable auditory filterbank is the PA's
        identity, and it is cheap: 1.3 ms of the old 17 ms).
      * The four stride-2 conv stages running at 8→0.5 kHz sample rates
        are REPLACED by overlapping frame patchify onto the STFT grid
        (hop = 80) + Dense embedding GEMMs with 10k-20k contraction —
        dense MXU work where the cascade ran at ~19 % MXU with ~8
        full-rate HBM passes per block (docs/PERF.md round-2c profile).
      * All residual conv mixing happens AT FRAME RATE (T' = N/80), where
        GroupNorm's whole-sequence stats cost nothing.

    v2 (quality fix — the v1 single-patchify regressed CSII/NCM, the
    high-band/modulation-coherence metrics, by collapsing all sub-frame
    temporal structure through ONE linear map; ablation in RESULTS.md):

      * the fine window widens to 4·hop (40 ms, matching the cascade's
        receptive field before its 100 Hz rate),
      * an explicit ENVELOPE stream — |sinc| → 8× avg-pool (1 kHz) →
        log1p compression → its own patchify/Dense — hands the trunk the
        rectified multi-band envelope (= the modulation features the
        cascade's stacked nonlinearities built implicitly; what the
        auditory literature calls the AMS front-end, dsp/features.py).

    The 16×-stride + 5× pool rate mismatch of the reference disappears:
    the latent is born on the STFT grid.
    """

    encoder_channels: int = 256
    sample_rate: int = 8000
    sinc_kernel_size: int = 251
    align_hop: int = 80           # latent hop == STFT hop
    num_blocks: int = 3
    env_pool: int = 8             # envelope stream decimation (8 kHz → 1 kHz)
    fine_act: str = "gelu"        # fine-stream activation: "gelu" (v2) |
                                  # "mulaw" (sign-preserving compressive —
                                  # round-3 SSNR ablation, RESULTS.md)
    fine_feats: str = "single"    # "single" (v4, default) | "dual" (v5
                                  # quality preset): ALSO feed a per-
                                  # frame-NORMALIZED copy of the fine
                                  # chunks. Dual won the round-4 quality
                                  # ablation (first MXU-PA config to beat
                                  # the ref-PA row on PESQ, at parity
                                  # CSII) but the second k=4 embed GEMM +
                                  # chunk LN cost a measured 18% RTF
                                  # (22.1k → 17.8k, RESULTS.md round 4);
                                  # it ships as the opt-in quality
                                  # configuration, not the default.
                                  # Checkpoints autodetect either.

    @nn.compact
    def __call__(self, waveform: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        d = self.encoder_channels
        hop = self.align_hop
        c_sinc = d // 4
        x = SincConv1d(out_channels=c_sinc,
                       kernel_size=self.sinc_kernel_size,
                       sample_rate=self.sample_rate,
                       channels_last=True,
                       name="sinc")(waveform)            # (B, N, C)
        b, n, c = x.shape
        t = n // hop                                     # frames (== N/80)

        # ── envelope stream: rectify → 1 kHz → compress. XLA fuses this
        # well; a Pallas kernel fusing act+envelope into one HBM pass
        # (ops/envact_pallas.py) measured 12 ms SLOWER at these shapes
        # (C=64 = half the 128-lane VPU width) — kept as a documented
        # negative result, not wired (docs/PERF.md round-3c). ────────────
        pool = self.env_pool
        env = jnp.abs(x)[:, :t * hop]
        env = env.reshape(b, (t * hop) // pool, pool, c).mean(axis=2)
        env = jnp.log1p(env)                             # (B, N/8, C)
        ehop = hop // pool                               # 10 frames @1 kHz
        echunks = env.reshape(b, t, ehop * c)            # (B, T, 10·C)

        # ── fine stream: cheap learned per-channel elementwise activation
        # at sample rate (fuses into the conv epilogue; the old whole-
        # sequence GroupNorm at 8 kHz cost 3.2 ms of HBM traffic) ────────
        scale = self.param("act_scale", nn.initializers.ones, (c_sinc,))
        if self.fine_act == "mulaw":
            # sign-preserving compressive companding: boosts quiet-frame
            # fine structure into the embed GEMM's representation range
            # (the v2 run's remaining deficit was segmental SNR growing
            # with input SNR — a residual fine-structure floor in clean
            # conditions). μ is per-channel, softplus-positive.
            mu_raw = self.param("act_mu",
                                nn.initializers.constant(1.0), (c_sinc,))
            mu = nn.softplus(mu_raw) + 1e-4
            z = x * scale
            x = jnp.sign(z) * jnp.log1p(mu * jnp.abs(z))
        else:
            x = nn.gelu(x * scale)

        # overlapping patchify onto the STFT grid: the hop-sized chunk
        # reshape is a free view; the 4·hop (40 ms) window [(j-1)·hop,
        # (j+3)·hop) is then a k=4 conv over the chunk sequence — one
        # fused MXU pass with K = hop·C = 5120 contraction, instead of
        # materialising a (B, T, 4·hop·C) concat (2 GB at B=128; the v2
        # Dense-on-concat form measured 17.9 ms vs ~10 for this).
        chunks = x[:, :t * hop].reshape(b, t, hop * c)
        # NOTE a per-frame LayerNorm on the chunks here (decouple fine
        # structure from frame level) was trained and rejected: it buys
        # segmental SNR (+1.0 dB) but costs CSII (0.369→0.298) —
        # RESULTS.md round-3 ablation, v3 row.

        h = (nn.Conv(d, (4,), padding="SAME", name="embed")(chunks)
             + nn.Conv(d, (2,), padding="SAME", name="embed_env")(echunks))
        if self.fine_feats == "dual":
            # v5: a level-decoupled VIEW of the same fine structure in
            # ADDITION to the raw/companded chunks (not instead — the v3
            # ablation showed replacing the level cue costs CSII).
            normed = nn.LayerNorm(use_bias=False, use_scale=False,
                                  name="chunk_ln")(chunks)
            h = h + nn.Conv(d, (4,), padding="SAME",
                            name="embed_norm")(normed)
        h = nn.LayerNorm(name="embed_ln")(h)
        h = nn.gelu(h)

        for i in range(self.num_blocks):
            h = _ConvBlock(d, stride=1, name=f"block_{i}")(h)

        z_real = nn.GroupNorm(num_groups=16, name="gn_real")(
            nn.Dense(d, name="real_proj")(h))
        z_imag = nn.GroupNorm(num_groups=16, name="gn_imag")(
            nn.Dense(d, name="imag_proj")(h))

        u = nn.Conv(d // 4, (3,), padding="SAME", name="unc1")(h)
        u = nn.gelu(u)
        log_var = nn.Dense(1, name="unc2")(u)
        sigma = jnp.exp(0.5 * jnp.clip(log_var, -10.0, 10.0))

        return (jnp.swapaxes(z_real, 1, 2), jnp.swapaxes(z_imag, 1, 2),
                jnp.swapaxes(sigma, 1, 2))


class PerceptionAgent(nn.Module):
    """(B, N) waveform → (z_real, z_imag, σ): (B, D, T'), (B, D, T'), (B, 1, T')."""

    encoder_channels: int = 256
    sample_rate: int = 8000
    sinc_kernel_size: int = 251
    align_hop: int = 80           # pool latent to the STFT frame rate

    @nn.compact
    def __call__(self, waveform: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        d = self.encoder_channels
        x = SincConv1d(out_channels=d // 4,
                       kernel_size=self.sinc_kernel_size,
                       sample_rate=self.sample_rate,
                       name="sinc")(waveform)            # (B, D/4, N)
        x = jnp.swapaxes(x, 1, 2)                        # (B, N, D/4)
        x = nn.GroupNorm(num_groups=8, name="sinc_norm")(x)
        x = nn.gelu(x)

        # progressive stride-2 stack: D/4 → D/2 → D/2 → D (perception.py:159-165)
        for i, ch in enumerate([d // 2, d // 2, d]):
            x = _ConvBlock(ch, stride=2, name=f"block_{i}")(x)
        # final stride-2 downsample (16× total, perception.py:167-171)
        x = nn.Conv(d, (5,), strides=(2,), padding="SAME",
                    name="downsample")(x)
        x = nn.GroupNorm(num_groups=16, name="down_norm")(x)
        x = nn.gelu(x)

        # 500 Hz → 100 Hz: align to the STFT hop (integration fix)
        pool = self.align_hop // 16
        if pool > 1:
            x = nn.avg_pool(x, window_shape=(pool,), strides=(pool,))

        z_real = nn.GroupNorm(num_groups=16, name="gn_real")(
            nn.Conv(d, (1,), name="real_proj")(x))
        z_imag = nn.GroupNorm(num_groups=16, name="gn_imag")(
            nn.Conv(d, (1,), name="imag_proj")(x))

        u = nn.Conv(d // 4, (3,), padding="SAME", name="unc1")(x)
        u = nn.gelu(u)
        log_var = nn.Conv(1, (1,), name="unc2")(u)
        sigma = jnp.exp(0.5 * jnp.clip(log_var, -10.0, 10.0))

        # return channels-first like the reference contract
        return (jnp.swapaxes(z_real, 1, 2), jnp.swapaxes(z_imag, 1, 2),
                jnp.swapaxes(sigma, 1, 2))
