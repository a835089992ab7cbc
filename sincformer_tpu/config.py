"""Typed configuration tree for the framework.

Replaces the reference's flat constants module (``/root/reference/config.py:8-122``)
with frozen dataclasses so configs are hashable (usable as jit static args),
composable, and per-experiment overridable via ``dataclasses.replace``.

All default *values* match the reference so oracle masks, framing and metrics
are numerically comparable.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Tuple


def replace(cfg, **kw):
    """Convenience re-export of dataclasses.replace."""
    return dataclasses.replace(cfg, **kw)


# ─── Audio / framing ─────────────────────────────────────────────────────────

@dataclass(frozen=True)
class AudioConfig:
    """Narrowband 8 kHz audio framing (reference config.py:17-22)."""
    sample_rate: int = 8000
    frame_size_ms: int = 20
    fft_size: int = 256
    window: str = "hamming"

    @property
    def frame_size(self) -> int:          # 160 samples
        return int(self.sample_rate * self.frame_size_ms / 1000)

    @property
    def hop_size(self) -> int:            # 80 samples, 50% overlap
        return self.frame_size // 2

    @property
    def n_freq(self) -> int:              # 129 rfft bins
        return self.fft_size // 2 + 1


# ─── Gammatone filterbank ────────────────────────────────────────────────────

@dataclass(frozen=True)
class GammatoneConfig:
    """64-channel GFTB, 50-4000 Hz (reference config.py:25-28)."""
    num_channels: int = 64
    freq_low: float = 50.0
    freq_high: float = 4000.0
    filter_order: int = 4
    ir_duration: float = 0.05  # seconds of impulse response (gammatone.py:50)


# ─── Feature extraction ──────────────────────────────────────────────────────

@dataclass(frozen=True)
class FeatureConfig:
    """AMS / RASTA-PLP / MFCC / GFCC dims (reference config.py:31-46)."""
    ams_segments: int = 128
    ams_overlap: int = 64
    ams_fft_size: int = 256
    ams_num_bands: int = 15
    ams_decimate: int = 8
    ams_low_hz: float = 15.6
    ams_high_hz: float = 400.0

    mfcc_num_coeff: int = 13
    mfcc_fft_size: int = 512
    mfcc_num_filters: int = 64

    gfcc_num_coeff: int = 13
    gfcc_decimate_rate: int = 100  # Hz → 10 ms frameshift

    rasta_num_coeff: int = 13
    rasta_num_bands: int = 21      # bark critical bands (features.py:162)

    context_frames: int = 5        # ±5 context → 11× frame dim

    @property
    def raw_dim(self) -> int:      # 15 + 13 + 13 + 13 = 54
        return (self.ams_num_bands + self.rasta_num_coeff
                + self.mfcc_num_coeff + self.gfcc_num_coeff)

    @property
    def dim(self) -> int:          # 54 * 11 = 594
        return self.raw_dim * (2 * self.context_frames + 1)


# ─── Datasets / noise grid ───────────────────────────────────────────────────

@dataclass(frozen=True)
class DataConfig:
    """Noise grid + split sizes (reference config.py:49-60)."""
    noise_types: Tuple[str, ...] = ("babble", "white", "factory1",
                                    "destroyerengine")
    snr_levels: Tuple[int, ...] = (-5, 0, 5, 10)
    max_train_utterances: int = 19200
    max_test_utterances: int = 1920
    train_split_seed: int = 42     # pipeline.py:406 / conformer_pipeline.py:381
    eval_sample_seed: int = 99     # main.py:280
    train_fraction: float = 0.9
    # reference pad/trunc length (conformer_pipeline.py:159); env-overridable
    # like the directory knobs so memory-constrained (or CPU CI) runs can
    # shrink the padded batch shape without editing code
    max_wave_seconds: float = field(default_factory=lambda: float(
        os.environ.get("SINCFORMER_MAX_WAVE_SECONDS", "4.0")))

    timit_dir: str = field(default_factory=lambda: os.environ.get(
        "SINCFORMER_TIMIT_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "DARPA-TIMIT", "data")))
    noisex_dir: str = field(default_factory=lambda: os.environ.get(
        "SINCFORMER_NOISEX_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "Noises", "NoiseX-92")))
    output_dir: str = field(default_factory=lambda: os.environ.get(
        "SINCFORMER_OUTPUT_DIR", "output"))
    model_dir: str = field(default_factory=lambda: os.environ.get(
        "SINCFORMER_MODEL_DIR", "saved_models"))
    cache_dir: str = field(default_factory=lambda: os.environ.get(
        "SINCFORMER_CACHE_DIR", "feature_cache"))


# ─── DNN (original-paper pipeline) ───────────────────────────────────────────

@dataclass(frozen=True)
class DNNConfig:
    """5-layer mask DNN (reference config.py:63-72, models/dnn.py:22-132)."""
    hidden_layers: int = 3
    hidden_units: int = 1024
    dropout: float = 0.2
    learning_rate: float = 1e-3
    epochs: int = 50
    batch_size: int = 256
    output_dim: int = 64           # NUM_CHANNELS mask


@dataclass(frozen=True)
class RBMConfig:
    """CD-k pretraining (reference config.py:75-78)."""
    learning_rate: float = 0.01
    epochs: int = 10
    batch_size: int = 256
    k_steps: int = 1
    max_samples: int = 50000       # pipeline.py RBM data cap


# ─── PSO / OPT-PCIRM ─────────────────────────────────────────────────────────

@dataclass(frozen=True)
class PSOConfig:
    """Swarm hyperparams (reference config.py:81-87, optimizer/pso.py:26)."""
    num_particles: int = 30
    max_iter: int = 100
    w: float = 0.7
    c1: float = 1.5
    c2: float = 1.5
    bounds: Tuple[float, float] = (0.0, 1.0)


@dataclass(frozen=True)
class OptPCIRMConfig:
    """Hard-mask quantization (reference config.py:89-90)."""
    num_steps: int = 3
    local_criterion_db: float = -15.0


# ─── Conformer / DCSE ────────────────────────────────────────────────────────

@dataclass(frozen=True)
class ConformerConfig:
    """ComplexConformer defaults (reference config.py:93-98)."""
    num_blocks: int = 6
    d_model: int = 256
    num_heads: int = 4
    ff_dim: int = 1024
    kernel_size: int = 31
    dropout: float = 0.1
    attn_impl: str = "speech"   # "speech" (Pallas one-shot kernel, the
    # TPU default: +31% DCSE e2e, docs/PERF.md) | "xla" | "flash"


@dataclass(frozen=True)
class DCSEConfig:
    """DCSE SpeechEnhancer (reference conformer_pipeline.py:239-246,403-442)."""
    d_model: int = 256
    num_blocks: int = 4
    num_heads: int = 4
    ff_dim: int = 1024
    kernel_size: int = 31
    dropout: float = 0.15
    phase_bound_div: float = 6.0   # phase ∈ [-π/6, π/6]
    attn_impl: str = "speech"   # "speech" (Pallas one-shot kernel, the
    # TPU default: +31% DCSE e2e, docs/PERF.md) | "xla" | "flash"
    fused_ffn: bool = False  # Pallas fused FF modules (ops/fused_ffn.py)
    lr: float = 5e-4
    betas: Tuple[float, float] = (0.9, 0.98)
    weight_decay: float = 0.01
    grad_clip: float = 5.0
    batch_size: int = 8
    epochs: int = 50
    mag_loss_weight: float = 0.5


# ─── VQ / agents / curriculum ────────────────────────────────────────────────

@dataclass(frozen=True)
class VQConfig:
    """VQ-STE quantizer (reference config.py:101-102)."""
    num_centroids: int = 3
    commitment_weight: float = 0.25


@dataclass(frozen=True)
class AgentConfig:
    """Multi-agent stack dims (reference config.py:105-108)."""
    cpea_hidden_size: int = 128
    cpea_num_layers: int = 2
    pa_encoder_channels: int = 256
    maa_threshold_init: float = 0.5
    sinc_kernel_size: int = 251    # perception.py:154
    memory_slots: int = 64         # memory.py:41
    msa_phase_bound_div: float = 8.0  # msa.py:168 (π/8)
    # PerceptionAgent compute formulation: "mxu" = frame-rate GEMM encoder
    # (round-3 TPU reformulation, agents/perception.py::PerceptionAgentMXU);
    # "reference" = the stride-2 cascade parity path
    pa_impl: str = "mxu"
    # mxu fine-stream activation ("mulaw" | "gelu"); μ-law companding won
    # the round-3 SSNR ablation outright (beats every metric of the
    # reference-PA configuration — RESULTS.md). Env-overridable.
    pa_fine_act: str = field(
        default_factory=lambda: os.environ.get(
            "SINCFORMER_PA_FINE_ACT", "mulaw"))
    # mxu fine-feature streams: "single" (v4, default) | "dual" (v5
    # QUALITY preset — adds a per-frame-normalized fine-chunk stream
    # alongside the companded raw one; won the round-4 quality ablation
    # but costs a measured 18% flagship RTF — RESULTS.md round 4;
    # checkpoints autodetect either, agents/perception.py)
    pa_fine_feats: str = field(
        default_factory=lambda: os.environ.get(
            "SINCFORMER_PA_FINE_FEATS", "single"))


@dataclass(frozen=True)
class LossConfig:
    """Loss weights (reference config.py:111-113)."""
    perceptual_weight: float = 10.0
    adversarial_weight: float = 0.5
    commitment_weight: float = 0.25
    # stage-1/2 mask-domain MSE (Eq. 14; reference curriculum.py:30-40
    # prescribes loss_type "mse", losses.py:22-30 — orphaned there);
    # env-overridable for ablations
    mask_mse_weight: float = field(
        default_factory=lambda: float(
            os.environ.get("SINCFORMER_MASK_MSE_WEIGHT", "1.0")))


@dataclass(frozen=True)
class CurriculumConfig:
    """3-stage schedule (reference config.py:120-122, training/curriculum.py)."""
    stage1_epochs: int = 15
    stage2_epochs: int = 20
    stage3_epochs: int = 15


# ─── Evaluation ──────────────────────────────────────────────────────────────

@dataclass(frozen=True)
class EvalConfig:
    """Metric settings (reference config.py:116-117).

    pesq_impl: "auto" = ITU C library when installed, else the native
    P.862 implementation (evaluation/p862.py); "clib" = C library only
    (raises if absent); "native" = always the native P.862; "proxy" =
    the reference's LSD proxy (pesq_eval.py:51-85) — bit-parity mode for
    comparisons against the reference without the C library.
    """
    stoi_extended: bool = False
    pesq_mode: str = "nb"
    pesq_impl: str = "auto"


# ─── Root config ─────────────────────────────────────────────────────────────

@dataclass(frozen=True)
class Config:
    audio: AudioConfig = field(default_factory=AudioConfig)
    gammatone: GammatoneConfig = field(default_factory=GammatoneConfig)
    features: FeatureConfig = field(default_factory=FeatureConfig)
    data: DataConfig = field(default_factory=DataConfig)
    dnn: DNNConfig = field(default_factory=DNNConfig)
    rbm: RBMConfig = field(default_factory=RBMConfig)
    pso: PSOConfig = field(default_factory=PSOConfig)
    opt_pcirm: OptPCIRMConfig = field(default_factory=OptPCIRMConfig)
    conformer: ConformerConfig = field(default_factory=ConformerConfig)
    dcse: DCSEConfig = field(default_factory=DCSEConfig)
    vq: VQConfig = field(default_factory=VQConfig)
    agents: AgentConfig = field(default_factory=AgentConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    curriculum: CurriculumConfig = field(default_factory=CurriculumConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)


DEFAULT = Config()
