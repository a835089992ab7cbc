"""Conformer blocks + complex-domain Conformer mask estimator.

Capability-parity with the reference (``models/conformer.py``): half-residual
feed-forward (Swish), pre-LN MHSA, conv module (pointwise→GLU→depthwise
k=31→norm→Swish→pointwise), final LayerNorm; ComplexConformer with global
skip and complex-mask applier.

TPU-first choices (documented deviations):
  * attention uses ``jax.nn.dot_product_attention`` so XLA emits its fused
    flash-attention kernel on TPU (the reference uses torch
    nn.MultiheadAttention); an optional Pallas kernel can be slotted in via
    ops/attention.py.
  * the conv module's normalisation is switchable: per-position LayerNorm
    (default — no cross-batch or cross-time statistics, so it is safe under
    SPMD sharding and length padding), GroupNorm (`norm="group"`), or
    BatchNorm (`norm="batch"`, reference parity with conformer.py:95 —
    cross-batch stats are hostile to sharding and padded batches).
  * depthwise conv is one ``lax.conv_general_dilated`` with
    ``feature_group_count=d_model``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sincformer_tpu import config as cfg


def swish(x):
    """x·sigmoid(x) (reference conformer.py:45)."""
    return x * jax.nn.sigmoid(x)


class FeedForwardModule(nn.Module):
    """LN → Dense(d_ff) → Swish → Drop → Dense(d) → Drop, half residual
    (reference conformer.py:28-49)."""
    d_model: int
    d_ff: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        x = nn.LayerNorm()(x)
        x = nn.Dense(self.d_ff)(x)
        x = swish(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.d_model)(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return residual + 0.5 * x


class _LNParams(nn.Module):
    """Bare LayerNorm params (scale, bias) — created under the SAME tree
    path as an ``nn.LayerNorm`` child, so fused and unfused modules share
    checkpoints."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _DenseParams(nn.Module):
    """Bare Dense params (kernel, bias) matching ``nn.Dense`` defaults."""
    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.out_features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_features,))
        return kernel, bias


class FusedFeedForward(nn.Module):
    """FeedForwardModule with the LN→GEMM→Swish→GEMM→½-residual chain
    executed by ONE Pallas kernel (ops/fused_ffn.py) — one HBM read and one
    write per row tile instead of one per stage.

    Param tree is IDENTICAL to FeedForwardModule (LayerNorm_0 / Dense_0 /
    Dense_1), so the two are checkpoint-interchangeable; construct with
    ``name="FeedForwardModule_N"`` inside ConformerBlock to keep auto-name
    parity. With dropout active (train mode) it falls back to the unfused
    math — the fused path is the inference/serving fast path.
    """
    d_model: int
    d_ff: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from sincformer_tpu.ops.fused_ffn import fused_ffn
        ln_s, ln_b = _LNParams(self.d_model, name="LayerNorm_0")()
        w1, b1 = _DenseParams(self.d_model, self.d_ff, name="Dense_0")()
        w2, b2 = _DenseParams(self.d_ff, self.d_model, name="Dense_1")()
        if deterministic or self.dropout == 0.0:
            return fused_ffn(x, ln_s, ln_b, w1, b1, w2, b2)
        # training-with-dropout: unfused math, same params
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        h = (x - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
        h = swish(h @ w1 + b1)
        h = nn.Dropout(self.dropout, deterministic=False)(h)
        h = h @ w2 + b2
        h = nn.Dropout(self.dropout, deterministic=False)(h)
        return x + 0.5 * h


class MultiHeadSelfAttention(nn.Module):
    """Pre-LN MHSA with residual (reference conformer.py:52-71).

    QKV/out projections are Dense (MXU GEMMs); the score/softmax/value path
    goes through jax.nn.dot_product_attention → XLA fused attention on TPU.
    """
    d_model: int
    num_heads: int
    dropout: float = 0.1
    attn_impl: str = "xla"   # "xla" | "flash" (Pallas kernel, ops/attention)
    pad_to: Optional[int] = None   # time-axis MXU alignment (ops/attention)

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 mask: Optional[jnp.ndarray] = None):
        from sincformer_tpu.ops.attention import dot_product_attention
        residual = x
        x = nn.LayerNorm()(x)
        b, t, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv = nn.Dense(3 * d, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, dh)
        k = k.reshape(b, t, h, dh)
        v = v.reshape(b, t, h, dh)
        o = dot_product_attention(q, k, v, mask=mask, impl=self.attn_impl,
                                  pad_to=self.pad_to,
                                  train=not deterministic,
                                  quiet=self.is_initializing())
        o = o.reshape(b, t, d)
        o = nn.Dense(d, name="out")(o)
        o = nn.Dropout(self.dropout, deterministic=deterministic)(o)
        return residual + o


class DepthwiseConv(nn.Module):
    """SAME-padded stride-1 depthwise conv over time, (B, T, D).

    Param-compatible with ``nn.Conv(..., feature_group_count=D)`` (same
    "kernel"/"bias" names, shapes and inits — checkpoints interchange).
    When a context-parallel ``ops.ring_mesh`` context is active at trace
    time and the geometry allows, the conv runs as a halo-exchange
    ``shard_map`` (ops/cp_conv.py) instead of letting GSPMD partition it —
    jax 0.9.0's partitioner double-counts conv kernel grads on multi-axis
    meshes (see ops/cp_conv.py docstring)."""
    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, 1, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        from sincformer_tpu.ops.attention import active_ring_mesh
        ctx = active_ring_mesh()
        if ctx is not None and k % 2 == 1:
            mesh, seq_axis = ctx
            n = mesh.shape[seq_axis]
            t = x.shape[1]
            if t % n == 0 and t // n >= (k - 1) // 2:
                from sincformer_tpu.ops.cp_conv import cp_depthwise_conv
                return cp_depthwise_conv(x, kernel, bias, mesh, seq_axis)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1,),
            padding="SAME", dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.features)
        return y + bias.astype(y.dtype)


class ConvolutionModule(nn.Module):
    """LN → pointwise(2d) → GLU → depthwise(k) → norm → Swish → pointwise →
    Drop, residual (reference conformer.py:74-128)."""
    d_model: int
    kernel_size: int = 31
    dropout: float = 0.1
    norm: str = "layer"   # "layer" (default) | "group" | "batch" (parity)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        x = nn.LayerNorm()(x)
        x = nn.Dense(2 * self.d_model, name="pointwise1")(x)
        x = nn.glu(x, axis=-1)
        # depthwise conv over time: (B, T, D), feature_group_count=D
        x = DepthwiseConv(self.d_model, self.kernel_size,
                          name="depthwise")(x)
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=deterministic,
                             name="bn")(x)
        elif self.norm == "group":
            x = nn.GroupNorm(num_groups=min(32, self.d_model), name="gn")(x)
        else:  # "layer": per-position — no cross-time/-batch coupling, the
            # padding- and SPMD-safe default
            x = nn.LayerNorm(name="ln")(x)
        x = swish(x)
        x = nn.Dense(self.d_model, name="pointwise2")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return residual + x


class ConformerBlock(nn.Module):
    """FF½ → MHSA → Conv → FF½ → LN (reference conformer.py:131-151)."""
    d_model: int
    num_heads: int
    d_ff: int
    kernel_size: int
    dropout: float
    conv_norm: str = "layer"
    attn_impl: str = "xla"   # "xla" | "flash" (Pallas, ops/attention.py)
    fused_ffn: bool = False  # Pallas fused LN+GEMM+Swish+GEMM (ops/fused_ffn)

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 mask: Optional[jnp.ndarray] = None):
        if self.fused_ffn:
            # identical param tree to FeedForwardModule via explicit names
            ff0 = FusedFeedForward(self.d_model, self.d_ff, self.dropout,
                                   name="FeedForwardModule_0")
            ff1 = FusedFeedForward(self.d_model, self.d_ff, self.dropout,
                                   name="FeedForwardModule_1")
        else:
            ff0 = FeedForwardModule(self.d_model, self.d_ff, self.dropout,
                                    name="FeedForwardModule_0")
            ff1 = FeedForwardModule(self.d_model, self.d_ff, self.dropout,
                                    name="FeedForwardModule_1")
        x = ff0(x, deterministic)
        x = MultiHeadSelfAttention(self.d_model, self.num_heads,
                                   self.dropout,
                                   attn_impl=self.attn_impl)(
            x, deterministic, mask)
        x = ConvolutionModule(self.d_model, self.kernel_size, self.dropout,
                              self.conv_norm)(x, deterministic)
        x = ff1(x, deterministic)
        return nn.LayerNorm()(x)


class ComplexConformer(nn.Module):
    """Complex-STFT → complex mask (reference conformer.py:154-249).

    stack(re, im) → Linear(2F→d) → N blocks → +global skip → Linear(d→2F).
    """
    n_freq: int = 129
    d_model: int = 256
    num_blocks: int = 6
    num_heads: int = 4
    d_ff: int = 1024
    kernel_size: int = 31
    dropout: float = 0.1
    conv_norm: str = "layer"
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, stft_real, stft_imag, deterministic: bool = True,
                 mask: Optional[jnp.ndarray] = None):
        x = jnp.concatenate([stft_real, stft_imag], axis=-1)
        x = nn.Dense(self.d_model, name="input_proj")(x)
        skip = x
        for i in range(self.num_blocks):
            x = ConformerBlock(self.d_model, self.num_heads, self.d_ff,
                               self.kernel_size, self.dropout,
                               self.conv_norm, self.attn_impl,
                               name=f"block_{i}")(
                x, deterministic, mask)
        x = x + skip
        x = nn.Dense(2 * self.n_freq, name="output_proj")(x)
        return x[..., :self.n_freq], x[..., self.n_freq:]

    @staticmethod
    def apply_mask(stft_real, stft_imag, mask_real, mask_imag):
        """Ŝ = M̂ ⊙ Z complex multiply (reference conformer.py:230-245)."""
        enhanced_real = mask_real * stft_real - mask_imag * stft_imag
        enhanced_imag = mask_real * stft_imag + mask_imag * stft_real
        return enhanced_real, enhanced_imag


def default_complex_conformer(ccfg: cfg.ConformerConfig = cfg.DEFAULT.conformer,
                              acfg: cfg.AudioConfig = cfg.DEFAULT.audio,
                              **overrides) -> ComplexConformer:
    kw = dict(n_freq=acfg.n_freq, d_model=ccfg.d_model,
              num_blocks=ccfg.num_blocks, num_heads=ccfg.num_heads,
              d_ff=ccfg.ff_dim, kernel_size=ccfg.kernel_size,
              dropout=ccfg.dropout,
              attn_impl=getattr(ccfg, "attn_impl", "xla"))
    kw.update(overrides)
    return ComplexConformer(**kw)
