"""One-shot Pallas attention kernel for speech-length sequences.

Round-2 profiling (docs/PERF.md) pinned the DCSE Conformer's MHSA as the
model bottleneck: 7.2 ms of the 12.3 ms model time at batch 128, with the
score/value matmuls running at ~13 TFLOP/s — T=401 misaligns the MXU's
128-wide tiles and dh=64 halves the contraction lanes, and XLA's fused
attention adds bias-handling overhead the moment any mask appears. The
flash kernel (ops/attention.py impl="flash") is built for LONG sequences:
its online-softmax streaming machinery costs more than it saves when the
whole (T×T) score tile fits in VMEM.

This kernel exploits the speech regime instead (T ≤ ~2k frames at 8 kHz):

  * NO streaming — scores for a whole query block live in VMEM
    (512×512 f32 = 1 MB against the ~16 MB budget), one softmax pass.
  * heads stay PACKED in the model dim: blocks move (T, H·dh)=(T, 256)
    arrays between HBM and VMEM (128-lane aligned) and the per-head
    (TQ, dh) slices happen on-chip, so K/V are DMA'd once per batch row
    for all H heads instead of once per (batch, head).
  * the T=401-style ragged tail is padded to the 128-lane boundary OUTSIDE
    the kernel and neutralised by a key bias row folded into the same add
    as the optional valid-frame mask — inside the kernel the tail costs
    one fused VPU add, not an XLA-level masked-attention graph.

Used by ops/attention.py under ``impl="speech"`` (plumbed end-to-end via
``ConformerConfig.attn_impl``, models/conformer.py). The reference's torch
``nn.MultiheadAttention`` (reference models/conformer.py:52-71) is the
behaviour being matched; parity vs ``jax.nn.dot_product_attention`` is
pinned by tests/test_pallas_ops.py::TestSpeechAttention.

Backward: custom VJP whose backward is JAX autodiff of the reference
formulation (same pattern as ops/fused_ffn.py) — the kernel is safe inside
training steps; the forward is the serving fast path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9          # key-side bias for padded / invalid frames
_LANE = 128          # TPU lane width: pad T to a multiple of this
_MAX_TQ = 512        # query-block rows (whole T for speech lengths)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _pick_tq(t_pad: int) -> int:
    """Largest query-block size that exactly divides ``t_pad``.

    ``t_pad`` is always a multiple of ``_LANE`` (128), so 128 always
    divides and the grid ``t_pad // tq`` covers EVERY query row — the
    round-2 ``min(_MAX_TQ, t_pad)`` choice silently dropped tail blocks
    for t_pad in (512, 2048] off the 512 grid (e.g. T=600 → t_pad=640
    ran one 512-row block and left rows 512..639 uninitialised).
    """
    for tq in (_MAX_TQ, 384, 256, _LANE):
        if t_pad % tq == 0:
            return tq
    return _LANE


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                 num_heads: int, sm_scale: float):
    """One (batch, query-block) program: full-softmax attention, all heads.

    Block shapes: q (1, TQ, H·dh), k/v (1, T, H·dh), bias (1, 1, T) f32
    (0 for valid keys, -1e9 for padded/masked), out (1, TQ, H·dh).
    """
    q = q_ref[0]                                   # (TQ, D)
    k = k_ref[0]                                   # (T, D)
    v = v_ref[0]                                   # (T, D)
    bias = bias_ref[0].astype(jnp.float32)         # (1, T) → broadcast rows
    d = q.shape[-1]
    dh = d // num_heads
    outs = []
    for h in range(num_heads):                     # static unroll
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # (TQ, T)
        s = s * sm_scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v[:, sl],
                    preferred_element_type=jnp.float32)
        outs.append(o / l)
    out_ref[0] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "sm_scale", "interpret"))
def _speech_attention_fwd(q3, k3, v3, bias, *, num_heads: int,
                          sm_scale: float, interpret: bool = False):
    """q3/k3/v3: (B, T, D) with D = H·dh; bias: (B, T) f32 key-side adds.

    T need not be lane-aligned — padding happens here.
    """
    b, t, d = q3.shape
    t_pad = _round_up(max(t, _LANE), _LANE)
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0)]
        q3 = jnp.pad(q3, pad)
        k3 = jnp.pad(k3, pad)
        v3 = jnp.pad(v3, pad)
        bias = jnp.pad(bias, [(0, 0), (0, t_pad - t)],
                       constant_values=_NEG)
    tq = _pick_tq(t_pad)
    grid = (b, t_pad // tq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads,
                          sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, d), q3.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t_pad * t_pad * d,
            bytes_accessed=4 * b * t_pad * d * q3.dtype.itemsize,
            transcendentals=b * t_pad * t_pad,
        ),
        interpret=interpret,
    )(q3, k3, v3, bias[:, None, :])
    return out[:, :t]


def _reference(q, k, v, bias4, sm_scale):
    """Unfused oracle/backward: plain softmax attention, (B, T, H, dh)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    if bias4 is not None:
        s = s + bias4
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype),
                      v).astype(q.dtype)


def _use_pallas() -> bool:
    from sincformer_tpu.utils.backend import on_tpu
    return on_tpu()


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def speech_attention(q, k, v, bias, sm_scale: Optional[float] = None):
    """Full-softmax attention tuned for speech-length T.

    Args:
        q, k, v: (B, T, H, dh).
        bias: optional (B, T) f32 key-side additive bias (0 valid,
            -1e9 masked) — the valid-frame mask in additive form.
        sm_scale: score scale; default 1/sqrt(dh).

    Returns:
        (B, T, H, dh) attention output, dtype of q.
    """
    return _speech_attention_impl(q, k, v, bias, sm_scale)


def _speech_attention_impl(q, k, v, bias, sm_scale):
    b, t, h, dh = q.shape
    scale = sm_scale if sm_scale is not None else 1.0 / float(dh) ** 0.5
    if _use_pallas():
        if bias is None:
            bias = jnp.zeros((b, t), jnp.float32)
        out3 = _speech_attention_fwd(
            q.reshape(b, t, h * dh), k.reshape(b, t, h * dh),
            v.reshape(b, t, h * dh), bias, num_heads=h, sm_scale=scale)
        return out3.reshape(b, t, h, dh)
    bias4 = None if bias is None else bias[:, None, None, :]
    return _reference(q, k, v, bias4, scale)


def _vjp_fwd(q, k, v, bias, sm_scale):
    return _speech_attention_impl(q, k, v, bias, sm_scale), (q, k, v, bias)


def _vjp_bwd(sm_scale, res, g):
    q, k, v, bias = res
    scale = sm_scale if sm_scale is not None else 1.0 / float(q.shape[-1]) ** 0.5
    bias4 = None if bias is None else bias[:, None, None, :]
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference(q_, k_, v_, bias4, scale),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


speech_attention.defvjp(_vjp_fwd, _vjp_bwd)
