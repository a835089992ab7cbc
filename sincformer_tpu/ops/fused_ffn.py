"""Fused LayerNorm → Dense(d_ff) → Swish → Dense(d) → ½-residual kernel.

The Conformer's feed-forward modules carry ~76 % of a DCSE block's FLOPs
(2 × [LN + GEMM(d→4d) + Swish + GEMM(4d→d)] per block). Run as separate
XLA ops, each stage round-trips a (B·T, d) or (B·T, 4d) activation through
HBM; round-1 profiling pinned DCSE inference at ≈52 TFLOP/s bf16 — ~25 %
of v5e peak — with elementwise HBM traffic as the ceiling
(docs/PERF.md:29,49). This Pallas kernel performs the whole module with ONE
HBM read of x and ONE write of the output per row tile: the normalised
activations, the 4d intermediate and the swish all live in VMEM.

Layout: rows = flattened (B·T) positions, d and d_ff kept whole in VMEM
(d=256, d_ff=1024 bf16 weights = 1 MB — comfortably resident). Row tiles
of 256 keep the MXU fed ((256,256)·(256,1024) per step).

Gradients: ``fused_ffn`` carries a custom VJP whose backward is the JAX
autodiff of the reference formulation (numerically identical path), so the
kernel is safe inside training steps; the forward win is what matters for
serving. Dropout inside the module is inference-identity; training callers
that need dropout use the unfused module.

Parity: tests/test_pallas_ops.py::TestFusedFFN checks kernel vs
flax FeedForwardModule to fp32 precision (interpret mode on CPU, compiled
on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6


def _ffn_kernel(x_ref, ln_g_ref, ln_b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                out_ref):
    x = x_ref[:].astype(jnp.float32)                       # (TM, D)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + _LN_EPS)
    xn = xn * ln_g_ref[:].astype(jnp.float32) \
        + ln_b_ref[:].astype(jnp.float32)
    h = jnp.dot(xn.astype(w1_ref.dtype), w1_ref[:],
                preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    h = h * jax.nn.sigmoid(h)                              # swish
    y = jnp.dot(h.astype(w2_ref.dtype), w2_ref[:],
                preferred_element_type=jnp.float32)
    y = y + b2_ref[:].astype(jnp.float32)
    out_ref[:] = (x + 0.5 * y).astype(out_ref.dtype)


def _ffn_reference(x, ln_g, ln_b, w1, b1, w2, b2):
    """Unfused formulation — the backward pass and the parity oracle."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS) * ln_g + ln_b
    h = jnp.dot(xn.astype(w1.dtype), w1,
                preferred_element_type=jnp.float32) + b1
    h = h * jax.nn.sigmoid(h)
    y = jnp.dot(h.astype(w2.dtype), w2,
                preferred_element_type=jnp.float32) + b2
    return (xf + 0.5 * y).astype(x.dtype)


def _round_up(n, m):
    return (n + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ffn_fwd_pallas(x2d, ln_g, ln_b, w1, b1, w2, b2, interpret=False):
    m, d = x2d.shape
    d_ff = w1.shape[1]
    tile_m = 256
    m_pad = _round_up(max(m, 8), tile_m)
    if m_pad != m:
        x2d = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // tile_m,)
    out = pl.pallas_call(
        _ffn_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, d), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d_ff), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_ff,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_ff, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * d * d_ff,
            bytes_accessed=(2 * m_pad * d + 2 * d * d_ff) * x2d.dtype.itemsize,
            transcendentals=m_pad * d_ff,
        ),
        interpret=interpret,
    )(x2d, ln_g, ln_b, w1, b1, w2, b2)
    return out[:m]


@jax.custom_vjp
def fused_ffn(x, ln_g, ln_b, w1, b1, w2, b2):
    """y = x + ½·(swish(LN(x)·W1 + b1)·W2 + b2), fused on TPU.

    Args:
        x: (..., d) activations.
        ln_g, ln_b: LayerNorm scale/bias (d,).
        w1: (d, d_ff); b1: (d_ff,); w2: (d_ff, d); b2: (d,).
    """
    return _fused_ffn_fwd_impl(x, ln_g, ln_b, w1, b1, w2, b2)


def _use_pallas() -> bool:
    from sincformer_tpu.utils.backend import on_tpu
    return on_tpu()


def _fused_ffn_fwd_impl(x, ln_g, ln_b, w1, b1, w2, b2):
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    if _use_pallas():
        out = _ffn_fwd_pallas(x2d, ln_g, ln_b, w1, b1, w2, b2)
    else:
        out = _ffn_reference(x2d, ln_g, ln_b, w1, b1, w2, b2)
    return out.reshape(shape)


def _fused_ffn_vjp_fwd(x, ln_g, ln_b, w1, b1, w2, b2):
    return (_fused_ffn_fwd_impl(x, ln_g, ln_b, w1, b1, w2, b2),
            (x, ln_g, ln_b, w1, b1, w2, b2))


def _fused_ffn_vjp_bwd(res, g):
    x, ln_g, ln_b, w1, b1, w2, b2 = res
    shape = x.shape

    def ref(x_, ln_g_, ln_b_, w1_, b1_, w2_, b2_):
        return _ffn_reference(x_.reshape(-1, shape[-1]), ln_g_, ln_b_,
                              w1_, b1_, w2_, b2_).reshape(shape)

    _, vjp = jax.vjp(ref, x, ln_g, ln_b, w1, b1, w2, b2)
    return vjp(g)


fused_ffn.defvjp(_fused_ffn_vjp_fwd, _fused_ffn_vjp_bwd)
