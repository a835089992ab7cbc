"""Int8 quantization kernels (Pallas): per-channel scales + stochastic
rounding.

Purpose here is weight storage/transfer compression — the models are small
(≤10 M params) so int8 COMPUTE buys nothing on the MXU, but 4× smaller
checkpoints/HBM parameter traffic matter for fleet serving and multi-model
grids. Stochastic rounding keeps the quantization error zero-mean, which
is what lets round-tripped weights preserve model quality.

API:
  * :func:`quantize_int8` — (rows, cols) f32 → (int8 values, (cols,) f32
    per-column scales), one Pallas kernel (TPU) or an identical jnp
    fallback (CPU/interpret).
  * :func:`dequantize_int8` — inverse.
  * :func:`quantize_tree` / :func:`dequantize_tree` — apply to every ≥2-D
    leaf of a param pytree (1-D biases/norm params stay f32: they are
    tiny and precision-critical).

tests/test_pallas_ops.py::TestInt8Quantize covers kernel parity
(interpret mode), round-trip error bounds, zero-mean rounding, and a DCSE
end-to-end quality check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_kernel(seed_ref, x_ref, scale_ref, vals_ref):
    """Stochastic rounding of one (BR, C) row block against precomputed
    per-column scales. The per-column amax reduction happens in XLA
    (quantize is reduction + elementwise; only the on-chip PRNG needs
    Pallas) — so the kernel row-tiles and never holds the whole matrix
    in VMEM (a 20480×256 f32 embed table blew the 16 MB scoped-vmem
    limit when the kernel was un-gridded)."""
    # decorrelate the random stream across row blocks
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[:].astype(jnp.float32)                      # (BR, C)
    scaled = jnp.clip(x / scale_ref[:], -127.0, 127.0)
    # stochastic rounding to the int grid by hand — pltpu.stochastic_round
    # only targets bf16/fp8. uniform in [0,1) from the top 24 random bits.
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    # uint32→float is unsupported on TPU: go via int32 (top 24 bits are
    # non-negative, so the signed reinterpretation is exact)
    u = ((bits >> 8).astype(jnp.int32).astype(jnp.float32)
         * (1.0 / (1 << 24)))
    floor = jnp.floor(scaled)
    vals_ref[:] = (floor + (u < scaled - floor)).astype(jnp.int8)


def _quant_reference(x, key):
    """jnp stochastic rounding — the non-TPU path and the parity oracle."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    scaled = jnp.clip(x / scale, -127.0, 127.0)
    floor = jnp.floor(scaled)
    frac = scaled - floor
    up = jax.random.uniform(key, scaled.shape) < frac
    vals = (floor + up.astype(jnp.float32)).astype(jnp.int8)
    return vals, scale[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _quantize_pallas(x, seed, interpret=False):
    r, c = x.shape
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0              # (1, C)
    # row-block size: keep the f32 input block ≲2 MB of VMEM (plus the
    # int8 output and PRNG bits), in whole sublanes
    br = min(r, max(8, (2_000_000 // (4 * c)) // 8 * 8))
    grid = (r + br - 1) // br
    vals = pl.pallas_call(
        _round_kernel,
        grid=(grid,),
        out_shape=jax.ShapeDtypeStruct((r, c), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((br, c), lambda i: (i, 0)),
                  pl.BlockSpec((1, c), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0)),
        interpret=interpret,
    )(seed, x, scale)
    return vals, scale[0]


def _on_tpu() -> bool:
    from sincformer_tpu.utils.backend import on_tpu
    return on_tpu()


def quantize_int8(x: jnp.ndarray, seed: int = 0,
                  force_kernel: bool = False):
    """(R, C) float → (int8 (R, C), f32 (C,) per-column scales).

    The Pallas kernel runs on TPU (its PRNG primitives do not lower on
    CPU, even interpreted); elsewhere an identical-semantics jnp
    implementation is used.
    """
    assert x.ndim == 2, x.shape
    if force_kernel or _on_tpu():
        return _quantize_pallas(x, jnp.asarray([seed], jnp.int32))
    return _quant_reference(x, jax.random.PRNGKey(seed))


def dequantize_int8(vals: jnp.ndarray, scales: jnp.ndarray,
                    dtype=jnp.float32) -> jnp.ndarray:
    return vals.astype(dtype) * scales.astype(dtype)[None, :]


def quantize_tree(params, seed: int = 0):
    """Quantize every ≥2-D leaf per-output-channel; smaller leaves stay
    f32. Returns a pytree of {"q": int8, "s": scales} / raw leaves."""
    leaves_seed = [seed]

    def q(leaf):
        if leaf.ndim >= 2 and leaf.size >= 4096:
            leaves_seed[0] += 1
            mat = leaf.reshape(-1, leaf.shape[-1])
            vals, scales = quantize_int8(mat, seed=leaves_seed[0])
            return {"q": vals.reshape(leaf.shape), "s": scales}
        return leaf

    return jax.tree.map(q, params)


def dequantize_tree(tree, dtype=jnp.float32):
    def is_q(node):
        return isinstance(node, dict) and set(node) == {"q", "s"}

    def dq(node):
        if is_q(node):
            q = node["q"]
            mat = dequantize_int8(q.reshape(-1, q.shape[-1]), node["s"],
                                  dtype)
            return mat.reshape(q.shape)
        return node

    return jax.tree.map(dq, tree, is_leaf=is_q)
