"""Pallas TPU kernel fusing the PerceptionAgentMXU front-end elementwise
stages into ONE pass over the sinc filterbank output.

The PA-MXU v2 forward (agents/perception.py) derives two streams from the
(B, N, C) sinc output x:

  * fine activation  y   = gelu(x * scale)              — (B, N, C)
  * envelope stream  env = log1p(mean_8(|x|))           — (B, N/8, C)

MEASURED NEGATIVE RESULT — parity-tested but NOT wired into the PA:
at the PA call site (B=128, N=32000, C=64, bf16, one v5e) this kernel
measures ~12 ms SLOWER than XLA's fusion of the same ops. C=64 is half
the 128-lane VPU width (every vector op runs at 50 % lane utilisation and
tiles pad to 128 lanes), and the sublane-split reshape reduce lowers as
cross-sublane shuffles; XLA's fusion pipelines the same arithmetic inside
the surrounding convs' HBM traffic. Same lesson as ops/conv_gn_pallas.py
and ops/fused_ffn.py: at small-channel speech shapes, a Pallas kernel must
be MXU-dominated to beat the XLA fuser (docs/PERF.md round-3c).

Grid: (B, N/block). Each program loads one (block, C) tile, emits the
activated tile and its (block/8, C) pooled envelope. The 8-sample pooling
is done with stride-8 sublane slices (Mosaic-safe; in-register reshape of
the sublane dim is not).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_POOL = 8


def _kernel(x_ref, scale_ref, y_ref, env_ref, *, block: int):
    x = x_ref[0]                                   # (block, C)
    scale = scale_ref[...]                         # (1, C)
    y_ref[0] = jax.nn.gelu(x * scale)
    # rectify-then-pool: split the sublane dim (block) into (block/8, 8)
    # and reduce the inner factor (Mosaic allows leading-dim splits; a
    # stride-8 extract_strided_slice is rejected)
    a = jnp.abs(x.astype(jnp.float32)).reshape(block // _POOL, _POOL,
                                               x.shape[1])
    env_ref[0] = jnp.log1p(a.mean(axis=1)).astype(env_ref.dtype)


def _pick_block(n: int) -> int | None:
    """Largest block with 64 | block (so the (block,C) activation tile AND
    the (block/8,C) envelope tile both satisfy the TPU sublane-multiple-of-8
    rule in every dtype) that exactly divides N. None → no valid tiling."""
    for bk in (3200, 1920, 1280, 640, 320, 192, 128, 64):
        if n % bk == 0:
            return bk
    return None


def env_act(x: jnp.ndarray, scale: jnp.ndarray,
            block: int | None = None, interpret: bool = False):
    """(B, N, C) sinc output → (gelu(x*scale), log1p(pool8(|x|))).

    ``block`` must divide N and be a multiple of 64 on real TPUs (interpret
    mode only needs the pool-8 divisibility). Callers should prefer
    :func:`env_act_auto`, which falls back to the XLA formulation when no
    valid tiling exists.
    """
    b, n, c = x.shape
    if block is None:
        block = _pick_block(n)
        if block is None:
            raise ValueError(f"no valid envelope tiling for N={n}")
    y, env = pl.pallas_call(
        functools.partial(_kernel, block=block),
        grid=(b, n // block),
        in_specs=[pl.BlockSpec((1, block, c), lambda i, j: (i, j, 0)),
                  pl.BlockSpec((1, c), lambda i, j: (0, 0))],
        out_specs=[pl.BlockSpec((1, block, c), lambda i, j: (i, j, 0)),
                   pl.BlockSpec((1, block // _POOL, c),
                                lambda i, j: (i, j, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, n, c), x.dtype),
                   jax.ShapeDtypeStruct((b, n // _POOL, c), x.dtype)],
        interpret=interpret,
    )(x, scale.reshape(1, c))
    return y, env


def env_act_reference(x: jnp.ndarray, scale: jnp.ndarray):
    """Plain-XLA formulation (also the non-TPU fallback)."""
    b, n, c = x.shape
    y = jax.nn.gelu(x * scale)
    env = jnp.abs(x).reshape(b, n // _POOL, _POOL, c).mean(
        axis=2, dtype=jnp.float32)
    return y, jnp.log1p(env).astype(x.dtype)


@jax.custom_vjp
def _env_act_tpu(x, scale):
    return env_act(x, scale)


def _env_act_fwd(x, scale):
    return env_act(x, scale), (x, scale)


def _env_act_bwd(res, cts):
    # reference-formulation VJP (same pattern as ops/conv_gn_pallas.py):
    # the backward is elementwise-cheap, so plain XLA is fine there
    x, scale = res
    _, vjp = jax.vjp(env_act_reference, x, scale)
    return vjp(cts)


_env_act_tpu.defvjp(_env_act_fwd, _env_act_bwd)


def _on_tpu() -> bool:
    from sincformer_tpu.utils.backend import on_tpu
    return on_tpu()


def env_act_auto(x: jnp.ndarray, scale: jnp.ndarray):
    """Kernel on TPU, reference XLA elsewhere (or when no tiling fits).
    Differentiable both ways."""
    if _on_tpu() and _pick_block(x.shape[1]) is not None:
        return _env_act_tpu(x, scale)
    return env_act_reference(x, scale)
