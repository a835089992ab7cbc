"""Context-parallel depthwise convolution: halo exchange over a mesh axis.

The Conformer's depthwise conv mixes a ±(k−1)/2 time neighbourhood, so a
TIME-sharded activation needs its neighbours' edge frames. Letting GSPMD
partition the conv works for the forward but jax 0.9.0's SPMD partitioner
DOUBLE-COUNTS conv kernel gradients whenever the input is spatially
sharded on a mesh that has a second (unused) axis — kernel grads come back
scaled by exactly the size of that axis (repro: scripts/repro notes in
tests/test_cp_conv.py). This op sidesteps the partitioner: a
``shard_map`` body exchanges halo frames with ``ppermute`` (one ICI hop
each way), zero-pads the global edges, and runs a VALID depthwise conv
locally — the canonical CP convolution, with gradients that are exact by
construction (autodiff of ppermute is ppermute).

Used by models/conformer.py::DepthwiseConv when an ``ops.ring_mesh``
context-parallel context is active.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _body(x, kernel, bias, *, seq_axis: str, n: int, halo: int):
    """Per-device body. x: (B, Tl, C) local block; kernel (k, 1, C)."""
    i = jax.lax.axis_index(seq_axis)
    if halo > 0:
        to_next = [(j, (j + 1) % n) for j in range(n)]
        to_prev = [(j, (j - 1) % n) for j in range(n)]
        # device i receives x[i-1]'s tail as its left halo and x[i+1]'s
        # head as its right halo; global edges are zeroed (SAME padding)
        left = jax.lax.ppermute(x[:, -halo:, :], seq_axis, to_next)
        right = jax.lax.ppermute(x[:, :halo, :], seq_axis, to_prev)
        left = jnp.where(i == 0, 0.0, 1.0).astype(x.dtype) * left
        right = jnp.where(i == n - 1, 0.0, 1.0).astype(x.dtype) * right
        x = jnp.concatenate([left, x, right], axis=1)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=kernel.shape[-1])
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def cp_depthwise_conv(x: jnp.ndarray, kernel: jnp.ndarray,
                      bias: jnp.ndarray | None, mesh: Mesh,
                      seq_axis: str = "data") -> jnp.ndarray:
    """SAME-padded stride-1 depthwise conv of a time-sharded (B, T, C)
    activation, exchanging (k−1)/2 halo frames over ``mesh[seq_axis]``.

    ``kernel``: (k, 1, C) flax ``nn.Conv`` depthwise layout, odd k.
    T must divide the axis size and every local block must be at least as
    long as the halo.
    """
    k = kernel.shape[0]
    assert k % 2 == 1, f"odd kernel required, got {k}"
    halo = (k - 1) // 2
    n = mesh.shape[seq_axis]
    t = x.shape[1]
    assert t % n == 0, f"T={t} must divide the '{seq_axis}' axis size {n}"
    assert t // n >= halo, (
        f"local block {t // n} shorter than halo {halo} — use fewer "
        f"devices or a shorter kernel")
    spec = P(None, seq_axis, None)
    body = functools.partial(_body, seq_axis=seq_axis, n=n, halo=halo)
    has_bias = bias is not None
    fn = jax.shard_map(
        body if has_bias else (lambda x_, k_: body(x_, k_, None)),
        mesh=mesh,
        in_specs=(spec, P(), P()) if has_bias else (spec, P()),
        out_specs=spec)
    return fn(x, kernel, bias) if has_bias else fn(x, kernel)
