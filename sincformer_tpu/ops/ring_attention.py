"""Ring attention: context-parallel attention over a mesh axis.

Completes the long-context story (SURVEY.md §5): the flash kernel
(ops/attention.py) covers single-chip long sequences; this op covers
sequences whose activations don't fit ONE chip by sharding the TIME axis
across the mesh. Each device holds a T/P slice of Q, K and V; K/V blocks
travel around the ring with ``jax.lax.ppermute`` while every device
accumulates its queries' attention over each visiting block with the
online-softmax recurrence (the blockwise/ring-attention construction of
Liu et al., 2023). Communication rides the ICI ring and overlaps with the
per-block matmuls under XLA's scheduler; nothing ever materialises a
(T, T) score matrix or gathers full K/V.

8 kHz utterances never need this (T≈400); it exists for long-form /
streaming enhancement at minutes-of-audio scale, and is exercised on the
virtual 8-device CPU mesh in tests/test_ring_attention.py against exact
full attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_NEG = -1e30


def _ring_body(q, k, v, axis_name: str, n_devices: int, scale: float):
    """Per-device shard_map body. q, k, v: (B, Tl, H, Dh) local blocks."""
    qh = jnp.swapaxes(q, 1, 2).astype(jnp.float32)      # (B, H, Tl, Dh)
    # derive the accumulators from qh so they carry the same device-varying
    # type as the loop outputs (shard_map tracks manual-axis variance)
    m = jnp.full_like(qh[..., 0], _NEG)
    l = jnp.zeros_like(qh[..., 0])
    acc = jnp.zeros_like(qh)
    perm = [(j, (j + 1) % n_devices) for j in range(n_devices)]

    def accumulate(m, l, acc, kc, vc):
        kh = jnp.swapaxes(kc, 1, 2).astype(jnp.float32)  # (B, H, Tk, Dh)
        vh = jnp.swapaxes(vc, 1, 2).astype(jnp.float32)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                       precision=jax.lax.Precision.HIGHEST) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vh,
            precision=jax.lax.Precision.HIGHEST)
        return m_new, l, acc

    def step(_, carry):
        m, l, acc, kc, vc = carry
        m, l, acc = accumulate(m, l, acc, kc, vc)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return m, l, acc, kc, vc

    # n-1 process+permute hops, then the FINAL block without the permute:
    # the old n-iteration loop shipped one extra K+V block around the ICI
    # ring whose result was discarded (round-4 review)
    kc, vc = k, v
    if n_devices > 1:
        m, l, acc, kc, vc = jax.lax.fori_loop(0, n_devices - 1, step,
                                              (m, l, acc, k, v))
    m, l, acc = accumulate(m, l, acc, kc, vc)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)       # (B, Tl, H, Dh)


def ring_attention_in_mesh(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           mesh: Mesh, seq_axis: str = "data"
                           ) -> jnp.ndarray:
    """The shard_map core — safe to call on traced values INSIDE ``jit``
    (no device placement; GSPMD reshards operands onto the sequence axis).
    Used by the model layer via ops/attention.py ``impl="ring"``."""
    n = mesh.shape[seq_axis]
    assert q.shape[1] % n == 0, (
        f"T={q.shape[1]} must divide the '{seq_axis}' axis size {n}")
    scale = 1.0 / float(q.shape[-1]) ** 0.5
    spec = P(None, seq_axis, None, None)
    body = functools.partial(_ring_body, axis_name=seq_axis, n_devices=n,
                             scale=scale)
    fn = jax.shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec)
    return fn(q, k, v)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, seq_axis: str = "data") -> jnp.ndarray:
    """Context-parallel attention over ``mesh[seq_axis]``.

    Args:
        q, k, v: (B, T, H, Dh) with T divisible by the axis size. May be
            global arrays (any sharding — they are re-sharded onto the
            sequence axis) or host arrays.
        mesh: the device mesh.
        seq_axis: mesh axis name to shard time over.

    Returns:
        (B, T, H, Dh) attention output, time-sharded like the inputs.
    """
    n = mesh.shape[seq_axis]
    assert q.shape[1] % n == 0, (
        f"T={q.shape[1]} must divide the '{seq_axis}' axis size {n}")
    spec = P(None, seq_axis, None, None)
    sh = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(x, sh) for x in (q, k, v))
    return ring_attention_in_mesh(q, k, v, mesh, seq_axis)
