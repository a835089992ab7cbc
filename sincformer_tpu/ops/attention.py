"""Attention dispatch: XLA fused attention or the Pallas flash kernel.

The Conformer's MHSA (models/conformer.py) calls this instead of binding to
one implementation:

  * ``impl="xla"`` (default): ``jax.nn.dot_product_attention`` — XLA's fused
    attention; for speech-length sequences (~400 frames) it is already
    near-roofline and supports arbitrary additive bias.
  * ``impl="flash"``: the production Pallas flash-attention kernel
    (``jax.experimental.pallas.ops.tpu.flash_attention``) — tiled online-
    softmax, O(T) memory; the right choice for long-form/streaming audio
    where T² activations stop fitting (SURVEY.md §5 long-context note).
    Valid-frame masks are expressed as flash SegmentIds. TPU-only; falls
    back to XLA elsewhere.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _flash_available() -> bool:
    try:
        import jax.experimental.pallas.ops.tpu.flash_attention  # noqa: F401
    except Exception:  # pragma: no cover
        return False
    # honour an explicit CPU default device (tests pin it even though the
    # TPU backend stays registered)
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"


def dot_product_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          mask: Optional[jnp.ndarray] = None,
                          impl: str = "xla") -> jnp.ndarray:
    """Batched MHSA core.

    Args:
        q, k, v: (B, T, H, Dh).
        mask: optional (B, T) boolean valid-frame mask.
        impl: "xla" | "flash".

    Returns:
        (B, T, H, Dh) attention output.
    """
    if impl == "flash" and _flash_available():
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            SegmentIds, flash_attention)
        # flash kernel layout: (B, H, T, Dh)
        qt = jnp.swapaxes(q, 1, 2)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        seg = None
        if mask is not None:
            # padding frames get segment id 1, valid frames 0 → no
            # cross-attention between them; padded queries attend padding
            ids = (~mask).astype(jnp.int32)
            seg = SegmentIds(q=ids, kv=ids)
        out = flash_attention(qt, kt, vt, segment_ids=seg,
                              sm_scale=1.0 / float(q.shape[-1]) ** 0.5)
        return jnp.swapaxes(out, 1, 2)

    bias = None
    if mask is not None:
        b, t = mask.shape
        bias = jnp.where(mask[:, None, None, :], 0.0, -1e9)
        bias = jnp.broadcast_to(bias, (b, 1, t, t)).astype(q.dtype)
    return jax.nn.dot_product_attention(q, k, v, bias=bias)
