"""5-layer mask-estimation DNN (reference ``models/dnn.py:22-132``).

594-dim context features → 3×[1024 ReLU + dropout 0.2] → 64 sigmoid mask.
Flax Linen; parameters live in bf16-friendly f32 (matmuls hit the MXU as one
(batch, 594)×(594, 1024) GEMM per layer — the whole frame batch in one shot).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from sincformer_tpu import config as cfg


class SpeechEnhancementDNN(nn.Module):
    """features (B, input_dim) → mask (B, output_dim) ∈ [0,1]."""

    input_dim: int = 594
    hidden_dim: int = 1024
    output_dim: int = 64
    num_hidden_layers: int = 3
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        for i in range(self.num_hidden_layers):
            x = nn.Dense(self.hidden_dim,
                         kernel_init=nn.initializers.he_normal(),
                         name=f"hidden_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.output_dim, name="output")(x)
        return nn.sigmoid(x)


def create_dnn(feature_dim: int, mask_dim: int | None = None,
               dcfg: cfg.DNNConfig = cfg.DEFAULT.dnn) -> SpeechEnhancementDNN:
    """Factory matching the reference's paper configuration
    (dnn.py:116-132)."""
    return SpeechEnhancementDNN(
        input_dim=feature_dim,
        hidden_dim=dcfg.hidden_units,
        output_dim=mask_dim or dcfg.output_dim,
        num_hidden_layers=dcfg.hidden_layers,
        dropout=dcfg.dropout,
    )


def load_rbm_weights(params, rbm_weights: Sequence[Tuple]) -> dict:
    """Overwrite hidden-layer kernels/biases with RBM-pretrained weights
    (reference dnn.py:96-109: all but the output layer).

    Args:
        params: Flax params dict of :class:`SpeechEnhancementDNN`.
        rbm_weights: list of (W (vis, hid), v_bias, h_bias) per layer.

    Returns:
        new params dict.
    """
    import flax
    flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
    for i, (w, _vb, hb) in enumerate(rbm_weights):
        k_kernel = ("params", f"hidden_{i}", "kernel")
        k_bias = ("params", f"hidden_{i}", "bias")
        if k_kernel not in flat:
            break
        flat[k_kernel] = jnp.asarray(w, jnp.float32)        # (vis, hid)
        flat[k_bias] = jnp.asarray(hb, jnp.float32)
    # plain dict to match flax>=0.8 init() pytree structure
    return flax.traverse_util.unflatten_dict(flat)
