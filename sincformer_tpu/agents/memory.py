"""Episodic key-value memory for noise-environment adaptation.

Capability-parity with the reference (``agents/memory.py:24-158``): 64-slot
learnable K/V bank, projected-query cosine-similarity softmax retrieval,
tanh-bounded value projection with tiny init (the "gradient lifeline",
memory.py:77-82), confidence gate, usage counters.

Usage counters are a mutable ``memory_stats`` variable collection (the
functional replacement for torch buffers); the per-sample Python loop of the
reference (memory.py:138-141) is one one-hot sum.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


class EpisodicMemory(nn.Module):
    """environment_embedding (B, key_dim) → {bias, gate, top_indices, similarity}."""

    key_dim: int = 256
    value_dim: int = 129
    num_slots: int = 64
    temperature: float = 1.0

    @nn.compact
    def __call__(self, environment_embedding: jnp.ndarray,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        keys = self.param("keys", nn.initializers.normal(0.01),
                          (self.num_slots, self.key_dim))
        values = self.param("values", nn.initializers.normal(0.01),
                            (self.num_slots, self.value_dim))

        q = nn.Dense(self.key_dim, name="key_proj1")(environment_embedding)
        q = nn.LayerNorm(name="key_ln")(q)
        q = nn.gelu(q)
        query = nn.Dense(self.key_dim, name="key_proj2")(q)

        qn = query / (jnp.linalg.norm(query, axis=-1, keepdims=True) + 1e-8)
        kn = keys / (jnp.linalg.norm(keys, axis=-1, keepdims=True) + 1e-8)
        similarity = (qn @ kn.T) / self.temperature        # (B, slots)
        attention = nn.softmax(similarity, axis=-1)
        retrieved = attention @ values                     # (B, value_dim)

        bias = jnp.tanh(nn.Dense(
            self.value_dim, name="value_proj",
            kernel_init=nn.initializers.variance_scaling(
                0.01 ** 2, "fan_avg", "uniform"),
            bias_init=nn.initializers.zeros)(retrieved))

        gate = nn.sigmoid(nn.Dense(1, name="gate")(
            jnp.concatenate([query, retrieved], axis=-1)))

        usage = self.variable("memory_stats", "usage_count",
                              lambda: jnp.zeros(self.num_slots))
        n_queries = self.variable("memory_stats", "num_queries",
                                  lambda: jnp.zeros((), jnp.int32))
        top = jnp.argmax(similarity, axis=-1)
        if train:
            usage.value = usage.value + jnp.sum(
                jax.nn.one_hot(top, self.num_slots), axis=0)
            n_queries.value = n_queries.value + top.shape[0]

        return {"bias": bias * gate, "gate": gate, "top_indices": top,
                "similarity": jnp.max(similarity, axis=-1)}

    @staticmethod
    def usage_stats(memory_stats) -> jnp.ndarray:
        """Slot utilisation fractions (reference memory.py:150-155)."""
        total = memory_stats["num_queries"]
        return jnp.where(total > 0,
                         memory_stats["usage_count"] / jnp.maximum(total, 1),
                         jnp.zeros_like(memory_stats["usage_count"]))
