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

    episodic_slots: int = 0       # >0 enables the WRITE path (see below)
    write_momentum: float = 0.5
    write_threshold: float = 0.7  # cosine: below this → new environment

    @nn.compact
    def __call__(self, environment_embedding: jnp.ndarray,
                 train: bool = False,
                 write_value: jnp.ndarray | None = None
                 ) -> Dict[str, jnp.ndarray]:
        keys = self.param("keys", nn.initializers.normal(0.01),
                          (self.num_slots, self.key_dim))
        values = self.param("values", nn.initializers.normal(0.01),
                            (self.num_slots, self.value_dim))

        q = nn.Dense(self.key_dim, name="key_proj1")(environment_embedding)
        q = nn.LayerNorm(name="key_ln")(q)
        q = nn.gelu(q)
        query = nn.Dense(self.key_dim, name="key_proj2")(q)

        # ── episodic WRITE path (new capability) ─────────────────────────
        # The reference only READS its memory; its docstring promises
        # continual adaptation to new noise environments (memory.py:2-13).
        # Here a non-learnable episodic bank lives in a mutable collection:
        # when a queried environment is far from every stored key (cosine
        # below write_threshold) the least-recently-used slot is overwritten
        # with the batch-mean (embedding, statistics) pair; near matches
        # update their slot by EMA. Reads attend over BOTH banks.
        ep = self.episodic_slots
        if ep > 0:
            ep_keys = self.variable("memory_bank", "keys",
                                    lambda: jnp.zeros((ep, self.key_dim)))
            ep_vals = self.variable("memory_bank", "values",
                                    lambda: jnp.zeros((ep, self.value_dim)))
            ep_age = self.variable("memory_bank", "age",
                                   lambda: jnp.full((ep,), 1e9))
            if write_value is not None:
                emb = jnp.mean(jax.lax.stop_gradient(query), axis=0)
                val = jnp.mean(jax.lax.stop_gradient(write_value), axis=0)
                en = emb / (jnp.linalg.norm(emb) + 1e-8)
                ekn = ep_keys.value / (jnp.linalg.norm(
                    ep_keys.value, axis=-1, keepdims=True) + 1e-8)
                sims = ekn @ en                              # (ep,)
                best = jnp.argmax(sims)
                is_new = sims[best] < self.write_threshold
                slot = jnp.where(is_new, jnp.argmax(ep_age.value), best)
                m = jnp.where(is_new, 1.0, self.write_momentum)
                one = jax.nn.one_hot(slot, ep)[:, None]
                ep_keys.value = (ep_keys.value * (1 - one * m)
                                 + one * m * emb[None, :])
                ep_vals.value = (ep_vals.value * (1 - one * m)
                                 + one * m * val[None, :])
                ep_age.value = (ep_age.value + 1.0) * (1.0 - one[:, 0])
            keys = jnp.concatenate([keys, ep_keys.value], axis=0)
            values = jnp.concatenate([values, ep_vals.value], axis=0)

        qn = query / (jnp.linalg.norm(query, axis=-1, keepdims=True) + 1e-8)
        kn = keys / (jnp.linalg.norm(keys, axis=-1, keepdims=True) + 1e-8)
        similarity = (qn @ kn.T) / self.temperature        # (B, slots[+ep])
        attention = nn.softmax(similarity, axis=-1)
        retrieved = attention @ values                     # (B, value_dim)

        bias = jnp.tanh(nn.Dense(
            self.value_dim, name="value_proj",
            kernel_init=nn.initializers.variance_scaling(
                0.01 ** 2, "fan_avg", "uniform"),
            bias_init=nn.initializers.zeros)(retrieved))

        gate = nn.sigmoid(nn.Dense(1, name="gate")(
            jnp.concatenate([query, retrieved], axis=-1)))

        # Counters span BOTH banks: one_hot must be sized to the combined
        # slot count, otherwise retrievals that hit episodic slots one-hot
        # to all zeros and silently vanish from the stats.
        total_slots = self.num_slots + ep
        usage = self.variable("memory_stats", "usage_count",
                              lambda: jnp.zeros(total_slots))
        n_queries = self.variable("memory_stats", "num_queries",
                                  lambda: jnp.zeros((), jnp.int32))
        top = jnp.argmax(similarity, axis=-1)
        if train:
            usage.value = usage.value + jnp.sum(
                jax.nn.one_hot(top, total_slots), axis=0)
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
