"""Metacognitive Arbitration Agent — uncertainty → strategy routing.

Capability-parity with the reference (``agents/maa.py:26-143``): running-stat
normalised σ → 3-layer MLP → 4-way decision {SOFT_MASK, RESAMPLE, HARD_MASK,
ESCALATE}, learnable threshold τ, EMA running statistics.

Upgrade over the reference (flagged in SURVEY.md §0.2): the README promises
Gumbel-softmax routing but the code uses plain softmax+argmax
(maa.py:102-108). Here both are available — ``routing="gumbel"`` gives the
differentiable straight-through sampler the README describes, ``routing=
"softmax"`` reproduces the reference. Running stats live in a mutable
``maa_stats`` variable collection (functional-JAX replacement for torch
buffers).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

SOFT_MASK, RESAMPLE, HARD_MASK, ESCALATE = 0, 1, 2, 3

STRATEGY_NAMES = {
    0: "SOFT_MASK (high confidence)",
    1: "RESAMPLE (ensemble averaging)",
    2: "HARD_MASK (quantized fallback)",
    3: "ESCALATE (human review)",
}


def get_strategy_name(decision_idx: int) -> str:
    """Human-readable strategy (reference maa.py:132-140)."""
    return STRATEGY_NAMES.get(int(decision_idx), "UNKNOWN")


class MetacognitiveArbitrationAgent(nn.Module):
    """σ (B, 1, T) or (B, T) → routing dict."""

    hidden_dim: int = 64
    num_classes: int = 4
    initial_threshold: float = 0.5
    routing: str = "gumbel"       # "gumbel" | "softmax" (reference parity)
    tau: float = 1.0              # gumbel temperature

    @nn.compact
    def __call__(self, sigma: jnp.ndarray, train: bool = False,
                 rng_key=None, tau=None) -> Dict[str, jnp.ndarray]:
        """``tau`` overrides the Gumbel temperature (annealing schedules
        pass a traced value; default: the static field)."""
        if sigma.ndim == 3:
            sigma = sigma[:, 0, :]                        # (B, T)

        # Parity note: the reference's "learnable threshold τ" is a DEAD
        # parameter — created (maa.py:52) and returned (maa.py:117) but
        # consumed by no computation, so it can never receive a gradient.
        # Reproduced as-is for checkpoint/contract parity; consumers of
        # routing["threshold"] get the init value (0.5) by design.
        threshold = self.param(
            "threshold", lambda *_: jnp.asarray([self.initial_threshold]))

        run_mean = self.variable("maa_stats", "running_mean",
                                 lambda: jnp.zeros(()))
        run_var = self.variable("maa_stats", "running_var",
                                lambda: jnp.ones(()))
        num_updates = self.variable("maa_stats", "num_updates",
                                    lambda: jnp.zeros((), jnp.int32))

        if train:  # EMA update (maa.py:121-130)
            momentum = 0.1
            batch_mean = jnp.mean(sigma)
            batch_var = jnp.var(sigma)
            run_mean.value = ((1 - momentum) * run_mean.value
                              + momentum * batch_mean)
            run_var.value = ((1 - momentum) * run_var.value
                             + momentum * batch_var)
            num_updates.value = num_updates.value + 1

        normalized = ((sigma - run_mean.value)
                      / (jnp.sqrt(run_var.value) + 1e-8))

        x = normalized[..., None]                         # (B, T, 1)
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(x))
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc2")(x))
        logits = nn.Dense(self.num_classes, name="fc3")(x)  # (B, T, 4)

        probs = nn.softmax(logits, axis=-1)
        if train and self.routing == "gumbel":
            if rng_key is None:
                rng_key = self.make_rng("routing")
            g = -jnp.log(-jnp.log(
                jax.random.uniform(rng_key, logits.shape, minval=1e-10,
                                   maxval=1.0) + 1e-10))
            t = self.tau if tau is None else tau
            y_soft = nn.softmax((logits + g) / t, axis=-1)
            # straight-through one-hot
            idx = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(idx, self.num_classes)
            route = y_soft + jax.lax.stop_gradient(y_hard - y_soft)
        elif train:
            route = probs                                 # reference softmax
        else:
            idx = jnp.argmax(logits, axis=-1)
            route = jax.nn.one_hot(idx, self.num_classes)

        decisions = jnp.argmax(logits if not train else probs, axis=-1)
        confidence = nn.sigmoid(-normalized)

        return {"decisions": decisions, "probs": probs, "logits": logits,
                "route": route, "threshold": threshold,
                "confidence": confidence}
