"""Bidirectional linear-recurrent (LRU-style) sequence mixer.

Drop-in replacement for the CPEA's BiLSTM (reference agents/cpea.py:22-115)
behind ``CorrelationPhaseEstimationAgent(impl="ssm")``. The BiLSTM is the
metacog stack's compile- and step-time bottleneck: a per-timestep
``lax.scan`` whose cell does tiny (B,128)×(128,512) matmuls every step.
A diagonal linear state-space recurrence computes the same sequence mixing
with ``jax.lax.associative_scan`` — O(log T) depth instead of O(T), and all
projections become a few large MXU GEMMs over the whole (B·T) batch.

Parameterisation follows the Linear Recurrent Unit (Orvieto et al., 2023,
arXiv:2303.06349): complex diagonal transition λ = exp(−exp(ν) + i·exp(θ))
with |λ| initialised uniformly in [r_min, r_max], input normalisation
γ = √(1−|λ|²), complex input/output projections, and a real skip path.
Nonlinearity between layers is a GLU, as in the S5/LRU literature.

This is an idiomatic-TPU substitution, not a reference port: interface and
output shapes match the BiLSTM exactly ((B, T, 2·hidden) features into the
same four CPEA heads), so checkpoints select the implementation via the
module config.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _lru_init_nu(key, shape, r_min=0.9, r_max=0.999):
    u = jax.random.uniform(key, shape)
    radii = jnp.sqrt(u * (r_max ** 2 - r_min ** 2) + r_min ** 2)
    return jnp.log(-jnp.log(radii))


def _lru_init_theta(key, shape, max_phase=np.pi / 4):
    return jnp.log(jax.random.uniform(key, shape, minval=1e-4,
                                      maxval=max_phase))


class LRULayer(nn.Module):
    """x (B, T, D) → y (B, T, D): diagonal complex linear recurrence along
    time via associative scan, with learned input/output mixing."""

    d_model: int
    d_state: int = 128
    reverse: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.d_state
        nu_log = self.param("nu_log", _lru_init_nu, (h,))
        theta_log = self.param("theta_log", _lru_init_theta, (h,))
        b_re = self.param("B_re", nn.initializers.lecun_normal(),
                          (self.d_model, h))
        b_im = self.param("B_im", nn.initializers.lecun_normal(),
                          (self.d_model, h))
        c_re = self.param("C_re", nn.initializers.lecun_normal(),
                          (h, self.d_model))
        c_im = self.param("C_im", nn.initializers.lecun_normal(),
                          (h, self.d_model))
        d_skip = self.param("D", nn.initializers.ones, (self.d_model,))

        # Complex diagonal recurrence in REAL arithmetic (pairs of planes):
        # TPU/XLA complex support is partial (eager complex exp is
        # UNIMPLEMENTED on the axon backend), and real pairs map cleanly
        # onto the VPU.
        mag = jnp.exp(-jnp.exp(nu_log))                             # |λ|
        theta = jnp.exp(theta_log)
        lam_re, lam_im = mag * jnp.cos(theta), mag * jnp.sin(theta)
        gamma = jnp.sqrt(jnp.maximum(1.0 - mag ** 2, 1e-8))

        seq = jnp.flip(x, axis=1) if self.reverse else x
        bx_re = (seq @ b_re) * gamma                                # (B,T,H)
        bx_im = (seq @ b_im) * gamma
        shape = bx_re.shape
        lr = jnp.broadcast_to(lam_re, shape)
        li = jnp.broadcast_to(lam_im, shape)

        def combine(a, b):
            alr, ali, abr, abi = a
            blr, bli, bbr, bbi = b
            # λ_combined = λ_b · λ_a ; b_combined = λ_b · b_a + b_b
            return (blr * alr - bli * ali,
                    blr * ali + bli * alr,
                    blr * abr - bli * abi + bbr,
                    blr * abi + bli * abr + bbi)

        _, _, hr, hi = jax.lax.associative_scan(
            combine, (lr, li, bx_re, bx_im), axis=1)
        y = hr @ c_re - hi @ c_im                                   # Re(h·C)
        if self.reverse:
            y = jnp.flip(y, axis=1)
        return y + x * d_skip


class BiLRU(nn.Module):
    """Bidirectional LRU block stack: (B, T, D) → (B, T, 2·hidden),
    shape-compatible with the CPEA BiLSTM feature extractor."""

    input_dim: int = 256
    hidden_size: int = 128
    num_layers: int = 2
    d_state: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = 2 * self.hidden_size
        x = nn.Dense(d, name="in_proj")(x)
        for layer in range(self.num_layers):
            residual = x
            x = nn.LayerNorm(name=f"ln_{layer}")(x)
            fwd = LRULayer(d, self.d_state, reverse=False,
                           name=f"lru_fwd_{layer}")(x)
            bwd = LRULayer(d, self.d_state, reverse=True,
                           name=f"lru_bwd_{layer}")(x)
            x = fwd + bwd
            # GLU channel mixing (S5/LRU recipe)
            x = nn.Dense(2 * d, name=f"glu_{layer}")(nn.gelu(x))
            x = nn.glu(x, axis=-1)
            x = residual + x
        return x
