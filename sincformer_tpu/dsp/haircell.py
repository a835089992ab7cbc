"""Meddis (1986) inner hair cell — transmitter-reservoir ODE as a lax.scan.

The reference integrates the ODE with a per-sample Python loop over one
channel at a time (haircell.py:84-103 + the per-channel loop at 121-122).
Here the scan carries the (q, c, w) state for *all* channels and batch
elements at once: the time axis is sequential (inherent to the ODE) but each
step is a fully vectorised VPU op over (..., C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sincformer_tpu.utils.signal import frame_signal, num_frames


class MeddisHairCell:
    """Meddis-1986 hair cell with the reference's exact parameter set
    (haircell.py:33-49) and forward-Euler integration."""

    def __init__(self, sample_rate: int = 8000):
        self.fs = sample_rate
        self.dt = 1.0 / sample_rate
        self.A = 5.0
        self.B = 300.0
        self.g = 2000.0
        self.y = 5.05
        self.l = 2500.0
        self.r = 6580.0
        self.x = 66.31
        self.h = 50000.0
        self.M = 1.0
        # steady state at zero input (haircell.py:51-63)
        k_ss = self.g * self.A / (self.A + self.B)
        self.q0 = (self.M * self.y * k_ss
                   / (self.l * k_ss + self.y * (self.l + self.r)))
        self.c0 = self.q0 * k_ss / self.y
        self.w0 = self.c0 * self.r / self.x

    def process(self, signal: jnp.ndarray,
                backend: str = "scan") -> jnp.ndarray:
        """Firing-rate probability for (..., N) input (any leading dims —
        e.g. (B, C, N) filterbank output). Time is scanned; everything else
        is vectorised.

        ``backend="pallas"`` routes to the fused on-chip kernel
        (ops/meddis_pallas.py — identical math, state kept in VMEM across
        time chunks; note its one-time TPU compile is slow).
        """
        if backend == "pallas":
            from sincformer_tpu.ops.meddis_pallas import meddis_pallas
            return meddis_pallas(signal, self.fs)
        x = jnp.asarray(signal, jnp.float32)
        lead = x.shape[:-1]
        dt = self.dt

        def step(state, s_t):
            q, c, w = state
            s = jnp.maximum(s_t + self.A, 0.0)
            # reference haircell.py:86-87 uses k = s/(s+B); the g factor only
            # enters the steady-state init — reproduced exactly.
            k = s / (s + self.B)
            dq = dt * (self.y * (self.M - q) + self.x * w - k * q)
            q = jnp.maximum(q + dq, 0.0)
            dc = dt * (k * q - self.l * c - self.r * c)
            c = jnp.maximum(c + dc, 0.0)
            dw = dt * (self.r * c - self.x * w)
            w = jnp.maximum(w + dw, 0.0)
            return (q, c, w), self.h * c

        init = tuple(jnp.full(lead, v, jnp.float32)
                     for v in (self.q0, self.c0, self.w0))
        xs = jnp.moveaxis(x, -1, 0)                 # (N, ...)
        _, out = jax.lax.scan(step, init, xs)
        return jnp.moveaxis(out, 0, -1)

    def process_filterbank(self, filterbank_output: jnp.ndarray) -> jnp.ndarray:
        """(..., C, N) → (..., C, N) firing rates (haircell.py:107-124)."""
        return self.process(filterbank_output)

    def process_to_frames(self, filterbank_output: jnp.ndarray,
                          frame_size: int = 160,
                          hop_size: int = 80) -> jnp.ndarray:
        """(..., C, N) → (..., C, T) mean firing rate per frame
        (haircell.py:126-155)."""
        rates = self.process(filterbank_output)
        frames = frame_signal(rates, frame_size, hop_size)
        return jnp.mean(frames, axis=-1)
