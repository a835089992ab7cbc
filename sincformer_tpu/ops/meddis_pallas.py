"""Pallas TPU kernel for the Meddis hair-cell recurrence.

The Meddis ODE (dsp/haircell.py) is inherently sequential in time: a
``lax.scan`` issues one tiny elementwise step per audio sample (8k-32k
steps), each with XLA loop overhead. This kernel keeps the whole recurrence
on-chip: the time axis is the (sequential) TPU grid in VMEM-sized chunks,
the (q, c, w) state lives in VMEM scratch that persists across grid steps,
and each time step is one full-lane VPU op over all batch×channel columns.

Layout: input (N, M) time-major with M = batch·channels padded to a lane
multiple (128), so every scan step is a dense (1, M) row op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Meddis (1986) constants — must match dsp/haircell.py
_A, _B, _G = 5.0, 300.0, 2000.0
_Y, _L, _R = 5.05, 2500.0, 6580.0
_X, _H, _M = 66.31, 50000.0, 1.0


def _steady_state():
    k_ss = _G * _A / (_A + _B)
    q0 = _M * _Y * k_ss / (_L * k_ss + _Y * (_L + _R))
    c0 = q0 * k_ss / _Y
    w0 = c0 * _R / _X
    return q0, c0, w0


def _kernel(x_ref, out_ref, state, *, chunk: int, dt: float):
    i = pl.program_id(0)
    q0, c0, w0 = _steady_state()

    @pl.when(i == 0)
    def _init():
        state[0, :] = jnp.full_like(state[0, :], q0)
        state[1, :] = jnp.full_like(state[1, :], c0)
        state[2, :] = jnp.full_like(state[2, :], w0)

    def body(t, _):
        q = state[0, :]
        c = state[1, :]
        w = state[2, :]
        s = jnp.maximum(x_ref[t, :] + _A, 0.0)
        k = s / (s + _B)
        q = jnp.maximum(q + dt * (_Y * (_M - q) + _X * w - k * q), 0.0)
        c = jnp.maximum(c + dt * (k * q - _L * c - _R * c), 0.0)
        w = jnp.maximum(w + dt * (_R * c - _X * w), 0.0)
        state[0, :] = q
        state[1, :] = c
        state[2, :] = w
        out_ref[t, :] = _H * c
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)


def _pad_to(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("sample_rate", "interpret"))
def meddis_pallas(signal: jnp.ndarray, sample_rate: int = 8000,
                  interpret: bool = False) -> jnp.ndarray:
    """Meddis firing rate for (..., N) input — Pallas TPU kernel.

    Bit-matches dsp/haircell.MeddisHairCell.process (same Euler updates in
    f32). ``interpret=True`` runs the kernel in interpreter mode (CPU tests).
    """
    x = jnp.asarray(signal, jnp.float32)
    lead = x.shape[:-1]
    n = x.shape[-1]
    m = int(np.prod(lead)) if lead else 1

    chunk = 512
    n_pad = _pad_to(max(n, 1), chunk)
    m_pad = _pad_to(max(m, 1), 128)

    xt = x.reshape(m, n).T                               # (N, M)
    xt = jnp.pad(xt, ((0, n_pad - n), (0, m_pad - m)))

    out = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, dt=1.0 / sample_rate),
        grid=(n_pad // chunk,),
        in_specs=[pl.BlockSpec((chunk, m_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, m_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3, m_pad), jnp.float32)],
        interpret=interpret,
    )(xt)
    return out[:n, :m].T.reshape(lead + (n,))
