"""Flagship metacog RTF/chip vs batch size (bf16, 4 s windows, one v5e).
Dependency-chain timed (docs/PERF.md). PYTHONPATH=. python scripts/..."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from sincformer_tpu.dsp.stft import istft, stft
from sincformer_tpu.train.agent_trainer import default_metacog

N, SECONDS = 32000, 4.0
ITERS = 8


def chain(fn, x, iters=ITERS):
    def t(k):
        out = x
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(out)
        float(out[0, 0])
        return time.perf_counter() - t0
    t(1)
    t1 = min(t(1) for _ in range(3))
    tk = min(t(iters + 1) for _ in range(3))
    return (tk - t1) / iters


def main():
    model = default_metacog()
    rng = np.random.default_rng(0)
    wav32 = jnp.asarray(rng.standard_normal((128, N)), jnp.float32)
    spec = jax.jit(stft)(wav32)
    v = jax.jit(lambda r, w, a, b: model.init(r, w, a, b, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "routing": jax.random.PRNGKey(2)}, wav32, spec.real, spec.imag)
    vb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), v)

    @jax.jit
    def full(w):
        sp = stft(w.astype(jnp.float32))
        out = model.apply(vb, w, sp.real.astype(jnp.bfloat16),
                          sp.imag.astype(jnp.bfloat16), train=False)
        y = istft(out["enhanced_real"].astype(jnp.float32)
                  + 1j * out["enhanced_imag"].astype(jnp.float32),
                  length=w.shape[-1])
        return y.astype(w.dtype)

    for b in (128, 256, 512):
        wav = jnp.asarray(rng.standard_normal((b, N)), jnp.bfloat16)
        dt = chain(full, wav)
        print(f"B={b:4d}: {dt*1e3:7.2f} ms  RTF {b*SECONDS/dt:10,.0f}x",
              flush=True)


if __name__ == "__main__":
    main()
