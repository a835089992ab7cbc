"""PA reformulation A/B: PerceptionAgentMXU vs PerceptionAgent, plus the
flagship metacog e2e with each. Dependency-chain timed (docs/PERF.md)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

from sincformer_tpu.agents.perception import (PerceptionAgent,
                                              PerceptionAgentMXU)

BATCH, N = 128, 32000
ITERS = 10


def chain(fn, x, iters=ITERS):
    def t(k):
        out = x
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(out)
        float(out[(0,) * out.ndim])
        return time.perf_counter() - t0
    t(1)
    t1 = min(t(1) for _ in range(3))
    tk = min(t(iters + 1) for _ in range(3))
    return (tk - t1) / iters


def dep(x, y):
    axes = tuple(range(1, y.ndim))
    m = jnp.mean(y.astype(jnp.float32), axis=axes)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    return x + (1e-6 * m).reshape(shape).astype(x.dtype)


def run_pa(cls, dtype):
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((BATCH, N)), jnp.float32)
    pa = cls(256, 8000, 251)
    v = jax.jit(lambda w: pa.init(jax.random.PRNGKey(0), w))(wav)
    params = jax.tree.map(lambda x: x.astype(dtype), v["params"])
    wav_d = wav.astype(dtype)

    @jax.jit
    def full(w):
        r, i, s = pa.apply({"params": params}, w)
        return dep(dep(dep(w, r), i), s)

    dt = chain(full, wav_d) * 1e3
    print(f"[{jnp.dtype(dtype).name}] {cls.__name__}: {dt:8.2f} ms",
          flush=True)


def run_flagship(pa_impl):
    from sincformer_tpu.dsp.stft import istft, stft
    from sincformer_tpu.train.agent_trainer import default_metacog

    model = default_metacog(pa_impl=pa_impl)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((BATCH, N)), jnp.float32)
    spec0 = jax.jit(stft)(wav[:1])
    init_fn = jax.jit(lambda r, w, a, b: model.init(r, w, a, b, train=False))
    v32 = init_fn({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1),
                   "routing": jax.random.PRNGKey(2)},
                  wav[:1], spec0.real, spec0.imag)
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, v32)

    @jax.jit
    def enhance(wav):
        spec = stft(wav)
        out = model.apply(variables, wav.astype(jnp.bfloat16),
                          spec.real.astype(jnp.bfloat16),
                          spec.imag.astype(jnp.bfloat16), train=False)
        enh = (out["enhanced_real"].astype(jnp.float32)
               + 1j * out["enhanced_imag"].astype(jnp.float32))
        return istft(enh, length=wav.shape[-1])

    dt = chain(enhance, wav) * 1e3
    rtf = BATCH * 4.0 / (dt / 1e3)
    print(f"flagship pa_impl={pa_impl}: {dt:8.2f} ms  -> {rtf:,.0f}x RT",
          flush=True)


if __name__ == "__main__":
    for cls in (PerceptionAgentMXU, PerceptionAgent):
        run_pa(cls, jnp.bfloat16)
    for impl in ("mxu", "reference"):
        run_flagship(impl)
