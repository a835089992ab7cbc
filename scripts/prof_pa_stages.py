"""PA-MXU v2 internal stage profile (bf16, B=128 x 4 s, one v5e).

Dependency-chain timing (docs/PERF.md methodology). Stages are cumulative
prefixes of the PA forward so the deltas attribute time to each stage.
Run from repo root: PYTHONPATH=. python scripts/prof_pa_stages.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from sincformer_tpu.agents.perception import PerceptionAgentMXU, _ConvBlock
from sincformer_tpu.agents.sincnet import SincConv1d

BATCH, N = 128, 32000
ITERS = 10
DT = jnp.bfloat16


def chain(fn, x, iters=ITERS):
    def t(k):
        out = x
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(out)
        float(jnp.asarray(out, jnp.float32).ravel()[0])
        return time.perf_counter() - t0
    t(1)
    t1 = min(t(1) for _ in range(3))
    tk = min(t(iters + 1) for _ in range(3))
    return (tk - t1) / iters


class Stage(nn.Module):
    """Cumulative prefix of PerceptionAgentMXU's forward."""
    upto: str

    @nn.compact
    def __call__(self, w):
        d, hop, c_sinc = 256, 80, 64
        x = SincConv1d(out_channels=c_sinc, kernel_size=251,
                       sample_rate=8000, channels_last=True, name="sinc")(w)
        if self.upto == "sinc":
            return x
        b, n, c = x.shape
        t = n // hop
        env = jnp.abs(x)[:, :t * hop]
        env = env.reshape(b, (t * hop) // 8, 8, c).mean(axis=2)
        env = jnp.log1p(env)
        echunks = env.reshape(b, t, 10 * c)
        if self.upto == "env":
            return echunks
        scale = self.param("act_scale", nn.initializers.ones, (c_sinc,))
        x = nn.gelu(x * scale)
        chunks = x[:, :t * hop].reshape(b, t, hop * c)
        if self.upto == "act":
            return chunks[:, :, :1] + echunks[:, :, :1]
        h = (nn.Conv(d, (4,), padding="SAME", name="embed")(chunks)
             + nn.Conv(d, (2,), padding="SAME", name="embed_env")(echunks))
        h = nn.LayerNorm(name="embed_ln")(h)
        h = nn.gelu(h)
        if self.upto == "embed":
            return h
        for i in range(3):
            h = _ConvBlock(d, stride=1, name=f"block_{i}")(h)
        if self.upto == "blocks":
            return h
        z_real = nn.GroupNorm(num_groups=16, name="gn_real")(
            nn.Dense(d, name="real_proj")(h))
        u = nn.Conv(d // 4, (3,), padding="SAME", name="unc1")(h)
        return z_real + jnp.pad(nn.gelu(u), ((0, 0), (0, 0), (0, d - d // 4)))


def run(upto, wav):
    m = Stage(upto)
    v = jax.jit(lambda w: m.init(jax.random.PRNGKey(0), w))(wav)
    params = jax.tree.map(lambda a: a.astype(DT), v["params"])

    @jax.jit
    def fn(w):
        out = m.apply({"params": params}, w)
        ax = tuple(range(1, out.ndim))
        mu = jnp.mean(out.astype(jnp.float32), axis=ax)
        return w + (1e-6 * mu).reshape((w.shape[0], 1)).astype(w.dtype)

    dt = chain(fn, wav) * 1e3
    print(f"  upto {upto:7s}: {dt:7.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((BATCH, N)), DT)
    prev = 0.0
    for upto in ("sinc", "env", "act", "embed", "blocks", "heads"):
        dt = run(upto, wav)
        print(f"    delta vs prev: {dt - prev:+7.2f} ms")
        prev = dt


if __name__ == "__main__":
    main()
