"""Run from the repo root: `python scripts/prof_perception.py`.

Timing methodology: docs/PERF.md "Measurement methodology" - 
dependency chains with an unfoldable per-batch epsilon
dependency and a single-element fetch; naive timing on the
axon backend reports fantasy numbers.
"""
"""PA stage profile, take 2.

Chain rule: each step feeds `x + 1e-6 * mean(stage(x), all-but-batch)`
back as input — a real data dependency XLA cannot fold away — and the
chain is closed by a SINGLE-element fetch (bench.py pattern).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from sincformer_tpu.agents.perception import PerceptionAgent, _ConvBlock
from sincformer_tpu.agents.sincnet import SincConv1d

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
    """x + tiny per-batch functional of y (unfoldable dependency)."""
    axes = tuple(range(1, y.ndim))
    m = jnp.mean(y.astype(jnp.float32), axis=axes)      # (B,)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    return x + (1e-6 * m).reshape(shape).astype(x.dtype)


def run(dtype):
    name = jnp.dtype(dtype).name
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((BATCH, N)), jnp.float32)

    pa = PerceptionAgent(256, 8000, 251)
    v = jax.jit(lambda w: pa.init(jax.random.PRNGKey(0), w))(wav)
    params = jax.tree.map(lambda x: x.astype(dtype), v["params"])
    wav_d = wav.astype(dtype)

    @jax.jit
    def full(w):
        r, i, s = pa.apply({"params": params}, w)
        return dep(dep(dep(w, r), i), s)

    print(f"[{name}] PA full:        {chain(full, wav_d)*1e3:8.2f} ms",
          flush=True)

    sc = SincConv1d(out_channels=64, kernel_size=251, sample_rate=8000)
    sp = {"params": params["sinc"]}

    @jax.jit
    def s1(w):
        return dep(w, sc.apply(sp, w))

    print(f"[{name}]  sinc conv:     {chain(s1, wav_d)*1e3:8.2f} ms",
          flush=True)

    gn = nn.GroupNorm(num_groups=8)
    gnp = {"params": params["sinc_norm"]}
    x64 = jnp.asarray(rng.standard_normal((BATCH, N, 64)), jnp.float32
                      ).astype(dtype)

    @jax.jit
    def s2(x):
        return dep(x, nn.gelu(gn.apply(gnp, x)))

    print(f"[{name}]  GN+GELU @32k:  {chain(s2, x64)*1e3:8.2f} ms",
          flush=True)

    b0 = _ConvBlock(128, stride=2)
    b0p = {"params": params["block_0"]}

    @jax.jit
    def s3(x):
        return dep(x, b0.apply(b0p, x))

    print(f"[{name}]  block_0 @32k:  {chain(s3, x64)*1e3:8.2f} ms",
          flush=True)

    x128 = jnp.asarray(rng.standard_normal((BATCH, N // 2, 128)),
                       jnp.float32).astype(dtype)
    b1 = _ConvBlock(128, stride=2)
    b2 = _ConvBlock(256, stride=2)
    b1p = {"params": params["block_1"]}
    b2p = {"params": params["block_2"]}

    @jax.jit
    def s4(x):
        return dep(x, b2.apply(b2p, b1.apply(b1p, x)))

    print(f"[{name}]  block_1+2:     {chain(s4, x128)*1e3:8.2f} ms",
          flush=True)


run(jnp.float32)
run(jnp.bfloat16)
