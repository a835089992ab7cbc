"""Run from the repo root: `python scripts/prof_metacog.py`.

Timing methodology: docs/PERF.md "Measurement methodology" - 
dependency chains with an unfoldable per-batch epsilon
dependency and a single-element fetch; naive timing on the
axon backend reports fantasy numbers.
"""
"""Metacog inference component profile, bf16, batch 128 x 4s, one v5e.
Dependency-chain timing per component (out feeds next input, scalar fetch
closes the chain, 1-link time subtracted) — same methodology as bench.py.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from sincformer_tpu.dsp.stft import istft, stft
from sincformer_tpu.train.agent_trainer import default_metacog
from sincformer_tpu.agents.perception import PerceptionAgent
from sincformer_tpu.agents.cpea import CorrelationPhaseEstimationAgent
from sincformer_tpu.agents.msa import MaskSynthesisAgent

BATCH, SECONDS, FS = 128, 4.0, 8000
N = int(FS * SECONDS)
ITERS = 10


def chain(fn, x, iters=ITERS):
    """min-of-3 dependency-chain time minus the 1-link time."""
    def t(k):
        out = x
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(out)
        jax.tree.leaves(out)[0][(0,) * jax.tree.leaves(out)[0].ndim].item()
        return time.perf_counter() - t0
    t(1)
    t1 = min(t(1) for _ in range(3))
    tk = min(t(iters + 1) for _ in range(3))
    return (tk - t1) / iters


def prof(cpea_impl):
    model = default_metacog(cpea_impl=cpea_impl)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((BATCH, N)), jnp.float32)
    spec = jax.jit(stft)(wav)
    init_fn = jax.jit(lambda r, w, a, b: model.init(r, w, a, b, train=False))
    v32 = init_fn({"params": jax.random.PRNGKey(0),
                   "dropout": jax.random.PRNGKey(1),
                   "routing": jax.random.PRNGKey(2)},
                  wav, spec.real, spec.imag)
    params = v32["params"]

    @jax.jit
    def full(w):
        sp = stft(w)
        out = model.apply(v32, w, sp.real, sp.imag, train=False)
        return istft(out["enhanced_real"] + 1j * out["enhanced_imag"],
                     length=w.shape[-1])

    dt = chain(full, wav)
    print(f"[{cpea_impl}] full e2e: {dt*1e3:8.2f} ms  RTF "
          f"{BATCH*SECONDS/dt:,.0f}x")

    # components (each wrapped so output feeds back as input where shapes
    # allow; otherwise chain on the same-shaped primary tensor)
    from sincformer_tpu.agents.perception import PerceptionAgentMXU
    if model.pa_impl == "mxu":
        pa = PerceptionAgentMXU(model.encoder_channels, model.sample_rate,
                                model.sinc_kernel_size, model.hop,
                                fine_act=model.pa_fine_act)
    else:
        pa = PerceptionAgent(model.encoder_channels, model.sample_rate,
                             model.sinc_kernel_size, model.hop)
    pa_p = {"params": params["pa"]}
    zr, zi, sg = jax.jit(lambda w: pa.apply(pa_p, w))(wav)

    @jax.jit
    def pa_fn(w):
        r, i, s = pa.apply(pa_p, w)
        # keep chain alive: fold latent back into a waveform-shaped tensor
        return w + jnp.mean(r) * 0

    print(f"  PA (SincNet encoder):  {chain(pa_fn, wav)*1e3:8.2f} ms")

    cp = CorrelationPhaseEstimationAgent(
        model.encoder_channels, model.cpea_hidden, model.cpea_layers,
        model.cpea_channels, impl=cpea_impl)
    cp_p = {"params": params["cpea"]}
    t = zr.shape[-1]

    @jax.jit
    def cp_fn(z):
        out = cp.apply(cp_p, z, channels_first=True)
        return z + jnp.mean(out["rho_s"]) * 0

    print(f"  CPEA ({cpea_impl:4s}):        {chain(cp_fn, zr)*1e3:8.2f} ms")

    msa = MaskSynthesisAgent(
        model.encoder_channels, model.cpea_channels, model.d_model,
        model.n_freq, model.msa_blocks, model.num_heads, model.d_ff,
        model.kernel_size, model.dropout, attn_impl=model.attn_impl)
    msa_p = {"params": params["msa"]}
    cpea_out = jax.jit(lambda z: cp.apply(cp_p, z))(zr)
    sr = spec.real[:, :t]
    si = spec.imag[:, :t]

    @jax.jit
    def msa_fn(z):
        mr, mi = msa.apply(msa_p, z, zi[..., :t], cpea_out, sr, si,
                           deterministic=True)
        return z + jnp.mean(mr) * 0

    print(f"  MSA (conformer):       {chain(msa_fn, zr[..., :t])*1e3:8.2f} ms")

    @jax.jit
    def stft_fn(w):
        sp = stft(w)
        return istft(sp, length=w.shape[-1])

    print(f"  STFT+iSTFT:            {chain(stft_fn, wav)*1e3:8.2f} ms")
    return dt


dt_l = prof("lstm")
dt_s = prof("ssm")
print(f"\nssm speedup e2e: {dt_l/dt_s:.2f}x")
