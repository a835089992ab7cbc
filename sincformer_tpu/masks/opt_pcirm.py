"""OPT-PCIRM — hard mask with PSO-optimised middle step.

Same math as reference ``masks/opt_pcirm.py``:
  Eq. 9  n = -log2(lc/(lc+1)),        lc = 10^(LC/10), LC = -15 dB
  Eq. 10 s_m = ((m-1)/M)^n            (M=3 → {0, ≈0.004, ≈0.13})
  Eq. 11 bucket PCIRM by step boundaries, assign step values

The quantizer is a vectorised bucketed select (replaces the per-step boolean
loop, opt_pcirm.py:91-96). The PSO path vmaps the whole
quantize→reconstruct→STOI fitness over all particles on device — the
reference evaluates ~3000 serial Python STOI calls (opt_pcirm.py:146-183);
here one jitted batched sweep covers an entire swarm iteration.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from sincformer_tpu import config as cfg


def compute_snr_boundaries(local_criterion_db: float | None = None,
                           num_steps: int | None = None,
                           ocfg: cfg.OptPCIRMConfig = cfg.DEFAULT.opt_pcirm
                           ) -> Tuple[np.ndarray, float]:
    """Step values + exponent (reference opt_pcirm.py:24-51). Host NumPy —
    these are static quantizer constants."""
    lc_db = (local_criterion_db if local_criterion_db is not None
             else ocfg.local_criterion_db)
    m_steps = num_steps or ocfg.num_steps
    lc = 10.0 ** (lc_db / 10.0)
    n_exp = -np.log2(lc / (lc + 1.0))
    steps = np.array([((m - 1) / m_steps) ** n_exp
                      for m in range(1, m_steps + 1)])
    return steps, float(n_exp)


def quantize_pcirm(pcirm, step_values, middle_value=None):
    """Bucket PCIRM into discrete step values (reference opt_pcirm.py:54-98).

    Boundaries are [0, s_2, ..., s_M, 1]; values are the step values with an
    optional traced ``middle_value`` override for s_2 (the PSO variable).
    Fully vectorised: one ``searchsorted``-style bucketing via nested where.

    Args:
        pcirm: (...,) continuous mask in [0, 1] (any batch shape).
        step_values: length-M static step array.
        middle_value: scalar (may be a traced jnp value) overriding step 2.

    Returns:
        Quantized mask, same shape as ``pcirm``.
    """
    steps = np.asarray(step_values, dtype=np.float32)
    m = len(steps)
    bounds = np.concatenate([[0.0], steps[1:], [1.0]]).astype(np.float32)
    values = [jnp.asarray(v, jnp.float32) for v in steps]
    if middle_value is not None and m >= 3:
        values[1] = jnp.asarray(middle_value, jnp.float32)
    # reference semantics: value m where bounds[m] <= p < bounds[m+1];
    # p >= 1 → last value; p < 0 impossible (mask clipped).
    out = jnp.zeros_like(pcirm)
    for i in range(m):
        in_bucket = (pcirm >= bounds[i]) & (pcirm < bounds[i + 1])
        out = jnp.where(in_bucket, values[i], out)
    out = jnp.where(pcirm >= bounds[-1], values[-1], out)
    return out


def reconstruct_scalar_gain(mask: jnp.ndarray, noisy_signal: jnp.ndarray,
                            frame_size: int = 160, hop: int = 80):
    """Channel-averaged per-frame scalar gain overlap-add, the reconstruction
    used by the PSO fitness and the demo (reference opt_pcirm.py:160-180,
    main.py:116-131): for every frame, scale the noisy samples by the mean
    mask over channels, then divide by the overlap count.

    Args:
        mask: (C, T) quantized or soft mask.
        noisy_signal: (N,) waveform.

    Returns:
        (N,) enhanced waveform.
    """
    n = noisy_signal.shape[-1]
    t = mask.shape[-1]
    gains = jnp.mean(mask, axis=-2)                        # (T,)
    # accumulate gain and count per sample with a static index map
    starts = np.arange(t) * hop
    idx = (starts[:, None] + np.arange(frame_size)[None, :])
    valid = idx < n
    idx_c = np.minimum(idx, n - 1)
    flat_idx = idx_c.reshape(-1)
    contrib = (gains[:, None] * valid).reshape(-1)
    counts = valid.astype(np.float32).reshape(-1)
    gain_sum = jnp.zeros(n).at[flat_idx].add(
        contrib * noisy_signal[flat_idx])
    weight = jnp.zeros(n).at[flat_idx].add(counts)
    weight = jnp.maximum(weight, 1.0)
    return gain_sum / weight


def compute_opt_pcirm(pcirm, noisy_signal=None, clean_signal=None,
                      fs: int | None = None, num_steps: int | None = None,
                      use_pso: bool = True, pso_config: dict | None = None,
                      rng=None, fitness: str = "simplified"):
    """Full OPT-PCIRM (reference opt_pcirm.py:101-202).

    With ``use_pso=False`` returns the fixed-step quantization. With PSO the
    middle step is optimised to maximise STOI of the scalar-gain
    reconstruction — the swarm's fitness evaluations run as one vmapped
    batch per iteration (see optim/pso.py).

    ``fitness``: "simplified" reproduces the reference-as-run (its pystoi-
    less fallback correlation STOI); "full" uses the jittable Taal-2011
    STOI (evaluation/stoi.py::stoi_full_jax) — the closer intelligibility
    objective the reference would have used with pystoi installed.

    Returns:
        (opt_mask, step_values, optimized_middle)
    """
    acfg = cfg.DEFAULT.audio
    fs = fs or acfg.sample_rate
    steps, _ = compute_snr_boundaries(num_steps=num_steps)

    if not use_pso:
        return (quantize_pcirm(pcirm, steps), steps,
                steps[1] if len(steps) > 1 else None)

    import jax

    from sincformer_tpu.evaluation.stoi import stoi_full_jax, stoi_jax
    from sincformer_tpu.optim.pso import ParticleSwarmOptimizer

    stoi_fn = stoi_full_jax if fitness == "full" else stoi_jax
    pcirm = jnp.asarray(pcirm)
    noisy = jnp.asarray(noisy_signal, jnp.float32)
    clean = jnp.asarray(clean_signal, jnp.float32)

    def fitness_one(x_middle):
        cand = quantize_pcirm(pcirm, steps, middle_value=x_middle)
        enhanced = reconstruct_scalar_gain(cand, noisy,
                                           acfg.frame_size, acfg.hop_size)
        return stoi_fn(clean, enhanced, fs)

    batched_fitness = jax.jit(jax.vmap(fitness_one))

    pcfg = cfg.DEFAULT.pso
    params = dict(num_particles=pcfg.num_particles, max_iter=pcfg.max_iter,
                  w=pcfg.w, c1=pcfg.c1, c2=pcfg.c2, bounds=pcfg.bounds)
    if pso_config:
        params.update(pso_config)

    pso = ParticleSwarmOptimizer(batched_fitness=batched_fitness,
                                 maximize=True, **params)
    best_x, _best_fit = pso.optimize(rng=rng)
    opt_mask = quantize_pcirm(pcirm, steps, middle_value=best_x)
    return opt_mask, steps, float(best_x)


def apply_opt_pcirm(noisy_tf, opt_pcirm):
    """Enhanced = OPT-PCIRM ⊙ Noisy (reference opt_pcirm.py:205-217)."""
    return noisy_tf * opt_pcirm
