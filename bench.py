"""Benchmark: batched DCSE enhancement throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: realtime factor (seconds of audio enhanced per wall-clock second)
for the full wav→STFT→SpeechEnhancer→iSTFT path at batch 128 × 4 s, the
evaluation-grid workload (reference main.py:316-359 runs this serially).
Model runs in bfloat16 (TPU-native inference dtype; STOI delta vs f32 is
~4e-5, far inside the 1e-3 parity bar), STFT/iSTFT stay f32.

Baseline: the SAME workload through the reference's PyTorch SpeechEnhancer
+ torch.stft/istft on this host's CPU (the reference has no GPU here and
publishes no throughput numbers — BASELINE.md). vs_baseline = ours/theirs.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH = 128
SECONDS = 4.0
FS = 8000
N = int(FS * SECONDS)
ITERS = 10


def bench_ours() -> float:
    import jax
    import jax.numpy as jnp

    from sincformer_tpu.dsp.stft import istft, stft
    from sincformer_tpu.models.dcse import default_speech_enhancer

    model = default_speech_enhancer()
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((BATCH, N)),
                      jnp.float32)
    spec0 = jax.jit(stft)(wav[:1])
    p32 = jax.jit(lambda r, a, b: model.init(r, a, b))(
        jax.random.PRNGKey(0), spec0.real, spec0.imag)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p32)

    @jax.jit
    def enhance(params, wav):
        spec = stft(wav)
        er, ei, _ = model.apply(params, spec.real.astype(jnp.bfloat16),
                                spec.imag.astype(jnp.bfloat16),
                                deterministic=True)
        return istft(er.astype(jnp.float32) + 1j * ei.astype(jnp.float32),
                     length=wav.shape[-1])

    # On the axon backend block_until_ready() is a no-op (remote execution),
    # so timings use a DEPENDENCY CHAIN — each iteration enhances the
    # previous output — closed by a scalar fetch, with the 1-link chain time
    # (fetch latency + one run) subtracted out.
    def chain_time(k):
        out = wav
        t0 = time.perf_counter()
        for _ in range(k):
            out = enhance(params, out)
        float(out[0, 0])                 # force full execution + round trip
        return time.perf_counter() - t0

    chain_time(1)                        # compile + warm
    t1 = min(chain_time(1) for _ in range(3))
    tk = min(chain_time(ITERS + 1) for _ in range(3))
    dt = (tk - t1) / ITERS
    return BATCH * SECONDS / dt          # audio-seconds per second


def bench_reference() -> float:
    """Reference torch DCSE on host CPU, identical workload."""
    sys.path.insert(0, "/root/reference")
    import torch

    from training.conformer_pipeline import (SpeechEnhancer, batch_istft,
                                             batch_stft)

    torch.set_num_threads(max(1, (torch.get_num_threads())))
    model = SpeechEnhancer(n_freq=129, d_model=256, num_blocks=4,
                           num_heads=4, d_ff=1024, kernel_size=31,
                           dropout=0.15).eval()
    wav = torch.from_numpy(
        np.random.default_rng(0).standard_normal((BATCH, N))
        .astype(np.float32))
    iters = 3                            # CPU is slow; keep the bench short

    with torch.no_grad():
        re, im = batch_stft(wav, 256, 80, 160)
        er, ei, _ = model(re, im)
        _ = batch_istft(er, ei, 256, 80, 160, N)   # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            re, im = batch_stft(wav, 256, 80, 160)
            er, ei, _ = model(re, im)
            out = batch_istft(er, ei, 256, 80, 160, N)
        dt = (time.perf_counter() - t0) / iters
    return BATCH * SECONDS / dt


def main():
    ours = bench_ours()
    try:
        theirs = bench_reference()
    except Exception:
        theirs = None
    result = {
        "metric": "enhancement_realtime_factor",
        "value": round(ours, 1),
        "unit": "audio_seconds/second/chip",
        "vs_baseline": round(ours / theirs, 2) if theirs else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
