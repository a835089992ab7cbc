"""Fully-batched on-device metric sweep.

One jitted call evaluates all five metrics for a whole batch of
(clean, enhanced) pairs — the device-side replacement for the reference's
serial per-utterance metric loop (main.py:338-356). Used by the grid
evaluator's fast path and by the benchmark harness.

Metric semantics match the host entry points exactly for equal-length
inputs (the host versions are these same jnp kernels, unbatched).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sincformer_tpu.evaluation.csii import csii_jax
from sincformer_tpu.evaluation.ncm import ncm_jax
from sincformer_tpu.evaluation.pesq import pesq_proxy_jax
from sincformer_tpu.evaluation.ssnr import ssnr_jax
from sincformer_tpu.evaluation.stoi import stoi_jax

_METRIC_JAX = {
    "stoi": stoi_jax,
    "pesq": pesq_proxy_jax,
    "ssnr": lambda c, e: ssnr_jax(c, e),
    "csii": csii_jax,
    "ncm": ncm_jax,
}


@functools.lru_cache(maxsize=16)
def _batched_metrics_fn(metrics: tuple, fs: int):
    fns = {k: _METRIC_JAX[k] for k in metrics}

    @jax.jit
    def compute(clean, enhanced):
        out = {}
        for k, fn in fns.items():
            if k == "ssnr":
                out[k] = jax.vmap(lambda c, e, _f=fn: _f(c, e))(clean,
                                                               enhanced)
            else:  # metrics that take the sample rate
                out[k] = jax.vmap(lambda c, e, _f=fn: _f(c, e, fs))(clean,
                                                                    enhanced)
        return out

    return compute


def metrics_batch(clean: np.ndarray, enhanced: np.ndarray,
                  metrics: Sequence[str] = ("stoi", "pesq", "ssnr",
                                            "csii", "ncm"),
                  fs: int = 8000,
                  pesq_impl: str | None = None) -> Dict[str, np.ndarray]:
    """All metrics for (B, N) pairs in one device call.

    PESQ uses the SAME source as the serial grid path (compute_pesq's
    impl chain — C lib / native P.862), fanned over host threads, so
    batched and serial evaluations of the same models agree. Only
    ``pesq_impl="proxy"`` keeps PESQ inside the device sweep.

    Returns {metric: (B,) float array}.
    """
    import importlib.util

    from sincformer_tpu import config as cfg
    pesq_impl = pesq_impl or getattr(cfg.DEFAULT.eval, "pesq_impl", "auto")
    host_pesq = "pesq" in metrics and pesq_impl != "proxy"
    # pystoi, when installed, is what the host entry point dispatches to —
    # keep batched and serial grids in agreement there too
    host_stoi = ("stoi" in metrics
                 and importlib.util.find_spec("pystoi") is not None)
    device_metrics = tuple(
        m for m in metrics
        if not (m == "pesq" and host_pesq) and not (m == "stoi"
                                                    and host_stoi))
    out: Dict[str, np.ndarray] = {}
    futs = {}
    pool = None
    if host_pesq or host_stoi:
        # enqueue host metrics while the device sweep runs
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(max_workers=8)
        cs, es = np.asarray(clean), np.asarray(enhanced)
        if host_pesq:
            from sincformer_tpu.evaluation.pesq import compute_pesq
            futs["pesq"] = [pool.submit(compute_pesq, c, e, fs, None,
                                        pesq_impl)
                            for c, e in zip(cs, es)]
        if host_stoi:
            from sincformer_tpu.evaluation.stoi import compute_stoi
            futs["stoi"] = [pool.submit(compute_stoi, c, e, fs)
                            for c, e in zip(cs, es)]
    if device_metrics:
        fn = _batched_metrics_fn(device_metrics, fs)
        dev = fn(jnp.asarray(clean, jnp.float32),
                 jnp.asarray(enhanced, jnp.float32))
        out.update({k: np.asarray(v) for k, v in dev.items()})
    for k, fl in futs.items():
        out[k] = np.asarray([f.result() for f in fl])
    if pool is not None:
        pool.shutdown()
    return out
