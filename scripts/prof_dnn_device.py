"""Measure the device-resident DNN enhance_batch RTF on the real TPU
(VERDICT r2 #3 gate: dnn_rtf >= 1000)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")

import jax
import numpy as np

from sincformer_tpu.train.dnn_trainer import DNNPipeline

N = 32000
B = int(os.environ.get("B", "16"))
pipe = DNNPipeline(mask_type="pcirm", use_rbm_pretrain=False,
                   model_dir="/tmp/bench_dnn")
pipe.state = pipe._init_model_state(1e-3, jax.random.PRNGKey(0))
wav = np.random.default_rng(0).standard_normal((B, N)).astype(np.float32)
print("backend:", jax.devices()[0].platform, "device:",
      pipe._accel_device())
t0 = time.perf_counter()
out = pipe.enhance_batch(wav)
print(f"compile+first run: {time.perf_counter()-t0:.1f}s")
iters = 5
t0 = time.perf_counter()
for _ in range(iters):
    out = pipe.enhance_batch(wav)
dt = (time.perf_counter() - t0) / iters
assert np.all(np.isfinite(out))
print(f"per call: {dt*1e3:.1f} ms  RTF: {B*4.0/dt:.0f}x")
