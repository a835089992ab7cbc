"""Observability: metric logging, step timing, flash-attention dispatch."""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from sincformer_tpu.utils.observability import MetricsLogger, StepTimer


class TestMetricsLogger:
    def test_jsonl_roundtrip(self, tmp_path):
        path = str(tmp_path / "metrics.jsonl")
        log = MetricsLogger(path)
        log.log({"epoch": 0, "loss": np.float32(1.5)})
        log.log({"epoch": 1, "loss": 1.2, "note": "ok"})
        records = log.read_all()
        assert len(records) == 2
        assert records[0]["seq"] == 0 and records[1]["seq"] == 1
        assert abs(records[0]["loss"] - 1.5) < 1e-6
        assert records[1]["note"] == "ok"
        # plain-JSON serialisable (no numpy leaks)
        json.dumps(records)

    def test_trainer_integration(self, tmp_path):
        from sincformer_tpu.data import synthetic_noise, synthetic_speech
        from sincformer_tpu.data.loader import WaveformDataset
        from sincformer_tpu.models.dcse import SpeechEnhancer
        from sincformer_tpu.train.dcse_trainer import DCSEPipeline

        log = MetricsLogger(str(tmp_path / "train.jsonl"))
        model = SpeechEnhancer(n_freq=129, d_model=32, num_blocks=1,
                               num_heads=2, d_ff=64, kernel_size=7,
                               dropout=0.0)
        ds = WaveformDataset.from_arrays(
            [synthetic_speech(0.5)] * 4,
            {"white": synthetic_noise(8000, seed=0)}, max_len=4000)
        pipe = DCSEPipeline(model=model, model_dir=str(tmp_path),
                            logger=log)
        pipe.train(ds, ds, epochs=2, batch_size=2, verbose=False)
        records = log.read_all()
        assert len(records) == 2
        assert records[0]["pipeline"] == "dcse"
        assert "val_sisnr" in records[0]
        assert records[0]["epoch_seconds"] > 0


class TestStepTimer:
    def test_ema(self):
        t = StepTimer(momentum=0.5)
        with t.measure():
            time.sleep(0.01)
        first = t.ema
        with t.measure():
            time.sleep(0.03)
        assert t.count == 2
        assert t.ema > first
        assert t.last >= 0.02


class TestAttentionDispatch:
    def test_xla_and_fallback(self, rng):
        from sincformer_tpu.ops.attention import dot_product_attention
        q = jnp.asarray(rng.standard_normal((2, 16, 2, 8)), jnp.float32)
        a = dot_product_attention(q, q, q, impl="xla")
        # flash on CPU backend silently falls back to xla
        b = dot_product_attention(q, q, q, impl="flash")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_mask_equivalence_with_trim(self, rng):
        from sincformer_tpu.ops.attention import dot_product_attention
        q = jnp.asarray(rng.standard_normal((1, 16, 2, 8)), jnp.float32)
        mask = jnp.asarray(np.arange(16) < 10)[None, :]
        masked = dot_product_attention(q, q, q, mask=mask, impl="xla")
        trimmed = dot_product_attention(q[:, :10], q[:, :10], q[:, :10],
                                        impl="xla")
        np.testing.assert_allclose(np.asarray(masked[:, :10]),
                                   np.asarray(trimmed), atol=1e-5)
