"""Regression tests for the round-2 correctness fixes (VERDICT Weak #5/#7/#9,
ADVICE findings): episodic usage counters, grid failure logging, immutable
LR-plateau updates, 8-bit WAV decode, batch-norm DCSE training, safe torch
checkpoint loading, bucketed-loader remainder handling.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.io import wavfile

from sincformer_tpu.data import native
from sincformer_tpu.data.loader import WaveformDataset, batch_iterator


class TestEpisodicUsageCounters:
    def test_episodic_hits_are_counted(self):
        """Retrievals landing on episodic slots must appear in usage stats
        (round-1 bug: one_hot was sized to num_slots only)."""
        from sincformer_tpu.agents.memory import EpisodicMemory
        mem = EpisodicMemory(key_dim=16, value_dim=8, num_slots=4,
                             episodic_slots=4)
        emb = jnp.asarray(
            np.random.default_rng(0).standard_normal((6, 16)), jnp.float32)
        wv = jnp.ones((6, 8))
        variables = mem.init(jax.random.PRNGKey(0), emb)
        # write an episodic entry so its key strongly matches the query
        out, mut = mem.apply(variables, emb, train=True, write_value=wv,
                             mutable=["memory_bank", "memory_stats"])
        variables = {**variables, **mut}
        out, mut = mem.apply(variables, emb, train=True,
                             mutable=["memory_stats"])
        stats = mut["memory_stats"]
        assert stats["usage_count"].shape == (8,)  # 4 learnable + 4 episodic
        # every query must be counted exactly once, wherever it lands
        assert float(jnp.sum(stats["usage_count"])) == pytest.approx(
            float(stats["num_queries"]))
        # the EMA-written episodic slot dominates similarity for this batch:
        # at least one episodic slot must have non-zero usage
        assert float(jnp.sum(stats["usage_count"][4:])) > 0


class TestSetInjectedLr:
    def test_lr_actually_drives_updates(self):
        from sincformer_tpu.train.state import (TrainState, make_adam_plateau,
                                                set_injected_lr)
        params = {"w": jnp.ones((4,))}
        state = TrainState.create(apply_fn=None, params=params,
                                  tx=make_adam_plateau(1e-2),
                                  nan_count=jnp.zeros((), jnp.int32))
        grads = {"w": jnp.ones((4,))}
        s1 = state.apply_gradients(grads=grads)
        assert float(jnp.max(jnp.abs(s1.params["w"] - params["w"]))) > 0

        # zero LR → update must be a no-op
        state0 = state.replace(
            opt_state=set_injected_lr(state.opt_state, 0.0))
        s2 = state0.apply_gradients(grads=grads)
        np.testing.assert_allclose(np.asarray(s2.params["w"]),
                                   np.asarray(params["w"]), atol=0)

    def test_structure_preserved(self):
        from sincformer_tpu.train.state import (make_adam_plateau,
                                                set_injected_lr)
        tx = make_adam_plateau(1e-3)
        opt_state = tx.init({"w": jnp.ones((2,))})
        new = set_injected_lr(opt_state, 5e-4)
        assert (jax.tree_util.tree_structure(new)
                == jax.tree_util.tree_structure(opt_state))


class TestWav8Bit:
    def test_8bit_pcm_decodes(self, tmp_path):
        if not native.available():
            pytest.skip("native toolchain unavailable")
        t = np.arange(4000) / 8000.0
        x = 0.5 * np.sin(2 * np.pi * 440 * t)
        path = str(tmp_path / "u8.wav")
        wavfile.write(path, 8000,
                      np.clip(x * 128 + 128, 0, 255).astype(np.uint8))
        out = native.wav_read_mono(path)
        assert out is not None
        samples, sr = out
        assert sr == 8000
        assert np.max(np.abs(samples)) > 0.4   # round-1 bug: all-zero
        # correlation with the source sine should be near-perfect
        c = np.corrcoef(samples, x)[0, 1]
        assert c > 0.99


class TestDCSEBatchNormTraining:
    def test_train_step_with_batch_stats(self, tmp_path):
        """conv_norm='batch' training crashed in round 1
        (ModifyScopeVariableError: batch_stats immutable)."""
        from sincformer_tpu.models.dcse import default_speech_enhancer
        from sincformer_tpu.train.dcse_trainer import DCSEPipeline
        model = default_speech_enhancer(
            num_blocks=1, d_model=32, d_ff=64, num_heads=2, kernel_size=7,
            conv_norm="batch")
        pipe = DCSEPipeline(model=model, model_dir=str(tmp_path))
        pipe.init_state(epochs=1, steps_per_epoch=1, example_len=2000)
        assert pipe.state.model_state is not None
        assert "batch_stats" in pipe.state.model_state
        step = pipe._make_train_step()
        rng = np.random.default_rng(0)
        noisy = jnp.asarray(rng.standard_normal((2, 2000)), jnp.float32)
        clean = jnp.asarray(rng.standard_normal((2, 2000)), jnp.float32)
        before = jax.tree.map(np.asarray, pipe.state.model_state)
        state, loss, sisnr = step(pipe.state, noisy, clean,
                                  jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))
        # running stats must actually update
        changed = any(
            not np.allclose(a, b) for a, b in zip(
                jax.tree.leaves(before),
                jax.tree.leaves(jax.tree.map(np.asarray,
                                             state.model_state))))
        assert changed
        # and inference uses them without error
        pipe.state = state
        out = pipe.enhance_signal(rng.standard_normal(2000)
                                  .astype(np.float32), pad_quantum=2000)
        assert out.shape == (2000,) and np.all(np.isfinite(out))


class TestSafeTorchLoad:
    def test_legit_checkpoint_loads_safely(self, tmp_path):
        torch = pytest.importorskip("torch")
        from sincformer_tpu.compat.torch_import import _torch_load_safe
        path = str(tmp_path / "ok.pt")
        torch.save({"model_state": {"w": torch.ones(3)},
                    "feat_mean": np.zeros(4), "mask_type": "pcirm"}, path)
        ckpt = _torch_load_safe(path, allow_pickle=False)
        assert ckpt["mask_type"] == "pcirm"
        np.testing.assert_allclose(np.asarray(ckpt["feat_mean"]),
                                   np.zeros(4))

    def test_arbitrary_pickle_rejected_without_optin(self, tmp_path):
        torch = pytest.importorskip("torch")
        import pickle

        class Evil:
            def __reduce__(self):
                return (os.path.join, ("pwned", "x"))

        from sincformer_tpu.compat.torch_import import _torch_load_safe
        path = str(tmp_path / "evil.pt")
        torch.save({"payload": Evil()}, path)
        with pytest.raises(ValueError, match="allow_pickle"):
            _torch_load_safe(path, allow_pickle=False)
        # explicit opt-in still works (trusted checkpoint escape hatch)
        out = _torch_load_safe(path, allow_pickle=True)
        assert out["payload"] == os.path.join("pwned", "x")


class TestBucketedRemainder:
    def _ds(self, lengths):
        rng = np.random.default_rng(0)
        pairs = [(rng.standard_normal(n).astype(np.float32),
                  rng.standard_normal(n).astype(np.float32))
                 for n in lengths]
        return WaveformDataset(pairs=pairs, max_len=max(lengths))

    def test_remainders_pool_to_largest_bucket_shape(self):
        # 5 utts in the 4000-bucket, 3 in the 8000-bucket, batch 4:
        # full batches: one @4000; remainders 1+3 pool into one @8000 batch
        ds = self._ds([3000] * 5 + [7000] * 3)
        batches = list(batch_iterator(ds, 4, shuffle=False, drop_last=True,
                                      bucketed=True))
        shapes = sorted(b["noisy"].shape for b in batches)
        assert shapes == [(4, 3000 + 1000), (4, 8000)]
        total = sum(b["noisy"].shape[0] for b in batches)
        assert total == 8   # nothing dropped: 1+3 remainder folded together

    def test_small_dataset_never_empty(self):
        ds = self._ds([3000, 3000])
        batches = list(batch_iterator(ds, 8, shuffle=False, drop_last=True,
                                      bucketed=True))
        assert len(batches) == 1 and batches[0]["noisy"].shape[0] == 2


class TestAttnImplPlumbing:
    def test_attn_impl_reaches_kernel_dispatch(self, monkeypatch):
        """Round-1 gap: ConformerBlock never forwarded attn_impl, so no
        model config could reach the flash kernel. Verify the flag now
        flows from SpeechEnhancer down to ops.attention."""
        import sincformer_tpu.ops.attention as attn_ops
        from sincformer_tpu.models.dcse import default_speech_enhancer

        seen = []
        orig = attn_ops.dot_product_attention

        def spy(q, k, v, mask=None, impl="xla", **kw):
            seen.append(impl)
            return orig(q, k, v, mask=mask, impl="xla")

        monkeypatch.setattr(attn_ops, "dot_product_attention", spy)
        model = default_speech_enhancer(num_blocks=2, d_model=32, d_ff=64,
                                        num_heads=2, kernel_size=7,
                                        attn_impl="flash")
        re = jnp.zeros((1, 16, 129))
        model.init(jax.random.PRNGKey(0), re, re)
        assert seen == ["flash", "flash"]

    def test_config_carries_attn_impl(self):
        import dataclasses
        from sincformer_tpu import config as cfg
        from sincformer_tpu.models.dcse import default_speech_enhancer
        dcfg = dataclasses.replace(cfg.DEFAULT.dcse, attn_impl="flash")
        model = default_speech_enhancer(dcfg)
        assert model.attn_impl == "flash"

    def test_metacog_carries_attn_impl(self):
        from sincformer_tpu.train.agent_trainer import default_metacog
        model = default_metacog(attn_impl="flash")
        assert model.attn_impl == "flash"


class TestGridFailureLogging:
    def test_crashing_pipeline_is_reported(self, capsys):
        from sincformer_tpu.evaluation.grid import evaluate_grid

        class Boom:
            def enhance_signal(self, x):
                raise RuntimeError("kaput")

        rng = np.random.default_rng(0)
        clean = [rng.standard_normal(2000).astype(np.float32)]
        noises = {"white": rng.standard_normal(4000).astype(np.float32)}
        results = evaluate_grid(clean, noises, {"boom": Boom()},
                                snr_levels=[0.0], metrics=("ssnr",),
                                verbose=False, batched=False)
        out = capsys.readouterr().out
        assert "FAILED" in out and "boom" in out and "kaput" in out
        assert "FEWER cells" in out
        # the noisy baseline still evaluated
        assert len(results["white"]["noisy"][0.0]["ssnr"]) == 1
        assert len(results["white"]["boom"][0.0]["ssnr"]) == 0


class TestLatestStepDir:
    """Numeric step selection: lexicographic sort picked step_98 over
    step_336 (hit for real by the 50-epoch SSM run's best_sincformer)."""

    def test_numeric_not_lexicographic(self, tmp_path):
        from sincformer_tpu.train.state import latest_step_dir
        for n in (7, 98, 105, 336):
            (tmp_path / f"step_{n}").mkdir()
        (tmp_path / "step_400.orbax-checkpoint-tmp").mkdir()  # in-flight
        (tmp_path / "step_336.meta.json").write_text("{}")
        got = latest_step_dir(str(tmp_path))
        assert got is not None and got.endswith("step_336")

    def test_missing_dir_is_none(self, tmp_path):
        from sincformer_tpu.train.state import latest_step_dir
        assert latest_step_dir(str(tmp_path / "nope")) is None


class TestCpeaImplAutodetect:
    """load_model must restore cpea_impl='ssm' checkpoints into a matching
    model skeleton (discovered live: the grid eval restored BiLRU params
    into a BiLSTM template and failed)."""

    def _fake_ckpt(self, tmp_path, cpea_keys):
        import orbax.checkpoint as ocp
        path = str(tmp_path / "step_1")
        tree = {"params": {"cpea": {k: {"w": jnp.ones((2,))}
                                    for k in cpea_keys}}}
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        ckptr.wait_until_finished()
        return path

    def test_detects_ssm_and_lstm(self, tmp_path):
        from sincformer_tpu.train.agent_trainer import _checkpoint_cpea_impl
        p1 = self._fake_ckpt(tmp_path / "a", ["bilru", "rho_s_head"])
        assert _checkpoint_cpea_impl(p1) == "ssm"
        p2 = self._fake_ckpt(tmp_path / "b", ["lstm_fwd_0", "rho_s_head"])
        assert _checkpoint_cpea_impl(p2) == "lstm"

    def test_garbage_path_is_none(self, tmp_path):
        from sincformer_tpu.train.agent_trainer import _checkpoint_cpea_impl
        assert _checkpoint_cpea_impl(str(tmp_path / "nothing")) is None
