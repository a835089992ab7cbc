"""Regression tests for round-4 review fixes.

Covers: CPEA explicit input-layout contract (the old shape heuristic
silently misread channels-first input whenever T == input_dim), and
bucketed batch emission order (ascending-length emission every epoch
systematically biased SGD).

Ring attention's n-1-hop fix needs no new test: the existing
tests/test_ring_attention.py parity+grad suites pin the semantics; the
fix only removed a discarded final ppermute.
"""

import numpy as np
import pytest

from sincformer_tpu.data.loader import WaveformDataset, batch_iterator


def _cpea(input_dim=8):
    from sincformer_tpu.agents.cpea import CorrelationPhaseEstimationAgent
    return CorrelationPhaseEstimationAgent(
        input_dim=input_dim, hidden_size=4, num_layers=1,
        output_channels=4, impl="lstm")


class TestCpeaLayoutContract:
    def test_square_input_without_flag_raises(self):
        import jax
        import jax.numpy as jnp
        mod = _cpea(8)
        x = jnp.zeros((2, 8, 8))
        with pytest.raises(ValueError, match="square in input_dim"):
            mod.init(jax.random.PRNGKey(0), x)

    def test_no_matching_axis_raises(self):
        import jax
        import jax.numpy as jnp
        mod = _cpea(16)
        x = jnp.zeros((2, 8, 12))
        with pytest.raises(ValueError, match="no axis of size"):
            mod.init(jax.random.PRNGKey(0), x)

    def test_explicit_layouts_agree(self):
        """(B, D, T) with channels_first=True == transposed input with
        channels_first=False, byte-identical outputs under shared params."""
        import jax
        import jax.numpy as jnp
        mod = _cpea(8)
        x_td = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 12, 8)), jnp.float32)           # (B, T, D)
        params = mod.init(jax.random.PRNGKey(1), x_td,
                          channels_first=False)
        out_td = mod.apply(params, x_td, channels_first=False)
        out_dt = mod.apply(params, jnp.swapaxes(x_td, 1, 2),
                           channels_first=True)
        for k in out_td:
            np.testing.assert_array_equal(np.asarray(out_td[k]),
                                          np.asarray(out_dt[k]))

    def test_square_input_with_flag_works(self):
        import jax
        import jax.numpy as jnp
        mod = _cpea(8)
        x = jnp.zeros((2, 8, 8))
        params = mod.init(jax.random.PRNGKey(0), x, channels_first=True)
        out = mod.apply(params, x, channels_first=True)
        assert out["rho_s"].shape[1] == 8             # T frames preserved

    def test_unambiguous_inference_still_works(self):
        import jax
        import jax.numpy as jnp
        mod = _cpea(8)
        x = jnp.zeros((2, 8, 12))                     # only axis 1 == D
        params = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(params, x)
        assert out["rho_s"].shape[1] == 12


class TestBucketedEmissionOrder:
    def _ds(self, lengths, seed=0):
        rng = np.random.default_rng(seed)
        pairs = [(rng.normal(size=n).astype(np.float32),
                  rng.normal(size=n).astype(np.float32)) for n in lengths]
        return WaveformDataset(pairs=pairs, max_len=max(lengths))

    def test_shuffled_emission_is_not_length_sorted(self):
        # 6 short + 6 long → 3+3 full batches; ascending emission would
        # put all 3 narrow batches first. Some seed must interleave.
        ds = self._ds([3000] * 6 + [7000] * 6)
        interleaved = False
        for seed in range(8):
            widths = [b["noisy"].shape[1] for b in batch_iterator(
                ds, 2, shuffle=True, seed=seed, bucketed=True,
                drop_last=False)]
            if widths != sorted(widths):
                interleaved = True
                break
        assert interleaved, "bucketed+shuffle always emitted ascending"

    def test_shuffle_preserves_batch_multiset(self):
        ds = self._ds([3000] * 5 + [7000] * 3)
        a = list(batch_iterator(ds, 2, shuffle=True, seed=3,
                                bucketed=True, drop_last=False))
        b = list(batch_iterator(ds, 2, shuffle=False,
                                bucketed=True, drop_last=False))
        # same number of batches, same multiset of shapes, same total
        assert sorted(x["noisy"].shape for x in a) == \
            sorted(x["noisy"].shape for x in b)
        assert sum(x["noisy"].shape[0] for x in a) == \
            sum(x["noisy"].shape[0] for x in b) == 8

    def test_unshuffled_order_is_deterministic_ascending(self):
        ds = self._ds([3000] * 4 + [7000] * 4)
        widths = [b["noisy"].shape[1] for b in batch_iterator(
            ds, 2, shuffle=False, bucketed=True, drop_last=False)]
        assert widths == sorted(widths)


class TestDnnSplitHeldoutConsistency:
    """Round-4 review: prepare_arrays chooses each job's noise bank by an
    A-PRIORI index (jobs >= test_start mix with held-out crops), so the
    post-hoc train/test split must use the SAME boundary over survivors.
    A fractional re-split over surviving outputs shifted a training-
    noise-mixed utterance into the test set whenever a test-tail job
    failed — partially reinstating the memorized-crop evaluation bias."""

    def test_failed_job_does_not_shift_boundary(self, monkeypatch):
        import sincformer_tpu.train.dnn_trainer as dt

        raw = np.arange(16000, dtype=np.float32)
        noises = {"white": raw}
        from sincformer_tpu.data.loader import heldout_noises
        held = heldout_noises(noises)["white"]

        def fake_process(clean, noise, snr, mask_type, fe, gfb,
                         cache_dir=None, cache_key=None, pad_quantum=2000):
            i = int(clean[0])                    # job index rides in data
            if i == 19:                          # a TEST-tail job fails
                return None
            is_held = bool(np.array_equal(noise, held))
            # distinct frame count per job → identifiable after concat
            t = i + 2
            f = np.full((t, 4), float(is_held), np.float32)
            m = np.full((t, 3), 0.5, np.float32)
            return f, m

        monkeypatch.setattr(dt, "process_single_utterance", fake_process)
        pipe = dt.DNNPipeline(use_rbm_pretrain=False)
        clean = [np.full(100, i, np.float32) for i in range(20)]
        train, test = pipe.prepare_arrays(clean, noises,
                                          test_fraction=0.1,
                                          host_workers=1)
        # test_start = 18: jobs 18,19 are held-out-mixed; job 19 failed →
        # the test set must be EXACTLY job 18 (20 frames), not jobs 17+18
        assert len(test) == 18 + 2, \
            "train/test boundary shifted after a failed test-tail job"
        assert len(train) == sum(i + 2 for i in range(18))

    def test_failed_train_job_keeps_test_pure(self, monkeypatch):
        import sincformer_tpu.train.dnn_trainer as dt

        noises = {"white": np.arange(16000, dtype=np.float32)}
        from sincformer_tpu.data.loader import heldout_noises
        held = heldout_noises(noises)["white"]
        bank_by_frames = {}

        def fake_process(clean, noise, snr, mask_type, fe, gfb,
                         cache_dir=None, cache_key=None, pad_quantum=2000):
            i = int(clean[0])
            if i == 7:                           # a TRAIN job fails
                return None
            t = i + 2
            bank_by_frames[t] = bool(np.array_equal(noise, held))
            return (np.full((t, 4), float(i), np.float32),
                    np.full((t, 3), 0.5, np.float32))

        monkeypatch.setattr(dt, "process_single_utterance", fake_process)
        pipe = dt.DNNPipeline(use_rbm_pretrain=False)
        clean = [np.full(100, i, np.float32) for i in range(20)]
        train, test = pipe.prepare_arrays(clean, noises,
                                          test_fraction=0.1,
                                          host_workers=1)
        # survivors among jobs >= 18: both → test = jobs 18 (20fr) + 19
        # (21fr); every test frame must come from a held-out-mixed job
        assert len(test) == 20 + 21
        assert bank_by_frames[20] and bank_by_frames[21]


class TestCalibrateCliNoiseRotation:
    """Round-4 review: cli `calibrate` pre-rolled the noise bank AND
    SincformerPipeline.calibrate_gain rolls it again — np.roll by len//2
    twice is the identity for even lengths, i.e. the gain was fitted on
    the exact training crops the rotation exists to avoid. The CLI must
    pass the RAW bank to sincformer (which rolls internally) and roll
    exactly once for DCSE (whose calibrate_gain takes a pre-mixed
    dataset)."""

    def _patch_data(self, monkeypatch, raw):
        import types

        import sincformer_tpu.data as data_pkg
        import sincformer_tpu.data.loader as loader
        from sincformer_tpu.data.synthetic import synthetic_speech
        monkeypatch.setattr(loader, "find_speech_files",
                            lambda *a, **k: ["a.wav", "b.wav"])
        monkeypatch.setattr(loader, "train_test_split",
                            lambda files, **k: ([], list(files)))
        monkeypatch.setattr(loader, "load_noise_signals",
                            lambda fs: {"white": raw.copy()})
        monkeypatch.setattr(data_pkg, "load_audio",
                            lambda f, fs: synthetic_speech(0.5))
        return types.SimpleNamespace(samples=2, synthetic=False)

    def test_sincformer_gets_raw_bank(self, monkeypatch):
        import sincformer_tpu.cli as cli
        import sincformer_tpu.train.agent_trainer as at
        raw = np.arange(16000, dtype=np.float32)
        args = self._patch_data(monkeypatch, raw)
        args.model = "sincformer"
        captured = {}

        class FakePipe:
            output_gain = 1.0

            def load_model(self):
                pass

            def calibrate_gain(self, clean, noises, **kw):
                captured["noises"] = noises
                return 1.0

        monkeypatch.setattr(at, "SincformerPipeline", FakePipe)
        cli.calibrate(args)
        assert np.array_equal(captured["noises"]["white"], raw), \
            "CLI must pass the RAW bank — calibrate_gain rolls it itself"

    def test_dcse_rolls_exactly_once(self, monkeypatch):
        import sincformer_tpu.cli as cli
        import sincformer_tpu.data.loader as loader
        import sincformer_tpu.train.dcse_trainer as dct
        raw = np.arange(16000, dtype=np.float32)
        args = self._patch_data(monkeypatch, raw)
        args.model = "dcse"
        calls = []
        orig = loader.heldout_noises
        monkeypatch.setattr(loader, "heldout_noises",
                            lambda n: calls.append(1) or orig(n))

        class FakePipe:
            output_gain = 1.0

            def load_model(self):
                pass

            def calibrate_gain(self, ds, **kw):
                return 1.0

        monkeypatch.setattr(dct, "DCSEPipeline", FakePipe)
        cli.calibrate(args)
        assert len(calls) == 1, \
            f"DCSE branch must roll the bank exactly once, got {len(calls)}"
