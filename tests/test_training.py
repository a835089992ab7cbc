"""Training-engine tests: data pipeline, DCSE convergence, checkpoint resume,
curriculum, data-parallel step on the 8-device CPU mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sincformer_tpu import config as cfg
from sincformer_tpu.data import (WaveformDataset, add_noise_at_snr,
                                 batch_iterator, synthetic_noise,
                                 synthetic_speech, train_test_split)
from sincformer_tpu.models.dcse import SpeechEnhancer
from sincformer_tpu.train.curriculum import CurriculumScheduler
from sincformer_tpu.train.dcse_trainer import DCSEPipeline


def tiny_pipeline(tmp_path, mesh=None):
    model = SpeechEnhancer(n_freq=129, d_model=32, num_blocks=1,
                           num_heads=2, d_ff=64, kernel_size=7, dropout=0.0)
    return DCSEPipeline(model=model, model_dir=str(tmp_path), mesh=mesh)


def tiny_dataset(n=8, dur=0.5, seed=0):
    rng = np.random.default_rng(seed)
    signals = []
    for i in range(n):
        s = synthetic_speech(dur)
        # vary utterances slightly
        s = s * (0.8 + 0.4 * rng.random())
        signals.append(s)
    noises = {"white": synthetic_noise(8000, seed=seed)}
    return WaveformDataset.from_arrays(signals, noises,
                                       max_len=int(8000 * dur))


class TestData:
    def test_add_noise_snr(self, rng):
        clean = synthetic_speech(1.0)
        noise = synthetic_noise(4000, seed=1)
        noisy = add_noise_at_snr(clean, noise, 5.0)
        resid = noisy - clean
        snr = 10 * np.log10(np.mean(clean ** 2) / np.mean(resid ** 2))
        assert abs(snr - 5.0) < 0.5

    def test_split_determinism(self):
        files = [f"f{i}.wav" for i in range(100)]
        a1, b1 = train_test_split(files)
        a2, b2 = train_test_split(files)
        assert a1 == a2 and b1 == b2
        assert len(a1) == 90 and len(b1) == 10
        assert set(a1).isdisjoint(b1)

    def test_batch_iterator_padding(self):
        ds = tiny_dataset(5)
        batches = list(batch_iterator(ds, 2, shuffle=False))
        assert all(b["noisy"].shape == (2, ds.max_len) for b in batches)
        assert len(batches) == 2  # drop_last

    def test_small_dataset_never_yields_zero_batches(self):
        # regression: 7 utterances + batch 8 + drop_last silently trained
        # on NOTHING (caught by a CLI drive)
        ds = tiny_dataset(7)
        batches = list(batch_iterator(ds, 8, shuffle=False, drop_last=True))
        assert len(batches) == 1
        assert batches[0]["noisy"].shape[0] == 7

    def test_bucketed_batches(self):
        rng = np.random.default_rng(0)
        signals = [synthetic_speech(d) for d in (0.5, 0.5, 1.0, 1.0, 2.0)]
        noises = {"white": synthetic_noise(8000, seed=0)}
        ds = WaveformDataset.from_arrays(signals, noises, max_len=16000)
        batches = list(batch_iterator(ds, 2, shuffle=False, bucketed=True,
                                      drop_last=False))
        lens = sorted(b["noisy"].shape[1] for b in batches)
        assert lens[0] < 16000  # short bucket stayed dense
        total = sum(b["noisy"].shape[0] for b in batches)
        assert total == 5


class TestDCSETraining:
    def test_loss_decreases(self, tmp_path):
        ds = tiny_dataset(8, dur=0.5)
        pipe = tiny_pipeline(tmp_path)
        hist = pipe.train(ds, ds, epochs=8, batch_size=4, verbose=False)
        assert hist[-1]["train_loss"] < hist[0]["train_loss"]
        assert pipe.state is not None
        assert int(pipe.state.nan_count) == 0

    def test_enhance_signal_shapes(self, tmp_path):
        ds = tiny_dataset(4, dur=0.5)
        pipe = tiny_pipeline(tmp_path)
        pipe.train(ds, ds, epochs=1, batch_size=2, verbose=False)
        noisy = ds.pairs[0][0]
        out = pipe.enhance_signal(noisy)
        assert out.shape == noisy.shape
        assert np.all(np.isfinite(out))

    def test_checkpoint_roundtrip(self, tmp_path):
        ds = tiny_dataset(4, dur=0.5)
        pipe = tiny_pipeline(tmp_path)
        pipe.train(ds, ds, epochs=2, batch_size=2, verbose=False)
        path = pipe.save_model("conformer_final")
        before = pipe.enhance_signal(ds.pairs[0][0])

        pipe2 = tiny_pipeline(tmp_path)
        loaded_path = pipe2.load_model()
        after = pipe2.enhance_signal(ds.pairs[0][0])
        np.testing.assert_allclose(before, after, atol=1e-6)
        # full state: optimizer state restored → resume-able
        assert int(pipe2.state.step) == int(pipe.state.step)

    def test_data_parallel_mesh(self, tmp_path):
        from sincformer_tpu.parallel import make_mesh
        cpus = jax.devices("cpu")
        mesh = make_mesh(devices=cpus[:4], axis_names=("data",))
        ds = tiny_dataset(8, dur=0.5)
        pipe = tiny_pipeline(tmp_path, mesh=mesh)
        hist = pipe.train(ds, ds, epochs=2, batch_size=4, verbose=False)
        assert np.isfinite(hist[-1]["train_loss"])


class TestCurriculum:
    def test_stages_match_reference_schedule(self):
        sched = CurriculumScheduler()
        assert sched.total_epochs == 50
        s1 = sched.get_stage(0)
        assert s1["stage"] == 1 and s1["snr_levels"] == [5, 10]
        assert not s1["use_vq"]
        s2 = sched.get_stage(15)
        assert s2["stage"] == 2 and s2["snr_levels"] == [0, 5, 10]
        s2b = sched.get_stage(30)
        assert s2b["snr_levels"] == [-5, 0, 5, 10]
        s3 = sched.get_stage(35)
        assert s3["stage"] == 3 and s3["use_vq"]
        assert s3["loss_type"] == "perceptual+vq+adversarial"

    def test_parity_with_reference(self, ref_modules):
        import importlib
        ref = importlib.import_module("training.curriculum")
        ours = CurriculumScheduler()
        theirs = ref.CurriculumScheduler()
        for epoch in range(50):
            a = ours.get_stage(epoch)
            b = theirs.get_stage(epoch)
            assert a["stage"] == b["stage"]
            assert a["snr_levels"] == b["snr_levels"]
            assert a["use_vq"] == b["use_vq"]
            assert a["loss_type"] == b["loss_type"]


class TestDCSEResume:
    def test_kill_and_resume(self, tmp_path):
        from sincformer_tpu.data import synthetic_noise, synthetic_speech
        from sincformer_tpu.data.loader import WaveformDataset
        from sincformer_tpu.models.dcse import SpeechEnhancer
        from sincformer_tpu.train.dcse_trainer import DCSEPipeline

        def fresh():
            model = SpeechEnhancer(n_freq=129, d_model=32, num_blocks=1,
                                   num_heads=2, d_ff=64, kernel_size=7,
                                   dropout=0.0)
            return DCSEPipeline(model=model, model_dir=str(tmp_path))

        ds = WaveformDataset.from_arrays(
            [synthetic_speech(0.5)] * 8,
            {"white": synthetic_noise(8000, seed=0)}, max_len=4000)
        p1 = fresh()
        h1 = p1.train(ds, ds, epochs=2, batch_size=4, verbose=False)
        assert len(h1) == 2
        # derive the expectation from the NEWEST on-disk checkpoint (the
        # best save, not necessarily the last epoch run)
        from sincformer_tpu.train.state import (checkpoint_step,
                                                newest_checkpoint)
        ck = newest_checkpoint(str(tmp_path),
                               ("conformer_final", "best_conformer"))
        saved_step = checkpoint_step(ck)
        assert saved_step > 0

        p2 = fresh()
        h2 = p2.train(ds, ds, epochs=4, batch_size=4, verbose=False,
                      resume=True)
        assert h2[0]["epoch"] == saved_step // 2      # steps_per_epoch = 2
        assert h2[-1]["epoch"] == 3
        assert int(p2.state.step) > saved_step
