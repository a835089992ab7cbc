"""CLI surface tests (reference main.py parity: subcommands + flags)."""

import os

import numpy as np
import pytest

from sincformer_tpu import cli


class TestCLI:
    def test_info(self, capsys):
        cli.main(["info"])
        out = capsys.readouterr().out
        assert "Sample Rate:        8000 Hz" in out
        assert "GFTB Channels:      64" in out
        assert "JAX Version" in out

    def test_help_lists_all_subcommands(self, capsys):
        with pytest.raises(SystemExit):
            cli.main(["--help"])
        out = capsys.readouterr().out
        for sub in ("demo", "train", "evaluate", "info", "test"):
            assert sub in out

    def test_train_flags_parity(self, capsys):
        """--pipeline/--mask-type choices match (and extend) the reference."""
        with pytest.raises(SystemExit):
            cli.main(["train", "--help"])
        out = capsys.readouterr().out
        for flag in ("--pipeline", "--mask-type", "--epochs", "--max-train",
                     "--max-test", "--no-rbm"):
            assert flag in out
        for choice in ("dnn", "conformer", "agents", "irm", "pcirm",
                       "opt_pcirm"):
            assert choice in out

    def test_evaluate_no_models(self, capsys, tmp_path, monkeypatch):
        import sincformer_tpu.config as cfgmod
        import dataclasses
        monkeypatch.setenv("SINCFORMER_MODEL_DIR", str(tmp_path / "empty"))
        # rebuild DEFAULT with the env override
        monkeypatch.setattr(cfgmod, "DEFAULT", cfgmod.Config())
        cli.main(["evaluate", "--max-eval", "1"])
        out = capsys.readouterr().out
        assert "No trained models found" in out

    def test_demo_runs(self, capsys):
        """Zero-data smoke test — the reference's first e2e milestone."""
        cli.main(["demo"])
        out = capsys.readouterr().out
        assert "SNR = 0 dB" in out
        assert "OPT-PCIRM" in out
        assert "NCM" in out            # 5-metric table (reference prints 3)
        assert "Demo complete!" in out

    def test_enhance_multi_file_batched(self, capsys, tmp_path,
                                        monkeypatch, rng):
        """`enhance in1 in2 ... outdir` routes through enhance_many with
        same-quantum inputs batched in ONE device call."""
        from scipy.io import wavfile

        import sincformer_tpu.evaluation.grid as grid_mod

        class HalfPipe:
            def __init__(self):
                self.batch_shapes = []

            def enhance_signal(self, x):
                return np.asarray(x) * 0.5

            def enhance_batch(self, x):
                x = np.asarray(x)
                self.batch_shapes.append(x.shape)
                return x * 0.5

        pipe = HalfPipe()
        monkeypatch.setattr(grid_mod, "discover_pipelines",
                            lambda *a, **k: {"sincformer": pipe})
        paths = []
        for i, n in enumerate((3000, 3500)):     # same 4000-pad quantum
            x = (0.2 * rng.standard_normal(n)).astype(np.float32)
            p = str(tmp_path / f"in{i}.wav")
            wavfile.write(p, 8000, x)
            paths.append(p)
        outdir = str(tmp_path / "out")
        cli.main(["enhance", *paths, outdir])
        out = capsys.readouterr().out
        assert "Enhanced 2 files" in out
        # one batched call covering both utterances
        assert pipe.batch_shapes == [(2, 4000)]
        for i, p in enumerate(paths):
            fs, y = wavfile.read(str(tmp_path / "out" / f"in{i}.wav"))
            fs2, x = wavfile.read(p)
            np.testing.assert_allclose(y, x * 0.5, atol=1e-4)


class TestEnhancePcm16:
    def test_single_file_pcm16_output(self, capsys, tmp_path, monkeypatch,
                                      rng):
        from scipy.io import wavfile

        import sincformer_tpu.evaluation.grid as grid_mod

        class IdentPipe:
            def enhance_signal(self, x):
                return np.asarray(x, np.float32)

        monkeypatch.setattr(grid_mod, "discover_pipelines",
                            lambda *a, **k: {"sincformer": IdentPipe()})
        x = (0.2 * rng.standard_normal(3000)).astype(np.float32)
        src = str(tmp_path / "in.wav")
        dst = str(tmp_path / "out.wav")
        wavfile.write(src, 8000, x)
        cli.main(["enhance", src, dst, "--pcm16"])
        fs, y = wavfile.read(dst)
        assert y.dtype == np.int16
        np.testing.assert_allclose(y / 32767.0, x, atol=2e-4)


class TestRound5Flags:
    def test_synthetic_corpus_noise_kinds(self):
        from sincformer_tpu.cli import _synthetic_corpus
        clean, white = _synthetic_corpus(3, "white")
        assert len(clean) == 3 and set(white) == {"white"}
        clean2, multi = _synthetic_corpus(3, "multi")
        # the reference's full 4-noise protocol bank (pipeline.py:423-436)
        assert set(multi) == {"white", "babble", "factory1",
                              "destroyerengine"}
        # clean corpus is identical either way (noise kind only swaps the
        # bank, so white-vs-multi ablations share their speech material)
        for a, b in zip(clean, clean2):
            np.testing.assert_array_equal(a, b)

    def test_train_new_flags_listed(self, capsys):
        with pytest.raises(SystemExit):
            cli.main(["train", "--help"])
        out = capsys.readouterr().out
        for flag in ("--synth-noises", "--seed", "--log-jsonl"):
            assert flag in out

    def test_evaluate_json_out_flag_listed(self, capsys):
        with pytest.raises(SystemExit):
            cli.main(["evaluate", "--help"])
        out = capsys.readouterr().out
        assert "--json-out" in out

    def test_enhance_online_flag(self, capsys, tmp_path, monkeypatch, rng):
        from scipy.io import wavfile

        import sincformer_tpu.evaluation.grid as grid_mod

        class IdentPipe:
            def enhance_signal(self, x):
                return np.asarray(x, np.float32)

            def enhance_batch(self, x):
                return np.asarray(x, np.float32)

        monkeypatch.setattr(grid_mod, "discover_pipelines",
                            lambda *a, **k: {"sincformer": IdentPipe()})
        x = (0.2 * rng.standard_normal(5000)).astype(np.float32)
        src = str(tmp_path / "in.wav")
        dst = str(tmp_path / "out.wav")
        wavfile.write(src, 8000, x)
        cli.main(["enhance", src, dst, "--online"])
        out = capsys.readouterr().out
        assert "50 ms algorithmic latency" in out
        fs, y = wavfile.read(dst)
        assert y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=2e-4)


class TestCkptPreference:
    """evaluate --ckpt best flips every pipeline's inference load order
    (train.state.inference_ckpt_order); default stays final-first (the
    recorded round-5 eval protocol)."""

    def test_order_default_and_best(self, monkeypatch):
        from sincformer_tpu.train.state import inference_ckpt_order
        monkeypatch.delenv("SINCFORMER_CKPT_PREF", raising=False)
        assert inference_ckpt_order("f", "b") == ("f", "b")
        monkeypatch.setenv("SINCFORMER_CKPT_PREF", "best")
        assert inference_ckpt_order("f", "b") == ("b", "f")
        monkeypatch.setenv("SINCFORMER_CKPT_PREF", "final")
        assert inference_ckpt_order("f", "b") == ("f", "b")

    def test_evaluate_ckpt_flag_listed(self, capsys):
        with pytest.raises(SystemExit):
            cli.main(["evaluate", "--help"])
        out = capsys.readouterr().out
        assert "--ckpt" in out

    def test_evaluate_sets_env(self, monkeypatch, capsys):
        import sincformer_tpu.evaluation.grid as grid_mod

        seen = {}

        def fake_grid(**kw):
            seen["pref"] = os.environ.get("SINCFORMER_CKPT_PREF")

        monkeypatch.setattr(grid_mod, "run_grid_evaluation", fake_grid)
        cli.main(["evaluate", "--ckpt", "best", "--max-eval", "1"])
        assert seen["pref"] == "best"
        cli.main(["evaluate", "--max-eval", "1"])
        assert seen["pref"] == "final"

    def test_agent_load_prefers_best_when_asked(self, tmp_path,
                                                monkeypatch):
        # two checkpoint families on disk; load_model(None) must pick the
        # family the preference names, independent of step numbers
        from sincformer_tpu.train.state import inference_ckpt_order
        for fam, step in (("sincformer_final", 99), ("best_sincformer", 7)):
            (tmp_path / fam / f"step_{step}").mkdir(parents=True)
        from sincformer_tpu.train.state import latest_step_dir
        monkeypatch.setenv("SINCFORMER_CKPT_PREF", "best")
        order = inference_ckpt_order("sincformer_final", "best_sincformer")
        path = None
        for name in order:
            path = latest_step_dir(str(tmp_path / name))
            if path:
                break
        assert path is not None and "best_sincformer" in path


class TestExportVerb:
    def test_export_listed(self, capsys):
        with pytest.raises(SystemExit):
            cli.main(["--help"])
        assert "export" in capsys.readouterr().out

    def test_export_round_trip(self, tmp_path, monkeypatch, capsys):
        """export produces a drop-in int8 serving dir: loads with no
        flags, carries the calibrated output gain, and enhances close to
        the source checkpoint (per-channel int8 quantization noise
        only)."""
        from sincformer_tpu.train.dcse_trainer import DCSEPipeline
        src_dir = tmp_path / "m"
        pipe = DCSEPipeline(model_dir=str(src_dir))
        pipe.init_state(epochs=1, steps_per_epoch=1, example_len=2000)
        pipe.output_gain = 1.25
        pipe.save_model()                    # conformer_final + gain sidecar
        monkeypatch.setenv("SINCFORMER_MODEL_DIR", str(src_dir))
        from sincformer_tpu import config as cfgmod
        monkeypatch.setattr(cfgmod, "DEFAULT", cfgmod.Config())
        out = tmp_path / "serving"
        cli.main(["export", "--model", "conformer", "--ckpt", "final",
                  "--out", str(out)])
        msg = capsys.readouterr().out
        assert "Exported" in msg and str(out) in msg
        # provenance sidecar
        from sincformer_tpu.train.state import read_train_meta
        meta = read_train_meta(str(out), "conformer_final")
        assert meta["output_gain"] == pytest.approx(1.25)
        assert "step_" in meta["exported_from"]
        # drop-in load from the exported dir (quantized restore is
        # transparent) and near-parity enhancement
        pipe2 = DCSEPipeline(model_dir=str(out))
        path = pipe2.load_model()
        assert "conformer_final" in path
        assert pipe2.output_gain == pytest.approx(1.25)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 2000)).astype(np.float32) * 0.3
        a = np.asarray(pipe.enhance_batch(x)).ravel()
        b = np.asarray(pipe2.enhance_batch(x)).ravel()
        assert np.isfinite(b).all()
        assert np.corrcoef(a, b)[0, 1] > 0.95
        # and it is genuinely the compact artifact, not a f32 copy: the
        # exported family is much smaller than the source family
        def du(d):
            return sum(os.path.getsize(os.path.join(r, f))
                       for r, _, fs in os.walk(d) for f in fs)
        assert du(out) < 0.5 * du(src_dir / "conformer_final")


class TestEnhanceOnlinePool:
    def test_multi_input_online_uses_pool(self, capsys, tmp_path,
                                          monkeypatch):
        """`enhance a b c outdir --online` serves the inputs as
        CONCURRENT live streams: every device call is one fixed
        (n_streams, context) batch, and each output equals the solo
        result (0.5x for the linear pipe)."""
        from scipy.io import wavfile

        import sincformer_tpu.evaluation.grid as grid_mod
        rng = np.random.default_rng(3)

        class HalfPipe:
            def __init__(self):
                self.batch_shapes = []

            def enhance_batch(self, x):
                x = np.asarray(x)
                self.batch_shapes.append(x.shape)
                return x * 0.5

        pipe = HalfPipe()
        monkeypatch.setattr(grid_mod, "discover_pipelines",
                            lambda *a, **k: {"sincformer": pipe})
        paths, xs = [], []
        for i, n in enumerate((3000, 2100, 4400)):
            x = (0.2 * rng.standard_normal(n)).astype(np.float32)
            p = str(tmp_path / f"s{i}.wav")
            wavfile.write(p, 8000, x)
            paths.append(p)
            xs.append(x)
        outdir = str(tmp_path / "out")
        cli.main(["enhance", *paths, outdir, "--online"])
        out = capsys.readouterr().out
        assert "Online pool: 3 concurrent streams" in out
        assert "Enhanced 3 streams" in out
        assert set(pipe.batch_shapes) == {(3, 8000)}   # one executable
        for p, x in zip(paths, xs):
            _, y = wavfile.read(str(tmp_path / "out" / os.path.basename(p)))
            assert y.shape == x.shape
            np.testing.assert_allclose(y, x * 0.5, atol=1e-4)
