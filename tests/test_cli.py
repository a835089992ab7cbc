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
