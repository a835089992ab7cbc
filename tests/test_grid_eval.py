"""Grid evaluation: batched fast path vs serial path consistency."""

import numpy as np
import pytest

from sincformer_tpu.data import synthetic_noise, synthetic_speech
from sincformer_tpu.evaluation.batched import metrics_batch
from sincformer_tpu.evaluation.grid import evaluate_grid, print_grid_tables
from sincformer_tpu.evaluation import (compute_csii, compute_ncm,
                                       compute_pesq, compute_ssnr,
                                       compute_stoi)


class _IdentityPipe:
    """Pass-through 'enhancer' with both serial and batched APIs."""

    def enhance_signal(self, x):
        return np.asarray(x) * 0.9

    def enhance_batch(self, x):
        return np.asarray(x) * 0.9


class TestBatchedMetrics:
    def test_matches_host_metrics(self, rng):
        clean = np.stack([synthetic_speech(1.0) for _ in range(3)])
        enhanced = clean + 0.1 * rng.standard_normal(clean.shape
                                                     ).astype(np.float32)
        out = metrics_batch(clean, enhanced)
        host = {
            "stoi": compute_stoi, "pesq": compute_pesq,
            "ssnr": compute_ssnr, "csii": compute_csii, "ncm": compute_ncm,
        }
        for k, fn in host.items():
            for b in range(3):
                assert abs(out[k][b] - fn(clean[b], enhanced[b])) < 2e-3, k


class TestGridPaths:
    def test_batched_equals_serial(self):
        clean = [synthetic_speech(1.0) * s for s in (1.0, 0.8)]
        noises = {"white": synthetic_noise(8000, seed=0)}
        pipes = {"ident": _IdentityPipe()}
        serial = evaluate_grid(clean, noises, pipes, snr_levels=[0, 5],
                               verbose=False, batched=False)
        fast = evaluate_grid(clean, noises, pipes, snr_levels=[0, 5],
                             verbose=False, batched=True)
        for method in ("noisy", "ident"):
            for snr in (0, 5):
                for k in ("stoi", "ssnr", "pesq"):
                    a = serial["white"][method][snr][k]
                    b = fast["white"][method][snr][k]
                    np.testing.assert_allclose(a, b, atol=2e-3,
                                               err_msg=f"{method}/{snr}/{k}")

    def test_variable_length_batched_equals_serial(self):
        """Round-1 gap: the fast path required uniform lengths, so real
        TIMIT degenerated to the serial loop. Bucketed batching must now
        take the fast path AND reproduce the serial values exactly."""
        clean = [synthetic_speech(d) for d in (0.6, 0.6, 1.1, 1.7)]
        noises = {"white": synthetic_noise(16000, seed=0)}
        pipes = {"ident": _IdentityPipe()}
        serial = evaluate_grid(clean, noises, pipes, snr_levels=[5],
                               verbose=False, batched=False)
        fast = evaluate_grid(clean, noises, pipes, snr_levels=[5],
                             verbose=False, batched=True)
        for method in ("noisy", "ident"):
            for k in ("stoi", "ssnr", "pesq", "csii", "ncm"):
                a = sorted(serial["white"][method][5][k])
                b = sorted(fast["white"][method][5][k])
                assert len(b) == 4
                np.testing.assert_allclose(a, b, atol=2e-3,
                                           err_msg=f"{method}/{k}")

    def test_tables_print(self, capsys):
        clean = [synthetic_speech(0.5)]
        noises = {"white": synthetic_noise(8000, seed=0)}
        res = evaluate_grid(clean, noises, {"ident": _IdentityPipe()},
                            snr_levels=[0], verbose=False)
        summary = print_grid_tables(res, [0])
        out = capsys.readouterr().out
        assert "GRAND SUMMARY" in out
        assert ("ident", "ncm") in summary


class TestMeshGrid:
    def test_sharded_metric_sweep(self):
        """Batched grid over an 8-device CPU mesh == single-device result.

        3 utterances on 8 devices forces pad (5) > bucket size (3) — the
        cyclic-tiling case a single cb[:pad] slice could not satisfy
        (round-3 review finding)."""
        import jax
        from sincformer_tpu.parallel import make_mesh

        clean = [synthetic_speech(1.0) * s for s in (1.0, 0.9, 0.8)]
        noises = {"white": synthetic_noise(8000, seed=0)}
        pipes = {"ident": _IdentityPipe()}
        mesh = make_mesh(devices=jax.devices("cpu")[:8],
                         axis_names=("data",))
        plain = evaluate_grid(clean, noises, pipes, snr_levels=[0],
                              verbose=False, batched=True)
        sharded = evaluate_grid(clean, noises, pipes, snr_levels=[0],
                                verbose=False, batched=True, mesh=mesh)
        for method in ("noisy", "ident"):
            for k in ("stoi", "ssnr", "ncm"):
                np.testing.assert_allclose(
                    plain["white"][method][0][k],
                    sharded["white"][method][0][k], atol=1e-4)


class TestSyntheticNoiseBank:
    def test_four_classes_with_distinct_spectra(self):
        from sincformer_tpu.data.synthetic import synthetic_noise_bank
        bank = synthetic_noise_bank(16000, seed=0)
        assert set(bank) == {"white", "babble", "factory1",
                             "destroyerengine"}
        import numpy as np
        lf_ratio = {}
        for k, v in bank.items():
            assert v.dtype == np.float32 and np.isfinite(v).all()
            spec = np.abs(np.fft.rfft(v)) ** 2
            lf_ratio[k] = spec[: len(spec) // 16].sum() / spec.sum()
        # engine noise is LF-dominated, white is not
        assert lf_ratio["destroyerengine"] > 0.5 > lf_ratio["white"]
        # deterministic under the same seed
        again = synthetic_noise_bank(16000, seed=0)
        np.testing.assert_array_equal(bank["babble"], again["babble"])

    def test_loader_fallback_modes(self, tmp_path):
        import numpy as np
        from sincformer_tpu.data.loader import load_noise_signals
        multi = load_noise_signals(8000, noisex_dir=str(tmp_path),
                                   synth_fallback="multi")
        assert len(multi) == 4
        white = load_noise_signals(8000, noisex_dir=str(tmp_path),
                                   synth_fallback=True)
        assert set(white) == {"white"}
        none = load_noise_signals(8000, noisex_dir=str(tmp_path),
                                  synth_fallback=False)
        assert none == {}
