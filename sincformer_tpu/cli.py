"""CLI — demo / train / evaluate / info (+ the `test` alias the reference
documents but never registered, main.py:6 vs 478-510).

Flag-for-flag parity with the reference ``main.py:474-523``:
  train: --pipeline {dnn,conformer,agents} --mask-type --epochs --max-train
         --max-test --no-rbm
  evaluate: --max-eval

Improvements over the reference (cited):
  * `--pipeline agents` actually exists (the multi-agent stack is wired);
  * `evaluate` reports all FIVE metrics — CSII and NCM are implemented in
    the reference but never called by any entry point (SURVEY.md §0.3);
  * the evaluation grid runs batched on device instead of a serial Python
    loop (main.py:316-359).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def demo(args):
    """Zero-data demo on synthetic audio (reference main.py:25-173)."""
    import jax.numpy as jnp

    from sincformer_tpu import config as cfg
    from sincformer_tpu.data import (add_noise_at_snr, synthetic_noise,
                                     synthetic_speech)
    from sincformer_tpu.dsp import GammatoneFilterbank
    from sincformer_tpu.evaluation import (compute_csii, compute_ncm,
                                           compute_pesq, compute_ssnr,
                                           compute_stoi)
    from sincformer_tpu.masks import (compute_correlation_coefficients,
                                      compute_irm,
                                      compute_pcirm,
                                      compute_phase_differences,
                                      compute_snr_boundaries, quantize_pcirm)
    from sincformer_tpu.masks.opt_pcirm import reconstruct_scalar_gain

    print("=" * 70)
    print("  Speech Enhancement Demo — Synthetic Signal (sincformer_tpu)")
    print("=" * 70)

    fs = cfg.DEFAULT.audio.sample_rate
    clean = synthetic_speech(2.0, fs)
    noise = synthetic_noise(len(clean), seed=None)

    gfb = GammatoneFilterbank(sample_rate=fs)
    for snr_db in (0, 5, 10):
        print(f"\n{'─' * 60}\n  SNR = {snr_db} dB\n{'─' * 60}")
        noisy = add_noise_at_snr(clean, noise, snr_db)

        clean_m, clean_p = gfb.get_tf_magnitudes(jnp.asarray(clean))
        noisy_m, noisy_p = gfb.get_tf_magnitudes(jnp.asarray(noisy))
        noise_m, noise_p = gfb.get_tf_magnitudes(
            jnp.asarray(noise[:len(clean)]))

        irm = compute_irm(clean_m, noise_m)
        rho_s, rho_n = compute_correlation_coefficients(noisy_m, clean_m,
                                                        noise_m)
        phi1, phi2 = compute_phase_differences(noisy_p, clean_p, noise_p)
        pcirm = compute_pcirm(clean_m, noise_m, rho_s, rho_n, phi1, phi2)
        steps, _ = compute_snr_boundaries()
        opt = quantize_pcirm(pcirm, steps)

        outs = {"Noisy": noisy}
        for name, mask in (("IRM", irm), ("PCIRM", pcirm),
                           ("OPT-PCIRM", opt)):
            outs[name] = np.asarray(reconstruct_scalar_gain(
                mask, jnp.asarray(noisy)))

        cols = list(outs.keys())
        print(f"\n  {'Metric':<12}" + "".join(f"{c:>12}" for c in cols))
        print("  " + "─" * (12 + 12 * len(cols)))
        metric_fns = [("STOI", compute_stoi), ("PESQ", compute_pesq),
                      ("SSNR (dB)", compute_ssnr), ("CSII", compute_csii),
                      ("NCM", compute_ncm)]
        for mname, fn in metric_fns:
            row = f"  {mname:<12}"
            for c in cols:
                row += f"{fn(clean, outs[c]):>12.4f}"
            print(row)

        print("\n  Mask stats:")
        print(f"    IRM      — mean={float(jnp.mean(irm)):.3f}, "
              f"std={float(jnp.std(irm)):.3f}")
        print(f"    PCIRM    — mean={float(jnp.mean(pcirm)):.3f}, "
              f"std={float(jnp.std(pcirm)):.3f}")
        uniq = np.unique(np.round(np.asarray(opt), 4))
        print(f"    OPT-PCIRM— unique values={uniq}, "
              f"mean={float(jnp.mean(opt)):.3f}")

    print(f"\n{'=' * 70}\n  Demo complete!\n{'=' * 70}\n")


def _synthetic_corpus(n: int, noise_kind: str = "white",
                      speech_kind: str = "formant"):
    """Synthetic clean utterances + noise bank for dataset-free training.

    ``noise_kind="multi"`` trains under the reference's actual protocol —
    round-robin over 4 noise types × 4 SNRs (reference
    training/pipeline.py:423-436) — using the same 4-class synthetic
    NOISEX stand-ins the evaluate grid uses (data/synthetic.py::
    synthetic_noise_bank). ``"white"`` keeps the historical single-noise
    corpus (every headline run through round 4).

    ``speech_kind="varied"`` draws a distinct randomized utterance per
    index (data/synthetic.py::synthetic_speech_varied) instead of n
    copies of the reference's one fixed formant pattern — the round-5
    speech-diversity probe."""
    import numpy as np

    from sincformer_tpu import config as cfg
    from sincformer_tpu.data import (synthetic_noise, synthetic_speech,
                                     synthetic_speech_varied)
    rng = np.random.default_rng(42)
    if speech_kind == "varied":
        clean = [synthetic_speech_varied(1.0 + rng.random(), seed=1000 + i)
                 * (0.6 + 0.8 * rng.random()) for i in range(n)]
    else:
        clean = [synthetic_speech(1.0 + rng.random())
                 * (0.6 + 0.8 * rng.random()) for _ in range(n)]
    fs = cfg.DEFAULT.audio.sample_rate
    if noise_kind == "multi":
        from sincformer_tpu.data.synthetic import synthetic_noise_bank
        noises = synthetic_noise_bank(fs * 30, seed=7)
    else:
        noises = {"white": synthetic_noise(fs * 30, seed=7)}
    return clean, noises


def train(args):
    """Train on TIMIT + NOISEX-92 (reference main.py:176-212), or on a
    synthetic corpus with --synthetic N (no datasets needed)."""
    pipeline_type = getattr(args, "pipeline", "dnn")
    synthetic_n = getattr(args, "synthetic", 0)
    noise_kind = getattr(args, "synth_noises", "white") or "white"
    speech_kind = getattr(args, "synth_speech", "formant") or "formant"
    seed = getattr(args, "seed", None) or 0
    log_path = getattr(args, "log_jsonl", None)
    logger = None
    if log_path:
        from sincformer_tpu.utils.observability import MetricsLogger
        logger = MetricsLogger(log_path)

    if pipeline_type in ("conformer", "dcse"):
        from sincformer_tpu.train.dcse_trainer import DCSEPipeline
        print("=" * 70)
        print("  Speech Enhancement — DCSE Conformer Training (TPU)")
        print("=" * 70)
        pipe = DCSEPipeline(seed=seed, logger=logger)
        if synthetic_n:
            from sincformer_tpu.data.loader import (WaveformDataset,
                                                    heldout_noises)
            clean, noises = _synthetic_corpus(synthetic_n, noise_kind,
                                              speech_kind)
            split = max(1, int(0.9 * len(clean)))
            train_ds = WaveformDataset.from_arrays(clean[:split], noises)
            # val mixes with held-out noise crops (loader.heldout_noises)
            test_ds = WaveformDataset.from_arrays(clean[split:],
                                                  heldout_noises(noises))
        else:
            train_ds, test_ds = pipe.prepare_data(max_train=args.max_train,
                                                  max_test=args.max_test)
        pipe.train(train_ds, test_ds, epochs=args.epochs,
                   resume=getattr(args, "resume", False))
        pipe.save_model()
    elif pipeline_type == "agents":
        from sincformer_tpu import config as cfg
        from sincformer_tpu.data import load_audio
        from sincformer_tpu.data.loader import (find_speech_files,
                                                load_noise_signals,
                                                train_test_split)
        from sincformer_tpu.train.agent_trainer import SincformerPipeline
        print("=" * 70)
        print("  Speech Enhancement — Sincformer Metacog Training (TPU)")
        print("=" * 70)
        fs = cfg.DEFAULT.audio.sample_rate
        if synthetic_n:
            clean, noises = _synthetic_corpus(synthetic_n, noise_kind,
                                              speech_kind)
            split = max(1, int(0.9 * len(clean)))
            clean_tr, clean_te = clean[:split], clean[split:]
        else:
            files = find_speech_files()
            if not files:
                raise RuntimeError(
                    f"No speech files in {cfg.DEFAULT.data.timit_dir}")
            tr_files, te_files = train_test_split(files,
                                                  max_train=args.max_train,
                                                  max_test=args.max_test)
            clean_tr = [load_audio(f, fs) for f in tr_files]
            clean_te = [load_audio(f, fs) for f in te_files]
            noises = load_noise_signals(fs)
        from sincformer_tpu.train.agent_trainer import default_metacog
        model = default_metacog(cpea_impl=getattr(args, "cpea", "lstm"),
                                pa_impl=getattr(args, "pa", None)
                                or cfg.DEFAULT.agents.pa_impl)
        pipe = SincformerPipeline(
            model=model, seed=seed, logger=logger,
            use_adversarial=getattr(args, "adversarial", False))
        pipe.train(clean_tr, clean_te, noises, epochs=args.epochs,
                   resume=getattr(args, "resume", False))
        pipe.save_model()
    else:
        from sincformer_tpu.train.dnn_trainer import DNNPipeline
        print("=" * 70)
        print("  Speech Enhancement — DNN Training (TPU)")
        print("=" * 70)
        pipe = DNNPipeline(mask_type=args.mask_type, seed=seed,
                           logger=logger,
                           use_rbm_pretrain=not args.no_rbm)
        if synthetic_n:
            from sincformer_tpu.data.loader import load_noise_signals
            clean, noises = _synthetic_corpus(synthetic_n, noise_kind,
                                              speech_kind)
            train_ds, test_ds = pipe.prepare_arrays(clean, noises)
        else:
            train_ds, test_ds = pipe.prepare_data(max_train=args.max_train,
                                                  max_test=args.max_test)
        pipe.train(train_ds, test_ds, epochs=args.epochs,
                   resume=getattr(args, "resume", False))
        pipe.save_model()

    print("\nTraining complete!")


def evaluate(args):
    """Full grid evaluation (reference main.py:215-442), extended with CSII
    and NCM, with the enhancement calls batched on device.

    Scale-out:
      --mesh         shard the metric sweep over all local devices;
      --distributed  multi-host: (noise × SNR) cells are dealt round-robin
                     to processes. Launch one process per host with
                     JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
                     JAX_PROCESS_ID set (parallel.distributed
                     .init_distributed), e.g.
                       JAX_COORDINATOR_ADDRESS=host0:1234 \\
                       JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=0 \\
                       python -m sincformer_tpu.cli evaluate --distributed
    """
    from sincformer_tpu import config as cfg
    from sincformer_tpu.evaluation.grid import run_grid_evaluation

    # --ckpt best → prefer the early-stopped best-val checkpoints for
    # every pipeline load in this process (train.state.inference_ckpt_order)
    os.environ["SINCFORMER_CKPT_PREF"] = getattr(args, "ckpt", "final")
    run_grid_evaluation(max_eval=getattr(args, "max_eval", 50),
                        model_dir=cfg.DEFAULT.data.model_dir,
                        distributed=getattr(args, "distributed", False),
                        use_mesh=getattr(args, "mesh", False),
                        synth_noises=getattr(args, "synth_noises", "white"),
                        synth_speech=getattr(args, "synth_speech",
                                             "formant"),
                        json_out=getattr(args, "json_out", None))


def enhance(args):
    """Enhance a WAV file with the best available trained model (long-form
    audio handled by the streaming chunker). New over the reference, which
    has no file-level enhancement entry point."""
    from scipy.io import wavfile

    from sincformer_tpu import config as cfg
    from sincformer_tpu.data import load_audio
    from sincformer_tpu.evaluation.grid import discover_pipelines
    from sincformer_tpu.serve import StreamingEnhancer

    fs = cfg.DEFAULT.audio.sample_rate
    # preference order: flagship > DCSE > DNN masks; load ONLY the first
    # available (model init is expensive on a remote TPU)
    prefer = getattr(args, "model", None)
    order = ([prefer] if prefer else
             ["sincformer", "conformer", "pcirm", "opt_pcirm", "irm"])
    pipe = name = None
    for cand in order:
        found = discover_pipelines(cfg.DEFAULT.data.model_dir,
                                   names=[cand])
        if cand in found:
            name, pipe = cand, found[cand]
            break
    if pipe is None:
        print("  No trained models found — train one first.")
        return
    print(f"  Using model: {name}")

    inputs = (args.input if isinstance(args.input, (list, tuple))
              else [args.input])
    pcm16 = bool(getattr(args, "pcm16", False))

    if getattr(args, "online", False):
        # causal low-latency mode: simulate live arrival in 20 ms chunks
        # through serve.OnlineEnhancer (bounded 50 ms algorithmic latency).
        # Multiple inputs run as CONCURRENT live streams through
        # serve.OnlineEnhancerPool — one batched device call advances all
        # of them one chunk (the production many-callers serving shape).
        from sincformer_tpu.serve import OnlineEnhancer, OnlineEnhancerPool

        def _toout(x):
            return (StreamingEnhancer._quantize_host(x) if pcm16
                    else np.clip(x, -1.0, 1.0).astype(np.float32))
        if len(inputs) == 1:
            noisy = load_audio(inputs[0], fs)
            oe = OnlineEnhancer(pipe)
            print(f"  Online mode: {oe.latency_samples / fs * 1000:.0f} ms "
                  f"algorithmic latency, {oe.chunk / fs * 1000:.0f} ms "
                  f"chunks")
            t0 = time.time()
            parts = [oe.push(noisy[i:i + oe.chunk])
                     for i in range(0, len(noisy), oe.chunk)]
            parts.append(oe.flush())
            enhanced = np.concatenate(parts)
            dt = time.time() - t0
            wavfile.write(args.output, fs, _toout(enhanced))
            print(f"  Enhanced → {args.output}  ({dt:.2f}s wall, "
                  f"{len(noisy) / fs / max(dt, 1e-9):.1f}x realtime)")
            return
        signals = [load_audio(p, fs) for p in inputs]
        pool = OnlineEnhancerPool(pipe, n_streams=len(signals))
        total_s = sum(len(s) for s in signals) / fs
        print(f"  Online pool: {len(signals)} concurrent streams, "
              f"{pool.latency_samples / fs * 1000:.0f} ms algorithmic "
              f"latency, one device call per {pool.chunk / fs * 1000:.0f} "
              f"ms step")
        os.makedirs(args.output, exist_ok=True)
        t0 = time.time()
        pos, n = [0] * len(signals), pool.chunk
        while any(p < len(s) for p, s in zip(pos, signals)):
            for i, s in enumerate(signals):       # live lockstep arrival
                if pos[i] < len(s):
                    pool.push(i, s[pos[i]:pos[i] + n])
                    pos[i] += n
            pool.step()
        outs = [np.concatenate([pool.take(i), pool.flush(i)])
                for i in range(len(signals))]
        dt = time.time() - t0
        for path, out in zip(inputs, outs):
            wavfile.write(os.path.join(args.output,
                                       os.path.basename(path)),
                          fs, _toout(out))
        print(f"  Enhanced {len(inputs)} streams → {args.output}/  "
              f"({dt:.2f}s wall, {total_s / max(dt, 1e-9):.1f}x realtime "
              f"aggregate)")
        return

    se = StreamingEnhancer(pipe)

    def _towav(x):
        if x.dtype == np.int16:        # quantized on device (serve.py)
            return x
        if pcm16:
            # same quantizer as the device path (signal.float_to_pcm
            # convention: ×32768, clip, round-to-nearest) so --pcm16
            # output is bit-identical whichever path produced the floats
            return StreamingEnhancer._quantize_host(x)
        return np.clip(x, -1.0, 1.0).astype(np.float32)
    if len(inputs) == 1:
        noisy = load_audio(inputs[0], fs)
        print(f"  Input: {inputs[0]} ({len(noisy) / fs:.2f}s @ {fs} Hz)")
        t0 = time.time()
        # --pcm16 quantizes ON DEVICE on the long-form path: the enhanced
        # audio crosses the tunnel as int16 (half the download bytes)
        enhanced = se.enhance(noisy, pcm16_out=pcm16)
        dt = time.time() - t0
        wavfile.write(args.output, fs, _towav(enhanced))
        print(f"  Enhanced → {args.output}  ({dt:.2f}s wall, "
              f"{len(noisy) / fs / max(dt, 1e-9):.1f}x realtime)")
        return

    # multi-file: same-length groups share one batched device call
    os.makedirs(args.output, exist_ok=True)
    signals = [load_audio(p, fs) for p in inputs]
    total_s = sum(len(s) for s in signals) / fs
    print(f"  Inputs: {len(inputs)} files, {total_s:.2f}s total")
    t0 = time.time()
    outs = se.enhance_many(signals)
    dt = time.time() - t0
    # de-duplicate output names: two inputs with the same basename in
    # different directories must not silently overwrite each other
    names, seen = [], {}
    for path in inputs:
        base = os.path.basename(path)
        if base in seen:
            seen[base] += 1
            stem, ext = os.path.splitext(base)
            base = f"{stem}_{seen[base]}{ext}"
        else:
            seen[base] = 0
        names.append(base)
    for base, out in zip(names, outs):
        dest = os.path.join(args.output, base)
        wavfile.write(dest, fs, _towav(out))
    print(f"  Enhanced {len(inputs)} files → {args.output}/  "
          f"({dt:.2f}s wall, {total_s / max(dt, 1e-9):.1f}x realtime)")


def calibrate(args):
    """Post-hoc output-gain calibration of an already-trained checkpoint.

    The SI-SNR-dominated training losses leave the models' absolute output
    level only weakly anchored, and it drifts with long training (measured:
    2.2 dB SSNR on the 150-epoch run — scripts/probe_gain_drift.py). New
    training runs self-calibrate every epoch; this command retrofits the
    persisted ``output_gain`` onto checkpoints saved before the feature (or
    after data drift) by fitting the scalar on a held-out mixture set —
    the TIMIT val split when datasets exist, the synthetic corpus's val
    tail otherwise."""
    import numpy as np

    from sincformer_tpu import config as cfg
    from sincformer_tpu.data import load_audio
    from sincformer_tpu.data.loader import (find_speech_files,
                                            heldout_noises,
                                            load_noise_signals,
                                            train_test_split)

    fs = cfg.DEFAULT.audio.sample_rate
    files = find_speech_files()
    if files and not getattr(args, "synthetic", False):
        # TIMIT val split, mixed with held-out noise crops — the gain must
        # be fitted under deployment-like conditions, never on the training
        # noise realization the model has memorized (loader.heldout_noises)
        _, te_files = train_test_split(files, max_test=args.samples)
        clean = [load_audio(f, fs) for f in te_files]
        # RAW noise bank: calibrate_gain applies loader.heldout_noises
        # itself — rolling here too would roll by 2·(len//2) = len (the
        # identity for even lengths), i.e. fit the gain on the exact
        # training crops the rotation exists to avoid
        noises = load_noise_signals(fs)
        print(f"  Calibration set: {len(clean)} TIMIT val utterances "
              f"(held-out noise crops)")
    else:
        # synthetic: grid-eval-protocol utterances under a seed disjoint
        # from both the training corpus (seed 42/7) and the grid's own
        # eval draw, mixed with a fresh noise realization
        from sincformer_tpu.data.synthetic import synthetic_speech
        rng = np.random.default_rng(cfg.DEFAULT.data.eval_sample_seed + 1)
        clean = [synthetic_speech(2.0) * (0.7 + 0.6 * rng.random())
                 for _ in range(args.samples)]
        noises = {"white": (rng.standard_normal(fs * 30) * 0.3
                            ).astype(np.float32)}
        print(f"  Calibration set: {len(clean)} synthetic utterances "
              f"(fresh noise realization)")

    which = getattr(args, "model", "sincformer")
    if which == "sincformer":
        from sincformer_tpu.train.agent_trainer import SincformerPipeline
        pipe = SincformerPipeline()
        pipe.load_model()
        before = pipe.output_gain
        after = pipe.calibrate_gain(clean, noises)
    else:
        from sincformer_tpu.data.loader import WaveformDataset
        from sincformer_tpu.train.dcse_trainer import DCSEPipeline
        pipe = DCSEPipeline()
        pipe.load_model()
        before = pipe.output_gain
        # DCSE's calibrate_gain takes an already-MIXED dataset, so the
        # held-out rotation happens here (exactly once)
        ds = WaveformDataset.from_arrays(clean, heldout_noises(noises))
        after = pipe.calibrate_gain(ds)
    print(f"  Output gain: {before:.4f} → {after:.4f} "
          f"(persisted in the checkpoint sidecar)")


def export(args):
    """Export a trained checkpoint family as a compact int8 SERVING
    artifact (train/state.py::save_checkpoint_quantized: per-channel
    int8 with stochastic rounding, no optimizer state, ~4× smaller;
    restored transparently by every inference path).

    The exported directory is a drop-in model dir: point
    ``SINCFORMER_MODEL_DIR`` at it and ``evaluate`` / ``enhance`` load
    it like any trained checkpoint — variant autodetect (CPEA/PA impls)
    and the output-gain sidecar both carry over. Exists so a trained
    model can be committed to the repo as durable evidence: the full
    training checkpoints (opt state, f32) are GBs and machine-local,
    the serving artifact is MBs. (Reference has no deployment-artifact
    path at all — its torch .pth saves are training state.)"""
    os.environ["SINCFORMER_CKPT_PREF"] = getattr(args, "ckpt", "best")
    which = getattr(args, "model", "sincformer")
    if which == "sincformer":
        from sincformer_tpu.train.agent_trainer import SincformerPipeline
        pipe, name = SincformerPipeline(), "sincformer_final"
    elif which == "conformer":
        from sincformer_tpu.train.dcse_trainer import DCSEPipeline
        pipe, name = DCSEPipeline(), "conformer_final"
    else:
        from sincformer_tpu.train.dnn_trainer import DNNPipeline
        pipe = DNNPipeline(mask_type=args.mask_type)
        name = f"dnn_{args.mask_type}_final"
    src = pipe.load_model()
    src_fam = os.path.dirname(os.path.abspath(src))
    out_dir = args.out or (pipe.model_dir.rstrip("/\\") + "_serving")
    os.makedirs(out_dir, exist_ok=True)
    # write under the FINAL family name whatever the source was, so the
    # exported dir is loadable with no flags; the sidecar records the
    # true provenance
    pipe.model_dir = out_dir
    path = pipe.save_model(name=name, quantize=True)
    from sincformer_tpu.train.state import merge_train_meta
    merge_train_meta(out_dir, name, {
        "exported_from": os.path.abspath(src),
        "source_step": int(pipe.state.step),
        "source_ckpt_pref": os.environ["SINCFORMER_CKPT_PREF"],
    })

    def _du(d):
        return sum(os.path.getsize(os.path.join(r, f))
                   for r, _, fs in os.walk(d) for f in fs) / 1e6
    print(f"  Source:   {src}  ({_du(src_fam):.1f} MB family)")
    print(f"  Exported: {path}  ({_du(out_dir):.1f} MB, int8 serving "
          f"artifact, output_gain={getattr(pipe, 'output_gain', 1.0):.4f})")
    print(f"  Load with: SINCFORMER_MODEL_DIR={out_dir}")


def info(args):
    """System/config info (reference main.py:445-471)."""
    import jax

    from sincformer_tpu import config as cfg

    acfg, dcfg = cfg.DEFAULT.audio, cfg.DEFAULT.dnn
    print("=" * 70)
    print("  Speech Enhancement System — Configuration (sincformer_tpu)")
    print("=" * 70)
    print(f"\n  Sample Rate:        {acfg.sample_rate} Hz")
    print(f"  Frame Size:         {acfg.frame_size} samples")
    print(f"  Hop Size:           {acfg.hop_size} samples")
    print(f"  GFTB Channels:      {cfg.DEFAULT.gammatone.num_channels}")
    print(f"  DNN Hidden Layers:  {dcfg.hidden_layers}")
    print(f"  DNN Hidden Units:   {dcfg.hidden_units}")
    print(f"  DNN Dropout:        {dcfg.dropout}")
    print(f"  PSO Particles:      {cfg.DEFAULT.pso.num_particles}")
    print(f"  PSO Max Iters:      {cfg.DEFAULT.pso.max_iter}")
    print(f"\n  JAX Version:        {jax.__version__}")
    print(f"  Backend:            {jax.default_backend()}")
    print(f"  Devices:            {jax.devices()}")
    print(f"\n  TIMIT Dir:          {cfg.DEFAULT.data.timit_dir}")
    print(f"  NOISEX Dir:         {cfg.DEFAULT.data.noisex_dir}")
    print(f"  TIMIT exists:       "
          f"{os.path.exists(cfg.DEFAULT.data.timit_dir)}")
    print(f"  NOISEX exists:      "
          f"{os.path.exists(cfg.DEFAULT.data.noisex_dir)}")


def build_parser():
    parser = argparse.ArgumentParser(
        prog="sincformer_tpu",
        description="TPU-native speech enhancement: PSO-DNN with "
                    "PCIRM/OPT-PCIRM, DCSE Conformer, Sincformer metacog")
    sub = parser.add_subparsers(dest="command")

    sub.add_parser("demo", help="Quick demo on synthetic data "
                                "(no datasets needed)")

    tp = sub.add_parser("train", help="Train on TIMIT + NOISEX-92")
    tp.add_argument("--pipeline", default="dnn",
                    choices=["dnn", "conformer", "dcse", "agents"],
                    help="dnn (original) | conformer/dcse | agents "
                         "(Sincformer metacog)")
    tp.add_argument("--mask-type", default="pcirm",
                    choices=["irm", "pcirm", "opt_pcirm"])
    tp.add_argument("--epochs", type=int, default=None)
    tp.add_argument("--max-train", type=int, default=100)
    tp.add_argument("--max-test", type=int, default=20)
    tp.add_argument("--pa", default=None, choices=["mxu", "reference"],
                    help="PerceptionAgent formulation (agents pipeline); "
                         "default follows config (mxu)")
    tp.add_argument("--cpea", default="lstm", choices=["lstm", "ssm"],
                    help="CPEA sequence mixer: 'lstm' (reference parity) or"
                         " 'ssm' (bidirectional LRU, ~16%% faster steps)")
    tp.add_argument("--resume", action="store_true",
                    help="agents/conformer pipelines: restore the newest "
                         "checkpoint (full train state) and continue from "
                         "the epoch after it was saved")
    tp.add_argument("--adversarial", action="store_true",
                    help="Enable the 3-scale adversarial loss in curriculum "
                         "stage 3 (agents pipeline only)")
    tp.add_argument("--no-rbm", action="store_true",
                    help="Skip RBM pre-training (DNN only)")
    tp.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="Train on N synthetic utterances (no datasets "
                         "needed)")
    tp.add_argument("--synth-noises", default="white",
                    choices=["white", "multi"], dest="synth_noises",
                    help="--synthetic noise bank: 'white' (historical "
                         "single-noise corpus) or 'multi' (the reference's "
                         "4-noise round-robin protocol, "
                         "training/pipeline.py:423-436, via the synthetic "
                         "NOISEX class stand-ins)")
    tp.add_argument("--synth-speech", default="formant",
                    choices=["formant", "varied"], dest="synth_speech",
                    help="--synthetic utterance generator: 'formant' (the "
                         "reference's one fixed demo pattern, main.py:51-63)"
                         " or 'varied' (per-utterance randomized f0/formant/"
                         "segment structure — the round-5 speech-diversity "
                         "probe)")
    tp.add_argument("--seed", type=int, default=0,
                    help="training seed (params/dropout/routing RNG)")
    tp.add_argument("--log-jsonl", default=None, metavar="PATH",
                    dest="log_jsonl",
                    help="write per-epoch structured metrics (JSONL) to "
                         "PATH — the committed run artifact")

    ep = sub.add_parser("evaluate", help="Full 5-metric grid evaluation")
    ep.add_argument("--max-eval", type=int, default=50)
    ep.add_argument("--mesh", action="store_true",
                    help="shard the metric sweep over all local devices")
    ep.add_argument("--distributed", action="store_true",
                    help="multi-host grid partition (JAX_COORDINATOR / "
                         "JAX_NUM_PROCESSES / JAX_PROCESS_ID env)")
    ep.add_argument("--synth-noises", default="white",
                    choices=["white", "multi"], dest="synth_noises",
                    help="no-NOISEX fallback: 'white' (recorded protocol) "
                         "or 'multi' (4-class synthetic bank matching the "
                         "reference's babble/white/factory1/destroyerengine "
                         "grid)")
    ep.add_argument("--synth-speech", default="formant",
                    choices=["formant", "varied"], dest="synth_speech",
                    help="no-TIMIT fallback utterances: 'formant' (recorded "
                         "protocol) or 'varied' (randomized per-utterance "
                         "speech — scores are NOT comparable across the two "
                         "corpora)")
    ep.add_argument("--ckpt", default="final", choices=["final", "best"],
                    help="checkpoint family to score: 'final' (completed "
                         "run — the recorded protocol) or 'best' (early-"
                         "stopped best-validation checkpoint)")
    ep.add_argument("--json-out", default=None, metavar="PATH",
                    dest="json_out",
                    help="dump every per-cell metric value + the grand "
                         "summary as JSON to PATH — the committed evidence "
                         "artifact for any table derived from this run")

    enp = sub.add_parser("enhance", help="Enhance WAV file(s)")
    enp.add_argument("input", nargs="+", help="Input WAV path(s)")
    enp.add_argument("output", help="Output WAV path (single input) or "
                                    "output directory (multiple inputs, "
                                    "batched on device)")
    enp.add_argument("--pcm16", action="store_true",
                     help="write 16-bit PCM WAV output (default: float32)")
    enp.add_argument("--online", action="store_true",
                     help="causal low-latency mode (50 ms bounded "
                          "algorithmic latency): audio is fed in 20 ms "
                          "chunks through the stateful online enhancer "
                          "instead of the batch long-form path; multiple "
                          "inputs run as concurrent live streams through "
                          "the batched online pool (one device call per "
                          "20 ms step for ALL streams)")
    enp.add_argument("--model", default=None,
                     choices=["sincformer", "conformer", "pcirm",
                              "opt_pcirm", "irm"],
                     help="Model to use (default: best available)")

    cp = sub.add_parser("calibrate",
                        help="Fit + persist the output-gain calibration "
                             "for a trained checkpoint")
    cp.add_argument("--model", default="sincformer",
                    choices=["sincformer", "conformer"])
    cp.add_argument("--samples", type=int, default=8,
                    help="held-out utterances to fit the gain on")
    cp.add_argument("--synthetic", action="store_true",
                    help="force the synthetic corpus even if TIMIT exists")

    xp = sub.add_parser("export",
                        help="Export a trained checkpoint as a compact "
                             "int8 serving artifact (drop-in model dir)")
    xp.add_argument("--model", default="sincformer",
                    choices=["sincformer", "conformer", "dnn"])
    xp.add_argument("--mask-type", default="pcirm",
                    choices=["irm", "pcirm", "opt_pcirm"],
                    help="mask head of the DNN checkpoint (--model dnn)")
    xp.add_argument("--ckpt", default="best", choices=["final", "best"],
                    help="checkpoint family to export (default: the "
                         "early-stopped best-validation checkpoint — the "
                         "deployment-correct choice)")
    xp.add_argument("--out", default=None, metavar="DIR",
                    help="output model dir (default: "
                         "<SINCFORMER_MODEL_DIR>_serving)")

    sub.add_parser("info", help="Print system configuration")
    # the `test` alias the reference's usage string promises (main.py:6)
    tstp = sub.add_parser("test", help="Alias for evaluate")
    tstp.add_argument("--max-eval", type=int, default=50)

    return parser


def main(argv=None):
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.command == "demo":
        demo(args)
    elif args.command == "train":
        train(args)
    elif args.command in ("evaluate", "test"):
        evaluate(args)
    elif args.command == "enhance":
        enhance(args)
    elif args.command == "calibrate":
        calibrate(args)
    elif args.command == "export":
        export(args)
    elif args.command == "info":
        info(args)
    else:
        parser.print_help()


if __name__ == "__main__":
    main()
