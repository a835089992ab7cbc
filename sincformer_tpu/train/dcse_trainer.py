"""DCSE training/inference pipeline — the wired `--pipeline conformer` path.

Capability-parity with the reference ``ConformerPipeline``
(``training/conformer_pipeline.py:308-685``): AdamW(5e-4, β=(0.9,0.98),
wd=0.01), 5-epoch linear warmup + cosine to 1%, grad-clip 5.0, NaN-skip
batches, best-by-val-loss checkpointing, SI-SNR + 0.5·L1-mag + MR-STFT loss.

TPU-first structure: STFT, model, iSTFT and all three losses live inside ONE
jitted train step (the reference round-trips tensors between host STFT calls
and the model); optional data-parallel execution over a ``Mesh`` by sharding
the batch axis — XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sincformer_tpu import config as cfg
from sincformer_tpu.data.loader import (WaveformDataset, batch_iterator,
                                        find_speech_files,
                                        load_noise_signals, train_test_split)
from sincformer_tpu.dsp.stft import istft, stft
from sincformer_tpu.models.dcse import SpeechEnhancer, default_speech_enhancer
from sincformer_tpu.parallel.mesh import make_mesh, shard_batch
from sincformer_tpu.train.losses import (multi_resolution_stft_loss,
                                         si_snr_loss)
from sincformer_tpu.train.state import (TrainState, guard_nan_update,
                                        inference_ckpt_order,
                                        latest_step_dir, make_adamw,
                                        VAL_PROTOCOL, merge_train_meta,
                                        newest_checkpoint, read_train_meta,
                                        restore_checkpoint,
                                        resolve_output_gain as
                                        _resolve_output_gain,
                                        save_checkpoint)


class DCSEPipeline:
    """Train / infer the DCSE SpeechEnhancer end-to-end on device."""

    def __init__(self, dcfg: cfg.DCSEConfig = cfg.DEFAULT.dcse,
                 acfg: cfg.AudioConfig = cfg.DEFAULT.audio,
                 mesh=None, model: Optional[SpeechEnhancer] = None,
                 model_dir: str | None = None, seed: int = 0,
                 logger=None, compute_dtype=None):
        self.dcfg = dcfg
        self.acfg = acfg
        self.fs = acfg.sample_rate
        self.mesh = mesh
        self.model = model or default_speech_enhancer(dcfg, acfg)
        self.model_dir = model_dir or cfg.DEFAULT.data.model_dir
        self.seed = seed
        self.logger = logger          # utils.observability.MetricsLogger
        # bf16 mixed precision: f32 master weights + optimizer state, model
        # compute in bf16, losses/STFT in f32 (SURVEY.md §2 mixed-precision
        # parity item — the reference uses CUDA AMP, pipeline.py:655-669)
        self.compute_dtype = compute_dtype
        self.state: Optional[TrainState] = None
        self._enhance_jit = {}
        # val-calibrated output gain (SI-SNR leaves output level only weakly
        # anchored; see agent_trainer.SincformerPipeline.output_gain)
        self.output_gain = 1.0
        self._loaded_ckpt_path: str | None = None
        os.makedirs(self.model_dir, exist_ok=True)

    # ── data ────────────────────────────────────────────────────────────

    def prepare_data(self, max_train: int | None = None,
                     max_test: int | None = None
                     ) -> Tuple[WaveformDataset, WaveformDataset]:
        """TIMIT discovery → seed-42 split → round-robin noise×SNR mixing
        (reference conformer_pipeline.py:371-399)."""
        files = find_speech_files()
        if not files:
            raise RuntimeError(
                f"No speech files in {cfg.DEFAULT.data.timit_dir}")
        train_files, test_files = train_test_split(
            files, max_train=max_train, max_test=max_test)
        noises = load_noise_signals(self.fs)
        train_ds = WaveformDataset.from_files(train_files, noises,
                                              fs=self.fs)
        # held-out noise crops for val: training always mixes noise[:len]
        # (reference parity) and the model memorizes that realization
        # (data.loader.heldout_noises)
        from sincformer_tpu.data.loader import heldout_noises
        test_ds = WaveformDataset.from_files(test_files,
                                             heldout_noises(noises),
                                             fs=self.fs)
        return train_ds, test_ds

    # ── core steps ──────────────────────────────────────────────────────

    def _loss_fn(self, params, model_state, noisy, clean, rng, train: bool):
        """model_state carries mutable collections (batch_stats when
        conv_norm='batch'); returns
        (total, (neg_sisnr, new_model_state, enh_wav))."""
        n_fft, hop, frame = (self.acfg.fft_size, self.acfg.hop_size,
                             self.acfg.frame_size)
        noisy_spec = stft(noisy, n_fft, hop, frame)
        clean_spec = stft(clean, n_fft, hop, frame)
        kwargs = {}
        if train:
            kwargs = {"rngs": {"dropout": rng}}
        re, im = noisy_spec.real, noisy_spec.imag
        apply_params = params
        if self.compute_dtype is not None:
            re = re.astype(self.compute_dtype)
            im = im.astype(self.compute_dtype)
            apply_params = jax.tree.map(
                lambda x: x.astype(self.compute_dtype), params)
        variables = {"params": apply_params, **(model_state or {})}
        new_model_state = model_state
        if train and model_state:
            (enh_r, enh_i, _mask), new_model_state = self.model.apply(
                variables, re, im, deterministic=False,
                mutable=list(model_state.keys()), **kwargs)
            new_model_state = dict(new_model_state)
        else:
            enh_r, enh_i, _mask = self.model.apply(
                variables, re, im, deterministic=not train, **kwargs)
        enh_r = enh_r.astype(jnp.float32)
        enh_i = enh_i.astype(jnp.float32)
        enh_wav = istft(enh_r + 1j * enh_i, n_fft, hop, frame,
                        length=clean.shape[-1])
        loss_sisnr = si_snr_loss(enh_wav, clean)
        enh_mag = jnp.sqrt(enh_r ** 2 + enh_i ** 2 + 1e-8)
        clean_mag = jnp.sqrt(clean_spec.real ** 2
                             + clean_spec.imag ** 2 + 1e-8)
        loss_mag = jnp.mean(jnp.abs(enh_mag - clean_mag))
        loss_stft = multi_resolution_stft_loss(enh_wav, clean)
        total = (loss_sisnr + self.dcfg.mag_loss_weight * loss_mag
                 + loss_stft)
        return total, (loss_sisnr, new_model_state, enh_wav)

    def init_state(self, epochs: int, steps_per_epoch: int,
                   example_len: int | None = None) -> TrainState:
        example_len = example_len or int(self.fs
                                         * cfg.DEFAULT.data.max_wave_seconds)
        spec = stft(jnp.zeros((1, example_len)), self.acfg.fft_size,
                    self.acfg.hop_size, self.acfg.frame_size)
        variables = self.model.init(jax.random.PRNGKey(self.seed),
                                    spec.real, spec.imag)
        variables = dict(variables)
        params = variables.pop("params")
        model_state = variables or None  # e.g. {"batch_stats": ...}
        tx = make_adamw(self.dcfg.lr, epochs, steps_per_epoch,
                        self.dcfg.betas, self.dcfg.weight_decay,
                        self.dcfg.grad_clip)
        self.state = TrainState.create(apply_fn=self.model.apply,
                                       params=params, tx=tx,
                                       model_state=model_state,
                                       nan_count=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            from sincformer_tpu.parallel.sharding import shard_state_params
            self.state = shard_state_params(self.state, self.mesh)
        return self.state

    def _make_train_step(self):
        import functools
        loss_fn = self._loss_fn

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, noisy, clean, rng):
            (loss, (neg_sisnr, new_ms, _)), grads = jax.value_and_grad(
                lambda p: loss_fn(p, state.model_state, noisy, clean, rng,
                                  True),
                has_aux=True)(state.params)
            grads, is_bad = guard_nan_update(grads, loss)
            new_state = state.apply_gradients(grads=grads)
            new_state = new_state.replace(
                model_state=new_ms,
                nan_count=state.nan_count + is_bad.astype(jnp.int32))
            return new_state, loss, -neg_sisnr

        return train_step

    def _make_eval_step(self):
        loss_fn = self._loss_fn

        @jax.jit
        def eval_step(params, model_state, noisy, clean, lengths):
            loss, (neg_sisnr, _, enh) = loss_fn(params, model_state, noisy,
                                                clean, jax.random.PRNGKey(0),
                                                False)
            # per-utterance oracle gain over TRUE samples only, degenerate
            # utterances excluded, (sum, count) returned for a single
            # geometric mean across batches (see agent_trainer eval step:
            # SI-SNR leaves output level under-constrained)
            m = (jnp.arange(clean.shape[-1])[None, :]
                 < lengths[:, None]).astype(clean.dtype)
            alpha = (jnp.sum(clean * enh * m, -1)
                     / (jnp.sum(enh * enh * m, -1) + 1e-12))
            valid = jnp.isfinite(alpha) & (alpha > 1e-3) & (alpha < 1e3)
            lg_sum = jnp.sum(jnp.where(
                valid, jnp.log(jnp.clip(alpha, 1e-12)), 0.0))
            return loss, -neg_sisnr, lg_sum, jnp.sum(valid)

        return eval_step

    # ── training loop ───────────────────────────────────────────────────

    def train(self, train_ds: WaveformDataset, test_ds: WaveformDataset,
              epochs: int | None = None, batch_size: int | None = None,
              verbose: bool = True, bucketed: bool = False,
              resume: bool = False):
        """Full training run with best-model checkpointing.

        ``resume=True``: restore the newest checkpoint (full train state —
        params + optimizer + step) and continue from the epoch after it
        was saved; best_val is seeded from the restored model's val loss
        (same mechanism as SincformerPipeline.train)."""
        epochs = epochs or self.dcfg.epochs
        batch_size = batch_size or self.dcfg.batch_size
        steps_per_epoch = max(1, len(train_ds) // batch_size)

        start_epoch = 0
        resume_path = None
        if resume:
            # MAX step across final AND best (see agent_trainer.train)
            resume_path = newest_checkpoint(
                self.model_dir, ("conformer_final", "best_conformer"))
            if resume_path is None and verbose:
                print("  resume requested but no checkpoint found — "
                      "starting fresh")
        if resume_path is not None:
            if self.state is None:
                self.init_state(epochs, steps_per_epoch,
                                example_len=train_ds.max_len)
            self.state = restore_checkpoint(resume_path, self.state)
            start_epoch = min(int(self.state.step) // steps_per_epoch,
                              epochs)
            if verbose:
                print(f"  Resuming from {resume_path} at step "
                      f"{int(self.state.step)} → epoch "
                      f"{start_epoch + 1}/{epochs}")
        if self.state is None:
            self.init_state(epochs, steps_per_epoch,
                            example_len=train_ds.max_len)
        train_step = self._make_train_step()
        eval_step = self._make_eval_step()
        key = jax.random.PRNGKey(self.seed + 1)

        best_val = float("inf")
        if resume_path is not None and start_epoch > 0:
            meta = read_train_meta(self.model_dir, "best_conformer")
            # val_protocol guard: best_val from an older val-mixing
            # protocol isn't comparable — re-evaluate instead
            if (meta and np.isfinite(meta.get("best_val", np.inf))
                    and meta.get("val_protocol") == VAL_PROTOCOL):
                best_val = float(meta["best_val"])
            else:
                v = [eval_step(self.state.params, self.state.model_state,
                               jnp.asarray(b["noisy"]),
                               jnp.asarray(b["clean"]),
                               jnp.asarray(b["lengths"]))[0]
                     for b in batch_iterator(test_ds, batch_size,
                                             shuffle=False, drop_last=False,
                                             bucketed=bucketed)]
                v = [float(x) for x in v]          # one sync point
                finite = [x for x in v if np.isfinite(x)]
                if finite:
                    best_val = float(np.mean(finite))
        history = []
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            # accumulate losses as device scalars — syncing float(loss)
            # every step serialises the loop on the host (severe through a
            # remote TPU tunnel); one sync per epoch instead
            losses, sisnrs = [], []
            for batch in batch_iterator(train_ds, batch_size, shuffle=True,
                                        seed=self.seed, epoch=epoch,
                                        bucketed=bucketed):
                key, sub = jax.random.split(key)
                noisy = jnp.asarray(batch["noisy"])
                clean = jnp.asarray(batch["clean"])
                if self.mesh is not None:
                    sharded = shard_batch(self.mesh,
                                          {"noisy": noisy, "clean": clean})
                    noisy, clean = sharded["noisy"], sharded["clean"]
                self.state, loss, sisnr = train_step(self.state, noisy,
                                                     clean, sub)
                losses.append(loss)
                sisnrs.append(sisnr)
            n_b = len(losses)
            tr_loss = float(sum(losses) / n_b) if n_b else 0.0
            tr_sisnr = float(sum(sisnrs) / n_b) if n_b else 0.0

            v_losses, v_sisnrs, v_lgs, v_lgc = [], [], [], []
            for batch in batch_iterator(test_ds, batch_size, shuffle=False,
                                        drop_last=False, bucketed=bucketed):
                loss, sisnr, lg_sum, lg_cnt = eval_step(
                    self.state.params, self.state.model_state,
                    jnp.asarray(batch["noisy"]),
                    jnp.asarray(batch["clean"]),
                    jnp.asarray(batch["lengths"]))
                v_losses.append(loss)
                v_sisnrs.append(sisnr)
                v_lgs.append(lg_sum)
                v_lgc.append(lg_cnt)
            finite = [i for i in range(len(v_losses))
                      if np.isfinite(float(v_losses[i]))]
            # all-NaN validation → inf, never a fake 0.0 "improvement"
            # (round-4 review; a diverged model must not take the best slot)
            va_loss = (float(np.mean([float(v_losses[i]) for i in finite]))
                       if finite else float("inf"))
            va_sisnr = (float(np.mean([float(v_sisnrs[i]) for i in finite]))
                        if finite else 0.0)

            # single geometric mean over all valid val utterances
            lg_n = sum(int(v_lgc[i]) for i in finite
                       if np.isfinite(float(v_lgs[i])))
            if lg_n > 0:
                lg_tot = sum(float(v_lgs[i]) for i in finite
                             if np.isfinite(float(v_lgs[i])))
                self.output_gain = float(np.exp(lg_tot / lg_n))
                self._enhance_jit.clear()

            improved = va_loss < best_val
            if improved:
                best_val = va_loss
                self.save_model("best_conformer")
                merge_train_meta(self.model_dir, "best_conformer",
                                 {"best_val": va_loss, "epoch": epoch,
                                  "step": int(self.state.step),
                                  "val_protocol": VAL_PROTOCOL})
            entry = {"epoch": epoch, "train_loss": tr_loss,
                     "val_loss": va_loss, "val_sisnr": va_sisnr,
                     "nan_count": int(self.state.nan_count),
                     "epoch_seconds": time.time() - t0}
            history.append(entry)
            if self.logger is not None:
                self.logger.log({"pipeline": "dcse", **entry})
            if verbose:
                print(f"  Epoch {epoch + 1:3d}/{epochs} | "
                      f"Train: {tr_loss:.4f} (SI-SNR: {tr_sisnr:+.2f}) | "
                      f"Val: {va_loss:.4f} (SI-SNR: {va_sisnr:+.2f}) | "
                      f"{time.time() - t0:.1f}s {'*' if improved else ''}")
        if verbose:
            print(f"\n  Best validation loss: {best_val:.4f}")
        return history

    # ── model I/O ───────────────────────────────────────────────────────

    def save_model(self, name: str = "conformer_final",
                   quantize: bool = False):
        """``quantize=True`` writes an int8 serving checkpoint (~4× smaller,
        dequantized transparently on load; no optimizer state)."""
        if self.state is None:
            return
        if quantize:
            from sincformer_tpu.train.state import save_checkpoint_quantized
            path = save_checkpoint_quantized(
                os.path.join(self.model_dir, name), self.state,
                step=int(self.state.step))
        else:
            path = save_checkpoint(os.path.join(self.model_dir, name),
                                   self.state, step=int(self.state.step))
        merge_train_meta(self.model_dir, name,
                         {"output_gain": float(self.output_gain)})
        return path

    def load_model(self, path: str | None = None):
        """Restore params (full state) from an Orbax checkpoint dir."""
        if path is None:
            for name in inference_ckpt_order("conformer_final",
                                             "best_conformer"):
                path = latest_step_dir(os.path.join(self.model_dir, name))
                if path:
                    break
        if path is None:
            raise FileNotFoundError("no conformer checkpoint found")
        if self.state is None:
            self.init_state(epochs=1, steps_per_epoch=1)
        self.state = restore_checkpoint(path, self.state)
        self._loaded_ckpt_path = path
        self.output_gain = _resolve_output_gain(path)
        self._enhance_jit.clear()
        return path

    def calibrate_gain(self, ds, batch_size: int = 8,
                       persist: bool = True) -> float:
        """Post-hoc output-gain calibration against a (noisy, clean)
        WaveformDataset — see SincformerPipeline.calibrate_gain. The
        dataset must be mixed with held-out noise (loader.heldout_noises),
        never the training noise realization the model memorized."""
        if self.state is None:
            raise RuntimeError("No model loaded.")
        logs = []
        for batch in batch_iterator(ds, batch_size, shuffle=False,
                                    drop_last=False):
            enh = self.enhance_batch(batch["noisy"].astype(np.float32))
            for i, n in enumerate(batch["lengths"]):
                e, c = enh[i, :n], batch["clean"][i, :n]
                alpha = float(np.dot(c, e) / (np.dot(e, e) + 1e-12))
                if np.isfinite(alpha) and 1e-3 < alpha < 1e3:
                    logs.append(np.log(alpha))
        if not logs:
            return float(self.output_gain)
        self.output_gain = float(self.output_gain * np.exp(np.mean(logs)))
        self._enhance_jit.clear()
        if persist and self._loaded_ckpt_path is not None:
            fam = os.path.dirname(os.path.abspath(self._loaded_ckpt_path))
            merge_train_meta(os.path.dirname(fam), os.path.basename(fam),
                             {"output_gain": float(self.output_gain)})
        return float(self.output_gain)

    @classmethod
    def from_torch_checkpoint(cls, path: str, model_dir: str | None = None,
                              allow_pickle: bool = False,
                              **model_overrides) -> "DCSEPipeline":
        """Inference-ready pipeline from a reference PyTorch checkpoint
        (conformer_final.pt / best_conformer.pt) via compat/torch_import.
        The model is built with conv_norm='batch' to carry the reference's
        BatchNorm running stats. ``allow_pickle`` opts in to full
        unpickling for checkpoints that fail weights-only loading."""
        from sincformer_tpu.compat import load_reference_checkpoint
        from sincformer_tpu.models.dcse import default_speech_enhancer
        loaded = load_reference_checkpoint(path, allow_pickle=allow_pickle)
        if loaded["kind"] != "dcse":
            raise ValueError(f"{path} is not a DCSE checkpoint")
        kw = dict(loaded.get("config", {}))
        kw.update(model_overrides)
        model = default_speech_enhancer(conv_norm="batch", **kw)
        pipe = cls(model=model, model_dir=model_dir)
        pipe.init_state(epochs=1, steps_per_epoch=1)
        variables = dict(loaded["variables"])
        params = variables.pop("params")
        pipe.state = pipe.state.replace(params=params,
                                        model_state=variables or None)
        return pipe

    # ── inference ───────────────────────────────────────────────────────

    def _enhance_fn(self, padded_len: int):
        key = (padded_len, float(self.output_gain))
        if key not in self._enhance_jit:
            n_fft, hop, frame = (self.acfg.fft_size, self.acfg.hop_size,
                                 self.acfg.frame_size)
            model = self.model
            gain = float(self.output_gain)   # val-calibrated, trace constant

            @jax.jit
            def fn(variables, wav):
                from sincformer_tpu.utils.signal import pcm_to_float
                wav = pcm_to_float(wav)     # int16 PCM wire → f32 on device
                spec = stft(wav, n_fft, hop, frame)
                er, ei, _ = model.apply(variables, spec.real, spec.imag,
                                        deterministic=True)
                enh = istft(er + 1j * ei, n_fft, hop, frame,
                            length=wav.shape[-1])
                return enh * gain if gain != 1.0 else enh

            self._enhance_jit[key] = fn
        return self._enhance_jit[key]

    def _variables(self) -> Dict:
        return {"params": self.state.params,
                **(self.state.model_state or {})}

    def enhance_signal(self, noisy_signal: np.ndarray,
                       pad_quantum: int = 4000) -> np.ndarray:
        """Enhance one waveform (reference conformer_pipeline.py:653-685).
        Input is right-padded to a quantised length so repeated calls reuse a
        handful of compiled shapes."""
        if self.state is None:
            raise RuntimeError("No model loaded.")
        noisy_signal = np.asarray(noisy_signal)
        if noisy_signal.dtype == np.int16:
            # int16 copied into the f32 pad buffer would bypass
            # pcm_to_float's dtype dispatch (round-4 review)
            noisy_signal = noisy_signal.astype(np.float32) / 32768.0
        n = len(noisy_signal)
        padded = int(np.ceil(n / pad_quantum) * pad_quantum)
        wav = np.zeros((1, padded), np.float32)
        wav[0, :n] = noisy_signal
        out = self._enhance_fn(padded)(self._variables(), jnp.asarray(wav))
        return np.asarray(out[0, :n], np.float32)

    def enhance_batch(self, noisy: np.ndarray) -> np.ndarray:
        """Batched enhancement (B, N) → (B, N) — the grid-eval fast path."""
        if self.state is None:
            raise RuntimeError("No model loaded.")
        out = self._enhance_fn(noisy.shape[-1])(self._variables(),
                                                jnp.asarray(noisy))
        return np.asarray(out, np.float32)
