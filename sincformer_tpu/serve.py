"""Streaming / long-form / multi-utterance enhancement for production
serving.

The reference processes whole utterances only (4 s max in training,
unbounded O(T²) attention at inference, one utterance at a time in its
evaluation loop, main.py:316-359). This module adds the serving layer the
reference lacks (SURVEY.md §5 long-context note):

  * :class:`StreamingEnhancer` — chunked overlap-add inference: arbitrary-
    length (hours-long) audio is processed in fixed-size windows with
    cross-fade, so device memory and compile shapes stay constant. When
    the wrapped pipeline exposes ``enhance_batch`` the windows are stacked
    and enhanced in device-batched groups (``chunk_batch`` windows per
    call) instead of one window per dispatch — on the remote-TPU tunnel
    each dispatch costs a round trip, so batching is the difference
    between O(minutes-of-audio) and O(1) host↔device syncs per file;
  * :meth:`StreamingEnhancer.enhance_many` — many utterances in one call:
    equal-length groups are batched together (the loader's bucketing
    idea applied to serving);
  * :func:`enhance_long` — one-call convenience wrapper.

Windows overlap by ``overlap`` samples and are cross-faded with a linear
ramp; every chunk reuses ONE compiled enhancement function per window
shape (a single jit cache entry regardless of total input length).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class StreamingEnhancer:
    """Wrap any pipeline with ``enhance_batch`` / ``enhance_signal`` into a
    constant-memory long-form enhancer.

    Args:
        pipeline: object exposing ``enhance_signal(np.ndarray) -> np.ndarray``
            (DCSEPipeline, SincformerPipeline, DNNPipeline) and optionally
            ``enhance_batch((B, N)) -> (B, N)`` for the batched fast path.
        window: samples per chunk (default 4 s @ 8 kHz — the training size).
        overlap: cross-fade length in samples.
        chunk_batch: max windows enhanced per device call on the batched
            path (bounds device memory for hours-long inputs).
    """

    def __init__(self, pipeline, window: int = 32000, overlap: int = 1600,
                 chunk_batch: int = 64):
        assert overlap < window // 2
        self.pipeline = pipeline
        self.window = window
        self.overlap = overlap
        self.chunk_batch = chunk_batch
        ramp = np.linspace(0.0, 1.0, overlap, dtype=np.float32)
        self._fade_in = ramp
        self._fade_out = 1.0 - ramp

    # ── internals ───────────────────────────────────────────────────────

    def _enhance_windows(self, chunks: np.ndarray) -> np.ndarray:
        """(C, window) noisy windows → (C, window) enhanced, batched when
        the pipeline supports it."""
        batch_fn = getattr(self.pipeline, "enhance_batch", None)
        if batch_fn is None:
            return np.stack([self.pipeline.enhance_signal(c)
                             for c in chunks])
        n = len(chunks)
        if n % self.chunk_batch:
            # pad EVERY ragged group up to chunk_batch: all files then share
            # ONE compiled (chunk_batch, window) shape — a ragged batch
            # otherwise costs a fresh XLA compile per distinct window count
            # (seconds through the remote-TPU tunnel vs ms of wasted rows;
            # this applies to short files too, where n < chunk_batch)
            pad = self.chunk_batch - n % self.chunk_batch
            chunks = np.concatenate(
                [chunks, np.zeros((pad, chunks.shape[1]), chunks.dtype)])
        outs = [np.asarray(batch_fn(chunks[i:i + self.chunk_batch]))
                for i in range(0, len(chunks), self.chunk_batch)]
        return np.concatenate(outs, axis=0)[:n]

    # ── public API ──────────────────────────────────────────────────────

    def enhance(self, noisy: np.ndarray) -> np.ndarray:
        """Enhance arbitrary-length audio with constant device footprint.

        int16 input is forwarded to the device AS int16 (half the wire
        bytes of float32 — audio's native PCM format) and dequantized
        inside the pipelines' jitted programs (utils/signal.pcm_to_float);
        output is always float32 in [-1, 1].
        """
        noisy = np.asarray(noisy)
        wire = np.int16 if noisy.dtype == np.int16 else np.float32
        noisy = noisy.astype(wire)
        n = len(noisy)
        if n <= self.window:
            return self.pipeline.enhance_signal(
                noisy.astype(np.float32) / 32768.0
                if wire == np.int16 else noisy)

        hop = self.window - self.overlap
        starts = list(range(0, n, hop))
        chunks = np.zeros((len(starts), self.window), wire)
        for c, start in enumerate(starts):
            seg = noisy[start:start + self.window]
            chunks[c, :len(seg)] = seg
        enhanced = self._enhance_windows(chunks)

        out = np.zeros(n, np.float32)
        weight = np.zeros(n, np.float32)
        for c, start in enumerate(starts):
            end = min(start + self.window, n)
            e = enhanced[c, :end - start]
            w = np.ones(end - start, np.float32)
            if start > 0:
                w[:self.overlap] = self._fade_in[:min(self.overlap,
                                                      end - start)]
            if end < n:
                w[-self.overlap:] = self._fade_out[-min(self.overlap,
                                                        end - start):]
            out[start:end] += e * w
            weight[start:end] += w
        return out / np.maximum(weight, 1e-8)

    def enhance_many(self, signals: Sequence[np.ndarray],
                     pad_quantum: int = 4000) -> List[np.ndarray]:
        """Enhance many utterances, batching same-shape groups per device
        call (serving-side analogue of the loader's length bucketing).

        Utterances longer than ``window`` go through the streaming path;
        the rest are zero-padded up to their bucket's quantum and enhanced
        together, ≤ ``chunk_batch`` at a time. Output order matches input.
        """
        signals = [np.asarray(s, np.float32) for s in signals]
        results: List[Optional[np.ndarray]] = [None] * len(signals)

        buckets: dict[int, list[int]] = {}
        for idx, s in enumerate(signals):
            if len(s) > self.window:
                results[idx] = self.enhance(s)
            else:
                q = int(np.ceil(max(len(s), 1) / pad_quantum) * pad_quantum)
                buckets.setdefault(q, []).append(idx)

        batch_fn = getattr(self.pipeline, "enhance_batch", None)
        for q, idxs in sorted(buckets.items()):
            if batch_fn is None:
                for idx in idxs:
                    results[idx] = self.pipeline.enhance_signal(signals[idx])
                continue
            for i in range(0, len(idxs), self.chunk_batch):
                group = idxs[i:i + self.chunk_batch]
                padded = np.zeros((len(group), q), np.float32)
                for row, idx in enumerate(group):
                    padded[row, :len(signals[idx])] = signals[idx]
                out = np.asarray(batch_fn(padded))
                for row, idx in enumerate(group):
                    results[idx] = out[row, :len(signals[idx])]
        return results  # type: ignore[return-value]


def enhance_long(pipeline, noisy: np.ndarray, window: int = 32000,
                 overlap: int = 1600) -> np.ndarray:
    """One-shot long-form enhancement."""
    return StreamingEnhancer(pipeline, window, overlap).enhance(noisy)
