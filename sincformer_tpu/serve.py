"""Streaming / long-form enhancement for production serving.

The reference processes whole utterances only (4 s max in training,
unbounded O(T²) attention at inference). This module adds the serving
layer the reference lacks (SURVEY.md §5 long-context note):

  * :class:`StreamingEnhancer` — chunked overlap-add inference: arbitrary-
    length (hours-long) audio is processed in fixed-size windows with
    cross-fade, so device memory and compile shapes stay constant and the
    pipeline is real-time capable;
  * :func:`enhance_long` — one-call convenience wrapper.

Windows overlap by ``overlap`` samples and are cross-faded with a linear
ramp; every chunk reuses ONE compiled enhancement function (a single jit
cache entry regardless of total input length).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


class StreamingEnhancer:
    """Wrap any pipeline with ``enhance_batch`` / ``enhance_signal`` into a
    constant-memory long-form enhancer.

    Args:
        pipeline: object exposing ``enhance_signal(np.ndarray) -> np.ndarray``
            (DCSEPipeline, SincformerPipeline, DNNPipeline).
        window: samples per chunk (default 4 s @ 8 kHz — the training size).
        overlap: cross-fade length in samples.
    """

    def __init__(self, pipeline, window: int = 32000, overlap: int = 1600):
        assert overlap < window // 2
        self.pipeline = pipeline
        self.window = window
        self.overlap = overlap
        ramp = np.linspace(0.0, 1.0, overlap, dtype=np.float32)
        self._fade_in = ramp
        self._fade_out = 1.0 - ramp

    def enhance(self, noisy: np.ndarray) -> np.ndarray:
        """Enhance arbitrary-length audio with constant device footprint."""
        noisy = np.asarray(noisy, np.float32)
        n = len(noisy)
        if n <= self.window:
            return self.pipeline.enhance_signal(noisy)

        hop = self.window - self.overlap
        out = np.zeros(n, np.float32)
        weight = np.zeros(n, np.float32)
        start = 0
        while start < n:
            end = min(start + self.window, n)
            chunk = noisy[start:end]
            if len(chunk) < self.window:
                chunk = np.pad(chunk, (0, self.window - len(chunk)))
            enhanced = self.pipeline.enhance_signal(chunk)[:end - start]

            w = np.ones(end - start, np.float32)
            if start > 0:
                w[:self.overlap] = self._fade_in[:min(self.overlap,
                                                      end - start)]
            if end < n:
                w[-self.overlap:] = self._fade_out[-min(self.overlap,
                                                        end - start):]
            out[start:end] += enhanced * w
            weight[start:end] += w
            start += hop
        return out / np.maximum(weight, 1e-8)


def enhance_long(pipeline, noisy: np.ndarray, window: int = 32000,
                 overlap: int = 1600) -> np.ndarray:
    """One-shot long-form enhancement."""
    return StreamingEnhancer(pipeline, window, overlap).enhance(noisy)
