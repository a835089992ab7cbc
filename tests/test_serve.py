"""Streaming long-form enhancement tests."""

import numpy as np

from sincformer_tpu.serve import StreamingEnhancer, enhance_long


class _ScalePipe:
    """Deterministic 'enhancer': halves the signal; records chunk sizes."""

    def __init__(self):
        self.calls = []

    def enhance_signal(self, x):
        self.calls.append(len(x))
        return np.asarray(x) * 0.5


class TestStreaming:
    def test_short_input_passthrough(self, rng):
        pipe = _ScalePipe()
        x = rng.standard_normal(8000).astype(np.float32)
        out = StreamingEnhancer(pipe, window=32000).enhance(x)
        np.testing.assert_allclose(out, x * 0.5)
        assert pipe.calls == [8000]

    def test_long_input_chunked_constant_shape(self, rng):
        pipe = _ScalePipe()
        x = rng.standard_normal(100000).astype(np.float32)
        out = StreamingEnhancer(pipe, window=32000,
                                overlap=1600).enhance(x)
        assert out.shape == x.shape
        # every device call sees the SAME window size (one compile)
        assert set(pipe.calls) == {32000}
        # linear operation → chunked == whole for a scale-only pipe
        np.testing.assert_allclose(out, x * 0.5, atol=1e-5)

    def test_crossfade_continuity_real_model(self, rng, tmp_path):
        """Chunked output of a real DCSE model stays close to whole-signal
        output away from chunk boundaries."""
        from sincformer_tpu.data import synthetic_noise, synthetic_speech
        from sincformer_tpu.data.loader import WaveformDataset
        from sincformer_tpu.models.dcse import SpeechEnhancer
        from sincformer_tpu.train.dcse_trainer import DCSEPipeline

        model = SpeechEnhancer(n_freq=129, d_model=32, num_blocks=1,
                               num_heads=2, d_ff=64, kernel_size=7,
                               dropout=0.0)
        ds = WaveformDataset.from_arrays(
            [synthetic_speech(0.5)] * 4,
            {"white": synthetic_noise(8000, seed=0)}, max_len=4000)
        pipe = DCSEPipeline(model=model, model_dir=str(tmp_path))
        pipe.train(ds, ds, epochs=1, batch_size=2, verbose=False)

        x = np.tile(synthetic_speech(1.0), 3)[:20000]
        chunked = enhance_long(pipe, x, window=8000, overlap=800)
        whole = pipe.enhance_signal(x)
        assert chunked.shape == whole.shape
        # energy within 20% (attention context differs per chunk)
        ratio = (np.sum(chunked ** 2) + 1e-9) / (np.sum(whole ** 2) + 1e-9)
        assert 0.5 < ratio < 2.0
        assert np.all(np.isfinite(chunked))


class TestLongFormSeams:
    """VERDICT r2 #9: minutes-long input through StreamingEnhancer vs the
    direct per-window model output — the seam error is BOUNDED."""

    def test_minutes_long_seam_bound_real_model(self, rng, tmp_path):
        from sincformer_tpu.data import synthetic_noise, synthetic_speech
        from sincformer_tpu.data.loader import WaveformDataset
        from sincformer_tpu.models.dcse import SpeechEnhancer
        from sincformer_tpu.train.dcse_trainer import DCSEPipeline

        model = SpeechEnhancer(n_freq=129, d_model=32, num_blocks=1,
                               num_heads=2, d_ff=64, kernel_size=7,
                               dropout=0.0)
        ds = WaveformDataset.from_arrays(
            [synthetic_speech(0.5)] * 4,
            {"white": synthetic_noise(8000, seed=0)}, max_len=4000)
        pipe = DCSEPipeline(model=model, model_dir=str(tmp_path))
        pipe.train(ds, ds, epochs=1, batch_size=2, verbose=False)

        # ~2 minutes of audio, window 16000, overlap 1600 → ~67 windows
        base = synthetic_speech(4.0)
        x = np.tile(base, 30).astype(np.float32)   # 120 s
        x += 0.05 * rng.standard_normal(len(x)).astype(np.float32)
        window, overlap = 16000, 1600
        se = StreamingEnhancer(pipe, window=window, overlap=overlap)
        streamed = se.enhance(x)
        assert streamed.shape == x.shape
        assert np.all(np.isfinite(streamed))

        # direct per-window model outputs (identical chunking)
        hop = window - overlap
        starts = list(range(0, len(x), hop))
        chunks = np.zeros((len(starts), window), np.float32)
        for c, s in enumerate(starts):
            seg = x[s:s + window]
            chunks[c, :len(seg)] = seg
        direct = np.concatenate(
            [np.asarray(pipe.enhance_batch(chunks[i:i + 64]))
             for i in range(0, len(chunks), 64)], axis=0)

        # (a) away from seams the streamed output IS the window output
        for c, s in enumerate(starts[:-1]):
            mid0, mid1 = s + overlap, s + hop   # interior, no cross-fade
            np.testing.assert_allclose(streamed[mid0:mid1],
                                       direct[c, overlap:hop], atol=1e-5)
        # (b) inside each seam the cross-fade is a convex combination of
        # the two neighbouring window estimates → bounded by their envelope
        for c, s in enumerate(starts[1:], start=1):
            seam = slice(s, s + overlap)
            a = direct[c - 1, hop:hop + overlap]      # outgoing window
            b = direct[c, :overlap]                   # incoming window
            lo = np.minimum(a, b) - 1e-5
            hi = np.maximum(a, b) + 1e-5
            got = streamed[seam]
            assert np.all(got >= lo) and np.all(got <= hi)
            # seam never exceeds the worst-case disagreement of the two
            # estimates
            assert np.max(np.abs(got - a)) <= np.max(np.abs(a - b)) + 1e-5


class _BatchScalePipe(_ScalePipe):
    """Adds the batched fast path; records batch shapes."""

    def __init__(self):
        super().__init__()
        self.batch_calls = []

    def enhance_batch(self, x):
        x = np.asarray(x)
        self.batch_calls.append(x.shape)
        return x * 0.5


class TestBatchedServing:
    def test_long_input_uses_batched_windows(self, rng):
        pipe = _BatchScalePipe()
        x = rng.standard_normal(100000).astype(np.float32)
        out = StreamingEnhancer(pipe, window=32000, overlap=1600,
                                chunk_batch=2).enhance(x)
        np.testing.assert_allclose(out, x * 0.5, atol=1e-5)
        assert pipe.calls == []                   # no serial dispatches
        # 4 windows grouped ≤2 per device call, constant window shape
        assert all(s[1] == 32000 for s in pipe.batch_calls)
        assert sum(s[0] for s in pipe.batch_calls) == 4
        assert max(s[0] for s in pipe.batch_calls) <= 2

    def test_enhance_many_buckets_and_preserves_order(self, rng):
        pipe = _BatchScalePipe()
        se = StreamingEnhancer(pipe, window=32000, chunk_batch=8)
        sigs = [rng.standard_normal(n).astype(np.float32)
                for n in (3000, 4000, 3500, 7900, 40000)]
        outs = se.enhance_many(sigs, pad_quantum=4000)
        assert len(outs) == len(sigs)
        for s, o in zip(sigs, outs):
            assert o.shape == s.shape
            np.testing.assert_allclose(o, s * 0.5, atol=1e-5)
        # short utterances batched into the 4000- and 8000-quantum buckets
        quanta = sorted(s[1] for s in pipe.batch_calls
                        if s[1] in (4000, 8000))
        assert quanta == [4000, 8000]

    def test_enhance_many_serial_fallback(self, rng):
        pipe = _ScalePipe()                       # no enhance_batch
        se = StreamingEnhancer(pipe, window=32000)
        sigs = [rng.standard_normal(3000).astype(np.float32)
                for _ in range(3)]
        outs = se.enhance_many(sigs)
        for s, o in zip(sigs, outs):
            np.testing.assert_allclose(o, s * 0.5)
        assert len(pipe.calls) == 3


class TestInt16Wire:
    """int16 PCM wire format: half the host→device bytes, dequantized
    inside the jitted enhance programs (utils/signal.pcm_to_float)."""

    def test_dcse_enhance_batch_int16_parity(self, rng, tmp_path):
        from sincformer_tpu.data import synthetic_noise, synthetic_speech
        from sincformer_tpu.data.loader import WaveformDataset
        from sincformer_tpu.models.dcse import SpeechEnhancer
        from sincformer_tpu.train.dcse_trainer import DCSEPipeline

        model = SpeechEnhancer(n_freq=129, d_model=32, num_blocks=1,
                               num_heads=2, d_ff=64, kernel_size=7,
                               dropout=0.0)
        ds = WaveformDataset.from_arrays(
            [synthetic_speech(0.5)] * 4,
            {"white": synthetic_noise(8000, seed=0)}, max_len=4000)
        pipe = DCSEPipeline(model=model, model_dir=str(tmp_path))
        pipe.train(ds, ds, epochs=1, batch_size=2, verbose=False)

        f = np.stack([synthetic_speech(0.5)[:4000]] * 2)
        pcm = np.clip(f * 32768.0, -32768, 32767).astype(np.int16)
        out_pcm = pipe.enhance_batch(pcm)
        out_f = pipe.enhance_batch(pcm.astype(np.float32) / 32768.0)
        assert out_pcm.dtype == np.float32
        np.testing.assert_allclose(out_pcm, out_f, atol=1e-5)

        # streaming path forwards int16 windows through untouched
        from sincformer_tpu.serve import StreamingEnhancer
        se = StreamingEnhancer(pipe, window=4000, overlap=400,
                               chunk_batch=2)
        long_pcm = np.tile(pcm[0], 4)                       # 16000 samples
        out_s = se.enhance(long_pcm)
        out_sf = se.enhance(long_pcm.astype(np.float32) / 32768.0)
        assert out_s.dtype == np.float32
        np.testing.assert_allclose(out_s, out_sf, atol=1e-5)

    def test_sincformer_enhance_batch_int16_parity(self, tmp_path):
        from sincformer_tpu.train.agent_trainer import (SincformerPipeline,
                                                        default_metacog)
        model = default_metacog(
            encoder_channels=32, cpea_hidden=16, cpea_channels=8,
            d_model=32, msa_blocks=1, num_heads=2, d_ff=64,
            kernel_size=7, dropout=0.0, memory_slots=4,
            sinc_kernel_size=65)
        pipe = SincformerPipeline(model=model, model_dir=str(tmp_path))
        pipe.init_state(epochs=1, steps_per_epoch=1, example_len=4000)
        from sincformer_tpu.data import synthetic_speech
        f = np.stack([synthetic_speech(0.5)[:4000]] * 2)
        pcm = np.clip(f * 32768.0, -32768, 32767).astype(np.int16)
        out_pcm = pipe.enhance_batch(pcm)
        out_f = pipe.enhance_batch(pcm.astype(np.float32) / 32768.0)
        np.testing.assert_allclose(out_pcm, out_f, atol=1e-5)


class TestDeviceOLA:
    """VERDICT r3 #9: the whole-file device-side OLA path (one jitted
    program: framing → grouped applies → cross-fade → overlap-add) must be
    numerically identical to the host OLA path it replaces."""

    def _dcse_pipe(self, tmp_path):
        from sincformer_tpu.models.dcse import SpeechEnhancer
        from sincformer_tpu.train.dcse_trainer import DCSEPipeline
        model = SpeechEnhancer(n_freq=129, d_model=32, num_blocks=1,
                               num_heads=2, d_ff=64, kernel_size=7,
                               dropout=0.0)
        pipe = DCSEPipeline(model=model, model_dir=str(tmp_path))
        pipe.init_state(epochs=1, steps_per_epoch=1, example_len=8000)
        return pipe

    def test_dcse_device_matches_host(self, rng, tmp_path):
        pipe = self._dcse_pipe(tmp_path)
        for n in (50000, 43201, 7200 * 6, 7200 * 6 + 1):
            x = rng.standard_normal(n).astype(np.float32) * 0.3
            dev = StreamingEnhancer(pipe, window=8000, overlap=800,
                                    chunk_batch=4).enhance(x)
            host = StreamingEnhancer(pipe, window=8000, overlap=800,
                                     chunk_batch=4,
                                     device_ola=False).enhance(x)
            assert dev.shape == host.shape == x.shape
            np.testing.assert_allclose(dev, host, atol=2e-5, err_msg=str(n))

    def test_dcse_device_int16_wire(self, rng, tmp_path):
        pipe = self._dcse_pipe(tmp_path)
        x = (rng.standard_normal(50000) * 8000).astype(np.int16)
        dev = StreamingEnhancer(pipe, window=8000, overlap=800,
                                chunk_batch=4).enhance(x)
        ref = StreamingEnhancer(pipe, window=8000, overlap=800,
                                chunk_batch=4).enhance(
            x.astype(np.float32) / 32768.0)
        np.testing.assert_allclose(dev, ref, atol=1e-5)

    def test_sincformer_device_matches_host(self, rng, tmp_path):
        from sincformer_tpu.train.agent_trainer import (SincformerPipeline,
                                                        default_metacog)
        model = default_metacog(
            encoder_channels=32, cpea_hidden=16, cpea_channels=8,
            d_model=32, msa_blocks=1, num_heads=2, d_ff=64, kernel_size=7,
            dropout=0.0, memory_slots=4, sinc_kernel_size=65)
        pipe = SincformerPipeline(model=model, model_dir=str(tmp_path))
        pipe.init_state(epochs=1, steps_per_epoch=1, example_len=8000)
        x = rng.standard_normal(30000).astype(np.float32) * 0.3
        dev = StreamingEnhancer(pipe, window=8000, overlap=800,
                                chunk_batch=2).enhance(x)
        host = StreamingEnhancer(pipe, window=8000, overlap=800,
                                 chunk_batch=2, device_ola=False).enhance(x)
        np.testing.assert_allclose(dev, host, atol=2e-5)

    def test_unsupported_pipeline_falls_back_to_host(self, rng):
        pipe = _BatchScalePipe()
        se = StreamingEnhancer(pipe, window=32000, overlap=1600,
                               chunk_batch=2)
        x = rng.standard_normal(100000).astype(np.float32)
        out = se.enhance(x)
        np.testing.assert_allclose(out, x * 0.5, atol=1e-5)
        assert pipe.batch_calls          # host batched path was used

    def test_pipelined_matches_whole_file(self, rng, tmp_path):
        """The segmented transfer-pipelined path must reproduce the
        whole-file device program (and therefore the host path) exactly:
        cross-fade ramps sum to 1, so per-segment numerators ADD."""
        pipe = self._dcse_pipe(tmp_path)
        # 86800/87200: 0 < n mod hop <= overlap — the tail window pair
        # where the OLA weights sum to 1 + fade_in and the segmented path
        # must divide the seam out on the host (round-4 review: the
        # numerator-only add inflated the last <= overlap samples by up
        # to ~2x). 90000/86401/86400: ragged + exact tails as before.
        for n in (90000, 86401, 4 * 7200 * 3, 86800, 87200):
            x = rng.standard_normal(n).astype(np.float32) * 0.3
            piped = StreamingEnhancer(pipe, window=8000, overlap=800,
                                      chunk_batch=4,
                                      pipelined=True).enhance(x)
            whole = StreamingEnhancer(pipe, window=8000, overlap=800,
                                      chunk_batch=4,
                                      pipelined=False).enhance(x)
            host = StreamingEnhancer(pipe, window=8000, overlap=800,
                                     chunk_batch=4,
                                     device_ola=False).enhance(x)
            assert piped.shape == whole.shape == x.shape
            np.testing.assert_allclose(piped, whole, atol=2e-5,
                                       err_msg=str(n))
            np.testing.assert_allclose(piped, host, atol=2e-5,
                                       err_msg=str(n))

    def test_pipelined_pcm16_wire(self, rng, tmp_path):
        """Pipelined + int16 both ways: boundary seams re-quantize after
        the host add, so tolerance is a couple of LSBs."""
        pipe = self._dcse_pipe(tmp_path)
        x = (rng.standard_normal(90000) * 8000).astype(np.int16)
        se = StreamingEnhancer(pipe, window=8000, overlap=800,
                               chunk_batch=4, pipelined=True)
        out16 = se.enhance(x, pcm16_out=True)
        assert out16.dtype == np.int16
        ref = StreamingEnhancer(pipe, window=8000, overlap=800,
                                chunk_batch=4,
                                pipelined=False).enhance(x)
        err = np.abs(out16.astype(np.float32) / 32768.0 - ref)
        assert np.max(err) <= 3.0 / 32768.0

    def test_whole_file_cache_tracks_output_gain(self, rng, tmp_path):
        """A long-lived server that recalibrates must not keep serving the
        old gain: output_gain is a trace constant inside the whole-file
        program, so the _stream_jit cache is keyed by it (round-4
        review)."""
        pipe = self._dcse_pipe(tmp_path)
        se = StreamingEnhancer(pipe, window=8000, overlap=800,
                               chunk_batch=4, pipelined=False)
        x = rng.standard_normal(50000).astype(np.float32) * 0.3
        out1 = se.enhance(x)
        assert se._stream_jit                    # whole-file path compiled
        pipe.output_gain = 2.0
        pipe._enhance_jit.clear()                # what calibrate_gain does
        out2 = se.enhance(x)
        np.testing.assert_allclose(out2, out1 * 2.0, rtol=1e-5, atol=1e-6)

    def test_pipelined_auto_skips_short_input(self, rng, tmp_path):
        """Auto mode falls back to the whole-file program under 3
        segments (nothing to overlap)."""
        pipe = self._dcse_pipe(tmp_path)
        se = StreamingEnhancer(pipe, window=8000, overlap=800,
                               chunk_batch=4)
        x = rng.standard_normal(30000).astype(np.float32) * 0.3
        out = se.enhance(x)
        assert not se._seg_jit            # segment program never built
        assert se._stream_jit             # whole-file program used
        assert out.shape == x.shape

    def test_pcm16_out_device_parity(self, rng, tmp_path):
        """pcm16_out quantizes ON DEVICE (int16 download wire): the result
        must equal the float32 path quantized on host, to ±1 LSB."""
        pipe = self._dcse_pipe(tmp_path)
        x = (rng.standard_normal(50000) * 8000).astype(np.int16)
        se = StreamingEnhancer(pipe, window=8000, overlap=800,
                               chunk_batch=4)
        out16 = se.enhance(x, pcm16_out=True)
        assert out16.dtype == np.int16
        ref = se.enhance(x)                       # float32 device OLA
        ref16 = np.round(np.clip(ref * 32768.0, -32768, 32767))
        assert np.max(np.abs(out16.astype(np.int32)
                             - ref16.astype(np.int32))) <= 1

    def test_pcm16_out_host_paths(self, rng):
        """Short-input and host-fallback paths honor pcm16_out too."""
        pipe = _BatchScalePipe()
        se = StreamingEnhancer(pipe, window=32000, overlap=1600,
                               chunk_batch=2)
        short = rng.standard_normal(8000).astype(np.float32) * 0.5
        o = se.enhance(short, pcm16_out=True)
        assert o.dtype == np.int16
        np.testing.assert_allclose(
            o, np.round(np.clip(short * 0.5 * 32768, -32768, 32767)))
        long = rng.standard_normal(100000).astype(np.float32) * 0.5
        o2 = se.enhance(long, pcm16_out=True)
        assert o2.dtype == np.int16 and o2.shape == long.shape

    def test_seg_ola_pcm16_tail_no_clipping(self):
        """Round-4 advisor medium finding: the segmented pcm16 path used to
        quantize the OLA numerator BEFORE the (1+fade_in) tail correction —
        float_to_pcm saturates at ±1 full scale, but the uncorrected
        numerator legitimately reaches (1+fade_in)·|enh| ≈ 2× there, so
        hot audio (|enh| > ~1/(1+fade_in)) clipped on device. The
        correction now happens inside _seg_ola_fn, before quantization."""
        import jax.numpy as jnp

        window, overlap, gb = 8000, 800, 4
        hop = window - overlap
        se = StreamingEnhancer(_ScalePipe(), window=window, overlap=overlap,
                               chunk_batch=gb)
        # n chosen so 0 < n mod hop <= overlap AND both tail windows land
        # in the same segment (k_last = 3 < gb): the exact clipping case
        n = 3 * hop + 400
        enh = jnp.full((gb, window), 0.9, jnp.float32)

        out16 = np.asarray(se._seg_ola_fn(True)(
            enh, jnp.asarray(0, jnp.int32), jnp.asarray(n, jnp.int32)))
        out_f = np.asarray(se._seg_ola_fn(False)(
            enh, jnp.asarray(0, jnp.int32), jnp.asarray(n, jnp.int32)))
        # the corrected tail region must read 0.9, not clip(0.9·(1+fade))
        tail = slice(3 * hop, n)
        np.testing.assert_allclose(out_f[tail], 0.9, atol=1e-5)
        np.testing.assert_allclose(
            out16[tail].astype(np.float32) / 32768.0, 0.9, atol=1.0 / 32768)
        # and the two dtypes agree everywhere to 1 LSB
        ref16 = np.round(np.clip(out_f * 32768.0, -32768, 32767))
        assert np.max(np.abs(out16.astype(np.int32)
                             - ref16.astype(np.int32))) <= 1

    def test_pipelined_pcm16_hot_audio(self, rng, tmp_path):
        """End-to-end: near-full-scale input through the pipelined pcm16
        path matches the float path quantized on host (the old code
        clipped the last <= overlap samples of hot audio up to ~2×)."""
        pipe = self._dcse_pipe(tmp_path)
        hop = 8000 - 800
        n = 11 * hop + 400                 # tail pair in the last segment
        x = (rng.standard_normal(n) * 28000).astype(np.int16)
        se = StreamingEnhancer(pipe, window=8000, overlap=800,
                               chunk_batch=4, pipelined=True)
        out16 = se.enhance(x, pcm16_out=True)
        ref = StreamingEnhancer(pipe, window=8000, overlap=800,
                                chunk_batch=4,
                                pipelined=True).enhance(x)
        err = np.abs(out16.astype(np.float32) / 32768.0 - ref)
        assert np.max(err) <= 3.0 / 32768.0

    def test_stream_jit_cache_bounded_across_recalibrations(self, rng,
                                                            tmp_path):
        """Advisor round-4 low finding: recalibrating in a long-lived
        server must EVICT the stale whole-file executable, not grow the
        cache per gain value."""
        pipe = self._dcse_pipe(tmp_path)
        se = StreamingEnhancer(pipe, window=8000, overlap=800,
                               chunk_batch=4, pipelined=False)
        x = rng.standard_normal(50000).astype(np.float32) * 0.3
        out1 = se.enhance(x)
        for gain in (2.0, 3.0, 0.5):
            pipe.output_gain = gain
            pipe._enhance_jit.clear()      # what calibrate_gain does
            out = se.enhance(x)
            np.testing.assert_allclose(out, out1 * gain / 1.0,
                                       rtol=1e-4, atol=1e-5)
        assert len(se._stream_jit) == 1    # one entry per (c_pad, pcm16)
