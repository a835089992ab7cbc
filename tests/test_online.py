"""Causal/online enhancement mode (VERDICT r4 #4b).

The OnlineEnhancer contract under test:
  * sample-aligned output: concatenated push()/flush() output matches the
    input stream length and positions exactly;
  * BOUNDED lookahead: no emitted sample depends on input more than
    ``lookahead`` samples ahead (checked by divergent-suffix causality);
  * exact replay parity: every chunk equals the pipeline's own batched
    program run on the documented sliding window;
  * algorithmic latency: lookahead + chunk samples, <= the ~64 ms bar.
"""

import numpy as np
import pytest

from sincformer_tpu.serve import OnlineEnhancer, OnlineEnhancerPool


class _BatchScalePipe:
    """Deterministic linear 'enhancer' (halves the signal); records the
    batch shapes it was called with."""

    def __init__(self):
        self.batch_calls = []

    def enhance_batch(self, x):
        x = np.asarray(x)
        self.batch_calls.append(x.shape)
        return x * 0.5


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _dcse_pipe(tmp_path):
    from sincformer_tpu.models.dcse import SpeechEnhancer
    from sincformer_tpu.train.dcse_trainer import DCSEPipeline
    model = SpeechEnhancer(n_freq=129, d_model=32, num_blocks=1,
                           num_heads=2, d_ff=64, kernel_size=7,
                           dropout=0.0)
    pipe = DCSEPipeline(model=model, model_dir=str(tmp_path))
    pipe.init_state(epochs=1, steps_per_epoch=1, example_len=2000)
    return pipe


class TestOnlineEnhancer:
    def test_linear_pipe_exact_alignment(self, rng):
        """A scale-only pipe makes windowing invisible: streamed output
        must equal 0.5x input EXACTLY, across ragged push sizes."""
        pipe = _BatchScalePipe()
        oe = OnlineEnhancer(pipe, context=2000, chunk=160, lookahead=240)
        x = rng.standard_normal(5000).astype(np.float32)
        outs, pos = [], 0
        for size in (1, 7, 159, 160, 161, 800, 2399):
            outs.append(oe.push(x[pos:pos + size]))
            pos += size
        outs.append(oe.push(x[pos:]))
        outs.append(oe.flush())
        out = np.concatenate(outs)
        assert out.shape == x.shape
        np.testing.assert_allclose(out, x * 0.5, atol=1e-6)
        # every device call saw the same fixed window shape (one compile)
        assert set(pipe.batch_calls) == {(1, 2000)}

    def test_latency_is_bounded_and_under_64ms(self, rng):
        pipe = _BatchScalePipe()
        oe = OnlineEnhancer(pipe)               # defaults: 8 kHz speech
        assert oe.latency_samples == 240 + 160 == 400
        assert oe.latency_samples <= int(0.064 * 8000)
        # behavioral check: after n samples, exactly the finalizable
        # prefix has been emitted — never a sample needing future input
        x = rng.standard_normal(1000).astype(np.float32)
        emitted = len(oe.push(x))
        expect = max(0, (1000 - oe.lookahead) // oe.chunk) * oe.chunk
        assert emitted == expect

    def test_bounded_lookahead_causality(self, tmp_path, rng):
        """Two streams identical through position p must produce
        bit-identical output for every chunk finalized before p - even
        with a real attention model (the window construction caps future
        visibility at `lookahead`)."""
        pipe = _dcse_pipe(tmp_path)
        p = 2400
        a = rng.standard_normal(4000).astype(np.float32) * 0.3
        b = a.copy()
        b[p:] = rng.standard_normal(4000 - p).astype(np.float32)

        def run(x):
            oe = OnlineEnhancer(pipe, context=2000, chunk=160,
                                lookahead=240)
            return np.concatenate([oe.push(x), oe.flush()])

        out_a, out_b = run(a), run(b)
        # chunks whose window end <= p are unaffected by the divergence
        n_safe = (p - 240) // 160 * 160
        np.testing.assert_array_equal(out_a[:n_safe], out_b[:n_safe])
        # and the divergence IS visible later (the model isn't ignoring
        # input — guards against a vacuous pass)
        assert not np.allclose(out_a[p:], out_b[p:])

    def test_replay_parity_with_pipeline_program(self, tmp_path, rng):
        """Every emitted chunk equals the pipeline's own enhance_batch on
        the documented sliding window — the online machinery adds
        buffering and indexing, never different math."""
        pipe = _dcse_pipe(tmp_path)
        ctx, chunk, la = 2000, 160, 240
        x = rng.standard_normal(3600).astype(np.float32) * 0.3
        oe = OnlineEnhancer(pipe, context=ctx, chunk=chunk, lookahead=la)
        out = np.concatenate([oe.push(x), oe.flush()])
        assert out.shape == x.shape

        for k in (0, 3, 10):               # start, middle, late chunks
            end = (k + 1) * chunk + la
            w = np.zeros(ctx, np.float32)
            seg = x[max(0, end - ctx):end]
            w[ctx - len(seg):] = seg
            ref = np.asarray(pipe.enhance_batch(w[None, :]))[0]
            np.testing.assert_allclose(
                out[k * chunk:(k + 1) * chunk],
                ref[ctx - la - chunk:ctx - la], atol=1e-5)

    def test_flush_short_stream(self, rng):
        """Streams shorter than one chunk still round-trip exactly."""
        pipe = _BatchScalePipe()
        oe = OnlineEnhancer(pipe, context=2000, chunk=160, lookahead=240)
        x = rng.standard_normal(90).astype(np.float32)
        out = np.concatenate([oe.push(x), oe.flush()])
        assert out.shape == x.shape
        np.testing.assert_allclose(out, x * 0.5, atol=1e-6)
        assert len(oe.flush()) == 0        # idempotent

    def test_pool_parity_with_solo_scale_pipe(self, rng):
        """Pool streams are bit-identical to solo OnlineEnhancers on a
        linear pipe, across ragged per-stream push sizes and staggered
        arrival — the pool batches the compute, never changes the math."""
        pipe = _BatchScalePipe()
        pool = OnlineEnhancerPool(pipe, n_streams=3, context=2000,
                                  chunk=160, lookahead=240)
        xs = [rng.standard_normal(n).astype(np.float32)
              for n in (3000, 1100, 4200)]
        # staggered, ragged arrival: stream 1 starts late, stream 2 in
        # dribs and drabs
        pool.push(0, xs[0][:500]);  pool.push(2, xs[2][:37])
        pool.run()
        pool.push(0, xs[0][500:]);  pool.push(1, xs[1][:800])
        pool.push(2, xs[2][37:2000])
        pool.run()
        pool.push(1, xs[1][800:]);  pool.push(2, xs[2][2000:])
        outs = [np.concatenate([pool.take(i), pool.flush(i)])
                for i in range(3)]
        for x, out in zip(xs, outs):
            assert out.shape == x.shape
            np.testing.assert_allclose(out, x * 0.5, atol=1e-6)
        # every device call saw the one fixed batch shape (one compile)
        assert set(pipe.batch_calls) == {(3, 2000)}

    def test_pool_step_advances_only_ready_streams(self, rng):
        pipe = _BatchScalePipe()
        pool = OnlineEnhancerPool(pipe, n_streams=4, context=2000,
                                  chunk=160, lookahead=240)
        assert pool.step() == 0                 # nothing buffered
        assert pipe.batch_calls == []           # ... and no device call
        pool.push(0, np.ones(400, np.float32))  # exactly one chunk ready
        pool.push(1, np.ones(399, np.float32))  # one sample short
        assert pool.step() == 1
        assert pool.step() == 0                 # stream 0 drained
        pool.push(1, np.ones(1, np.float32))
        pool.push(3, np.ones(805, np.float32))  # three chunks ready
        assert pool.run() == 3                  # {1,3}, {3}, {3}
        assert len(pool.take(1)) == 160 and len(pool.take(3)) == 480
        assert pool.latency_samples == 400

    def test_pool_parity_with_solo_real_model(self, tmp_path, rng):
        """With a real attention model the pooled (B, ctx) program must
        reproduce each solo stream's output (batch rows are independent;
        numerics agree to float tolerance)."""
        pipe = _dcse_pipe(tmp_path)
        xs = [rng.standard_normal(3000).astype(np.float32) * 0.3,
              rng.standard_normal(2500).astype(np.float32) * 0.3]
        solo = []
        for x in xs:
            oe = OnlineEnhancer(pipe, context=2000, chunk=160,
                                lookahead=240)
            solo.append(np.concatenate([oe.push(x), oe.flush()]))
        pool = OnlineEnhancerPool(pipe, n_streams=2, context=2000,
                                  chunk=160, lookahead=240)
        pool.push(0, xs[0])
        pool.push(1, xs[1])
        pool.run()
        outs = [pool.flush(i) for i in range(2)]
        for s, p in zip(solo, outs):
            assert p.shape == s.shape
            np.testing.assert_allclose(p, s, atol=1e-5)

    def test_online_close_to_offline_quality(self, tmp_path, rng):
        """Online output stays close to the offline whole-signal pass in
        energy terms (attention context is truncated, so exact equality
        is not expected - this bounds the truncation cost)."""
        pipe = _dcse_pipe(tmp_path)
        x = rng.standard_normal(4000).astype(np.float32) * 0.3
        oe = OnlineEnhancer(pipe, context=4000, chunk=160, lookahead=240)
        online = np.concatenate([oe.push(x), oe.flush()])
        offline = np.asarray(pipe.enhance_batch(x[None, :]))[0]
        # compare away from the stream-start zero-padding region
        a, b = online[1000:], offline[1000:]
        ratio = (np.sum(a * a) + 1e-9) / (np.sum(b * b) + 1e-9)
        assert 0.5 < ratio < 2.0
