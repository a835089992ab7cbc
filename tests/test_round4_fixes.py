"""Regression tests for round-4 review fixes.

Covers: CPEA explicit input-layout contract (the old shape heuristic
silently misread channels-first input whenever T == input_dim), and
bucketed batch emission order (ascending-length emission every epoch
systematically biased SGD).

Ring attention's n-1-hop fix needs no new test: the existing
tests/test_ring_attention.py parity+grad suites pin the semantics; the
fix only removed a discarded final ppermute.
"""

import numpy as np
import pytest

from sincformer_tpu.data.loader import WaveformDataset, batch_iterator


def _cpea(input_dim=8):
    from sincformer_tpu.agents.cpea import CorrelationPhaseEstimationAgent
    return CorrelationPhaseEstimationAgent(
        input_dim=input_dim, hidden_size=4, num_layers=1,
        output_channels=4, impl="lstm")


class TestCpeaLayoutContract:
    def test_square_input_without_flag_raises(self):
        import jax
        import jax.numpy as jnp
        mod = _cpea(8)
        x = jnp.zeros((2, 8, 8))
        with pytest.raises(ValueError, match="square in input_dim"):
            mod.init(jax.random.PRNGKey(0), x)

    def test_no_matching_axis_raises(self):
        import jax
        import jax.numpy as jnp
        mod = _cpea(16)
        x = jnp.zeros((2, 8, 12))
        with pytest.raises(ValueError, match="no axis of size"):
            mod.init(jax.random.PRNGKey(0), x)

    def test_explicit_layouts_agree(self):
        """(B, D, T) with channels_first=True == transposed input with
        channels_first=False, byte-identical outputs under shared params."""
        import jax
        import jax.numpy as jnp
        mod = _cpea(8)
        x_td = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 12, 8)), jnp.float32)           # (B, T, D)
        params = mod.init(jax.random.PRNGKey(1), x_td,
                          channels_first=False)
        out_td = mod.apply(params, x_td, channels_first=False)
        out_dt = mod.apply(params, jnp.swapaxes(x_td, 1, 2),
                           channels_first=True)
        for k in out_td:
            np.testing.assert_array_equal(np.asarray(out_td[k]),
                                          np.asarray(out_dt[k]))

    def test_square_input_with_flag_works(self):
        import jax
        import jax.numpy as jnp
        mod = _cpea(8)
        x = jnp.zeros((2, 8, 8))
        params = mod.init(jax.random.PRNGKey(0), x, channels_first=True)
        out = mod.apply(params, x, channels_first=True)
        assert out["rho_s"].shape[1] == 8             # T frames preserved

    def test_unambiguous_inference_still_works(self):
        import jax
        import jax.numpy as jnp
        mod = _cpea(8)
        x = jnp.zeros((2, 8, 12))                     # only axis 1 == D
        params = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(params, x)
        assert out["rho_s"].shape[1] == 12


class TestBucketedEmissionOrder:
    def _ds(self, lengths, seed=0):
        rng = np.random.default_rng(seed)
        pairs = [(rng.normal(size=n).astype(np.float32),
                  rng.normal(size=n).astype(np.float32)) for n in lengths]
        return WaveformDataset(pairs=pairs, max_len=max(lengths))

    def test_shuffled_emission_is_not_length_sorted(self):
        # 6 short + 6 long → 3+3 full batches; ascending emission would
        # put all 3 narrow batches first. Some seed must interleave.
        ds = self._ds([3000] * 6 + [7000] * 6)
        interleaved = False
        for seed in range(8):
            widths = [b["noisy"].shape[1] for b in batch_iterator(
                ds, 2, shuffle=True, seed=seed, bucketed=True,
                drop_last=False)]
            if widths != sorted(widths):
                interleaved = True
                break
        assert interleaved, "bucketed+shuffle always emitted ascending"

    def test_shuffle_preserves_batch_multiset(self):
        ds = self._ds([3000] * 5 + [7000] * 3)
        a = list(batch_iterator(ds, 2, shuffle=True, seed=3,
                                bucketed=True, drop_last=False))
        b = list(batch_iterator(ds, 2, shuffle=False,
                                bucketed=True, drop_last=False))
        # same number of batches, same multiset of shapes, same total
        assert sorted(x["noisy"].shape for x in a) == \
            sorted(x["noisy"].shape for x in b)
        assert sum(x["noisy"].shape[0] for x in a) == \
            sum(x["noisy"].shape[0] for x in b) == 8

    def test_unshuffled_order_is_deterministic_ascending(self):
        ds = self._ds([3000] * 4 + [7000] * 4)
        widths = [b["noisy"].shape[1] for b in batch_iterator(
            ds, 2, shuffle=False, bucketed=True, drop_last=False)]
        assert widths == sorted(widths)
