"""Pallas kernel tests (interpreter mode on the CPU backend)."""

import numpy as np

import jax
import jax.numpy as jnp

from sincformer_tpu.dsp.haircell import MeddisHairCell
from sincformer_tpu.ops.meddis_pallas import meddis_pallas


class TestMeddisPallas:
    def test_matches_scan_bitwise(self, rng):
        # drive with a positive offset so the reservoir stays active
        x = (np.abs(rng.standard_normal((2, 8, 700))) * 20).astype(np.float32)
        ref = MeddisHairCell().process(jnp.asarray(x))
        out = meddis_pallas(jnp.asarray(x), interpret=True)
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-5
        assert float(jnp.max(ref)) > 0  # non-degenerate drive

    def test_single_signal(self, rng):
        x = (np.abs(rng.standard_normal(300)) * 20).astype(np.float32)
        ref = MeddisHairCell().process(jnp.asarray(x))
        out = meddis_pallas(jnp.asarray(x), interpret=True)
        assert out.shape == (300,)
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-5

    def test_backend_dispatch(self, rng):
        x = (np.abs(rng.standard_normal((3, 200))) * 10).astype(np.float32)
        hc = MeddisHairCell()
        a = hc.process(jnp.asarray(x))
        # pallas backend path on CPU via interpret fallback
        b = meddis_pallas(jnp.asarray(x), interpret=True)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-5
