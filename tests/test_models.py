"""Model-zoo tests (mirrors the reference's tests/test_dnn.py,
test_conformer.py coverage + VQ/RBM which the reference never tested)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sincformer_tpu.models import (ComplexConformer, RBM, SpeechEnhancementDNN,
                                   SpeechEnhancer, VectorQuantizer,
                                   create_dnn, pretrain_dnn_with_rbm)
from sincformer_tpu.models.dnn import load_rbm_weights


def n_params(params):
    return sum(np.prod(p.shape) for p in jax.tree.leaves(params))


class TestDNN:
    def test_forward_shape_and_range(self, rng):
        model = create_dnn(594)
        x = jnp.asarray(rng.standard_normal((8, 594)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (8, 64)
        assert jnp.all(y >= 0) and jnp.all(y <= 1)

    def test_param_count(self):
        model = create_dnn(594)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 594)))
        # 594·1024 + 1024 + 2·(1024²+1024) + 1024·64 + 64 ≈ 2.77 M
        assert 2.5e6 < n_params(params) < 3.0e6

    def test_gradients_flow(self, rng):
        model = create_dnn(100, 16)
        x = jnp.asarray(rng.standard_normal((4, 100)), jnp.float32)
        tgt = jnp.asarray(rng.uniform(0, 1, (4, 16)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return jnp.mean((model.apply(p, x) - tgt) ** 2)

        grads = jax.grad(loss)(params)
        norms = [float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads)]
        assert all(n > 0 for n in norms)

    def test_rbm_weight_loading(self, rng):
        model = SpeechEnhancementDNN(input_dim=20, hidden_dim=8,
                                     output_dim=4, num_hidden_layers=2)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 20)))
        w0 = rng.standard_normal((20, 8)).astype(np.float32)
        w1 = rng.standard_normal((8, 8)).astype(np.float32)
        new = load_rbm_weights(params, [
            (w0, np.zeros(20), np.ones(8)),
            (w1, np.zeros(8), 2 * np.ones(8)),
        ])
        flat = jax.tree_util.tree_leaves_with_path(new)
        import flax
        d = flax.traverse_util.flatten_dict(flax.core.unfreeze(new))
        np.testing.assert_allclose(d[("params", "hidden_0", "kernel")], w0)
        np.testing.assert_allclose(d[("params", "hidden_1", "bias")],
                                   2 * np.ones(8))


class TestRBM:
    def test_cd_reduces_error(self, rng):
        data = (rng.uniform(0, 1, (256, 30)) > 0.5).astype(np.float32)
        rbm = RBM(30, 16)
        errors = rbm.train(data, epochs=5, batch_size=64, verbose=False)
        assert errors[-1] <= errors[0]

    def test_stacked_pretraining_shapes(self, rng):
        data = rng.uniform(0, 1, (128, 30)).astype(np.float32)
        weights = pretrain_dnn_with_rbm(data, [30, 16, 8], verbose=False)
        assert len(weights) == 2
        assert weights[0][0].shape == (30, 16)
        assert weights[1][0].shape == (16, 8)


class TestComplexConformer:
    @pytest.fixture(scope="class")
    def small(self):
        model = ComplexConformer(n_freq=33, d_model=32, num_blocks=2,
                                 num_heads=2, d_ff=64, kernel_size=7,
                                 dropout=0.0)
        re = jnp.zeros((2, 12, 33))
        im = jnp.zeros((2, 12, 33))
        params = model.init(jax.random.PRNGKey(0), re, im)
        return model, params

    def test_forward_shapes(self, small, rng):
        model, params = small
        re = jnp.asarray(rng.standard_normal((2, 12, 33)), jnp.float32)
        im = jnp.asarray(rng.standard_normal((2, 12, 33)), jnp.float32)
        mr, mi = model.apply(params, re, im)
        assert mr.shape == (2, 12, 33) and mi.shape == (2, 12, 33)
        er, ei = model.apply_mask(re, im, mr, mi)
        assert er.shape == re.shape

    def test_gradient_flow_to_inputs(self, small, rng):
        model, params = small
        re = jnp.asarray(rng.standard_normal((1, 12, 33)), jnp.float32)
        im = jnp.zeros((1, 12, 33))

        def loss(r):
            mr, mi = model.apply(params, r, im)
            return jnp.sum(mr ** 2)

        g = jax.grad(loss)(re)
        assert float(jnp.sum(jnp.abs(g))) > 0

    def test_attention_mask_blocks_padding(self, rng):
        # single block: attention fully blocked by the mask, only the
        # depthwise conv leaks locally (reach kernel//2 = 3 frames), so
        # frames 0-4 must be untouched by a perturbation at frames 8+.
        model = ComplexConformer(n_freq=33, d_model=32, num_blocks=1,
                                 num_heads=2, d_ff=64, kernel_size=7,
                                 dropout=0.0)
        re = jnp.asarray(rng.standard_normal((1, 12, 33)), jnp.float32)
        im = jnp.zeros_like(re)
        params = model.init(jax.random.PRNGKey(0), re, im)
        valid = jnp.arange(12) < 8
        m1, _ = model.apply(params, re, im, mask=valid[None, :])
        re2 = re.at[:, 8:].set(123.0)  # perturb only padded frames
        m2, _ = model.apply(params, re2, im, mask=valid[None, :])
        assert float(jnp.max(jnp.abs(m1[:, :5] - m2[:, :5]))) < 1e-4


class TestDCSE:
    def test_forward_and_bounds(self, rng):
        model = SpeechEnhancer(n_freq=33, d_model=32, num_blocks=1,
                               num_heads=2, d_ff=64, kernel_size=7,
                               dropout=0.0)
        re = jnp.asarray(rng.standard_normal((2, 10, 33)), jnp.float32)
        im = jnp.asarray(rng.standard_normal((2, 10, 33)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), re, im)
        er, ei, mag = model.apply(params, re, im)
        assert er.shape == re.shape
        assert jnp.all(mag >= 0) and jnp.all(mag <= 1)
        # attenuation-only: |enhanced| <= |noisy| elementwise
        assert jnp.all(jnp.sqrt(er**2 + ei**2)
                       <= jnp.sqrt(re**2 + im**2) + 1e-5)

    def test_default_param_count(self):
        from sincformer_tpu.models.dcse import default_speech_enhancer
        model = default_speech_enhancer()
        re = jnp.zeros((1, 4, 129))
        params = model.init(jax.random.PRNGKey(0), re, re)
        # exact parity with the reference torch model (its "~4.3M" docstring
        # at conformer_pipeline.py:237 is wrong; true count is 6,225,414)
        assert n_params(params) == 6225414


class TestVQ:
    def test_quantize_and_ste(self, rng):
        vq = VectorQuantizer(num_centroids=3)
        x = jnp.asarray(rng.uniform(0, 1, (50,)), jnp.float32)
        params = vq.init(jax.random.PRNGKey(0), x)
        q, idx, loss = vq.apply(params, x)
        assert q.shape == x.shape
        assert set(np.unique(np.asarray(idx))) <= {0, 1, 2}
        assert float(loss) >= 0
        # STE: gradient w.r.t. x is identity-like (nonzero)
        g = jax.grad(lambda xx: jnp.sum(vq.apply(params, xx)[0] ** 2))(x)
        assert float(jnp.sum(jnp.abs(g))) > 0

    def test_utilization(self, rng):
        vq = VectorQuantizer(num_centroids=3)
        x = jnp.asarray(rng.uniform(0, 1, (1000,)), jnp.float32)
        params = vq.init(jax.random.PRNGKey(0), x)
        _, idx, _ = vq.apply(params, x)
        util = VectorQuantizer.get_utilization(idx, 3)
        np.testing.assert_allclose(float(jnp.sum(util)), 1.0, rtol=1e-5)


class TestAttentionPadding:
    def test_pad_to_is_numerically_transparent(self, rng):
        """Localized MXU-alignment padding (ops/attention pad_to) must not
        change attention outputs."""
        import jax
        import jax.numpy as jnp
        from sincformer_tpu.models.conformer import MultiHeadSelfAttention
        x = jnp.asarray(rng.standard_normal((2, 13, 32)), jnp.float32)
        base = MultiHeadSelfAttention(32, 2, 0.0, pad_to=None)
        padded = MultiHeadSelfAttention(32, 2, 0.0, pad_to=8)
        params = base.init(jax.random.PRNGKey(0), x)
        a = base.apply(params, x, True)
        b = padded.apply(params, x, True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_pad_to_respects_existing_mask(self, rng):
        import jax
        import jax.numpy as jnp
        from sincformer_tpu.models.conformer import MultiHeadSelfAttention
        x = jnp.asarray(rng.standard_normal((2, 13, 32)), jnp.float32)
        mask = jnp.asarray(np.array([[True] * 9 + [False] * 4,
                                     [True] * 13]))
        base = MultiHeadSelfAttention(32, 2, 0.0, pad_to=None)
        padded = MultiHeadSelfAttention(32, 2, 0.0, pad_to=8)
        params = base.init(jax.random.PRNGKey(0), x)
        a = base.apply(params, x, True, mask)
        b = padded.apply(params, x, True, mask)
        # compare only valid rows (masked-query rows are garbage by contract)
        np.testing.assert_allclose(np.asarray(a)[0, :9], np.asarray(b)[0, :9],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(a)[1], np.asarray(b)[1],
                                   atol=1e-5)
