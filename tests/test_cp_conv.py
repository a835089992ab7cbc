"""Halo-exchange context-parallel depthwise conv (ops/cp_conv.py).

Background: jax 0.9.0's GSPMD partitioner returns conv KERNEL gradients
scaled by the size of any unused mesh axis when the conv input is
spatially sharded (repro kept in
TestXlaPartitionerBugDocumented::test_gspmd_conv_grad_doubling). The CP
conv avoids the partitioner with an explicit shard_map + ppermute halo.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sincformer_tpu.parallel.mesh import make_mesh


def _ref_depthwise(x, kernel, bias):
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=kernel.shape[-1])
    return y + bias


class TestCPDepthwiseConv:
    def _setup(self, rng, t=64, c=16, k=7):
        x = jnp.asarray(rng.standard_normal((2, t, c)), jnp.float32)
        kernel = jnp.asarray(rng.standard_normal((k, 1, c)) * 0.2,
                             jnp.float32)
        bias = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
        return x, kernel, bias

    @pytest.mark.parametrize("meshspec",
                             [((8,), ("data",)), ((4, 2), ("data", "model"))])
    def test_forward_matches_local(self, rng, meshspec):
        from sincformer_tpu.ops.cp_conv import cp_depthwise_conv
        shape, axes = meshspec
        mesh = make_mesh(int(np.prod(shape)), axes,
                         shape=shape if len(shape) > 1 else None)
        x, kernel, bias = self._setup(rng)
        ref = _ref_depthwise(x, kernel, bias)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", None)))
        out = jax.jit(lambda a, b, c_: cp_depthwise_conv(
            a, b, c_, mesh, "data"))(xs, kernel, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_grads_exact_on_two_axis_mesh(self, rng):
        """The whole point: kernel grads are NOT doubled on a (4, 2) mesh."""
        from sincformer_tpu.ops.cp_conv import cp_depthwise_conv
        mesh = make_mesh(8, ("data", "model"), shape=(4, 2))
        x, kernel, bias = self._setup(rng)

        def ref_loss(ker, b, x_):
            return jnp.mean(_ref_depthwise(x_, ker, b) ** 2)

        def cp_loss(ker, b, x_):
            return jnp.mean(cp_depthwise_conv(x_, ker, b, mesh,
                                              "data") ** 2)

        gk_ref, gb_ref = jax.jit(jax.grad(ref_loss, argnums=(0, 1)))(
            kernel, bias, x)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", None)))
        gk, gb = jax.jit(jax.grad(cp_loss, argnums=(0, 1)))(kernel, bias, xs)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref),
                                   atol=1e-6)

    def test_depthwise_module_param_compat_and_dispatch(self, rng):
        """models.conformer.DepthwiseConv == nn.Conv params; same output
        outside a ring context, and CP output inside one."""
        import flax.linen as nn

        from sincformer_tpu.models.conformer import DepthwiseConv
        from sincformer_tpu.ops.attention import ring_mesh
        x = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)
        ours = DepthwiseConv(16, 7)
        theirs = nn.Conv(16, kernel_size=(7,), feature_group_count=16,
                         padding="SAME")
        p = theirs.init(jax.random.PRNGKey(0), x)
        # identical param tree (names + shapes) → checkpoints interchange
        ours_p = ours.init(jax.random.PRNGKey(0), x)
        assert jax.tree.structure(p) == jax.tree.structure(ours_p)
        ref = theirs.apply(p, x)
        np.testing.assert_allclose(np.asarray(ours.apply(p, x)),
                                   np.asarray(ref), atol=1e-6)
        mesh = make_mesh(8, ("data",))
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", None)))
        with ring_mesh(mesh, "data"):
            out = jax.jit(lambda p_, x_: ours.apply(p_, x_))(p, xs)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


class TestXlaPartitionerBugDocumented:
    def test_gspmd_conv_grad_doubling(self, rng):
        """Documents the upstream issue the CP conv works around: GSPMD
        conv kernel grads scale with the unused mesh-axis size. If this
        starts PASSING with ratio≈1 after a jax upgrade, the workaround
        can be retired."""
        mesh = make_mesh(8, ("data", "model"), shape=(4, 2))
        x = jnp.asarray(rng.standard_normal((2, 64, 16)), jnp.float32)
        kernel = jnp.asarray(rng.standard_normal((7, 1, 16)) * 0.2,
                             jnp.float32)

        def loss(ker, x_):
            return jnp.mean(jax.lax.conv_general_dilated(
                x_, ker, window_strides=(1,), padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=16) ** 2)

        g_ref = jax.jit(jax.grad(loss))(kernel, x)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", None)))
        g_sh = jax.jit(jax.grad(loss))(kernel, xs)
        ratio = float(jnp.max(jnp.abs(g_sh)) / jnp.max(jnp.abs(g_ref)))
        assert ratio == pytest.approx(2.0, abs=0.05), (
            f"GSPMD conv-grad bug ratio changed to {ratio} — if ≈1, jax "
            f"fixed it upstream; consider retiring ops/cp_conv.py")
