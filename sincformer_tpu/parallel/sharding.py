"""Tensor-parallel parameter shardings (library-level).

The reference has no distributed execution at all (SURVEY.md §2 parallelism
table); the TPU framework's scale-out story is mesh-based SPMD. Batch/data
sharding lives in ``parallel.mesh``; this module adds the *model* axis:
rule-based PartitionSpecs that split the large GEMM weights of any model in
the zoo (DCSE ``SpeechEnhancer``, ``ComplexConformer``, the metacog agent
stack, the classic DNN) across a ``("data", "model")`` mesh.

Design: weights-only annotations + GSPMD propagation. Every Dense/Conv
kernel whose output-features dim divides the model-axis size is split on
that dim (Megatron column-parallel flavour); everything else (LayerNorm
scales, biases, small heads, scalar state) is replicated. XLA's sharding
propagation then lays out activations and inserts the all-reduces over ICI
— there is no hand-written collective to maintain, which is the idiomatic
TPU substitute for the reference's (absent) NCCL layer.

Used by train/dcse_trainer.py and train/agent_trainer.py whenever their
mesh has a ``model`` axis of size > 1, and by ``__graft_entry__
.dryrun_multichip`` (the driver's multi-chip gate), so the TP path is
exercised by tests/test_distributed.py on the virtual 8-CPU mesh.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Don't split tiny kernels: below this output width the all-reduce latency
# dwarfs the GEMM win and ragged head dims stop dividing evenly.
_MIN_SPLIT_DIM = 64


def has_model_axis(mesh: Mesh | None, axis: str = "model") -> bool:
    """True when ``mesh`` carries a tensor-parallel axis of size > 1."""
    return (mesh is not None and axis in mesh.axis_names
            and mesh.shape[axis] > 1)


def tp_spec(leaf: Any, n_shards: int, axis: str = "model",
            min_dim: int = _MIN_SPLIT_DIM) -> P:
    """PartitionSpec for one parameter leaf.

    Split the output-features (last) dim of matmul/conv kernels — Dense
    kernels are (in, out), Conv kernels (k, in, out) — when it divides the
    model-axis size and is large enough to be worth communicating for.
    """
    if (leaf.ndim >= 2 and leaf.shape[-1] >= min_dim
            and leaf.shape[-1] % n_shards == 0):
        return P(*([None] * (leaf.ndim - 1)), axis)
    return P()


def tp_param_shardings(params, mesh: Mesh, axis: str = "model"):
    """Pytree of NamedShardings mirroring ``params`` (rule: ``tp_spec``)."""
    n = mesh.shape[axis]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, tp_spec(leaf, n, axis)), params)


def shard_params(params, mesh: Mesh, axis: str = "model"):
    """device_put ``params`` with tensor-parallel shardings.

    No-op (fully replicated placement) when the mesh has no ``axis`` or it
    has size 1 — callers can pass any mesh unconditionally.
    """
    if not has_model_axis(mesh, axis):
        return jax.device_put(params,
                              jax.tree.map(lambda _: NamedSharding(mesh, P()),
                                           params))
    return jax.device_put(params, tp_param_shardings(params, mesh, axis))


def shard_state_params(state, mesh: Mesh | None, axis: str = "model"):
    """Apply TP shardings to a TrainState's params (+ matching opt state).

    Optimizer moments mirror the param tree, so they take the same specs;
    scalar counters stay replicated. Returns the state unchanged when no
    model axis is present.
    """
    if not has_model_axis(mesh, axis):
        return state
    shardings = tp_param_shardings(state.params, mesh, axis)
    params = jax.device_put(state.params, shardings)

    def shard_like_params(tree):
        # optax states embed param-shaped pytrees (mu, nu, trace…); map any
        # leaf whose shape matches a param leaf to that param's sharding
        flat_p = jax.tree.leaves(state.params)
        flat_s = jax.tree.leaves(shardings)
        by_shape = {}
        for pl_, sh in zip(flat_p, flat_s):
            by_shape.setdefault(pl_.shape, sh)

        def place(leaf):
            sh = by_shape.get(getattr(leaf, "shape", None))
            if sh is None:
                sh = NamedSharding(mesh, P())
            return jax.device_put(leaf, sh)

        return jax.tree.map(place, tree)

    opt_state = shard_like_params(state.opt_state)
    return state.replace(params=params, opt_state=opt_state)
