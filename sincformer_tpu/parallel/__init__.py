"""SPMD scaling: mesh construction + sharding rules (SURVEY.md §2 parallelism).

The reference has no distributed execution at all (SURVEY.md §2 table);
this package is the TPU-native scaling layer: a ``jax.sharding.Mesh`` over
ICI, batch-sharded training steps (data parallel via jit + NamedSharding —
XLA inserts the gradient psum), and the grid-sharded evaluation sweep.
"""

from sincformer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated,
    shard_batch,
)
