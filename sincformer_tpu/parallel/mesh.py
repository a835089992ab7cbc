"""Mesh + sharding helpers.

Speech-enhancement models here are small (≤10 M params) and utterances are
short, so the dominant axis is *data*: batch-sharded training and the
4-noise × 4-SNR × N-utterance evaluation grid (reference main.py:316-359 is
a serial Python loop; here the grid rides a mesh). The helpers still expose
a 2-D (data, model) mesh so tensor-parallel shardings are available if model
size grows.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Args:
        n_devices: take the first n devices (default: all).
        axis_names: mesh axis names, e.g. ("data",) or ("data", "model").
        shape: explicit mesh shape; defaults to all devices on axis 0.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if len(devices) < n_devices:
            # single-accelerator host: fall back to the virtual CPU backend
            # (tests/dryruns set --xla_force_host_platform_device_count)
            try:
                cpus = list(jax.devices("cpu"))
            except RuntimeError:  # pragma: no cover
                cpus = []
            if len(cpus) >= n_devices:
                devices = cpus
        if len(devices) < n_devices:
            # NEVER silently shrink: a "mesh of 8" that is secretly one
            # device makes every sharding test meaningless
            raise ValueError(
                f"make_mesh: need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh, ndim: int = 2,
                  axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (for params / scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """Device-put every array in a batch dict with its batch dim sharded."""
    out = {}
    for k, v in batch.items():
        sh = NamedSharding(mesh, P(axis, *([None] * (v.ndim - 1))))
        out[k] = jax.device_put(v, sh)
    return out
