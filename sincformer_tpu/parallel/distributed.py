"""Multi-host (DCN) scaffolding: distributed init, hybrid meshes, per-host
grid partitioning, multi-host-safe checkpoint helpers.

The reference has no distributed execution of any kind (SURVEY.md §2
parallelism table). This module is the TPU-native scale-out layer:

  * :func:`init_distributed` — ``jax.distributed.initialize`` wrapper with
    env-var defaults; no-op for single-process runs, so every pipeline can
    call it unconditionally.
  * :func:`make_global_mesh` — a mesh over ALL global devices. On a
    multi-host slice/pod the inter-host (DCN) dimension is mapped onto the
    leading axis (by default ``data``) so collectives that cross hosts are
    gradient all-reduces (bandwidth-tolerant) while tensor-parallel axes
    stay inside a host's ICI domain — the standard hybrid layout from the
    scaling playbook.
  * :func:`global_batch_from_local` — assemble a globally-sharded batch
    from each host's local shard (``jax.make_array_from_process_local_data``).
  * :func:`partition_grid_cells` / :func:`merge_grid_results` — the
    evaluation grid's (noise, SNR) cells dealt round-robin to hosts
    (reference main.py:316-359 is one serial loop; multi-host runs one
    sub-grid per host and merges).
  * :func:`is_primary` — rank-0 gate for host-side writes (tables, metadata
    JSON). Orbax's StandardCheckpointer is already multi-host-aware once
    ``jax.distributed`` is initialized; train/state.py needs no change.

Everything is testable without TPU pods: tests/test_distributed.py spawns
two REAL processes on the CPU backend (2 virtual devices each → a 4-device
global mesh) and runs init → hybrid mesh → global batch → psum → grid
partitioning end-to-end.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None
                     ) -> bool:
    """Initialize ``jax.distributed`` when running multi-process.

    Arguments default to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``). Returns True when a
    multi-process runtime was initialized, False for the single-process
    no-op — callers never need to branch.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1 or not coordinator_address:
        return False
    import jax
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return True


def make_global_mesh(axis_names: Sequence[str] = ("data", "model"),
                     model_axis_size: int = 1):
    """Mesh over all global devices: DCN (inter-host) on the leading axis,
    ICI (intra-host) split between the trailing axes.

    With one process this degenerates to the local mesh (same axis names),
    so code written against it runs unchanged on a laptop, one chip, or a
    multi-host slice.
    """
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    n_proc = jax.process_count()
    n_total = len(jax.devices())
    per_host = n_total // n_proc
    data_size = n_total // model_axis_size
    if n_proc > 1:
        try:
            # real multi-slice TPU topology: let mesh_utils optimise
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(per_host // model_axis_size, model_axis_size),
                dcn_mesh_shape=(n_proc, 1),
            )
        except ValueError:
            # single-slice / CPU simulation: hybrid layout by hand — hosts
            # contiguous along the data axis, model axis inside a host
            devs = sorted(jax.devices(),
                          key=lambda d: (d.process_index, d.id))
            devices = np.array(devs).reshape(
                n_proc, per_host // model_axis_size, model_axis_size)
    else:
        devices = mesh_utils.create_device_mesh(
            (data_size, model_axis_size))
    devices = np.asarray(devices).reshape(data_size, model_axis_size)
    if len(axis_names) == 1:
        devices = devices.reshape(-1)
    return Mesh(devices, axis_names)


def global_batch_from_local(mesh, local_batch: Dict[str, np.ndarray],
                            axis: str = "data") -> Dict:
    """Per-host local shards → one globally-sharded batch dict.

    Each host passes ONLY its local rows; the returned arrays are global
    jax.Arrays sharded over ``axis`` (host-local data never crosses DCN).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for k, v in local_batch.items():
        spec = P(axis, *([None] * (v.ndim - 1)))
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), v)
    return out


def is_primary() -> bool:
    import jax
    return jax.process_index() == 0


def partition_grid_cells(noise_names: Sequence[str],
                         snr_levels: Sequence[float],
                         process_id: Optional[int] = None,
                         num_processes: Optional[int] = None
                         ) -> List[Tuple[str, float]]:
    """Deterministic round-robin split of the (noise × SNR) evaluation grid
    across hosts. Every host calls this with its own rank and evaluates only
    its cells; :func:`merge_grid_results` reassembles."""
    import jax
    if process_id is None:
        process_id = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()
    cells = [(n, s) for n in noise_names for s in snr_levels]
    return cells[process_id::num_processes]


def merge_grid_results(parts: Sequence[Dict]) -> Dict:
    """Merge per-host ``evaluate_grid`` result dicts (disjoint cells)."""
    merged: Dict = {}
    for part in parts:
        for noise, methods in part.items():
            mtgt = merged.setdefault(noise, {})
            for method, snrs in methods.items():
                stgt = mtgt.setdefault(method, {})
                for snr, metricvals in snrs.items():
                    ctgt = stgt.setdefault(snr, {})
                    for metric, vals in metricvals.items():
                        ctgt.setdefault(metric, []).extend(vals)
    return merged
