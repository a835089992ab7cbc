"""Worker for the simulated 2-process multi-host test.

Launched by tests/test_distributed.py with JAX_PLATFORMS=cpu and 2 virtual
CPU devices per process → a 4-device global mesh across 2 "hosts".
"""

import os
import sys


def main():
    pid = int(os.environ["JAX_PROCESS_ID"])
    nproc = int(os.environ["JAX_NUM_PROCESSES"])
    out_dir = sys.argv[1]

    from sincformer_tpu.parallel.distributed import (
        global_batch_from_local, init_distributed, is_primary,
        make_global_mesh, merge_grid_results, partition_grid_cells)

    assert init_distributed(), "distributed init returned False"
    import jax
    import jax.numpy as jnp
    import numpy as np

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())
    assert len(jax.local_devices()) == 2

    # hybrid mesh: data axis spans hosts
    mesh = make_global_mesh(("data",))
    assert mesh.shape["data"] == 2 * nproc

    # per-host local rows → global batch; a jitted global reduction must
    # see BOTH hosts' data (the DCN collective path)
    local = np.full((2, 4), float(pid + 1), np.float32)
    batch = global_batch_from_local(mesh, {"x": local})
    total = jax.jit(lambda x: jnp.sum(x))(batch["x"])
    expect = sum((p + 1) * 2 * 4 for p in range(nproc))
    got = float(total)
    assert got == expect, (got, expect)

    # 2-D hybrid mesh with a model axis inside the host
    mesh2 = make_global_mesh(("data", "model"), model_axis_size=2)
    assert mesh2.shape == {"data": nproc, "model": 2}, dict(mesh2.shape)

    # grid-cell partitioning: disjoint, complete
    cells = partition_grid_cells(["white", "babble"], [-5, 0, 5, 10])
    all_cells = [partition_grid_cells(["white", "babble"], [-5, 0, 5, 10],
                                      process_id=p, num_processes=nproc)
                 for p in range(nproc)]
    flat = [c for part in all_cells for c in part]
    assert len(flat) == 8 and len(set(flat)) == 8
    assert cells == all_cells[pid]

    # merge helper round-trips disjoint partial results
    part = {"white": {"noisy": {0: {"stoi": [0.5 + pid]}}}}
    merged = merge_grid_results([part,
                                 {"white": {"noisy": {5: {"stoi": [1.0]}}}}])
    assert merged["white"]["noisy"][0]["stoi"] == [0.5 + pid]

    # multi-host orbax checkpoint of a globally-sharded array
    from jax.sharding import NamedSharding, PartitionSpec as P
    import orbax.checkpoint as ocp
    arr = jax.device_put(
        np.arange(4 * 8, dtype=np.float32).reshape(4, 8),
        NamedSharding(mesh, P("data", None)))
    path = os.path.join(out_dir, "ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"w": arr}, force=True)
    ckptr.wait_until_finished()
    restored = ckptr.restore(path, {"w": arr})
    # the global array is not fully addressable on one host — verify each
    # locally-addressable shard against the expected slice
    expected = np.arange(4 * 8, dtype=np.float32).reshape(4, 8)
    assert restored["w"].shape == (4, 8)
    shards = restored["w"].addressable_shards
    assert len(shards) == 2
    for shard in shards:
        np.testing.assert_allclose(np.asarray(shard.data),
                                   expected[shard.index])

    # distributed grid evaluation: each host runs its (noise, SNR) cells,
    # results merge identically on every host
    from sincformer_tpu.evaluation.grid import evaluate_grid_distributed

    class _Ident:
        def enhance_signal(self, x):
            return x * 0.9

        def enhance_batch(self, x):
            return np.asarray(x) * 0.9

    rng = np.random.default_rng(7)
    cleans = [rng.standard_normal(2000).astype(np.float32)
              for _ in range(2)]
    noises = {"white": rng.standard_normal(4000).astype(np.float32),
              "pink": rng.standard_normal(4000).astype(np.float32)}
    merged = evaluate_grid_distributed(
        cleans, noises, {"ident": _Ident()}, snr_levels=[0.0, 10.0],
        metrics=("ssnr",), verbose=False,
        out_dir=os.path.join(out_dir, "grid"))
    assert set(merged) == {"white", "pink"}
    for n in merged:
        for snr in (0.0, 10.0):
            assert len(merged[n]["ident"][snr]["ssnr"]) == 2, (n, snr)

    if is_primary():
        with open(os.path.join(out_dir, "primary_ok"), "w") as f:
            f.write("ok")
    print(f"worker {pid}: OK")


if __name__ == "__main__":
    main()
