"""Multi-host (multi-process) mesh plumbing.

The reference is single-node shared-memory (SURVEY §2.5); the TPU-native
scale-out story spans hosts over DCN: `jax.distributed.initialize` joins
every process into one runtime, the (data x index) mesh spans ALL
processes' devices, and the owner-computes rank/walk collectives in
kaiju_tpu.parallel.sharded_fused ride the same psum whether the index
axis crosses ICI or DCN.

Per-process responsibilities in this model:
  * every process feeds the reads for ITS data-axis slice and reads back
    only its addressable output shards;
  * replicated tables (C, seed records, taxonomy, bloom) are passed by
    every process identically;
  * index shards are materialised per process from the host copy via
    `make_array_from_callback`, so each process only touches the bytes
    its local devices own (a 54 GB refseq_ref index never exists whole
    on any single host's devices).

Smoke-tested with two CPU processes in tests/test_multihost.py.
"""

from __future__ import annotations

import numpy as np


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """Join this process into the global JAX runtime (idempotent)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(n_index_shards: int):
    """(data x index) mesh over ALL processes' devices; the index axis is
    innermost so its collectives ride the faster links."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    n = devs.size
    assert n % n_index_shards == 0, (n, n_index_shards)
    return Mesh(
        devs.reshape(n // n_index_shards, n_index_shards),
        ("data", "index"),
    )


def put_global(arr: np.ndarray, mesh, spec):
    """Host numpy -> globally-sharded device array.  Works in both
    single- and multi-process runtimes: each process materialises only
    the shards its local devices own."""
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: np.ascontiguousarray(arr[idx])
    )


def local_data_rows(mesh) -> list[int]:
    """Data-axis rows whose devices (any index shard) belong to THIS
    process — the read sub-batches this process must fragment, upload
    and collect.  Single-process: every row."""
    import jax

    pid = jax.process_index()
    dev_arr = np.asarray(mesh.devices)  # [D, S]
    return [
        d for d in range(dev_arr.shape[0])
        if any(dev.process_index == pid for dev in dev_arr[d])
    ]


def put_rows(parts: dict[int, np.ndarray], global_shape, dtype, mesh,
             spec):
    """Host rows -> P("data")-sharded global array; `parts` maps
    data-row index -> [*(global_shape[1:])] array and need only contain
    THIS process's rows (local_data_rows).  Works single-process too
    (all rows present)."""
    import jax
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)

    def cb(idx):
        rows = range(*idx[0].indices(global_shape[0]))
        return np.ascontiguousarray(
            np.stack([parts[r] for r in rows]).astype(dtype, copy=False)
        )

    return jax.make_array_from_callback(tuple(global_shape), sharding, cb)


def local_rows(global_out) -> dict[int, np.ndarray]:
    """Addressable data-axis rows of a P("data")-sharded output:
    {global_row_index: row_value}."""
    rows = {}
    for s in global_out.addressable_shards:
        idx = s.index[0]
        start = idx.start or 0
        arr = np.asarray(s.data)
        for r in range(arr.shape[0]):
            rows[start + r] = arr[r]
    return rows
