"""Worker process for the multi-host production-path test.

Each process owns 4 virtual CPU devices; together they form a
(data x index=2) mesh spanning processes.  Every process builds the
same tiny index + read set, then drives the PRODUCTION
ShardedMemClassifier end-to-end over jax.distributed:

  * index uploads via multihost.put_global (each process materialises
    only its locally-owned shards);
  * pipelined classify_stream with a deliberately undersized funnel
    capacity, forcing the capacity-retry path (the overflow counters
    are pmax'd across the mesh inside the program, so every process
    re-dispatches identically);
  * per-process output: the TSV lines for the reads whose data-axis
    rows live on this process (collect returns None elsewhere).

The test merges the per-process TSVs and compares byte-identical
against a single-process run (reference semantics: kaiju-multi loads
the index once and streams samples, kaiju-multi.cpp:307).

Usage: python multihost_worker.py <coordinator> <nprocs> <pid> <outfile>
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, nprocs, pid, outfile = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    from kaiju_tpu.parallel import multihost

    multihost.init_distributed(coordinator, nprocs, pid)

    import random

    import jax

    assert len(jax.devices()) == 4 * nprocs, jax.devices()
    mesh = multihost.make_global_mesh(n_index_shards=2)

    from conftest import make_db_records
    from kaiju_tpu.engine.config import KaijuConfig
    from kaiju_tpu.engine.core import format_output_line
    from kaiju_tpu.index import py_builder
    from kaiju_tpu.io.taxonomy import Taxonomy
    from kaiju_tpu.parallel.sharded_fused import ShardedMemClassifier
    from readgen import make_reads

    rng = random.Random(77)
    records = make_db_records(rng, nseq=12)
    idx = py_builder.build_index(records)
    nodes = {1: 1, 10: 1, 100: 10, 200: 10, 300: 10,
             101: 100, 102: 100, 103: 100, 201: 200, 202: 200, 301: 300}
    tax = Taxonomy(nodes)
    cfg = KaijuConfig(mode="mem", use_Evalue=False)

    clf = ShardedMemClassifier(idx, tax, cfg, mesh, n_index=2)
    # deliberately undersized funnel capacity: the first batch MUST
    # overflow and re-dispatch with grown caps on every process in
    # lockstep (the counters are mesh-pmax'd)
    clf._m2 = 16
    clf._ms = 16

    reads = [(n, s, None) for n, s in make_reads(rng, records, n=24)]
    batches = [reads[:12], reads[12:]]

    lines = {}
    base = 0
    for batch, results in zip(batches, clf.classify_stream(iter(batches))):
        for g, item in enumerate(results):
            if item is None:
                continue
            name, res = item
            lines[base + g] = format_output_line(name, res, False)
        base += len(batch)
    assert clf._m2 > 16, "capacity retry did not fire"

    with open(outfile, "w") as fh:
        json.dump({str(k): v for k, v in lines.items()}, fh)
    print(f"worker {pid} OK: {len(lines)} local reads, m2={clf._m2}",
          flush=True)


if __name__ == "__main__":
    main()
