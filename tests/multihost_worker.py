"""Worker process for the 2-process multi-host smoke test.

Each process owns 4 virtual CPU devices; together they form a
(data=4, index=2) mesh spanning processes.  Both processes build the
same tiny index + batch, run the sharded MEM classify step, and write
their ADDRESSABLE output rows to a JSON file the test compares against
the single-device pipeline.

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
    import numpy as np
    from jax.sharding import PartitionSpec as P

    assert len(jax.devices()) == 4 * nprocs, jax.devices()
    mesh = multihost.make_global_mesh(n_index_shards=2)

    from conftest import make_db_records
    from kaiju_tpu.engine.config import KaijuConfig
    from kaiju_tpu.engine.mem_fast import SEED_K, TIE_CAP
    from kaiju_tpu.index import py_builder
    from kaiju_tpu.index.alphabet import trans_table
    from kaiju_tpu.io.taxonomy import Taxonomy
    from kaiju_tpu.ops.kmer import KmerTables
    from kaiju_tpu.parallel.sharded_fused import make_sharded_mem_classify
    from kaiju_tpu.parallel.sharded_index import ShardedIndexArrays

    rng = random.Random(77)
    records = make_db_records(rng, nseq=12)
    idx = py_builder.build_index(records)
    sh = ShardedIndexArrays(idx, 2)
    cfg = KaijuConfig(mode="mem", use_Evalue=False)
    K = min(SEED_K, cfg.min_fragment_length)
    kmer = KmerTables.load_or_build(idx, None, K=K)
    seed_K = min(K, kmer.K)
    nodes = {1: 1, 10: 1, 100: 10, 200: 10, 300: 10,
             101: 100, 102: 100, 103: 100, 201: 200, 202: 200, 301: 300}
    par, dep = Taxonomy(nodes).dense_arrays()

    # deterministic fragment batch: D=data axis size, B=2 frag slots/read
    from readgen import make_reads

    reads = make_reads(rng, records, n=8)
    trans = trans_table(idx.alphabet)
    D = mesh.shape["data"]
    per = 2
    flat = np.zeros((D, 512), np.uint8)
    off = np.zeros((D, 9), np.int32)
    rf = np.full((D, per, 4), -1, np.int32)
    from kaiju_tpu.engine.fragments_native import NativeFragmenter

    frag = NativeFragmenter("mem", cfg.min_fragment_length, cfg.min_score,
                            cfg.seg, cfg.input_is_protein)
    for d in range(D):
        sub = [(n, s, None) for n, s in reads[d * per : (d + 1) * per]]
        frags, orders = frag.run(sub)
        pos = 0
        for fi, f in enumerate(frags[:8]):
            e = trans[np.frombuffer(f.encode(), np.uint8)]
            off[d, fi] = pos
            flat[d, pos : pos + len(e)] = e
            pos += len(e)
        off[d, len(frags[:8]):] = pos
        for r, o in enumerate(orders):
            rf[d, r, : len(o)] = [u for u in o[:4]]

    fn = make_sharded_mem_classify(
        mesh, sh, K=seed_K, j0=cfg.min_fragment_length - 1,
        min_len=cfg.min_fragment_length, M2=4096, Ms=4096,
        T=TIE_CAP, R=32, cap=cfg.max_match_ids,
    )

    def put(a, spec):
        return multihost.put_global(np.asarray(a), mesh, spec)

    out = fn(
        put(sh.blocks_sh, P("index")), put(sh.occ_local, P("index")),
        put(sh.shard_base, P()), put(sh.C, P()),
        put(sh.sa_seq_sh, P("index")), put(sh.sa_off_sh, P("index")),
        put(kmer.packed_seed_rec(seed_K), P()),
        put(np.asarray(idx.seq_taxids, np.int32), P()),
        put(par, P()), put(dep, P()),
        put(np.zeros(1, np.uint32), P()),
        put(flat, P("data")), put(off, P("data")), put(rf, P("data")),
    )
    rows = multihost.local_rows(out)
    with open(outfile, "w") as fh:
        json.dump(
            {str(k): v[:per].tolist() for k, v in rows.items()}, fh
        )
    print(f"worker {pid} OK: rows {sorted(rows)}", flush=True)


if __name__ == "__main__":
    main()
