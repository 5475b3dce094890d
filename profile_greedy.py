"""Per-phase wall-time profile of the Greedy pipeline on the bench DB.

Usage: KAIJU_BENCH_DB_LETTERS=8000000 python profile_greedy.py [n_batches]
"""

import os
import random
import sys
import time

import bench


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    batch = int(os.environ.get("KAIJU_BENCH_BATCH", 4096))
    index, fasta, nodes = bench.build_db()

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from readgen import make_reads as gen

    from kaiju_tpu.index.py_builder import read_fasta_records

    records = read_fasta_records(fasta)
    rng = random.Random(4242)
    reads = gen(rng, records, n=batch * (n_batches + 1))

    from kaiju_tpu.engine.config import KaijuConfig
    from kaiju_tpu.engine.greedy_fast import GreedyFastPipeline
    from kaiju_tpu.io.taxonomy import Taxonomy, parse_nodes_dmp

    tax = Taxonomy(parse_nodes_dmp(nodes))
    cfg = KaijuConfig(mode="greedy")
    pipe = GreedyFastPipeline(
        index, tax, cfg, kmer_cache_dir=os.path.join(bench.CACHE, "db.ktx"),
        source_fasta=fasta,
    )
    items = [(n, s, None) for n, s in reads]
    t0 = time.time()
    pipe.classify_batch(items[:batch])
    print(f"warmup {batch}: {time.time()-t0:.1f}s", flush=True)

    import kaiju_tpu.engine.greedy_fast as gf
    import kaiju_tpu.engine.mem_fast as mf

    timers = {}

    def patch(cls, name):
        orig = getattr(cls, name)

        def wrap(self, *a, **k):
            t = time.time()
            r = orig(self, *a, **k)
            timers[name] = timers.get(name, 0) + time.time() - t
            return r

        setattr(cls, name, wrap)

    for n in ["_compute_maps", "_simulate", "_backfill", "_replay",
              "_probe_batch", "_extend_batch", "_build_node_caches"]:
        patch(gf.GreedyFastPipeline, n)
    patch(mf.SaResolveMixin, "_resolve_ids")

    t0 = time.time()
    done = 0
    for b in range(1, n_batches + 1):
        pipe.classify_batch(items[b * batch : (b + 1) * batch])
        done += batch
        print(f"  batch {b} done at {time.time()-t0:.1f}s", flush=True)
    tot = time.time() - t0
    print(f"total: {done} reads in {tot:.2f}s -> {done/tot:.0f} reads/s")
    for k, v in sorted(timers.items(), key=lambda x: -x[1]):
        print(f"  {k:22s} {v:.3f}s")


if __name__ == "__main__":
    main()
