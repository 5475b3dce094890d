"""Capture a device trace of one fused MEM/Greedy batch at a given
batch size, then aggregate op durations (analyze_trace-style)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from scripts.exp_batch import big_reads  # noqa: E402

TRACE_DIR = "/tmp/jax_trace_exp"


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "mem"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    realistic = len(sys.argv) > 3 and sys.argv[3] == "real"

    import jax

    from kaiju_tpu.engine.config import KaijuConfig
    from kaiju_tpu.io.taxonomy import Taxonomy, parse_nodes_dmp

    cache = bench.CACHE_REAL if realistic else bench.CACHE
    index, fasta, nodes = bench.build_db(realistic)
    reads, _ = big_reads(fasta, cache)
    tax = Taxonomy(parse_nodes_dmp(nodes))
    if mode == "mem":
        from kaiju_tpu.engine.mem_fast import MemFastPipeline

        cfg = KaijuConfig(mode="mem", seg=True, use_Evalue=False)
        pipe = MemFastPipeline(
            index, tax, cfg, kmer_cache_dir=os.path.join(cache, "db.ktx"),
            source_fasta=fasta)
    else:
        from kaiju_tpu.engine.greedy_device import GreedyDevicePipeline

        cfg = KaijuConfig(mode="greedy")
        pipe = GreedyDevicePipeline(
            index, tax, cfg, kmer_cache_dir=os.path.join(cache, "db.ktx"),
            source_fasta=fasta)
    items = [(n, s, None) for n, s in reads]
    pipe.classify_batch(items[:batch])  # warm
    t0 = time.time()
    pipe.classify_batch(items[batch:2 * batch])
    print(f"steady batch: {time.time()-t0:.2f}s", flush=True)

    with jax.profiler.trace(TRACE_DIR):
        pipe.classify_batch(items[2 * batch:3 * batch])

    import collections
    import glob

    from jax.profiler import ProfileData

    path = sorted(
        glob.glob(TRACE_DIR + "/plugins/profile/*/*.xplane.pb"))[-1]
    pd = ProfileData.from_file(path)
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        agg = collections.Counter()
        cnt = collections.Counter()
        total = 0
        for line in plane.lines:
            if "Ops" not in line.name:
                continue
            for ev in line.events:
                base = ev.name.split(".")[0]
                agg[base] += ev.duration_ns
                cnt[base] += ev.duration_ns and 1
                total += ev.duration_ns
        print(f"== {plane.name}: total op time {total/1e6:.1f} ms")
        for name, dur in agg.most_common(35):
            print(f"  {dur/1e6:9.2f} ms  x{cnt[name]:<6d} {name}")


if __name__ == "__main__":
    main()
