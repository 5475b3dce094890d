"""Batch-size experiment: steady-state reads/s at different read-batch
sizes on the cached bench DBs (ROOFLINE.md §1/§3: gathers are
descriptor-rate bound and rates rise ~2.4x from 32k to 1M lanes, so
fatter batches amortize both the per-op descriptor cost and the
40-80 ms dispatch overhead).

Usage: python scripts/exp_batch.py [mem|greedy] [uniform|real] [BATCH...]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench utilities)

N_BIG = int(os.environ.get("KAIJU_EXP_READS", 131072))


def big_reads(fasta, cache):
    path = os.path.join(cache, "reads_big.fastq")
    if os.path.exists(path):
        reads = []
        with open(path) as fh:
            while True:
                h = fh.readline()
                if not h:
                    break
                seq = fh.readline().strip()
                fh.readline()
                fh.readline()
                reads.append((h.strip()[1:], seq))
        return reads, path
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from readgen import make_reads as gen

    from kaiju_tpu.index.py_builder import read_fasta_records

    records = read_fasta_records(fasta)
    rng = random.Random(4242)
    reads = gen(rng, records, n=N_BIG)
    with open(path, "w") as fh:
        for name, seq in reads:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    return reads, path


def run(mode, realistic, batch):
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
    t0 = time.time()
    pipe.classify_batch(items[:batch])
    warm = time.time() - t0
    print(f"exp: {mode} batch={batch} warmup {warm:.1f}s", flush=True)
    t0 = time.time()
    n_done = 0
    batches = (items[i:i + batch] for i in range(batch, len(items), batch))
    for results in pipe.classify_stream(batches):
        n_done += len(results)
    dt = time.time() - t0
    rps = n_done / dt
    frac = pipe.stats["flagged"] / max(pipe.stats["reads"], 1)
    print(f"exp: {mode} {'real' if realistic else 'unif'} batch={batch}: "
          f"{n_done} reads in {dt:.2f}s = {rps:.0f} r/s "
          f"(replay {frac*100:.2f}%)", flush=True)
    return rps


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "mem"
    realistic = (sys.argv[2] if len(sys.argv) > 2 else "uniform") == "real"
    sizes = [int(a) for a in sys.argv[3:]] or [32768]
    for b in sizes:
        run(mode, realistic, b)


if __name__ == "__main__":
    main()
