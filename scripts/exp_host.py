"""Host-vs-device wall breakdown: times submit_batch / collect_batch /
output formatting separately to locate the pipeline bottleneck."""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from scripts.exp_batch import big_reads  # noqa: E402


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "mem"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    nb = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    from kaiju_tpu.engine.config import KaijuConfig
    from kaiju_tpu.engine.core import format_output_line
    from kaiju_tpu.io.taxonomy import Taxonomy, parse_nodes_dmp

    cache = bench.CACHE
    index, fasta, nodes = bench.build_db(False)
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
    pipe.classify_batch(items[:batch])  # warmup

    # phase timing: submit all, then device-sync, then collect
    t_sub = t_col = t_fmt = 0.0
    states = []
    t0 = time.perf_counter()
    for i in range(1, nb + 1):
        states.append(pipe.submit_batch(items[i * batch:(i + 1) * batch]))
    t_sub = time.perf_counter() - t0
    import jax

    t0 = time.perf_counter()
    for st in states:
        jax.block_until_ready(st[-1])
    t_dev = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [pipe.collect_batch(st) for st in states]
    t_col = time.perf_counter() - t0
    t0 = time.perf_counter()
    lines = []
    for results in outs:
        for name, res in results:
            lines.append(format_output_line(name, res, False))
    t_fmt = time.perf_counter() - t0
    n = nb * batch
    print(f"{mode} B={batch}: submit {t_sub:.3f}s ({t_sub/n*1e6:.1f}us/read) "
          f"device-wait {t_dev:.3f}s collect {t_col:.3f}s "
          f"({t_col/n*1e6:.1f}us/read) format {t_fmt:.3f}s "
          f"({t_fmt/n*1e6:.1f}us/read)", flush=True)

    # profile one submit+collect round
    pr = cProfile.Profile()
    pr.enable()
    st = pipe.submit_batch(items[:batch])
    pipe.collect_batch(st)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
