"""Bisect the fused MEM device program: search-only vs classify tail."""

import os
import sys
import time

import numpy as np

import bench


def t(fn, reps=3):
    np.asarray(fn())
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(out)
    return (time.time() - t0) / reps * 1000


def main():
    index, fasta, nodes = bench.build_db()
    reads, _ = bench.make_reads(fasta)
    from kaiju_tpu.engine.config import KaijuConfig
    from kaiju_tpu.engine.mem_fast import MemFastPipeline, TIE_CAP, STRIP_W
    from kaiju_tpu.io.taxonomy import Taxonomy, parse_nodes_dmp
    from kaiju_tpu.ops.fused_classify import fused_mem_classify
    from kaiju_tpu.ops.fused_mem2 import fused_mem_search2

    tax = Taxonomy(parse_nodes_dmp(nodes))
    cfg = KaijuConfig(mode="mem", seg=True, use_Evalue=False)
    pipe = MemFastPipeline(
        index, tax, cfg, kmer_cache_dir=os.path.join(bench.CACHE, "db.ktx"),
        source_fasta=fasta,
    )
    items = [(n, s, None) for n, s in reads]
    batch = items[:4096]
    pipe.classify_batch(batch)  # warm

    _tag, _reads, _fb, args, M2, Ms, _out = pipe._submit_tail(batch)
    flat, frag_off, rf_rows = args
    j0 = cfg.min_fragment_length - 1

    full = lambda: fused_mem_classify(
        pipe.dev.rec, pipe.dev.C, pipe._seed_rec, flat, frag_off,
        rf_rows, pipe.dev.sa_seq, pipe.dev.sa_off, pipe._seq_tax,
        pipe._parent, pipe._depth, pipe.dev.rec2, pipe._bloom_words,
        *pipe._hyb_arrays(),
        pipe.seed_K, j0, cfg.min_fragment_length, M2, Ms, TIE_CAP,
        pipe.R_BUDGET, cfg.max_match_ids, index.nseq,
        index.chpt_exp, pipe._bloom_m, pipe._bloom_lb, STRIP_W)
    print(f"full classify:  {t(full):.1f} ms", flush=True)

    search = lambda: fused_mem_search2(
        pipe.dev.rec, pipe.dev.C, pipe._seed_rec, flat, frag_off,
        pipe.dev.rec2, pipe._bloom_words, pipe.seed_K, j0,
        cfg.min_fragment_length, M2, TIE_CAP, Ms,
        pipe._bloom_m, pipe._bloom_lb, STRIP_W)
    print(f"search only:    {t(search):.1f} ms", flush=True)

    # search without bloom screening (more lanes extend)
    search_nb = lambda: fused_mem_search2(
        pipe.dev.rec, pipe.dev.C, pipe._seed_rec, flat, frag_off,
        pipe.dev.rec2, None, pipe.seed_K, j0,
        cfg.min_fragment_length, M2, TIE_CAP, Ms, 0, 0, STRIP_W)
    print(f"search nobloom: {t(search_nb, reps=1):.1f} ms", flush=True)

    out = np.asarray(full())
    B = len(batch)
    print("n2 =", out[-1, 0], " n_surv =", out[-1, 1],
          " M2 =", M2, " Ms =", Ms)
    print("classified:", int((out[:B, 0] > 0).sum()), "/", B)


if __name__ == "__main__":
    main()
