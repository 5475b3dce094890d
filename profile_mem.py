"""Phase-level profiling of the fused MEM path on the real TPU.

Times each stage of a 4096-read batch separately (with value fetches —
block_until_ready does not synchronize over the axon tunnel):
  host fragmenting, fused device search+classify, full pipeline.
Run: python profile_mem.py [n_batches]
"""

import sys
import time

import numpy as np

import bench


def main():
    index, fasta, nodes = bench.build_db()
    reads, _ = bench.make_reads(fasta)
    import jax

    from kaiju_tpu.engine.config import KaijuConfig
    from kaiju_tpu.engine.mem_fast import MemFastPipeline
    from kaiju_tpu.io.taxonomy import Taxonomy, parse_nodes_dmp
    import os

    print("devices:", jax.devices(), file=sys.stderr)
    tax = Taxonomy(parse_nodes_dmp(nodes))
    cfg = KaijuConfig(mode="mem", seg=True, use_Evalue=False)
    pipe = MemFastPipeline(
        index, tax, cfg,
        kmer_cache_dir=os.path.join(bench.CACHE, "db.ktx"),
        source_fasta=fasta,
    )
    items = [(n, s, None) for n, s in reads]
    B = 4096
    batch = items[:B]

    # warmup/compile
    t0 = time.time()
    pipe.classify_batch(batch)
    print(f"warmup (compile) {time.time()-t0:.1f}s", file=sys.stderr)

    # 1) host fragmenting alone
    t0 = time.time()
    for _ in range(3):
        flat, chars, frag_off, n_frags, _keys, rf, oflow = (
            pipe._fragmenter2.run(batch, pipe.S_SLOTS, pipe._bucket)
        )
    t_frag = (time.time() - t0) / 3
    P = flat.shape[0]
    print(f"fragmenter2: {t_frag*1000:.1f} ms/batch  P={P} "
          f"n_frags={n_frags}", file=sys.stderr)

    # 2) full submit+collect, steady state
    for rep in range(3):
        t0 = time.time()
        st = pipe.submit_batch(batch)
        t_submit = time.time() - t0
        res = pipe.collect_batch(st)
        t_total = time.time() - t0
        print(f"rep{rep}: submit {t_submit*1000:.1f} ms, "
              f"submit+collect {t_total*1000:.1f} ms "
              f"({B/t_total:.0f} reads/s)", file=sys.stderr)

    # 3) device call alone (resubmit same args, fetch)
    st = pipe.submit_batch(batch)
    pipe.collect_batch(st)
    from kaiju_tpu.ops.fused_classify import fused_mem_classify
    _tag, _reads, _fb, args, M2, Ms, _out = pipe._submit_tail(batch)
    flat, frag_off, rf_rows = args
    j0 = cfg.min_fragment_length - 1
    for rep in range(3):
        t0 = time.time()
        out = fused_mem_classify(
            pipe.dev.rec, pipe.dev.C, pipe._seed_rec, flat, frag_off,
            rf_rows, pipe.dev.sa_seq, pipe.dev.sa_off, pipe._seq_tax,
            pipe._parent, pipe._depth, pipe.dev.rec2, pipe._bloom_words,
            *pipe._hyb_arrays(),
            pipe.seed_K, j0, cfg.min_fragment_length, M2, Ms, 8,
            pipe.R_BUDGET, cfg.max_match_ids, index.nseq,
            index.chpt_exp, pipe._bloom_m, pipe._bloom_lb, 4)
        np.asarray(out)
        print(f"device fused call rep{rep}: {(time.time()-t0)*1000:.1f} ms",
              file=sys.stderr)

    # 4) optional: jax profiler trace of one call
    if "--trace" in sys.argv:
        import jax.profiler
        with jax.profiler.trace("/tmp/jax_trace"):
            out = fused_mem_classify(
                pipe.dev.rec, pipe.dev.C, pipe._seed_rec, flat, frag_off,
                rf_rows, pipe.dev.sa_seq, pipe.dev.sa_off, pipe._seq_tax,
                pipe._parent, pipe._depth, pipe.dev.rec2, pipe._bloom_words,
                *pipe._hyb_arrays(),
                pipe.seed_K, j0, cfg.min_fragment_length, M2, Ms, 8,
                pipe.R_BUDGET, cfg.max_match_ids, index.nseq,
                index.chpt_exp, pipe._bloom_m, pipe._bloom_lb, 4)
            np.asarray(out)
        print("trace written to /tmp/jax_trace", file=sys.stderr)


if __name__ == "__main__":
    main()
