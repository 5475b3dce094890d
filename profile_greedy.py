"""Profile the fused Greedy device pipeline: per-batch breakdown of
fragment / dispatch / device-fetch / host-replay time plus retry and
flag counters.  Run on the TPU with the cached bench DB."""
import os
import random
import sys
import time

CACHE = ".bench_cache/db64M"
BATCH = int(os.environ.get("PG_BATCH", "4096"))
NREADS = int(os.environ.get("PG_READS", "12288"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import make_reads  # noqa: E402
from kaiju_tpu.engine.config import KaijuConfig  # noqa: E402
from kaiju_tpu.engine.greedy_device import GreedyDevicePipeline  # noqa: E402
from kaiju_tpu.index.core import KaijuIndex  # noqa: E402
from kaiju_tpu.io.taxonomy import Taxonomy, parse_nodes_dmp  # noqa: E402

import numpy as np  # noqa: E402


def main():
    index = KaijuIndex.load(os.path.join(CACHE, "db.ktx"))
    tax = Taxonomy(parse_nodes_dmp(os.path.join(CACHE, "nodes.dmp")))
    cfg = KaijuConfig(mode="greedy")
    pipe = GreedyDevicePipeline(
        index, tax, cfg, kmer_cache_dir=os.path.join(CACHE, "db.ktx"),
        source_fasta=os.path.join(CACHE, "db.faa"),
    )
    all_reads, _path = make_reads(os.path.join(CACHE, "db.faa"))
    reads = [(n, s, None) for n, s in all_reads[:NREADS]]

    # warmup
    t0 = time.time()
    pipe.classify_batch(reads[:BATCH])
    print(f"warmup {time.time()-t0:.1f}s", flush=True)

    for bi in range(0, len(reads), BATCH):
        batch = reads[bi : bi + BATCH]
        t0 = time.time()
        B = len(batch)
        S = pipe.S_SLOTS
        flat, chars, frag_off, n_frags, _keys, rf, oflow = (
            pipe._fragmenter2.run(batch, S, pipe._bucket)
        )
        t_frag = time.time() - t0

        P = flat.shape[0]
        Bp = pipe._bucket(B, 512)
        F = frag_off.shape[0] - 1
        frag_rid = np.full(F, Bp, dtype=np.int32)
        rows = rf[rf >= 0]
        rids = np.broadcast_to(
            np.arange(B, dtype=np.int32)[:, None], rf.shape
        )[rf >= 0]
        frag_rid[rows] = rids
        M2 = pipe._m2.setdefault(P, min(P // 8, 32768))
        Ms = pipe._ms

        t0 = time.time()
        out = pipe._dispatch(flat, frag_off, frag_rid, Bp, M2, Ms)
        t_disp = time.time() - t0

        t0 = time.time()
        packed = np.asarray(out)
        t_fetch = time.time() - t0

        n2, n_surv, n_nodes, max_nv, n_ties = (
            int(x) for x in packed[Bp, :5]
        )
        from kaiju_tpu.ops.fused_greedy import FLAG_NEED_MORE, FLAG_TIE_OVER
        flagged = [
            r for r in range(B)
            if packed[r, 2] & (FLAG_TIE_OVER | FLAG_NEED_MORE)
        ]
        flens = np.diff(frag_off)
        long_rows = np.flatnonzero(flens >= 512)
        n_long = sum(1 for fr_ in long_rows if frag_rid[fr_] < B)

        t0 = time.time()
        if flagged:
            sub = [batch[r] for r in flagged]
            pipe._host_pipe().classify_batch(sub)
        t_replay = time.time() - t0

        print(
            f"batch {bi//BATCH}: P={P} F={F} frag={t_frag:.2f}s "
            f"disp={t_disp:.2f}s fetch={t_fetch:.2f}s "
            f"replay={t_replay:.2f}s ({len(flagged)} flagged, "
            f"{n_long} long) "
            f"n2={n2}/{M2} nsurv={n_surv}/{Ms} nodes={n_nodes}/{pipe._mn} "
            f"nv={max_nv}/{pipe._mv} ties={n_ties}/{pipe._mt}",
            flush=True,
        )


if __name__ == "__main__":
    main()
