"""Greedy-mode batch pipeline: ONE fused device call per batch.

The search, variant fan-out, tie collection, SA resolution and LCA all
run on device (kaiju_tpu.ops.fused_greedy); the host fragments reads
(native), applies the float64 E-value gate (reference:
ConsumerThread.cpp:500-513) and replays the rare flagged reads (tie or
budget overflow, slot-table overflow, >=512-aa fragments) through the
exact host machinery (kaiju_tpu.engine.greedy_fast.GreedyFastPipeline).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..constants import (
    AA_TO_INT,
    BLOSUM62,
    BLOSUM62_DIAG,
    BLOSUM_SUBST,
    LAMBDA,
    LN_2,
    LN_K,
)
from ..index.alphabet import trans_table
from ..index.core import KaijuIndex
from ..io.taxonomy import Taxonomy
from ..ops import device_index as dev
from ..ops.fused_greedy import (
    FLAG_NEED_MORE,
    FLAG_TIE_OVER,
    fused_greedy_classify,
)
from ..ops.kmer import KmerTables
from .config import KaijuConfig
from .core import ClassifyResult
from .fragments_native import NativeFragmenter2
from .mem_fast import SEED_K

QLCAP = 512  # fragments >= this many aa replay on host (group-rule cap)


def greedy_scoring_tables(alphabet, trans):
    """Letter-code-indexed scoring tables for the fused Greedy program:
    diag [32], and per original code the 19 substitutions in the
    reference's descending-score order (ConsumerThread.cpp:346-395) —
    B62[orig, sub], substituted letter code, diag[sub]."""
    diag = np.zeros(32, dtype=np.int32)
    submat = np.zeros((32, 19), dtype=np.int32)
    subcode = np.zeros((32, 19), dtype=np.int32)
    subdiag = np.zeros((32, 19), dtype=np.int32)
    for code, ch in enumerate(alphabet):
        if ch not in AA_TO_INT:
            continue
        oi = AA_TO_INT[ch]
        diag[code] = int(BLOSUM62_DIAG[oi])
        for s, sub in enumerate(BLOSUM_SUBST[ch]):
            bi = AA_TO_INT[sub]
            submat[code, s] = int(BLOSUM62[oi, bi])
            subcode[code, s] = int(trans[ord(sub)])
            subdiag[code, s] = int(BLOSUM62_DIAG[bi])
    return diag, submat, subcode, subdiag


class GreedyDevicePipeline:
    def __init__(
        self,
        index: KaijuIndex,
        taxonomy: Taxonomy,
        config: KaijuConfig,
        device_index: Optional[dev.DeviceIndex] = None,
        kmer_tables: Optional[KmerTables] = None,
        kmer_cache_dir: Optional[str] = None,
        source_fasta: Optional[str] = None,
    ):
        assert config.mode == "greedy" and not config.taxonomy_free
        assert taxonomy is not None and not config.verbose
        import jax

        from ..utils import enable_compile_cache

        enable_compile_cache()
        self.cfg = config
        self.index = index
        self.tax = taxonomy
        self.dev = device_index or dev.DeviceIndex(index)
        want_K = min(SEED_K, config.seed_length)
        self.kmer = kmer_tables or KmerTables.load_or_build(
            index, kmer_cache_dir, K=want_K, device_index=self.dev
        )
        self.seed_K = min(want_K, self.kmer.K)
        self._seed_rec = tuple(
            jax.device_put(a) for a in self.kmer.planar_seed(self.seed_K)
        )
        from ..ops.bloom import BloomScreen

        self._lmap = min(config.seed_length, config.min_fragment_length)
        bl = BloomScreen.load_or_build(
            index, kmer_cache_dir or index.source_dir, self._lmap,
            fasta=source_fasta,
        )
        self._bloom_words = bl.words if bl else None
        self._bloom_m = bl.m if bl else 0
        self._bloom_lb = bl.lb if bl else 0
        self._trans = trans_table(index.alphabet)
        self._fragmenter2 = NativeFragmenter2(
            "greedy", config.min_fragment_length, config.min_score,
            config.seg, config.input_is_protein,
        )
        par, dep = taxonomy.dense_arrays()
        self._parent = jax.device_put(par)
        self._depth = jax.device_put(dep)
        self._seq_tax = jax.device_put(
            np.asarray(index.seq_taxids, dtype=np.int32)
        )
        # scoring tables indexed by LETTER CODE (index alphabet)
        diag, submat, subcode, subdiag = greedy_scoring_tables(
            index.alphabet, self._trans
        )
        self._diag_tab = jax.device_put(diag)
        self._submat = jax.device_put(submat)
        self._subcode_tab = jax.device_put(subcode)
        self._subdiag_tab = jax.device_put(subdiag)
        # sticky capacities (grow on overflow, never shrink: shape changes
        # force executable reloads over the tunnel), persisted per DB so
        # later processes start at steady state and compile exactly once
        from ..utils.capstore import CapStore

        self._caps = CapStore(
            kmer_cache_dir or index.source_dir, "greedy",
            sig=config.cap_sig(),
        )
        self._m2: dict[int, int] = self._caps.get_map("m2")
        self._msm: dict[int, int] = self._caps.get_map("ms2")
        # funnel caps are P-keyed maps (they track the flat batch size;
        # a new batch-size bucket seeds by proportional scaling from the
        # nearest learned bucket — utils/capstore.py seeded()).  Legacy
        # scalar entries were learned at the standard 4096-read bucket
        # (P = 1 << 20) and seed that key.
        self._mn: dict[int, int] = self._caps.get_map("mn2")
        self._mv: dict[int, int] = self._caps.get_map("mv2")
        self._mt: dict[int, int] = self._caps.get_map("mt2")
        self._mh: dict[int, int] = self._caps.get_map("mh2")
        LEGACY_P = 1 << 20
        for name, m in (("mn", self._mn), ("mv", self._mv),
                        ("mt", self._mt), ("mh", self._mh)):
            v = self._caps.get(name, 0)
            if v and LEGACY_P not in m:
                m[LEGACY_P] = v
        self._host: Optional[object] = None  # lazy exact-replay pipeline
        # running counters: host-replay (flagged) reads vs total, for
        # benchmark reporting of the funnel's fallback economics
        self.stats = {"reads": 0, "flagged": 0}
        from ..utils.aot import AotCache

        self._aot = AotCache(kmer_cache_dir or index.source_dir)

    S_SLOTS = 16
    R_BUDGET = 32

    @staticmethod
    def _bucket(n: int, lo: int) -> int:
        b = lo
        while b < n:
            b *= 2
        return b

    def _host_pipe(self):
        """Exact host replay engine for flagged reads.  The pure-host
        sequential classifier (the parity oracle) costs NO device
        compiles — flagged reads are <0.1% of a stream, and the
        device-pipeline fallback used before compiled its own fused
        programs on the FIRST flagged read, stalling the stream for
        tens of seconds."""
        if self._host is None:
            from .core import ExactClassifier

            self._host = ExactClassifier(self.index, self.tax, self.cfg)
        return self._host

    # ------------------------------------------------------------------

    def _hyb_arrays(self):
        from ..ops.fused_mem2 import VBASE

        if self.dev.has_text and self.index.length < VBASE:
            return self.dev.textp, self.dev.rank_start
        return None, None

    def _dispatch(self, flat, frag_off, frag_rid, B, caps):
        cfg = self.cfg
        M2, Ms, mn, mv, mt, mh = caps
        textp, rank_start = self._hyb_arrays()
        arrays = (
            self.dev.rec, self.dev.C, self.dev.rec2, self._seed_rec,
            self._bloom_words, self.dev.sa_seq, self.dev.sa_off,
            self._seq_tax, self._parent, self._depth,
            textp, rank_start,
            flat, frag_off, frag_rid,
            self._diag_tab, self._submat, self._subcode_tab,
            self._subdiag_tab,
        )
        statics = (
            B, self.seed_K, self._lmap - 1, self._lmap,
            cfg.min_fragment_length, cfg.min_score, cfg.mismatches,
            M2, Ms, mn, mv, mt, mh,
            cfg.max_matches_SI, self.R_BUDGET, cfg.max_match_ids,
            self.index.nseq, self.index.chpt_exp,
            self._bloom_m, self._bloom_lb, 4,
        )
        # exported-artifact call: skips the minutes-long re-trace of the
        # mega-program in every fresh process (utils/aot.py)
        return self._aot.call("greedy", fused_greedy_classify, arrays,
                              statics)

    def submit_batch(self, reads):
        # pad ragged batches up to the largest read-count bucket seen
        # for this DB: the trailing short batch of a stream must reuse
        # the full batch's executable, not compile (and possibly load
        # over the tunnel) a second one mid-stream
        B_real = len(reads)
        self._bmax = max(
            getattr(self, "_bmax", 0), self._bucket(B_real, 512)
        )
        bmax = self._bmax
        if B_real < bmax:
            reads = list(reads) + [("", "", None)] * (bmax - B_real)
        B = len(reads)
        S = self.S_SLOTS
        flat, chars, frag_off, n_frags, _keys, rf, oflow = (
            self._fragmenter2.run(reads, S, self._bucket)
        )
        # sticky shape buckets: pad ragged batches up to the largest
        # (P, F) seen for this DB at this read-count bucket so ONE
        # executable serves the whole stream (a second shape costs a
        # compile + a multi-second executable load over the device
        # tunnel); keyed by read-count bucket so a one-off large-batch
        # run cannot inflate smaller-batch runs
        from ..utils.capstore import CapStore

        Bp0 = self._bucket(B, 512)
        pmax_map = self._caps.get_map("pmax")
        fmax_map = self._caps.get_map("fmax")
        P = max(flat.shape[0],
                CapStore.seeded(pmax_map, Bp0, 4096,
                                self._caps.get("pmax", 0)))
        F = max(frag_off.shape[0] - 1,
                CapStore.seeded(fmax_map, Bp0, 128,
                                self._caps.get("fmax", 0)))
        self._caps.update(pmax={Bp0: P}, fmax={Bp0: F})
        if P > flat.shape[0]:
            flat = np.concatenate(
                [flat, np.zeros(P - flat.shape[0], np.uint8)]
            )
        if F > frag_off.shape[0] - 1:
            frag_off = np.concatenate([
                frag_off,
                np.full(F + 1 - frag_off.shape[0], frag_off[-1], np.int32),
            ])
        Bp = self._bucket(B, 512)
        # read id per fragment row (pad = Bp); rows only reachable via rf
        frag_rid = np.full(F, Bp, dtype=np.int32)
        rows = rf[rf >= 0]
        rids = np.broadcast_to(
            np.arange(B, dtype=np.int32)[:, None], rf.shape
        )[rf >= 0]
        frag_rid[rows] = rids
        # host-replay guards: slot overflow, over-long fragments (the
        # on-device group rule clamps lengths at QLCAP)
        flens = np.diff(frag_off)
        long_rows = np.flatnonzero(flens >= QLCAP)
        fallback = set(np.flatnonzero(oflow).tolist())
        for fr_ in long_rows:
            if frag_rid[fr_] < B:
                fallback.add(int(frag_rid[fr_]))

        from ..utils.capstore import CapStore

        seeded = CapStore.seeded
        caps = (
            seeded(self._m2, P, 4096, min(P // 8, 32768),
                   cap=self._bucket(P, 4096)),
            seeded(self._msm, P, 4096, 16384),
            seeded(self._mn, P, 4096, 32768),
            seeded(self._mv, P, 4096, 65536),
            seeded(self._mt, P, 4096, 16384),
            seeded(self._mh, P, 4096, 65536),
        )
        out = self._dispatch(flat, frag_off, frag_rid, Bp, caps)
        return (reads[:B_real], sorted(f for f in fallback if f < B_real),
                (flat, frag_off, frag_rid, Bp), caps, out)

    def collect_batch(self, state):
        cfg = self.cfg
        reads, fallback, args, caps, out = state
        flat, frag_off, frag_rid, Bp = args
        P = flat.shape[0]
        B = len(reads)
        while True:
            packed = np.asarray(out)
            n2, n_surv, n_nodes, max_nv, n_ties, want_h = (
                int(x) for x in packed[Bp, :6]
            )
            # validate against the caps BAKED INTO the executable that
            # produced THIS batch (caps may since have grown for a
            # later in-flight batch — comparing against the current
            # self._* would silently accept dropped lanes)
            M2, Ms, mn, mv, mt, mh = caps
            if (n2 <= M2 and n_surv <= Ms and n_nodes <= mn
                    and max_nv <= mv and n_ties <= mt and want_h <= mh):
                break
            # grow past the observed need (not just to it): one early
            # batch slightly under the steady-state peak must not cost a
            # second recompile when a later batch lands slightly over
            self._m2[P] = min(
                self._bucket(max(self._m2[P], n2 + n2 // 4), 4096),
                self._bucket(P, 4096),
            )
            self._msm[P] = self._bucket(
                max(self._msm[P], n_surv + n_surv // 4), 4096
            )
            self._mn[P] = self._bucket(
                max(self._mn[P], n_nodes + n_nodes // 4), 4096
            )
            self._mv[P] = self._bucket(
                max(self._mv[P], max_nv + max_nv // 4), 4096
            )
            self._mt[P] = self._bucket(
                max(self._mt[P], n_ties + n_ties // 4), 4096
            )
            self._mh[P] = self._bucket(
                max(self._mh[P], want_h + want_h // 4), 4096
            )
            self._caps.update(m2=self._m2, ms2=self._msm, mn2=self._mn,
                              mv2=self._mv, mt2=self._mt, mh2=self._mh)
            caps = (self._m2[P], self._msm[P], self._mn[P], self._mv[P],
                    self._mt[P], self._mh[P])
            out = self._dispatch(flat, frag_off, frag_rid, Bp, caps)

        flagged = set(fallback)
        for r in range(B):
            if packed[r, 2] & (FLAG_TIE_OVER | FLAG_NEED_MORE):
                flagged.add(r)
        self.stats["reads"] += B
        self.stats["flagged"] += len(flagged)
        redo = {}
        if flagged:
            sub = [reads[r] for r in sorted(flagged)]
            for rr, (_name, res) in zip(
                sorted(flagged), self._host_pipe().classify_batch(sub)
            ):
                redo[rr] = res

        # bulk-convert the result block + vectorize the float64 E-value
        # gate (the per-read numpy-scalar int()/math.pow path dominated
        # collect at 32k-read batches); np.power on float64 is the same
        # libm pow as math.pow, so the gate stays bit-identical
        rows = packed[:B, :4].tolist()
        if cfg.use_Evalue:
            if cfg.input_is_protein:
                qlen = np.fromiter(
                    (float(len(s1)) for _n, s1, _s2 in reads),
                    dtype=np.float64, count=B,
                )
            else:
                qlen = np.fromiter(
                    (len(s1) / 3.0 + (len(s2) / 3.0 if s2 else 0.0)
                     for _n, s1, s2 in reads),
                    dtype=np.float64, count=B,
                )
            best_a = packed[:B, 1].astype(np.float64)
            bitscore = (LAMBDA * best_a - LN_K) / LN_2
            evalue = (
                float(self.index.db_length) * qlen
                * np.power(2.0, -bitscore)
            )
            e_kill = (evalue > cfg.min_Evalue).tolist()
        else:
            e_kill = None
        unclassified = ClassifyResult(False, 0)
        results = []
        for r, (name, s1, s2) in enumerate(reads):
            if r in redo:
                results.append((name, redo[r]))
                continue
            lca, best, _flags, n_ids = rows[r]
            if best <= 0 or n_ids == 0 or (e_kill is not None and e_kill[r]):
                results.append((name, unclassified))
                continue
            results.append(
                (name, ClassifyResult(lca > 0, lca, score=best))
            )
        return results

    def classify_batch(self, reads):
        return self.collect_batch(self.submit_batch(reads))

    def classify_stream(self, batches, depth: int = 3):
        from collections import deque

        q: deque = deque()
        for batch in batches:
            q.append(self.submit_batch(batch))
            if len(q) > depth:
                yield self.collect_batch(q.popleft())
        while q:
            yield self.collect_batch(q.popleft())
