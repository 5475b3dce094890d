"""Vectorized MEM-mode batch pipeline (seeded, staged wavefront).

Semantically identical to the coroutine path (and hence the reference),
restructured for throughput.  Two order-independence facts of
classify_length (reference: ConsumerThread.cpp:543-628, bwt.c:347-380)
make this possible:

1. greedyExact's outcome for a fragment is a pure function of its
   per-end-position extension map: with j_stop = the largest end position
   whose maximal extension reaches query position <= 1 (the `i <= 1`
   break), maxl = max{ l_j : j >= j_stop, l_j >= min_len } and the tie set
   is { j : l_j == maxl, j >= j_stop } — independent of the dynamic L
   bound, because every tie satisfies j >= maxl-1 >= L-1 for any L <= maxl.
2. The queue's early stop (top key < longest) only skips fragments whose
   key — an upper bound on their match length — is below the final
   longest; simulating the queue to exhaustion (host-only: keys + SEG
   splits) yields the same contributing set in the same pop order.

Execution plan per batch:
  fragment extraction (C-speed)  ->  queue simulation (native SEG)
  -> k-mer SEED of every (fragment, end-position) lane on host: the first
     K backward steps come from precomputed tables, so most junk lanes
     never touch the device (kaiju_tpu.ops.kmer)
  -> staged device extension of surviving lanes with host compaction
     between stages (fused single-gather rank records; XLA TPU gathers
     are row-rate-bound, so gather count is the budget)
  -> bulk scoring, tie assembly in pop order
  -> round-batched SA resolution with the reference's id caps -> LCA.
"""

from __future__ import annotations

import heapq
from typing import Optional

import numpy as np

from ..index.alphabet import trans_table
from ..index.core import KaijuIndex, parse_taxid
from ..io.taxonomy import Taxonomy
from ..ops import device_index as dev
from ..ops.fused_mem2 import fused_mem_search2
from ..ops.kmer import KmerTables
from .config import KaijuConfig
from .core import ClassifyResult
from .fragments_fast import FastFragmentSource

SA_ROWS = 32768  # fixed SA-walk batch shape
SEED_K = 5  # packed seed-record depth for the fused device search
TIE_CAP = 8  # per-fragment tie list width returned by the fused search
STRIP_W = 4  # rightmost-positions strip width of the fused search


class SaResolveMixin:
    """Batched SA-position -> taxon-id resolution with the reference's
    enumeration caps, shared by the MEM and Greedy pipelines (requires
    self.cfg, self.index, self.dev)."""

    def _sa_lookup_batch(self, ks: list[int], sa_cache: dict[int, int]) -> None:
        idx = self.index
        uniq = [k for k in dict.fromkeys(ks) if k not in sa_cache]
        if not uniq:
            return
        e = idx.chpt_exp
        pad_k = ((idx.nseq + (1 << e) - 1) >> e) << e
        for pos in range(0, len(uniq), SA_ROWS):
            part = uniq[pos : pos + SA_ROWS]
            karr = np.full(SA_ROWS, pad_k, dtype=np.int32)
            karr[: len(part)] = part
            iseq, _pos = (
                np.asarray(a)
                for a in dev.sa_lookup_fused(
                    self.dev.rec, self.dev.C,
                    self.dev.sa_seq, self.dev.sa_off,
                    idx.nseq, idx.chpt_exp, karr,
                )
            )
            for t, k in enumerate(part):
                sa_cache[k] = int(iseq[t])

    def _resolve_ids(self, per_read_ranges: list[list[tuple[int, int]]]):
        """ids/dbnames per read with the reference enumeration caps.

        The reference checks `ids.size() > max_match_ids` before every
        position of every SI, so once exceeded, every later range breaks at
        its first position too: enumeration stops globally
        (reference: ConsumerThread.cpp:799-845)."""
        cfg = self.cfg
        idx = self.index
        states = []
        for ranges in per_read_ranges:
            states.append(
                {
                    "ids": set(),
                    "dbnames": set(),
                    "ri": 0,
                    "off": 0,
                    "done": not ranges,
                    "ranges": ranges,
                }
            )
        chunk = cfg.max_match_ids + 6
        sa_cache: dict[int, int] = {}
        while True:
            postings: list[tuple[int, list[int]]] = []
            all_ks: list[int] = []
            for rid, st in enumerate(states):
                if st["done"]:
                    continue
                ks = []
                while st["ri"] < len(st["ranges"]) and len(ks) < chunk:
                    s0, s1 = st["ranges"][st["ri"]]
                    if s0 + st["off"] >= s1:
                        st["ri"] += 1
                        st["off"] = 0
                        continue
                    take = min(chunk - len(ks), s1 - (s0 + st["off"]))
                    ks.extend(range(s0 + st["off"], s0 + st["off"] + take))
                    st["off"] += take
                if ks:
                    postings.append((rid, ks))
                    all_ks.extend(ks)
                else:
                    st["done"] = True
            if not postings:
                break
            self._sa_lookup_batch(all_ks, sa_cache)
            for rid, ks in postings:
                st = states[rid]
                for k in ks:
                    if len(st["ids"]) > cfg.max_match_ids:
                        st["done"] = True
                        break
                    name = idx.names[sa_cache[k]]
                    taxid = parse_taxid(name)
                    if (
                        "_" in name
                        and cfg.verbose
                        and len(st["dbnames"]) < cfg.max_match_acc
                    ):
                        st["dbnames"].add(name.rsplit("_", 1)[0])
                    st["ids"].add(taxid)
        return [(sorted(st["ids"]), sorted(st["dbnames"])) for st in states]


class MemFastPipeline(SaResolveMixin):
    def __init__(
        self,
        index: KaijuIndex,
        taxonomy: Optional[Taxonomy],
        config: KaijuConfig,
        device_index: Optional[dev.DeviceIndex] = None,
        kmer_tables: Optional[KmerTables] = None,
        kmer_cache_dir: Optional[str] = None,
        source_fasta: Optional[str] = None,
    ):
        assert config.mode == "mem"
        self.cfg = config
        self.index = index
        self.tax = taxonomy
        from ..utils import enable_compile_cache

        enable_compile_cache()
        self.dev = device_index or dev.DeviceIndex(index)
        want_K = min(SEED_K, config.min_fragment_length)
        self.kmer = kmer_tables or KmerTables.load_or_build(
            index, kmer_cache_dir, K=want_K, device_index=self.dev
        )
        self.seed_K = min(want_K, self.kmer.K)
        import jax

        self._seed_rec = tuple(
            jax.device_put(a) for a in self.kmer.planar_seed(self.seed_K)
        )
        from ..ops.bloom import BloomScreen

        bl = BloomScreen.load_or_build(
            index, kmer_cache_dir or index.source_dir,
            config.min_fragment_length, fasta=source_fasta,
        )
        self._bloom_words = bl.words if bl else None
        self._bloom_m = bl.m if bl else 0
        self._bloom_lb = bl.lb if bl else 0
        from ..utils.capstore import CapStore

        self._caps = CapStore(
            kmer_cache_dir or index.source_dir, "mem", sig=config.cap_sig()
        )
        from ..utils.aot import AotCache

        self._aot = AotCache(kmer_cache_dir or index.source_dir)
        # phase-2 lane capacity per P bucket / survivor-lane capacity of
        # the completion loops; persisted per DB (see utils/capstore.py)
        self._m2: dict[int, int] = self._caps.get_map("m2")
        self._msm: dict[int, int] = self._caps.get_map("ms2")
        self._trans = trans_table(index.alphabet)
        if config.seg:
            from .seg_native import make_seg_filter

            self._seg = make_seg_filter()
            self._seg_cache: dict[str, list] = {}
        else:
            self._seg = None
        from .fragments_native import NativeFragmenter

        self._fragmenter = NativeFragmenter(
            config.mode, config.min_fragment_length, config.min_score,
            config.seg, config.input_is_protein,
        )
        self._frag_ids: dict[str, int] = {}
        self._frags: list[str] = []
        # uid -> (maxl, [(tie j, si0, si1) ascending j])
        self._stats: list = []
        # generation flush: the fragment memo tables grow with unique
        # fragments seen; on a production-scale stream they are dropped
        # wholesale once the cap is hit (between batches only — uids in
        # submitted-but-uncollected states must stay valid)
        import os as _os

        self._cache_cap = int(
            _os.environ.get("KAIJU_FRAG_CACHE_CAP", 1 << 18)
        )
        self._inflight = 0
        # fully-fused device classification (search + SA + LCA in one
        # call); falls back to the host tail per read when budgets
        # overflow.  Verbose output needs names, so it stays on the host
        # tail path.
        self.stats = {"reads": 0, "flagged": 0}  # host-replay counters
        self._exact = None  # lazy pure-host replay engine
        self._device_tail = taxonomy is not None and not config.verbose
        if self._device_tail:
            import jax

            from .fragments_native import NativeFragmenter2

            self._fragmenter2 = NativeFragmenter2(
                config.mode, config.min_fragment_length, config.min_score,
                config.seg, config.input_is_protein,
            )
            par, dep = taxonomy.dense_arrays()
            self._parent = jax.device_put(par)
            self._depth = jax.device_put(dep)
            self._seq_tax = jax.device_put(
                np.asarray(index.seq_taxids, dtype=np.int32)
            )

    # ---- SEG ----------------------------------------------------------

    def _seg_intervals(self, frag: str):
        ivs = self._seg_cache.get(frag)
        if ivs is None:
            ivs = self._seg.mask_intervals(frag)
            self._seg_cache[frag] = ivs
        return ivs

    # ---- queue simulation --------------------------------------------

    def _searched_fragments(self, name, seq1, seq2) -> Optional[list[str]]:
        """Pop-order fragment list (None = short-read unclassified)."""
        cfg = self.cfg
        if cfg.input_is_protein:
            if len(seq1) < cfg.min_fragment_length:
                return None
        else:
            mfl3 = cfg.min_fragment_length * 3
            if seq2 is None:
                if len(seq1) < mfl3:
                    return None
            elif len(seq1) < mfl3 and len(seq2) < mfl3:
                return None

        src = FastFragmentSource(cfg.mode, cfg.min_fragment_length, cfg.min_score)
        if cfg.input_is_protein:
            src.add_protein(seq1)
        else:
            if len(seq1) >= cfg.min_fragment_length * 3:
                src.add_dna(seq1)
            if seq2 is not None and len(seq2) >= cfg.min_fragment_length * 3:
                src.add_dna(seq2)

        if self._seg is None:
            return [
                frag
                for _k, _n, frag in sorted(
                    ((-k, n, f) for n, (k, f) in enumerate(src.items))
                )
            ]

        heap: list[tuple[int, int, str, bool]] = []
        n = 0
        for key, frag in src.items:
            heap.append((-key, n, frag, False))
            n += 1
        heapq.heapify(heap)
        order: list[str] = []
        while heap:
            _negk, _seq, frag, checked = heapq.heappop(heap)
            if not checked:
                locs = self._seg_intervals(frag)
                if locs:
                    start = 0
                    for left, right in locs:
                        n = self._sim_requeue(heap, frag, start, left - start, n)
                        start = right + 1
                    n = self._sim_requeue(heap, frag, start, len(frag) - start, n)
                    continue
            order.append(frag)
        return order

    def _sim_requeue(self, heap, seq, start, length, n) -> int:
        if length > self.cfg.min_fragment_length:
            piece = seq[start : start + length]
            heapq.heappush(heap, (-length, n, piece, True))
            n += 1
        return n

    # ---- map computation: seed + staged extension --------------------

    def _uid(self, frag: str) -> int:
        uid = self._frag_ids.get(frag)
        if uid is None:
            uid = len(self._frags)
            self._frag_ids[frag] = uid
            self._frags.append(frag)
            self._stats.append(None)
        return uid

    @staticmethod
    def _bucket(n: int, lo: int) -> int:
        b = lo
        while b < n:
            b *= 2
        return b

    def _dispatch_maps(self, uids: list[int]):
        """Dispatch the fused search for every not-yet-known fragment.
        Returns an opaque pending handle (or None); JAX dispatch is async,
        so this does not block on the device."""
        cfg = self.cfg
        todo = [u for u in dict.fromkeys(uids) if self._stats[u] is None]
        if not todo:
            return None
        j0 = cfg.min_fragment_length - 1
        F = self._bucket(len(todo), 256)

        encoded = []
        for u in todo:
            raw = np.frombuffer(self._frags[u].encode("ascii"), dtype=np.uint8)
            encoded.append(self._trans[raw].astype(np.uint8))
        total = sum(len(e) for e in encoded)
        P = self._bucket(total, 4096)
        flat = np.zeros(P, dtype=np.uint8)
        frag_off = np.full(F + 1, total, dtype=np.int32)
        pos = 0
        for fi, e in enumerate(encoded):
            frag_off[fi] = pos
            flat[pos : pos + len(e)] = e
            pos += len(e)
        frag_off[len(encoded):] = pos

        # sticky per-P capacity: shape changes force executable reloads
        # over the tunnel, so only grow on overflow, never shrink; new
        # buckets seed by proportional scaling (utils/capstore.seeded)
        from ..utils.capstore import CapStore

        M2 = CapStore.seeded(self._m2, P, 4096, min(P // 8, 32768),
                             cap=self._bucket(P, 4096))
        Ms = CapStore.seeded(self._msm, P, 4096, 16384)
        out = fused_mem_search2(
            self.dev.rec, self.dev.C, self._seed_rec, flat, frag_off,
            None, self._bloom_words, self.seed_K, j0,
            cfg.min_fragment_length, M2, TIE_CAP, Ms,
            self._bloom_m, self._bloom_lb, STRIP_W,
        )
        return (todo, encoded, flat, frag_off, F, P, M2, Ms, out)

    def _finish_maps(self, pending) -> None:
        """Fetch a dispatched search, retrying on capacity overflow, and
        store per-uid (maxl, ties)."""
        if pending is None:
            return
        cfg = self.cfg
        j0 = cfg.min_fragment_length - 1
        todo, encoded, flat, frag_off, F, P, M2, Ms, out = pending
        T = TIE_CAP
        while True:
            packed = np.asarray(out)
            maxl = packed[:F, 0]
            tie_cnt = packed[:F, 1]
            tie_j = packed[:F, 2 : 2 + T]
            tie_s0 = packed[:F, 2 + T : 2 + 2 * T]
            tie_s1 = packed[:F, 2 + 2 * T : 2 + 3 * T]
            n2, n_surv = int(packed[F, 0]), int(packed[F, 1])
            if n2 <= M2 and n_surv <= Ms:
                break
            M2 = min(
                self._bucket(max(M2, n2 + n2 // 4), 4096),
                self._bucket(P, 4096),
            )
            Ms = self._bucket(max(Ms, n_surv + n_surv // 4), 4096)
            self._m2[P] = M2
            self._msm[P] = Ms
            self._caps.update(m2=self._m2, ms2=self._msm)
            out = fused_mem_search2(
                self.dev.rec, self.dev.C, self._seed_rec, flat, frag_off,
                None, self._bloom_words, self.seed_K, j0,
                cfg.min_fragment_length, M2, TIE_CAP, Ms,
                self._bloom_m, self._bloom_lb, STRIP_W,
            )

        overflow = [fi for fi in range(len(todo)) if tie_cnt[fi] > TIE_CAP]
        full: dict[int, tuple] = {}
        if overflow:
            full = self._full_maps([todo[fi] for fi in overflow], encoded,
                                   overflow, j0)
        for fi, u in enumerate(todo):
            if fi in full:
                self._stats[u] = full[fi]
                continue
            ties = [
                (int(tie_j[fi, t]), int(tie_s0[fi, t]), int(tie_s1[fi, t]))
                for t in range(min(int(tie_cnt[fi]), TIE_CAP))
            ]
            self._stats[u] = (int(maxl[fi]), ties)

    def _compute_maps(self, uids: list[int]) -> None:
        self._finish_maps(self._dispatch_maps(uids))

    def _full_maps(self, us, encoded_all, rows, j0):
        """Fallback for tie-cap overflow: full extension map for the given
        fragments, ties recomputed on host (rare — repeat-heavy DBs)."""
        cfg = self.cfg
        enc = [encoded_all[fi] for fi in rows]
        Fo = self._bucket(len(rows), 8)
        L = self._bucket(max(len(e) for e in enc), 32)
        oc = np.zeros((Fo, L), dtype=np.uint8)
        ol = np.zeros(Fo, dtype=np.int64)
        for t, e in enumerate(enc):
            oc[t, : len(e)] = e
            ol[t] = len(e)
        start, si0, si1 = (
            np.asarray(a)
            for a in dev.extend_all(
                self.dev.blocks, self.dev.occ, self.dev.C, oc, ol
            )
        )
        out = {}
        jg = np.arange(L, dtype=np.int64)
        for t, fi in enumerate(rows):
            n = int(ol[t])
            valid = (jg >= j0) & (jg < n)
            length = jg - start[t] + 1
            jstop = int(np.where(valid & (start[t] <= 1), jg, -1).max())
            eligible = valid & (jg >= jstop) & (length >= cfg.min_fragment_length)
            maxl = int(np.where(eligible, length, 0).max())
            ties = [
                (int(j), int(si0[t, j]), int(si1[t, j]))
                for j in np.nonzero(eligible & (length == maxl) & (maxl > 0))[0]
            ]
            out[fi] = (maxl, ties)
        return out

    # ---- per-read assembly -------------------------------------------

    def _assemble(self, order: list[int], longest: int):
        """([SI ranges in enumeration order], verbose strings)."""
        cfg = self.cfg
        ranges = []
        verbose_frags = []
        for u in order:
            maxl, ties = self._stats[u]
            if maxl != longest:
                continue
            # greedyExact chains ties newest-first => ascending j already
            for j, s0, s1 in ties:
                ranges.append((s0, s1))
            if cfg.verbose and ties:
                qi = ties[0][0] - longest + 1
                frag = self._frags[u]
                verbose_frags.append(frag[qi : qi + longest])
        return ranges, verbose_frags

    # ---- entry --------------------------------------------------------

    S_SLOTS = 16  # pop-order slots per read in the fused-classify table
    R_BUDGET = 32  # SA positions resolved on device per read

    def _maybe_flush_caches(self):
        if self._inflight == 0 and len(self._frags) > self._cache_cap:
            self._frag_ids.clear()
            self._frags.clear()
            self._stats.clear()
            if self._seg is not None:
                self._seg_cache.clear()

    def submit_batch(self, reads):
        """Host fragmenting + async device dispatch for one batch.  The
        returned state is consumed by collect_batch; submitting the next
        batch before collecting the previous overlaps host work with
        device compute (the device queue stays busy)."""
        self._maybe_flush_caches()
        self._inflight += 1
        try:
            if self._device_tail:
                return self._submit_tail(reads)
            frags, orders_local = self._fragmenter.run(reads)
            guid = [self._uid(f) for f in frags]
            orders = [[guid[u] for u in o] for o in orders_local]
            pending = self._dispatch_maps([u for o in orders for u in o])
            return ("host", reads, orders, pending)
        except BaseException:
            # a failed submit never reaches collect_batch; undo the
            # in-flight count so cache flushing keeps firing
            self._inflight = max(0, self._inflight - 1)
            raise

    # ---- fully-fused device path -------------------------------------

    def _submit_tail(self, reads):
        from ..ops.fused_classify import fused_mem_classify

        cfg = self.cfg
        j0 = cfg.min_fragment_length - 1
        # pad ragged batches to the largest read-count bucket seen so a
        # stream's trailing short batch reuses the full batch's
        # executable instead of compiling a second shape mid-stream
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
        # sticky shape buckets (see greedy_device.submit_batch): one
        # executable per DB regardless of ragged batches; keyed by the
        # bucketed read count so a one-off large-batch run does not
        # permanently inflate the padded shapes of smaller-batch runs
        from ..utils.capstore import CapStore

        Bp0 = self._bucket(B, 512)
        pmax_map = self._caps.get_map("pmax")
        fmax_map = self._caps.get_map("fmax")
        Pm = max(flat.shape[0],
                 CapStore.seeded(pmax_map, Bp0, 4096,
                                 self._caps.get("pmax", 0)))
        Fm = max(frag_off.shape[0] - 1,
                 CapStore.seeded(fmax_map, Bp0, 128,
                                 self._caps.get("fmax", 0)))
        self._caps.update(pmax={Bp0: Pm}, fmax={Bp0: Fm})
        if Pm > flat.shape[0]:
            flat = np.concatenate(
                [flat, np.zeros(Pm - flat.shape[0], np.uint8)]
            )
        if Fm > frag_off.shape[0] - 1:
            frag_off = np.concatenate([
                frag_off,
                np.full(Fm + 1 - frag_off.shape[0], frag_off[-1], np.int32),
            ])
        P = flat.shape[0]
        # pad the read axis to a bucketed shape so ragged final batches
        # reuse the compiled executable (pad rows classify as U, dropped
        # in collect)
        Bp = self._bucket(B, 512)
        if Bp == B:
            rf_rows = rf
        else:
            rf_rows = np.full((Bp, S), -1, dtype=np.int32)
            rf_rows[:B] = rf
        fallback = np.flatnonzero(oflow).tolist()

        M2 = CapStore.seeded(self._m2, P, 4096, min(P // 8, 32768),
                             cap=self._bucket(P, 4096))
        Ms = CapStore.seeded(self._msm, P, 4096, 16384)
        args = (flat, frag_off, rf_rows)
        out = self._dispatch_tail(flat, frag_off, rf_rows, M2, Ms)
        return ("tail", reads[:B_real],
                [f for f in fallback if f < B_real], args, M2, Ms, out)

    def _dispatch_tail(self, flat, frag_off, rf_rows, M2, Ms):
        from ..ops.fused_classify import fused_mem_classify

        cfg = self.cfg
        j0 = cfg.min_fragment_length - 1
        textp, rank_start = self._hyb_arrays()
        arrays = (
            self.dev.rec, self.dev.C, self._seed_rec, flat, frag_off,
            rf_rows, self.dev.sa_seq, self.dev.sa_off, self._seq_tax,
            self._parent, self._depth, self.dev.rec2, self._bloom_words,
            textp, rank_start,
        )
        statics = (
            self.seed_K, j0, cfg.min_fragment_length, M2, Ms, TIE_CAP,
            self.R_BUDGET, cfg.max_match_ids, self.index.nseq,
            self.index.chpt_exp, self._bloom_m, self._bloom_lb, STRIP_W,
        )
        # exported-artifact call (skips per-process re-trace; utils/aot.py)
        return self._aot.call("mem", fused_mem_classify, arrays, statics)

    def _hyb_arrays(self):
        """(textp, rank_start) for the text-comparison hybrid, or
        (None, None) when the index ships no text copy or is too large
        for the virtual-row encoding."""
        from ..ops.fused_mem2 import VBASE

        if self.dev.has_text and self.index.length < VBASE:
            return self.dev.textp, self.dev.rank_start
        return None, None

    def _collect_tail(self, state):
        from ..ops.fused_classify import (
            FLAG_NEED_MORE,
            FLAG_TIE_OVER,
            fused_mem_classify,
        )

        cfg = self.cfg
        _tag, reads, fallback, args, M2, Ms, out = state
        flat, frag_off, rf_rows = args
        j0 = cfg.min_fragment_length - 1
        B = len(reads)
        while True:
            packed = np.asarray(out)
            n2, n_surv = int(packed[-1, 0]), int(packed[-1, 1])
            if n2 <= M2 and n_surv <= Ms:
                break
            P = flat.shape[0]
            # grow the SHARED store monotonically (a later in-flight
            # batch may already have grown it past this batch's
            # dispatch-time caps), then retry with the grown values
            M2 = min(
                self._bucket(
                    max(self._m2.get(P, M2), M2, n2 + n2 // 4), 4096
                ),
                self._bucket(P, 4096),
            )
            Ms = self._bucket(
                max(self._msm.get(P, Ms), Ms, n_surv + n_surv // 4), 4096
            )
            self._m2[P] = M2
            self._msm[P] = Ms
            self._caps.update(m2=self._m2, ms2=self._msm)
            out = self._dispatch_tail(flat, frag_off, rf_rows, M2, Ms)

        flagged = set(fallback)
        for r in range(B):
            if packed[r, 2] & (FLAG_TIE_OVER | FLAG_NEED_MORE):
                flagged.add(r)
        self.stats["reads"] += B
        self.stats["flagged"] += len(flagged)
        redo = {}
        if flagged:
            # budget / slot overflow: replay through the pure-host exact
            # classifier — no device compiles, so a stream's first
            # flagged read cannot stall it (flagged reads are <0.1%)
            if self._exact is None:
                from .core import ExactClassifier

                self._exact = ExactClassifier(self.index, self.tax, self.cfg)
            sub = [reads[r] for r in sorted(flagged)]
            for rr, (_n, res) in zip(
                sorted(flagged), self._exact.classify_batch(sub)
            ):
                redo[rr] = res

        # bulk-convert the result block once (tolist is C-speed; per-read
        # numpy-scalar int() conversions dominated collect at 32k-read
        # batches)
        rows = packed[:B, :4].tolist()
        unclassified = ClassifyResult(False, 0)
        results = []
        for r, (name, _s1, _s2) in enumerate(reads):
            if r in redo:
                results.append((name, redo[r]))
                continue
            lca, score, _flags, n_ids = rows[r]
            if score == 0 or n_ids == 0:
                results.append((name, unclassified))
            else:
                results.append(
                    (name, ClassifyResult(lca > 0, lca, score=score))
                )
        return results

    def _host_tail(self, reads, orders):
        """Host assembly + batched SA resolution for a handful of reads
        (budget-overflow fallback); mirrors the non-fused collect path."""
        cfg = self.cfg
        assembled = []
        read_longest = []
        for order in orders:
            if not order:
                read_longest.append(0)
                assembled.append(([], []))
                continue
            longest = max(self._stats[u][0] for u in order)
            read_longest.append(longest)
            assembled.append(
                self._assemble(order, longest) if longest else ([], [])
            )
        resolved = self._resolve_ids([a[0] for a in assembled])
        out = []
        for (name, _s1, _s2), longest, (_r, vfrags), (ids, dbnames) in zip(
            reads, read_longest, assembled, resolved
        ):
            if longest == 0 or not ids:
                out.append(ClassifyResult(False, 0))
                continue
            if len(ids) == 1:
                lca = ids[0]
            elif self.tax is not None:
                lca = self.tax.lca(ids, verbose=cfg.verbose)
            else:
                lca = 0
            out.append(
                ClassifyResult(
                    classified=lca > 0, lca=lca, score=longest,
                    match_ids=ids, match_dbnames=dbnames,
                    match_fragments=vfrags,
                )
            )
        return out

    def classify_batch(self, reads) -> list[tuple[str, ClassifyResult]]:
        return self.collect_batch(self.submit_batch(reads))

    def classify_stream(self, batches, depth: int = 3):
        """Pipelined driver: yields per-read results batch by batch with
        `depth` batches of device lookahead (the tunnel's ~30 ms
        round-trip latency hides behind queued device work)."""
        from collections import deque

        q: deque = deque()
        for batch in batches:
            if len(self._frags) > self._cache_cap:
                # drain the lookahead so the generation flush (which
                # invalidates uids) can fire at the next submit
                while q:
                    yield self.collect_batch(q.popleft())
            q.append(self.submit_batch(batch))
            if len(q) > depth:
                yield self.collect_batch(q.popleft())
        while q:
            yield self.collect_batch(q.popleft())

    def collect_batch(self, state) -> list[tuple[str, ClassifyResult]]:
        self._inflight = max(0, self._inflight - 1)
        if state[0] == "tail":
            return self._collect_tail(state)
        cfg = self.cfg
        _tag, reads, orders, pending = state
        self._finish_maps(pending)

        assembled = []
        read_longest = []
        for order in orders:
            if not order:
                read_longest.append(0)
                assembled.append(([], []))
                continue
            longest = max(self._stats[u][0] for u in order)
            read_longest.append(longest)
            if longest == 0:
                assembled.append(([], []))
            else:
                assembled.append(self._assemble(order, longest))

        resolved = self._resolve_ids([a[0] for a in assembled])

        out = []
        for (name, _s1, _s2), longest, (_r, vfrags), (ids, dbnames) in zip(
            reads, read_longest, assembled, resolved
        ):
            if longest == 0 or not ids:
                out.append((name, ClassifyResult(False, 0)))
                continue
            if len(ids) == 1:
                lca = ids[0]
            elif self.tax is not None:
                lca = self.tax.lca(ids, verbose=cfg.verbose)
            else:
                lca = 0
            out.append(
                (
                    name,
                    ClassifyResult(
                        classified=lca > 0,
                        lca=lca,
                        score=longest,
                        match_ids=ids,
                        match_dbnames=dbnames,
                        match_fragments=vfrags,
                    ),
                )
            )
        return out
