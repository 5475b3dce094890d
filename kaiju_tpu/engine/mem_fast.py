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
from ..ops.kmer import KmerTables
from .config import KaijuConfig
from .core import ClassifyResult
from .fragments_fast import FastFragmentSource

SA_ROWS = 32768  # fixed SA-walk batch shape
STAGE_ROWS = 32768  # fixed extension-stage lane count (single compile shape)
STAGE_STEPS = 32  # steps per stage call


class MemFastPipeline:
    def __init__(
        self,
        index: KaijuIndex,
        taxonomy: Optional[Taxonomy],
        config: KaijuConfig,
        device_index: Optional[dev.DeviceIndex] = None,
        kmer_tables: Optional[KmerTables] = None,
        kmer_cache_dir: Optional[str] = None,
    ):
        assert config.mode == "mem"
        self.cfg = config
        self.index = index
        self.tax = taxonomy
        self.dev = device_index or dev.DeviceIndex(index)
        self.kmer = kmer_tables or KmerTables.load_or_build(index, kmer_cache_dir)
        self._trans = trans_table(index.alphabet)
        if config.seg:
            from .seg_native import make_seg_filter

            self._seg = make_seg_filter()
            self._seg_cache: dict[str, list] = {}
        else:
            self._seg = None
        self._frag_ids: dict[str, int] = {}
        self._frags: list[str] = []
        # uid -> (maxl, jstop, i[], si0[], si1[]) with arrays over
        # j in [min_fragment_length-1, len)
        self._stats: list = []

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

    def _compute_maps(self, uids: list[int]) -> None:
        cfg = self.cfg
        todo = [u for u in dict.fromkeys(uids) if self._stats[u] is None]
        if not todo:
            return
        j0 = cfg.min_fragment_length - 1
        F = len(todo)
        L = max(len(self._frags[u]) for u in todo)

        codes = np.zeros((F, L), dtype=np.uint8)
        flen = np.zeros(F, dtype=np.int64)
        for fi, u in enumerate(todo):
            raw = np.frombuffer(self._frags[u].encode("ascii"), dtype=np.uint8)
            e = self._trans[raw].astype(np.uint8)
            codes[fi, : len(e)] = e
            flen[fi] = len(e)

        depth, i_arr, si0, si1, alive, valid = self.kmer.seed(codes, flen, j0)

        # staged extension of surviving lanes
        af, aj = np.nonzero(alive)
        if len(af):
            lane_i = i_arr[af, aj].astype(np.int32)
            lane_s0 = si0[af, aj].astype(np.int32)
            lane_s1 = si1[af, aj].astype(np.int32)
            lane_f = af.astype(np.int64)
            while len(lane_i):
                n_run = min(len(lane_i), STAGE_ROWS)
                run = slice(0, n_run)
                # host-side code window: stage_codes[n, t] = codes at
                # position i-1-t of lane n's fragment (0 past the start)
                tgrid = np.arange(STAGE_STEPS, dtype=np.int64)[None, :]
                pos = lane_i[run, None].astype(np.int64) - 1 - tgrid
                sc = np.zeros((STAGE_ROWS, STAGE_STEPS), dtype=np.uint8)
                gathered = codes[lane_f[run, None], np.clip(pos, 0, L - 1)]
                sc[:n_run] = np.where(pos >= 0, gathered, 0)
                pi = np.zeros(STAGE_ROWS, dtype=np.int32)
                p0 = np.zeros(STAGE_ROWS, dtype=np.int32)
                p1 = np.ones(STAGE_ROWS, dtype=np.int32)
                pi[:n_run] = lane_i[run]
                p0[:n_run] = lane_s0[run]
                p1[:n_run] = lane_s1[run]
                ri, r0, r1, ract = (
                    np.asarray(a)[:n_run]
                    for a in dev.extend_stage(
                        self.dev.rec, self.dev.C, sc, pi, p0, p1, STAGE_STEPS
                    )
                )
                # write back results for the lanes just run
                raf, raj = af[run], aj[run]
                i_arr[raf, raj] = ri
                si0[raf, raj] = r0
                si1[raf, raj] = r1
                # survivors of this chunk + lanes not yet run
                still = ract & (ri > 0)
                keep_f = np.concatenate([raf[still], af[n_run:]])
                keep_j = np.concatenate([raj[still], aj[n_run:]])
                keep_i = np.concatenate([ri[still], lane_i[n_run:]])
                keep_s0 = np.concatenate([r0[still], lane_s0[n_run:]])
                keep_s1 = np.concatenate([r1[still], lane_s1[n_run:]])
                af, aj = keep_f, keep_j
                lane_i, lane_s0, lane_s1 = keep_i, keep_s0, keep_s1
                lane_f = af.astype(np.int64)

        # bulk per-fragment statistics
        jgrid = np.arange(L, dtype=np.int64)[None, :]
        l = jgrid - i_arr + 1
        jstop = np.where(valid & (i_arr <= 1), jgrid, -1).max(axis=1)
        eligible = valid & (jgrid >= jstop[:, None]) & (
            l >= cfg.min_fragment_length
        )
        maxl = np.where(eligible, l, 0).max(axis=1)

        for fi, u in enumerate(todo):
            n = int(flen[fi])
            self._stats[u] = (
                int(maxl[fi]),
                int(jstop[fi]),
                i_arr[fi, j0:n],
                si0[fi, j0:n],
                si1[fi, j0:n],
            )

    # ---- per-read assembly -------------------------------------------

    def _assemble(self, order: list[str], longest: int):
        """([SI ranges in enumeration order], verbose strings)."""
        cfg = self.cfg
        j0 = cfg.min_fragment_length - 1
        ranges = []
        verbose_frags = []
        for frag in order:
            maxl, jstop, i_arr, si0, si1 = self._stats[self._frag_ids[frag]]
            if maxl != longest:
                continue
            jrel = np.arange(j0, j0 + len(i_arr))
            ties = np.nonzero(
                (jrel - i_arr + 1 == longest) & (jrel >= jstop)
            )[0]
            # greedyExact chains ties newest-first => ascending j already
            for t in ties:
                ranges.append((int(si0[t]), int(si1[t])))
            if cfg.verbose and len(ties):
                qi = int(i_arr[ties[0]])
                verbose_frags.append(frag[qi : qi + longest])
        return ranges, verbose_frags

    # ---- batched SA resolution ---------------------------------------

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

    # ---- entry --------------------------------------------------------

    def classify_batch(self, reads) -> list[tuple[str, ClassifyResult]]:
        cfg = self.cfg
        orders = [self._searched_fragments(*r) for r in reads]
        self._compute_maps([self._uid(f) for o in orders if o for f in o])

        assembled = []
        read_longest = []
        for order in orders:
            if not order:
                read_longest.append(0)
                assembled.append(([], []))
                continue
            longest = max(self._stats[self._frag_ids[f]][0] for f in order)
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
