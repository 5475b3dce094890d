"""Vectorized MEM-mode batch pipeline.

Semantically identical to the coroutine path (and hence the reference),
restructured for throughput by exploiting two order-independence facts of
classify_length (reference: ConsumerThread.cpp:543-628, bwt.c:347-380):

1. greedyExact's result for a fragment depends only on its extension map:
   with j_stop = the largest end position whose maximal extension reaches
   query position <= 1 (the `i <= 1` break), the maximal match length is
   max{ l_j : j >= j_stop, l_j >= min_len } and the tie set is
   { j : l_j == maxl, j >= j_stop } — independent of the dynamic L bound,
   because every tie satisfies j >= maxl-1 >= L-1 for any L <= maxl.
2. The queue's early stop (top key < longest) only skips fragments whose
   key — an upper bound on their match length — is below the final
   longest, so simulating the queue to exhaustion (a pure host replay of
   keys and SEG splits, no index queries) yields the same searched set
   restricted to fragments that can contribute, in the same pop order.

Pipeline: fragment extraction (vectorized) -> queue simulation (host,
native SEG) -> device wavefront batches over unique fragments with FIXED
compile shapes, scoring on device (only [F] statistics come back over the
host link) -> winner-row fetch for tie assembly -> round-batched SA
resolution with the reference's id caps -> LCA.
"""

from __future__ import annotations

import heapq
from typing import Optional

import numpy as np

from ..index.alphabet import trans_table
from ..index.core import KaijuIndex, parse_taxid
from ..io.taxonomy import Taxonomy
from ..ops import device_index as dev
from .config import KaijuConfig
from .core import ClassifyResult
from .fragments_fast import FastFragmentSource

F_ROWS = 2048  # fragment rows per device call
L_MAIN = 256  # single main fragment-length bucket (compile-shape stable)
L_BIG = 2048  # fallback for long protein-mode fragments
SA_ROWS = 32768  # fixed SA-walk batch shape


class MemFastPipeline:
    def __init__(
        self,
        index: KaijuIndex,
        taxonomy: Optional[Taxonomy],
        config: KaijuConfig,
        device_index: Optional[dev.DeviceIndex] = None,
    ):
        assert config.mode == "mem"
        self.cfg = config
        self.index = index
        self.tax = taxonomy
        self.dev = device_index or dev.DeviceIndex(index)
        self._trans = trans_table(index.alphabet)
        if config.seg:
            from .seg_native import make_seg_filter

            self._seg = make_seg_filter()
            self._seg_cache: dict[str, list] = {}
        else:
            self._seg = None
        self._frag_ids: dict[str, int] = {}
        self._frags: list[str] = []
        self._stats: list = []  # uid -> (gid, row, maxl, jstop, nlen)
        self._groups: list = []  # gid -> (start_d, si0_d, si1_d)
        self._rows: dict[int, tuple] = {}  # uid -> host rows

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
            # pop order == sort by (-key, insertion seq); fragments are
            # searched as-is
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

    # ---- device batches ----------------------------------------------

    def _uid(self, frag: str) -> int:
        uid = self._frag_ids.get(frag)
        if uid is None:
            uid = len(self._frags)
            self._frag_ids[frag] = uid
            self._frags.append(frag)
            self._stats.append(None)
        return uid

    def _compute_maps(self, uids: list[int]) -> None:
        todo = [u for u in dict.fromkeys(uids) if self._stats[u] is None]
        if not todo:
            return
        main = [u for u in todo if len(self._frags[u]) <= L_MAIN]
        big = [u for u in todo if len(self._frags[u]) > L_MAIN]
        for group_src, L in ((main, L_MAIN), (big, L_BIG)):
            for pos in range(0, len(group_src), F_ROWS):
                self._run_group(group_src[pos : pos + F_ROWS], L)

    def _run_group(self, group: list[int], L: int) -> None:
        cfg = self.cfg
        codes = np.zeros((F_ROWS, L), dtype=np.uint8)
        flen = np.zeros(F_ROWS, dtype=np.int32)
        for i, u in enumerate(group):
            s = self._frags[u]
            raw = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
            e = self._trans[raw].astype(np.uint8)
            codes[i, : len(e)] = e
            flen[i] = len(e)
        start_d, si0_d, si1_d, maxl_d, jstop_d = dev.extend_all_scored(
            self.dev.blocks, self.dev.occ, self.dev.C, codes, flen,
            cfg.min_fragment_length,
        )
        maxl = np.asarray(maxl_d)
        jstop = np.asarray(jstop_d)
        gid = len(self._groups)
        self._groups.append((start_d, si0_d, si1_d))
        for i, u in enumerate(group):
            self._stats[u] = (gid, i, int(maxl[i]), int(jstop[i]), int(flen[i]))

    def _fetch_rows(self, uids: list[int]) -> None:
        """Pull [L] map rows for winner fragments, grouped per device call."""
        need = [u for u in dict.fromkeys(uids) if u not in self._rows]
        if not need:
            return
        by_gid: dict[int, list[int]] = {}
        for u in need:
            by_gid.setdefault(self._stats[u][0], []).append(u)
        for gid, us in by_gid.items():
            start_d, si0_d, si1_d = self._groups[gid]
            rows = np.array([self._stats[u][1] for u in us], dtype=np.int32)
            s = np.asarray(start_d[rows])
            a = np.asarray(si0_d[rows])
            b = np.asarray(si1_d[rows])
            for t, u in enumerate(us):
                nlen = self._stats[u][4]
                self._rows[u] = (s[t, :nlen], a[t, :nlen], b[t, :nlen])

    # ---- per-read assembly -------------------------------------------

    def _assemble(self, order: list[str]):
        """(longest, [SI ranges in enumeration order], verbose strings)."""
        cfg = self.cfg
        longest = 0
        for frag in order:
            longest = max(longest, self._stats[self._frag_ids[frag]][2])
        if longest == 0:
            return 0, [], []
        ranges = []
        verbose_frags = []
        for frag in order:
            uid = self._frag_ids[frag]
            _gid, _row, maxl, jstop, _nlen = self._stats[uid]
            if maxl != longest:
                continue
            start, si0, si1 = self._rows[uid]
            n = len(start)
            js = [
                j
                for j in range(max(jstop, 0), n)
                if j - start[j] + 1 == longest
            ]
            # greedyExact chains ties newest-first => ascending j already
            for j in js:
                ranges.append((int(si0[j]), int(si1[j])))
            if cfg.verbose and js:
                qi = int(start[js[0]])
                verbose_frags.append(frag[qi : qi + longest])
        return longest, ranges, verbose_frags

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
                for a in dev.sa_lookup(
                    self.dev.blocks, self.dev.occ, self.dev.C,
                    self.dev.sa_seq, self.dev.sa_off,
                    idx.nseq, karr, idx.chpt_exp,
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

        # winner fragments (those that can tie for a read's longest)
        winners: list[int] = []
        read_longest: list[int] = []
        for order in orders:
            if not order:
                read_longest.append(0)
                continue
            longest = max(
                self._stats[self._frag_ids[f]][2] for f in order
            )
            read_longest.append(longest)
            if longest > 0:
                for f in order:
                    uid = self._frag_ids[f]
                    if self._stats[uid][2] == longest:
                        winners.append(uid)
        self._fetch_rows(winners)

        assembled = []
        for order, longest in zip(orders, read_longest):
            if not order or longest == 0:
                assembled.append((0, [], []))
            else:
                assembled.append(self._assemble(order))

        resolved = self._resolve_ids([a[1] for a in assembled])

        out = []
        for (name, _s1, _s2), (longest, _r, vfrags), (ids, dbnames) in zip(
            reads, assembled, resolved
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
