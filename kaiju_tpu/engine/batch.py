"""Batched classification driver.

Runs thousands of per-read coroutines (kaiju_tpu.engine.core) in lockstep
rounds: each round gathers every coroutine's pending index-query request,
groups them by kind, executes ONE device kernel call per kind
(kaiju_tpu.ops.device_index), and resumes the coroutines with their
responses.  Host logic stays reference-exact; the device does all rank
work in large batches.

MEM mode needs one warm-up round (all candidate fragments' extension maps
are known upfront — originals plus their SEG splits — so every ExtendAll
hits the cache afterwards); Greedy adds a few co-simulation rounds for the
dynamically created mismatch fragments.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..index.alphabet import trans_table
from ..index.core import KaijuIndex
from ..io.taxonomy import Taxonomy
from ..ops import device_index as dev
from .config import GREEDY, KaijuConfig
from .core import (
    ClassifyResult,
    ExtendAll,
    ExtendFrom,
    Probes,
    ReadClassifier,
    SaLookup,
    _calc_score,
    format_output_line,
)
from .fragments import FragmentSource


def _bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class BatchRunner:
    def __init__(
        self,
        index: KaijuIndex,
        taxonomy: Optional[Taxonomy],
        config: KaijuConfig,
        device_index: Optional[dev.DeviceIndex] = None,
    ):
        self.cfg = config
        self.index = index
        self.core = ReadClassifier(config, index, taxonomy)
        self.dev = device_index or dev.DeviceIndex(index)
        self._trans = trans_table(index.alphabet)
        self._ext_cache: dict[str, tuple] = {}

    # ------------------------------------------------------------------

    def _encode(self, seq: str) -> np.ndarray:
        raw = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
        return self._trans[raw].astype(np.uint8)

    def _extend_all_batch(self, frags: list[str]) -> None:
        """Fill the extension-map cache for a list of fragments."""
        frags = [f for f in dict.fromkeys(frags) if f not in self._ext_cache]
        if not frags:
            return
        frags.sort(key=len)
        # process in same-bucket groups to bound padding waste
        group: list[str] = []
        for f in frags:
            if group and _bucket(len(f)) != _bucket(len(group[0])):
                self._run_extend_group(group)
                group = []
            group.append(f)
        if group:
            self._run_extend_group(group)

    def _run_extend_group(self, group: list[str]) -> None:
        L = _bucket(max(len(f) for f in group))
        F = _bucket(len(group), lo=8)
        codes = np.zeros((F, L), dtype=np.uint8)
        flen = np.zeros(F, dtype=np.int32)
        for i, f in enumerate(group):
            e = self._encode(f)
            codes[i, : len(e)] = e
            flen[i] = len(e)
        start, si0, si1 = (
            np.asarray(a)
            for a in dev.extend_all(
                self.dev.blocks, self.dev.occ, self.dev.C, codes, flen
            )
        )
        for i, f in enumerate(group):
            n = len(f)
            self._ext_cache[f] = (start[i, :n], si0[i, :n], si1[i, :n])

    def _serve_round(self, requests: list) -> list:
        """Serve one round of heterogeneous requests with grouped kernels."""
        responses: list = [None] * len(requests)

        # --- ExtendAll via cache ---
        ext_idx = [i for i, r in enumerate(requests) if isinstance(r, ExtendAll)]
        if ext_idx:
            self._extend_all_batch([requests[i].frag for i in ext_idx])
            for i in ext_idx:
                responses[i] = self._ext_cache[requests[i].frag]

        # --- ExtendFrom ---
        ef_idx = [i for i, r in enumerate(requests) if isinstance(r, ExtendFrom)]
        if ef_idx:
            N = _bucket(len(ef_idx), lo=8)
            L = _bucket(max(len(requests[i].frag) for i in ef_idx))
            codes = np.zeros((N, L), dtype=np.uint8)
            start_i = np.zeros(N, dtype=np.int32)
            s0 = np.zeros(N, dtype=np.int32)
            s1 = np.zeros(N, dtype=np.int32)
            act = np.zeros(N, dtype=bool)
            for n, i in enumerate(ef_idx):
                r = requests[i]
                e = self._encode(r.frag)
                codes[n, : len(e)] = e
                start_i[n] = len(e) - r.matchlen
                s0[n] = r.si0
                s1[n] = r.si1
                act[n] = True
            fi, f0, f1 = (
                np.asarray(a)
                for a in dev.extend_from(
                    self.dev.blocks, self.dev.occ, self.dev.C,
                    codes, start_i, s0, s1, act,
                )
            )
            for n, i in enumerate(ef_idx):
                responses[i] = (int(fi[n]), int(f0[n]), int(f1[n]))

        # --- Probes ---
        pr_idx = [i for i, r in enumerate(requests) if isinstance(r, Probes)]
        if pr_idx:
            flat = []
            for i in pr_idx:
                flat.extend(requests[i].items)
            N = _bucket(len(flat), lo=8)
            c = np.zeros(N, dtype=np.int32)
            s0 = np.zeros(N, dtype=np.int32)
            s1 = np.zeros(N, dtype=np.int32)
            for n, (cc, a, b) in enumerate(flat):
                c[n], s0[n], s1[n] = cc, a, b
            n0, n1, ok = (
                np.asarray(a)
                for a in dev.probe_updates(
                    self.dev.blocks, self.dev.occ, self.dev.C, c, s0, s1
                )
            )
            pos = 0
            for i in pr_idx:
                k = len(requests[i].items)
                responses[i] = [
                    (int(n0[pos + t]), int(n1[pos + t])) if ok[pos + t] else None
                    for t in range(k)
                ]
                pos += k

        # --- SaLookup ---
        sa_idx = [i for i, r in enumerate(requests) if isinstance(r, SaLookup)]
        if sa_idx:
            flat = []
            for i in sa_idx:
                flat.extend(requests[i].positions)
            N = _bucket(len(flat), lo=8)
            # pad with an immediately-resolvable position (a sampled slot)
            e = self.index.chpt_exp
            pad_k = ((self.index.nseq + (1 << e) - 1) >> e) << e
            k = np.full(N, pad_k, dtype=np.int32)
            k[: len(flat)] = flat
            iseq, _pos = (
                np.asarray(a)
                for a in dev.sa_lookup(
                    self.dev.blocks, self.dev.occ, self.dev.C,
                    self.dev.sa_seq, self.dev.sa_off,
                    self.index.nseq, k, self.index.chpt_exp,
                )
            )
            pos = 0
            for i in sa_idx:
                n = len(requests[i].positions)
                responses[i] = [int(x) for x in iseq[pos : pos + n]]
                pos += n

        return responses

    # ------------------------------------------------------------------

    def _warmup_fragments(self, reads) -> list[str]:
        """All fragments whose extension maps can be needed: the originals
        of every read plus their SEG split pieces (a superset of what the
        lazy queue will actually search)."""
        cfg = self.cfg
        frags: list[str] = []
        for _name, seq1, seq2 in reads:
            src = FragmentSource(cfg.mode, cfg.min_fragment_length, cfg.min_score)
            if cfg.input_is_protein:
                if len(seq1) >= cfg.min_fragment_length:
                    src.add_protein(seq1)
            else:
                if len(seq1) >= cfg.min_fragment_length * 3:
                    src.add_dna(seq1)
                if seq2 is not None and len(seq2) >= cfg.min_fragment_length * 3:
                    src.add_dna(seq2)
            for _key, frag in src.items:
                frags.append(frag)
                if cfg.seg:
                    locs = self.core.seg_intervals(frag)
                    if locs:
                        start = 0
                        for left, right in locs:
                            self._piece(frag, start, left - start, frags)
                            start = right + 1
                        self._piece(frag, start, len(frag) - start, frags)
        return frags

    def _piece(self, seq, start, length, out):
        cfg = self.cfg
        if length > cfg.min_fragment_length:
            if cfg.mode == GREEDY:
                if _calc_score(seq, start, length, 0) < cfg.min_score:
                    return
            out.append(seq[start : start + length])

    # ------------------------------------------------------------------

    def classify_batch(self, reads) -> list[tuple[str, ClassifyResult]]:
        """reads: list of (name, seq1, seq2-or-None)."""
        self._extend_all_batch(self._warmup_fragments(reads))

        gens = []
        results: list = [None] * len(reads)
        pending: dict[int, object] = {}
        for rid, (name, seq1, seq2) in enumerate(reads):
            gen = self.core.run(name, seq1, seq2)
            gens.append(gen)
            try:
                pending[rid] = next(gen)
            except StopIteration as stop:
                results[rid] = stop.value

        while pending:
            rids = list(pending.keys())
            reqs = [pending[r] for r in rids]
            resps = self._serve_round(reqs)
            new_pending = {}
            for r, resp in zip(rids, resps):
                try:
                    new_pending[r] = gens[r].send(resp)
                except StopIteration as stop:
                    results[r] = stop.value
            pending = new_pending

        return [(reads[i][0], results[i]) for i in range(len(reads))]

    def classify_to_lines(self, reads) -> list[str]:
        return [
            format_output_line(name, res, self.cfg.verbose)
            for name, res in self.classify_batch(reads)
        ]
