"""Host-exact classifier: the executable specification of the reference
classification semantics (reference: src/ConsumerThread.cpp).

Every observable behavior is replicated: fragment queue ordering (score
keys, FIFO ties), SEG re-queueing, best-first Greedy branch-and-bound with
its pruning bounds, SI traversal orders, tie caps, id enumeration order and
the E-value gate.  This engine is the parity oracle for the batched TPU
path (kaiju_tpu.engine.batch), which must produce identical output.
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass, field
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
from ..index.core import KaijuIndex, parse_taxid
from ..io.taxonomy import Taxonomy
from .config import GREEDY, MEM, KaijuConfig
from .fragments import FragmentSource, frag_score
from .search import greedy_exact, max_matches, max_matches_with_start
from .si import SI, walk_group_heads, walk_samelen
from ..index.alphabet import trans_table


@dataclass
class Fragment:
    """Queue entry (reference: ConsumerThread.hpp:46-62)."""

    seq: str
    num_mm: int = 0
    diff: int = 0
    pos_lastmm: int = 0
    si0: int = 0
    si1: int = 0
    matchlen: int = 0
    seg_checked: bool = False


@dataclass
class ClassifyResult:
    classified: bool
    lca: int
    score: int = 0  # best score (Greedy) or longest length (MEM)
    match_ids: list[int] = field(default_factory=list)  # sorted
    match_dbnames: list[str] = field(default_factory=list)  # sorted
    match_fragments: list[str] = field(default_factory=list)  # eval order


def _calc_score(seq: str, start: int, length: int, diff: int) -> int:
    """calcScore with clamp at 0 (reference: ConsumerThread.cpp:397-404)."""
    s = diff
    for ch in seq[start : start + length]:
        s += int(BLOSUM62_DIAG[AA_TO_INT.get(ch, 0)])
    return s if s > 0 else 0


class ExactClassifier:
    def __init__(
        self,
        index: KaijuIndex,
        taxonomy: Optional[Taxonomy],
        config: KaijuConfig,
    ):
        self.index = index
        self.tax = taxonomy
        self.cfg = config
        self._trans = trans_table(index.alphabet)
        if config.seg:
            from .seg import SegFilter

            self._seg = SegFilter()
        else:
            self._seg = None
        # per-read state
        self._queue: list[tuple[int, int, Fragment]] = []
        self._push_seq = 0

    # ---- fragment queue ------------------------------------------------

    def _push(self, key: int, frag: Fragment) -> None:
        heapq.heappush(self._queue, (-key, self._push_seq, frag))
        self._push_seq += 1

    def _peek_key(self) -> Optional[int]:
        return -self._queue[0][0] if self._queue else None

    def _pop(self) -> Fragment:
        return heapq.heappop(self._queue)[2]

    def _requeue_piece(self, seq: str, start: int, length: int) -> None:
        """Re-queue a SEG-clean piece (reference: ConsumerThread.cpp:298-322).
        NOTE the strict '>' on length in the reference."""
        if length > self.cfg.min_fragment_length:
            piece = seq[start : start + length]
            if self.cfg.mode == GREEDY:
                score = _calc_score(seq, start, length, 0)
                if score >= self.cfg.min_score:
                    self._push(score, Fragment(piece, seg_checked=True))
            else:
                self._push(length, Fragment(piece, seg_checked=True))

    def _get_next_fragment(self, min_score: int) -> Optional[Fragment]:
        """Pop the best fragment, lazily SEG-filtering
        (reference: ConsumerThread.cpp:272-342)."""
        key = self._peek_key()
        if key is None or key < min_score:
            return None
        f = self._pop()
        while self._seg is not None and f is not None and not f.seg_checked:
            locs = self._seg.mask_intervals(f.seq)
            if not locs:
                return f
            start = 0
            for left, right in locs:
                self._requeue_piece(f.seq, start, left - start)
                start = right + 1
            self._requeue_piece(f.seq, start, len(f.seq) - start)
            f = None
            key = self._peek_key()
            if key is not None and key >= min_score:
                f = self._pop()
        return f

    # ---- id resolution -------------------------------------------------

    def _ids_from_si(self, si: SI, state: dict) -> None:
        """SA walk per hit; taxid parsed from the DB name
        (reference: ConsumerThread.cpp:799-835)."""
        cfg = self.cfg
        idx = self.index
        for k in range(si.start, si.start + si.len):
            if len(state["ids"]) > cfg.max_match_ids:
                break
            iseq, _pos = idx.get_suffix(k)
            name = idx.names[iseq]
            if "_" in name:
                taxid = parse_taxid(name)
                if cfg.verbose and len(state["dbnames"]) < cfg.max_match_acc:
                    state["dbnames"].add(name.rsplit("_", 1)[0])
            else:
                taxid = parse_taxid(name)
            state["ids"].add(taxid)

    # ---- MEM mode ------------------------------------------------------

    def _classify_length(self) -> ClassifyResult:
        """(reference: ConsumerThread.cpp:543-628)"""
        cfg = self.cfg
        longest = 0
        matches: list[SI] = []
        match_fragments: list[str] = []
        while True:
            f = self._get_next_fragment(longest)
            if f is None:
                break
            codes = self._encode(f.seq)
            si = greedy_exact(
                self.index, codes, max(cfg.min_fragment_length, longest), -1
            )
            if si is None:
                continue
            if si.ql > longest:
                matches = [si]
                longest = si.ql
                if cfg.verbose:
                    match_fragments = [f.seq[si.qi : si.qi + si.ql]]
            elif si.ql == longest:
                matches.append(si)
                if cfg.verbose:
                    match_fragments.append(f.seq[si.qi : si.qi + si.ql])
        if not matches:
            return ClassifyResult(False, 0)
        state = {"ids": set(), "dbnames": set()}
        for m in matches:
            for node in walk_samelen(m):
                self._ids_from_si(node, state)
        return self._finish(state, longest, match_fragments)

    # ---- Greedy mode ---------------------------------------------------

    def _classify_greedy(self) -> ClassifyResult:
        """(reference: ConsumerThread.cpp:424-541)"""
        cfg = self.cfg
        best_score = 0
        best_sis: list[tuple[SI, Fragment]] = []
        best_fragments: list[str] = []

        while True:
            t = self._get_next_fragment(best_score)
            if t is None:
                break
            codes = self._encode(t.seq)
            length = len(t.seq)
            if t.num_mm > 0:
                L = (
                    cfg.min_fragment_length
                    if t.num_mm == cfg.mismatches
                    else t.matchlen
                )
                si = max_matches_with_start(
                    self.index, codes, L, t.si0, t.si1, t.matchlen
                )
            else:
                si = max_matches(self.index, codes, cfg.seed_length, 0)
            if si is None:
                continue

            if cfg.mismatches > 0 and t.num_mm < cfg.mismatches:
                for node in walk_group_heads(si):
                    match_right_end = node.qi + node.ql - 1
                    if (
                        node.qi > 0
                        and match_right_end + 1 >= cfg.min_fragment_length
                    ):
                        erase_pos = (
                            match_right_end + 1
                            if match_right_end < length - 1
                            else None
                        )
                        best_score = self._add_mismatch_variants(
                            t, node.qi - 1, erase_pos, node, best_score
                        )

            if si.ql < cfg.min_fragment_length:
                continue
            best_score = self._eval_match_scores(
                si, t, best_score, best_sis, best_fragments
            )

        if not best_sis:
            return ClassifyResult(False, 0)

        if cfg.use_Evalue:
            # (reference: ConsumerThread.cpp:500-513)
            bitscore = (LAMBDA * best_score - LN_K) / LN_2
            evalue = (
                float(self.index.db_length)
                * self._query_len
                * math.pow(2.0, -bitscore)
            )
            if evalue > cfg.min_Evalue:
                return ClassifyResult(False, 0)

        state = {"ids": set(), "dbnames": set()}
        for si, _frag in best_sis:
            self._ids_from_si(si, state)
        return self._finish(state, best_score, best_fragments)

    def _add_mismatch_variants(
        self,
        f: Fragment,
        pos: int,
        erase_pos: Optional[int],
        si: SI,
        best_score: int,
    ) -> int:
        """Enumerate the 19 substitutions at pos, best BLOSUM first, with
        prefix break on the score bound
        (reference: ConsumerThread.cpp:346-395)."""
        cfg = self.cfg
        fragment = f.seq
        if erase_pos is not None and erase_pos < len(fragment):
            fragment = fragment[:erase_pos]
        orig = fragment[pos]
        oi = AA_TO_INT[orig]
        base = _calc_score(fragment, 0, len(fragment), f.diff) - int(
            BLOSUM62_DIAG[oi]
        )
        si0, si1 = si.start, si.start + si.len
        for sub in BLOSUM_SUBST[orig]:
            bi = AA_TO_INT[sub]
            score_after = base + int(BLOSUM62[oi, bi])
            if score_after >= best_score and score_after >= cfg.min_score:
                code = int(self._trans[ord(sub)])
                upd = self.index.update_si(code, si0, si1)
                if upd is not None:
                    new_seq = fragment[:pos] + sub + fragment[pos + 1 :]
                    diff = int(BLOSUM62[oi, bi]) - int(BLOSUM62_DIAG[bi])
                    self._push(
                        score_after,
                        Fragment(
                            new_seq,
                            num_mm=f.num_mm + 1,
                            pos_lastmm=pos,
                            diff=f.diff + diff,
                            si0=upd[0],
                            si1=upd[1],
                            matchlen=si.ql + 1,
                            seg_checked=True,
                        ),
                    )
            else:
                break
        return best_score

    def _eval_match_scores(
        self,
        si: Optional[SI],
        frag: Fragment,
        best_score: int,
        best_sis: list,
        best_fragments: list,
    ) -> int:
        """Post-order over samelen then next chains
        (reference: ConsumerThread.cpp:751-797)."""
        if si is None:
            return best_score
        cfg = self.cfg
        if si.samelen is not None:
            best_score = self._eval_match_scores(
                si.samelen, frag, best_score, best_sis, best_fragments
            )
        if si.next is not None and si.next.ql >= cfg.min_fragment_length:
            best_score = self._eval_match_scores(
                si.next, frag, best_score, best_sis, best_fragments
            )
        score = _calc_score(frag.seq, si.qi, si.ql, frag.diff)
        if score < cfg.min_score:
            return best_score
        if score > best_score:
            best_sis.clear()
            best_fragments.clear()
            best_sis.append((si, frag))
            if cfg.verbose:
                best_fragments.append(frag.seq[si.qi : si.qi + si.ql])
            return score
        if score == best_score and len(best_sis) < cfg.max_matches_SI:
            best_sis.append((si, frag))
            if cfg.verbose:
                best_fragments.append(frag.seq[si.qi : si.qi + si.ql])
        return best_score

    # ---- shared helpers ------------------------------------------------

    def _encode(self, seq: str) -> np.ndarray:
        raw = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
        return self._trans[raw].astype(np.uint8)

    def _finish(
        self, state: dict, score: int, match_fragments: list[str]
    ) -> ClassifyResult:
        ids = state["ids"]
        if len(ids) == 1:
            lca = next(iter(ids))
        else:
            lca = self.tax.lca(sorted(ids), verbose=self.cfg.verbose) if self.tax else 0
        return ClassifyResult(
            classified=lca > 0,
            lca=lca,
            score=score,
            match_ids=sorted(ids),
            match_dbnames=sorted(state["dbnames"]),
            match_fragments=match_fragments,
        )

    # ---- per-read entry point ------------------------------------------

    def classify_read(
        self, name: str, seq1: str, seq2: Optional[str] = None
    ) -> tuple[str, ClassifyResult]:
        """Classify one (possibly paired) read
        (reference: ConsumerThread.cpp:630-745 doWork body)."""
        cfg = self.cfg
        self._queue.clear()
        self._push_seq = 0

        if cfg.input_is_protein:
            if len(seq1) < cfg.min_fragment_length:
                return name, ClassifyResult(False, 0)
        else:
            mfl3 = cfg.min_fragment_length * 3
            if seq2 is None:
                if len(seq1) < mfl3:
                    return name, ClassifyResult(False, 0)
            elif len(seq1) < mfl3 and len(seq2) < mfl3:
                return name, ClassifyResult(False, 0)

        src = FragmentSource(cfg.mode, cfg.min_fragment_length, cfg.min_score)
        if cfg.input_is_protein:
            self._query_len = float(len(seq1))
            src.add_protein(seq1)
        else:
            self._query_len = len(seq1) / 3.0
            if len(seq1) >= cfg.min_fragment_length * 3:
                src.add_dna(seq1)
            if seq2 is not None:
                self._query_len += len(seq2) / 3.0
                if len(seq2) >= cfg.min_fragment_length * 3:
                    src.add_dna(seq2)
        for key, frag in src.items:
            self._push(key, Fragment(frag))

        if cfg.mode == MEM:
            return name, self._classify_length()
        return name, self._classify_greedy()


def format_output_line(
    name: str, res: ClassifyResult, verbose: bool
) -> str:
    """TSV line (reference: ConsumerThread.cpp:724-739 and 527-536/614-622)."""
    if not res.classified:
        return f"U\t{name}\t0\n"
    line = f"C\t{name}\t{res.lca}"
    if verbose:
        ids = "".join(f"{i}," for i in res.match_ids)
        accs = "".join(f"{a}," for a in res.match_dbnames)
        frags = "".join(f"{m}," for m in res.match_fragments)
        line += f"\t{res.score}\t{ids}\t{accs}\t{frags}"
    return line + "\n"
