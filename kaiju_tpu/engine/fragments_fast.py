"""Vectorized fragment extraction (C-speed path).

Produces exactly the same fragments in exactly the same queue-insertion
order as kaiju_tpu.engine.fragments.FragmentSource (the per-character port
of ConsumerThread.cpp:190-270), but using numpy translation plus str.split
instead of per-character Python loops.

Ordering reconstruction: in the reference scan, a fragment is inserted when
its terminating stop codon is reached, so insertion order is (stop-codon
scan position) across the three interleaved frames; frame remainders flush
in frame order 0,1,2 after the scan.  The same holds for the backward scan.
"""

from __future__ import annotations

import numpy as np

from ..constants import AA_TO_INT, BLOSUM62_DIAG
from .fragments import translate_six_frames

_DIAG_BY_BYTE = np.full(256, int(BLOSUM62_DIAG[AA_TO_INT["A"]]), dtype=np.int64)
for _c, _i in AA_TO_INT.items():
    _DIAG_BY_BYTE[ord(_c)] = int(BLOSUM62_DIAG[_i])
_CUM_DIAG = None  # per-call scratch


def frag_score_fast(frag: str) -> int:
    raw = np.frombuffer(frag.encode("ascii"), dtype=np.uint8)
    return int(_DIAG_BY_BYTE[raw].sum())


def _scan_fragments(translated: str, lane_of_frame):
    """Fragments of one directional scan (3 interleaved position lanes).

    translated[k] is the AA for scan position k.  The reference keys its
    accumulators by FRAME = count % 3 (count = n-2-k for the backward
    scan), so remainders must flush in frame order 0,1,2 even though a
    frame's positions form lane (k % 3) = lane_of_frame(frame).
    Returns (stop_ordered, remainders_by_frame).
    """
    stops: list[tuple[int, str]] = []
    remainders: list[str] = [""] * 3
    for frame in range(3):
        f = lane_of_frame(frame)
        lane = translated[f::3]  # AAs at positions k ≡ f (mod 3), k ascending
        parts = lane.split("*")
        pos = 0  # chars consumed in lane
        for p, part in enumerate(parts):
            if p < len(parts) - 1:
                stop_lane_idx = pos + len(part)  # index of the '*' in lane
                stops.append((f + 3 * stop_lane_idx, part))
                pos = stop_lane_idx + 1
            else:
                remainders[frame] = part
    stops.sort(key=lambda x: x[0])
    return [s for _, s in stops], remainders


class FastFragmentSource:
    """Drop-in replacement for FragmentSource (same .items contract)."""

    def __init__(self, mode: str, min_fragment_length: int, min_score: int):
        self.mode = mode
        self.min_fragment_length = min_fragment_length
        self.min_score = min_score
        self.items: list[tuple[int, str]] = []

    def _emit(self, frag: str) -> None:
        if len(frag) >= self.min_fragment_length:
            if self.mode == "greedy":
                score = frag_score_fast(frag)
                if score >= self.min_score:
                    self.items.append((score, frag))
            else:
                self.items.append((len(frag), frag))

    def add_dna(self, read: str) -> None:
        fwd, rev = translate_six_frames(read)
        n = len(read)
        # forward: scan position k == count, frame = k % 3
        closed, remainders = _scan_fragments(fwd, lambda frame: frame)
        for frag in closed:
            self._emit(frag)
        for frag in remainders:
            self._emit(frag)
        # backward: rev[k] is count = n-2-k, frame = count % 3
        closed, remainders = _scan_fragments(rev, lambda frame: (n - 2 - frame) % 3)
        for frag in closed:
            self._emit(frag)
        for frag in remainders:
            self._emit(frag)

    def add_protein(self, read: str) -> None:
        # identical to the reference splitting (ConsumerThread.cpp:659-695)
        from .fragments import FragmentSource

        tmp = FragmentSource(self.mode, self.min_fragment_length, self.min_score)
        tmp.add_protein(read)
        self.items.extend(tmp.items)
