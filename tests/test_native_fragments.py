"""Native batched fragment pipeline vs the Python queue simulation."""

import random

import pytest

from conftest import random_dna, random_protein

from kaiju_tpu.engine.config import KaijuConfig
from kaiju_tpu.engine.fragments_native import NativeFragmenter


def python_orders(cfg, reads):
    """Pop-everything queue simulation with the per-mode requeue keys of
    the reference (MEM: ConsumerThread.cpp:543-628 via
    mem_fast._searched_fragments; Greedy requeue: ConsumerThread.cpp:298-322
    via core.ReadClassifier._requeue_piece)."""
    import heapq

    from kaiju_tpu.engine.core import _calc_score
    from kaiju_tpu.engine.fragments_fast import FastFragmentSource

    seg = None
    if cfg.seg:
        from kaiju_tpu.engine.seg_native import make_seg_filter

        seg = make_seg_filter()

    def requeue(heap, seq, start, length, n):
        if length > cfg.min_fragment_length:
            piece = seq[start : start + length]
            if cfg.mode == "greedy":
                score = _calc_score(seq, start, length, 0)
                if score < cfg.min_score:
                    return n
                key = score
            else:
                key = length
            heapq.heappush(heap, (-key, n, piece, True))
            n += 1
        return n

    out = []
    for _name, s1, s2 in reads:
        if cfg.input_is_protein:
            if len(s1) < cfg.min_fragment_length:
                out.append([])
                continue
        else:
            mfl3 = cfg.min_fragment_length * 3
            if s2 is None:
                if len(s1) < mfl3:
                    out.append([])
                    continue
            elif len(s1) < mfl3 and len(s2) < mfl3:
                out.append([])
                continue
        src = FastFragmentSource(cfg.mode, cfg.min_fragment_length,
                                 cfg.min_score)
        if cfg.input_is_protein:
            src.add_protein(s1)
        else:
            if len(s1) >= cfg.min_fragment_length * 3:
                src.add_dna(s1)
            if s2 is not None and len(s2) >= cfg.min_fragment_length * 3:
                src.add_dna(s2)
        heap = []
        n = 0
        for key, frag in src.items:
            heap.append((-key, n, frag, False))
            n += 1
        heapq.heapify(heap)
        order = []
        while heap:
            _k, _s, frag, checked = heapq.heappop(heap)
            if not checked and seg is not None:
                locs = seg.mask_intervals(frag)
                if locs:
                    start = 0
                    for left, right in locs:
                        n = requeue(heap, frag, start, left - start, n)
                        start = right + 1
                    n = requeue(heap, frag, start, len(frag) - start, n)
                    continue
            order.append(frag)
        out.append(order)
    return out


def make_reads(rng, n=300, protein=False, paired=False):
    reads = []
    for i in range(n):
        if protein:
            s1 = random_protein(rng, rng.randint(5, 120))
            if i % 4 == 0:  # junk chars forcing splits
                k = rng.randint(0, len(s1))
                s1 = s1[:k] + "x*1" + s1[k:]
        else:
            s1 = random_dna(rng, rng.randint(10, 250))
            if i % 5 == 0:  # Ns
                k = rng.randint(0, len(s1))
                s1 = s1[:k] + "NNN" + s1[k:]
            if i % 7 == 0:  # low-complexity stretch to trigger SEG
                s1 = s1 + "GCAGCAGCAGCAGCAGCAGCAGCAGCAGCAGCA"
        s2 = None
        if paired and i % 2 == 0:
            s2 = random_dna(rng, rng.randint(10, 200))
        reads.append((f"r{i}", s1, s2))
    return reads


@pytest.mark.parametrize("mode", ["mem", "greedy"])
@pytest.mark.parametrize("seg", [True, False])
def test_dna_parity(mode, seg):
    rng = random.Random(42)
    cfg = KaijuConfig(mode=mode, seg=seg, use_Evalue=False)
    reads = make_reads(rng, paired=True)
    nf = NativeFragmenter(mode, cfg.min_fragment_length, cfg.min_score,
                          seg, False)
    frags, orders = nf.run(reads)
    native = [[frags[u] for u in o] for o in orders]
    py = python_orders(cfg, reads)
    for r, (a, b) in enumerate(zip(native, py)):
        assert a == (b or []), f"read {r}: {a} != {b}"


@pytest.mark.parametrize("mode", ["mem", "greedy"])
def test_protein_parity(mode):
    rng = random.Random(43)
    cfg = KaijuConfig(mode=mode, seg=True, use_Evalue=False,
                      input_is_protein=True)
    reads = make_reads(rng, protein=True)
    nf = NativeFragmenter(mode, cfg.min_fragment_length, cfg.min_score,
                          True, True)
    frags, orders = nf.run(reads)
    native = [[frags[u] for u in o] for o in orders]
    py = python_orders(cfg, reads)
    for r, (a, b) in enumerate(zip(native, py)):
        assert a == (b or []), f"read {r}: {a} != {b}"
