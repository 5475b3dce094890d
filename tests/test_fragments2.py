"""Native fragmenter v2 (codes + slot table) vs v1 (strings): identical
fragments in identical pop order, and the Bloom screen's no-false-negative
guarantee."""

import random

import numpy as np

from conftest import random_dna, random_protein

from kaiju_tpu.engine.fragments_native import NativeFragmenter, NativeFragmenter2
from kaiju_tpu.index.alphabet import PROTEIN_ALPHABET


def bucket(n, lo):
    b = lo
    while b < n:
        b *= 2
    return b


def codes_to_str(codes):
    return "".join(PROTEIN_ALPHABET[c] for c in codes)


def _compare(reads, mode, seg, protein, S=16):
    v1 = NativeFragmenter(mode, 11, 65, seg, protein)
    v2 = NativeFragmenter2(mode, 11, 65, seg, protein)
    frags, orders = v1.run(reads)
    flat, chars, frag_off, n_frags, keys, rf_rows, oflow = v2.run(
        reads, S, bucket
    )
    for r, order in enumerate(orders):
        exp = [frags[u] for u in order]
        got = []
        for s in range(S):
            fi = rf_rows[r, s]
            if fi < 0:
                break
            got.append(
                codes_to_str(flat[frag_off[fi] : frag_off[fi + 1]])
            )
        if len(exp) > S:
            assert oflow[r] == 1
            exp = exp[:S]
        else:
            assert oflow[r] == 0
        assert got == exp, f"read {r}: {got} != {exp}"


def test_v2_matches_v1_dna_seg():
    rng = random.Random(11)
    reads = [
        (f"r{i}", random_dna(rng, rng.randint(20, 400)), None)
        for i in range(300)
    ]
    _compare(reads, "mem", True, False)


def test_v2_matches_v1_dna_noseg_greedy():
    rng = random.Random(12)
    reads = [
        (f"r{i}", random_dna(rng, rng.randint(20, 300)), None)
        for i in range(200)
    ]
    _compare(reads, "greedy", False, False)
    _compare(reads, "greedy", True, False)


def test_v2_matches_v1_protein():
    rng = random.Random(13)
    reads = [
        (f"r{i}", random_protein(rng, rng.randint(5, 200)), None)
        for i in range(200)
    ]
    _compare(reads, "mem", True, True)


def test_v2_matches_v1_paired():
    rng = random.Random(14)
    reads = [
        (
            f"r{i}",
            random_dna(rng, rng.randint(30, 200)),
            random_dna(rng, rng.randint(30, 200)) if i % 2 else None,
        )
        for i in range(150)
    ]
    _compare(reads, "mem", True, False)


def test_bloom_no_false_negatives():
    """Every m-mer of the database text must probe positive."""
    from kaiju_tpu.ops import bloom as B

    rng = random.Random(15)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    from kaiju_tpu.index.alphabet import trans_table

    trans = trans_table(PROTEIN_ALPHABET)
    seqs = [
        "".join(rng.choice(aas) for _ in range(rng.randint(12, 80)))
        for _ in range(30)
    ]
    m, lb = 11, 20
    text = np.concatenate(
        [
            np.concatenate(
                [
                    trans[np.frombuffer(s.encode(), np.uint8)].astype(
                        np.uint8
                    ),
                    np.zeros(1, np.uint8),
                ]
            )
            for s in seqs
        ]
    )
    words = B.fill_from_text(text, m, lb)

    # host-side probe identical to the device hash
    def probe(window_codes):
        h = np.uint32(0)
        a = np.uint32(1)
        for t in range(m):
            h = np.uint32(h + np.uint32(window_codes[m - 1 - t]) * a)
            a = np.uint32(a * B.A32)
        idx = np.uint32(h * B.GOLD) >> np.uint32(32 - lb)
        return (words[idx >> np.uint32(5)] >> (idx & np.uint32(31))) & 1

    np_err = np.seterr(over="ignore")
    try:
        hits = 0
        for s in seqs:
            c = trans[np.frombuffer(s.encode(), np.uint8)]
            for j in range(m - 1, len(s)):
                assert probe(c[j - m + 1 : j + 1]) == 1
                hits += 1
        assert hits > 200
        # junk m-mers should mostly miss (false-positive sanity)
        fp = 0
        trials = 500
        for _ in range(trials):
            w = [rng.randint(1, 20) for _ in range(m)]
            fp += int(probe(w))
        assert fp < trials * 0.2
    finally:
        np.seterr(**np_err)
