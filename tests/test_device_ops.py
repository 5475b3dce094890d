"""Device kernels (CPU-jax) vs the numpy host reference implementation."""

import random

import numpy as np

from kaiju_tpu.engine.search import _extend_backward
from kaiju_tpu.index import py_builder
from kaiju_tpu.index.alphabet import encode_protein
from kaiju_tpu.ops import device_index as dev

from conftest import make_db_records, random_protein


def _index_and_dev():
    rng = random.Random(21)
    records = make_db_records(rng, nseq=14)
    idx = py_builder.build_index(records)
    d = dev.DeviceIndex(idx)
    return rng, records, idx, d


def test_fmindex_matches_host():
    rng, _, idx, d = _index_and_dev()
    N = 500
    c = np.array([rng.randrange(0, idx.alen) for _ in range(N)], dtype=np.int32)
    k = np.array([rng.randrange(0, idx.length + 1) for _ in range(N)], dtype=np.int32)
    got = np.asarray(dev.fmindex(d.blocks, d.occ, d.C, c, k))
    want = idx.fmindex(c.astype(np.int64), k.astype(np.int64))
    np.testing.assert_array_equal(got, want)


def test_extend_all_matches_host():
    rng, records, idx, d = _index_and_dev()
    frags = []
    for _ in range(25):
        _, prot = records[rng.randrange(len(records))]
        ln = rng.randint(5, min(40, len(prot)))
        st = rng.randrange(0, len(prot) - ln + 1)
        s = prot[st : st + ln]
        if rng.random() < 0.5:  # mutate
            p = rng.randrange(len(s))
            s = s[:p] + rng.choice("ACDEFGHIKLMNPQRSTVWY") + s[p + 1 :]
        frags.append(s)
    frags.append(random_protein(rng, 30))
    L = max(len(s) for s in frags)
    F = len(frags)
    codes = np.zeros((F, L), dtype=np.uint8)
    flen = np.zeros(F, dtype=np.int32)
    for fi, s in enumerate(frags):
        e = encode_protein(s, idx.alphabet)
        codes[fi, : len(e)] = e
        flen[fi] = len(e)
    start, si0, si1 = (
        np.asarray(a) for a in dev.extend_all(d.blocks, d.occ, d.C, codes, flen)
    )
    for fi, s in enumerate(frags):
        e = encode_protein(s, idx.alphabet)
        for j in range(len(e)):
            i, h0, h1 = _extend_backward(idx, e, j)
            assert (start[fi, j], si0[fi, j], si1[fi, j]) == (i, h0, h1), (
                fi,
                j,
                s,
            )


def test_sa_lookup_matches_host():
    rng, _, idx, d = _index_and_dev()
    ks = np.array(
        [rng.randrange(idx.nseq, idx.length) for _ in range(400)], dtype=np.int32
    )
    iseq, pos = (
        np.asarray(a)
        for a in dev.sa_lookup(
            d.blocks, d.occ, d.C, d.sa_seq, d.sa_off, idx.nseq, ks, idx.chpt_exp
        )
    )
    for n, k in enumerate(ks):
        wi, wp = idx.get_suffix(int(k))
        assert (iseq[n], pos[n]) == (wi, wp), k


def test_probe_updates_matches_host():
    rng, _, idx, d = _index_and_dev()
    N = 300
    c = np.array([rng.randrange(1, idx.alen) for _ in range(N)], dtype=np.int32)
    si0 = np.array([rng.randrange(0, idx.length) for _ in range(N)], dtype=np.int32)
    si1 = np.array(
        [min(idx.length, s + rng.randrange(1, 50)) for s in si0], dtype=np.int32
    )
    n0, n1, ok = (np.asarray(a) for a in dev.probe_updates(d.blocks, d.occ, d.C, c, si0, si1))
    for t in range(N):
        upd = idx.update_si(int(c[t]), int(si0[t]), int(si1[t]))
        if upd is None:
            assert not ok[t]
        else:
            assert ok[t] and (n0[t], n1[t]) == upd
