"""Demonstrate and verify a >2^31-symbol index build (kt_build_bwt_big).

The reference routinely builds 111-491 GB indexes whose suffix counts
exceed int32 (reference: src/bwt/mkbwt.c:82-138, README.md:100-113); the
native threaded builder (kaiju_tpu/native/bigsais.cpp) uses int64
offsets throughout to lift the 2^31 cap.  This script proves it at
scale: it builds a synthetic protein DB of >= 2^31 + margin symbols,
records wall time and peak RSS, and verifies the result with strong
sampled invariants (an at-scale cross-check against the int32 SA-IS
path is impossible -- that is the point):

  1. letter histogram of the BWT == histogram of text + terminators;
  2. full backward reconstruction of R random sequences via LF walks
     from their terminator slots, byte-compared against the input text
     (exercises BWT content, occ counts and the terminator order);
  3. for S random SA samples (seq, off), a 24-char backward search of
     the claimed suffix prefix must produce an SA interval containing
     the sample's SA position (exercises the checkpointed SA).

Run:  python scripts/big_build_demo.py [--letters 4400000000]
Writes a JSON summary line and a log to BIGBUILD.log.
"""

from __future__ import annotations

import argparse
import ctypes
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kaiju_tpu.index.alphabet import MAKEDB_ALPHABET
from kaiju_tpu.index.native_builder import get_lib

BLOCK = 128


def log(fh, msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    fh.write(line + "\n")
    fh.flush()


def peak_rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


class BigRank:
    """int64 occ checkpoints over the big BWT, host-side (the ktx occ
    array is int32 and deliberately capped at 2^31 per shard)."""

    def __init__(self, bwt: np.ndarray, alen: int):
        n = len(bwt)
        nb = (n + BLOCK - 1) // BLOCK
        pad = np.full(nb * BLOCK - n, 255, dtype=np.uint8)
        self.bwt = np.concatenate([bwt, pad]) if len(pad) else bwt
        self.blocks = self.bwt.reshape(nb, BLOCK)
        self.occ = np.zeros((nb + 1, alen), dtype=np.int64)
        chunk = 1 << 20  # blocks per pass
        for b0 in range(0, nb, chunk):
            b1 = min(nb, b0 + chunk)
            blk = self.blocks[b0:b1]
            for c in range(alen):
                self.occ[b0 + 1 : b1 + 1, c] = (blk == c).sum(axis=1)
        np.cumsum(self.occ, axis=0, out=self.occ)
        counts = self.occ[-1]
        self.C = np.zeros(alen + 1, dtype=np.int64)
        np.cumsum(counts, out=self.C[1:])

    def rank(self, c: int, k: int) -> int:
        b = k >> 7
        base = int(self.occ[b, c])
        off = k & (BLOCK - 1)
        if off:
            row = self.blocks[b]
            base += int((row[:off] == c).sum())
        return base

    def fmindex(self, c: int, k: int) -> int:
        return int(self.C[c]) + self.rank(c, k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--letters", type=int, default=4_400_000_000)
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--seed", type=int, default=20260821)
    ap.add_argument("--allow-small", action="store_true",
                    help="skip the >2^31 size assertion (smoke runs)")
    args = ap.parse_args()

    fh = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BIGBUILD.log"), "w")
    alphabet = MAKEDB_ALPHABET
    alen = len(alphabet)
    rng = np.random.default_rng(args.seed)

    log(fh, f"generating {args.letters/1e9:.2f}G aa of synthetic protein...")
    t0 = time.time()
    # letter codes 1..20 uniform; sequence lengths 150..450
    lens = []
    tot = 0
    while tot < args.letters:
        n = int(rng.integers(150, 451))
        lens.append(n)
        tot += n
    nseq = len(lens)
    seq_len = np.asarray(lens, dtype=np.int64)
    N = tot + nseq
    if not args.allow_small:
        assert N > (1 << 31) + 1_000_000, "demo must exceed the int32 cap"
    text = np.empty(N, dtype=np.uint8)
    ends = np.cumsum(seq_len + 1)
    starts = ends - seq_len - 1
    # fill all positions with random letters, then zero the separators
    chunk = 1 << 28
    for i in range(0, N, chunk):
        j = min(N, i + chunk)
        text[i:j] = rng.integers(1, alen, size=j - i, dtype=np.uint8)
    text[ends - 1] = 0
    tstart = np.zeros(nseq + 1, dtype=np.int64)
    tstart[1:] = ends
    log(fh, f"text ready: N={N} ({N/2**31:.2f} x 2^31), nseq={nseq}, "
            f"{time.time()-t0:.0f}s, peak RSS {peak_rss_gb():.1f} GB")

    e = 5  # nr-scale checkpoint spacing (util/kaiju-makedb:17)
    first = ((nseq + (1 << e) - 1) >> e) << e
    n_samples = ((N - 1) >> e) - (first >> e) + 1
    bwt = np.empty(N, dtype=np.uint8)
    content_rank = np.empty(nseq, dtype=np.int32)
    sa_seq = np.empty(n_samples, dtype=np.int32)
    sa_off64 = np.empty(n_samples, dtype=np.int64)

    log(fh, f"building BWT with kt_build_bwt_big ({args.threads} threads)...")
    t0 = time.time()
    lib = get_lib()
    rc = lib.kt_build_bwt_big(
        text.ctypes.data_as(ctypes.c_void_p),
        tstart.ctypes.data_as(ctypes.c_void_p),
        nseq, N, alen, e, args.threads,
        bwt.ctypes.data_as(ctypes.c_void_p),
        content_rank.ctypes.data_as(ctypes.c_void_p),
        sa_seq.ctypes.data_as(ctypes.c_void_p),
        sa_off64.ctypes.data_as(ctypes.c_void_p),
        n_samples,
    )
    build_s = time.time() - t0
    assert rc == 0, f"kt_build_bwt_big rc={rc}"
    log(fh, f"BWT built in {build_s:.0f}s, peak RSS {peak_rss_gb():.1f} GB")

    # ---- check 1: letter histograms -----------------------------------
    t0 = time.time()
    hb = np.zeros(256, dtype=np.int64)
    ht = np.zeros(256, dtype=np.int64)
    for i in range(0, N, chunk):
        j = min(N, i + chunk)
        hb += np.bincount(bwt[i:j], minlength=256)
        ht += np.bincount(text[i:j], minlength=256)
    assert np.array_equal(hb, ht), "BWT letter histogram mismatch"
    log(fh, f"check 1 OK: histograms equal ({time.time()-t0:.0f}s)")

    # ---- occ checkpoints for LF walks ---------------------------------
    t0 = time.time()
    br = BigRank(bwt, alen)
    log(fh, f"host int64 occ table built ({time.time()-t0:.0f}s, "
            f"peak RSS {peak_rss_gb():.1f} GB)")

    # ---- check 2: reconstruct random sequences ------------------------
    t0 = time.time()
    order = np.argsort(content_rank, kind="stable")  # rank -> input idx
    py = np.random.default_rng(7)
    for trial in range(12):
        iseq = int(py.integers(0, nseq))  # input index
        L = int(seq_len[iseq])
        # terminator suffixes occupy SA slots 0..nseq-1 in INPUT order
        # (the builders' write_term convention); LF from a sequence's
        # terminator slot walks that sequence backwards.
        k = iseq
        got = np.empty(L, dtype=np.uint8)
        for x in range(L - 1, -1, -1):
            c = int(bwt[k])
            assert c != 0, "hit a terminator mid-sequence"
            got[x] = c
            k = br.fmindex(c, k)
        want = text[starts[iseq] : ends[iseq] - 1]
        assert np.array_equal(got, want), f"reconstruction {trial} mismatch"
    log(fh, f"check 2 OK: 12 random sequences reconstructed via LF walks "
            f"({time.time()-t0:.0f}s)")

    # ---- check 3: SA samples vs backward search -----------------------
    t0 = time.time()
    for trial in range(40):
        s = int(py.integers(0, n_samples))
        k = first + (s << e)
        r = int(sa_seq[s])
        off = int(sa_off64[s])
        iseq = int(order[r])
        p = int(starts[iseq]) + off
        q = text[p : p + 24]
        q = q[: np.argmax(q == 0)] if (q == 0).any() else q
        if len(q) == 0:
            continue
        s0, s1 = int(br.C[q[-1]]), int(br.C[q[-1] + 1])
        for c in q[-2::-1]:
            s0n = br.fmindex(int(c), s0)
            s1n = br.fmindex(int(c), s1)
            s0, s1 = s0n, s1n
            assert s0 < s1, "claimed suffix prefix not found"
        assert s0 <= k < s1, f"SA sample {s} not in its suffix interval"
    log(fh, f"check 3 OK: 40 SA samples verified by backward search "
            f"({time.time()-t0:.0f}s)")

    summary = {
        "metric": "big_build",
        "letters": int(N),
        "x_2p31": round(N / 2**31, 3),
        "nseq": int(nseq),
        "build_seconds": round(build_s, 1),
        "peak_rss_gb": round(peak_rss_gb(), 2),
        "checks": ["histogram", "lf_reconstruction", "sa_sample_search"],
        "ok": True,
    }
    log(fh, json.dumps(summary))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
