"""Cross-check the threaded big builder against the reference toolchain
at scale, plus thread-scaling measurements.

Round 4 proved kt_build_bwt_big at 4.4 Gaa with self-consistency
invariants only (BIGBUILD.log); this script closes the remaining gap
(round-4 review, weak #7): build the SAME FASTA with BOTH
kt_build_bwt_big and the reference kaiju-mkbwt + kaiju-mkfmi
(reference: src/bwt/mkbwt.c:82-138,569-671), then byte-compare

  * the BWT,
  * the checkpointed SA samples (seq index + offset),
  * the cumulative letter counts C,

and record letters/s for kt_build_bwt_big at 1..N threads (the
reference's bucket pipeline is mkbwt.c:569-671).

Run: python scripts/big_build_crosscheck.py [--letters 1000000000]
Writes BIGCROSSCHECK.log + one JSON summary line.  The reference
toolchain itself is int32-bound above 2^31, which is WHY the at-scale
4.4 Gaa build can only be self-checked — this script validates the
shared range instead.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kaiju_tpu.index import fmi_reader, native_builder
from kaiju_tpu.index.alphabet import MAKEDB_ALPHABET

ORACLE_BIN = os.environ.get("KAIJU_ORACLE_BIN", "/tmp/kaiju-oracle/bin")


def log(fh, msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    fh.write(line + "\n")
    fh.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--letters", type=int, default=1_000_000_000)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--workdir", default="/tmp/bigcross")
    ap.add_argument("--threads", type=int, nargs="*", default=None,
                    help="thread counts to time (default: 1..nproc)")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fh = open(os.path.join(root, "BIGCROSSCHECK.log"), "w")
    os.makedirs(args.workdir, exist_ok=True)
    alphabet = MAKEDB_ALPHABET
    letters = "ACDEFGHIKLMNPQRSTVWY"
    rng = np.random.default_rng(args.seed)

    # ---- synthetic FASTA ---------------------------------------------
    t0 = time.time()
    lens = []
    tot = 0
    while tot < args.letters:
        n = int(rng.integers(150, 451))
        lens.append(n)
        tot += n
    nseq = len(lens)
    lets = np.frombuffer(letters.encode(), np.uint8)
    fasta = os.path.join(args.workdir, "db.faa")
    codes_all = rng.integers(1, len(alphabet), size=tot, dtype=np.uint8)
    seqs = []
    pos = 0
    with open(fasta, "w") as out:
        for i, n in enumerate(lens):
            s = codes_all[pos : pos + n]
            seqs.append(s)
            pos += n
            out.write(f">S{i:08d}_{100 + i % 97}\n")
            out.write(lets[s - 1].tobytes().decode() + "\n")
    names = [f"S{i:08d}_{100 + i % 97}" for i in range(nseq)]
    log(fh, f"FASTA ready: {tot/1e6:.0f} Maa, {nseq} seqs, "
            f"{time.time()-t0:.0f}s")

    # ---- kt_build_bwt_big thread scaling ------------------------------
    ncpu = os.cpu_count() or 1
    threads = args.threads or list(range(1, ncpu + 1))
    rates = {}
    index = None
    for nt in threads:
        t0 = time.time()
        index = native_builder.build_index_from_codes(
            names, seqs, chpt_exp=3, alphabet=alphabet, builder="big",
            n_threads=nt,
        )
        dt = time.time() - t0
        rates[nt] = tot / dt
        log(fh, f"kt_build_bwt_big -n {nt}: {dt:.0f}s "
                f"({tot/dt/1e6:.2f} Maa/s), peak RSS "
                f"{resource.getrusage(resource.RUSAGE_SELF).ru_maxrss/1e6:.1f} GB")

    # ---- reference toolchain -----------------------------------------
    prefix = os.path.join(args.workdir, "refdb")
    t0 = time.time()
    subprocess.run(
        [os.path.join(ORACLE_BIN, "kaiju-mkbwt"), "-n", "2", "-e", "3",
         "-a", letters, "-o", prefix, fasta],
        check=True, capture_output=True,
    )
    subprocess.run(
        [os.path.join(ORACLE_BIN, "kaiju-mkfmi"), prefix],
        check=True, capture_output=True,
    )
    ref_s = time.time() - t0
    log(fh, f"kaiju-mkbwt -n 2 + kaiju-mkfmi: {ref_s:.0f}s")

    t0 = time.time()
    ref = fmi_reader.read_fmi(prefix + ".fmi")
    log(fh, f"reference .fmi loaded ({time.time()-t0:.0f}s)")

    # ---- byte comparisons --------------------------------------------
    assert index.length == ref.length, (index.length, ref.length)
    assert index.nseq == ref.nseq
    assert np.array_equal(np.asarray(index.bwt), np.asarray(ref.bwt)), \
        "BWT bytes differ"
    log(fh, f"BWT byte-identical ({index.length} symbols)")
    assert np.array_equal(np.asarray(index.C), np.asarray(ref.C)), \
        "C differs"
    assert index.chpt_exp == ref.chpt_exp
    # the reference emits one fewer trailing sample in some lengths
    # (same tolerance as tests/test_index.py)
    n = min(len(index.sa_seq), len(ref.sa_seq))
    assert abs(len(index.sa_seq) - len(ref.sa_seq)) <= 1
    assert np.array_equal(
        np.asarray(index.sa_seq)[:n], np.asarray(ref.sa_seq)[:n]
    ), "SA sample seq indices differ"
    assert np.array_equal(
        np.asarray(index.sa_off)[:n], np.asarray(ref.sa_off)[:n]
    ), "SA sample offsets differ"
    log(fh, f"SA samples byte-identical ({n} samples); C identical")
    assert list(index.names) == list(ref.names), "name order differs"
    log(fh, "sequence name order identical")

    summary = dict(
        metric="big_build_crosscheck", letters=tot, nseq=nseq,
        bwt_identical=True, sa_identical=True,
        rates_maa_per_s={str(k): round(v / 1e6, 2)
                         for k, v in rates.items()},
        ref_mkbwt_s=round(ref_s, 1),
    )
    log(fh, json.dumps(summary))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
