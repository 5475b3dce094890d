"""Index construction and FM-query parity tests.

The oracle is the reference kaiju-mkbwt/kaiju-mkfmi toolchain: our builder
must produce the same BWT, letter starts, SA samples and sequence metadata
for the same FASTA input.
"""

import random

import numpy as np
import pytest

from kaiju_tpu.index import fmi_reader, py_builder
from kaiju_tpu.index.alphabet import MAKEDB_ALPHABET
from kaiju_tpu.index.core import parse_taxid

from conftest import needs_oracle, make_db_records, write_fasta, oracle_build_index


@needs_oracle
def test_builder_matches_reference_fmi(db_env):
    ref = fmi_reader.read_fmi(db_env["fmi"])
    mine = py_builder.build_index(db_env["records"], chpt_exp=ref.chpt_exp)

    assert ref.alphabet == MAKEDB_ALPHABET
    assert mine.length == ref.length
    assert mine.nseq == ref.nseq
    np.testing.assert_array_equal(
        mine.bwt[: mine.length], ref.bwt[: ref.length]
    )
    np.testing.assert_array_equal(mine.C, ref.C)
    np.testing.assert_array_equal(mine.occ, ref.occ)
    # the reference under-counts ncheck by one when nseq % 2^e == 0
    # (suffixArray.c:160); compare the common prefix
    n = min(len(mine.sa_seq), len(ref.sa_seq))
    assert len(mine.sa_seq) - n <= 1
    np.testing.assert_array_equal(mine.sa_seq[:n], ref.sa_seq[:n])
    np.testing.assert_array_equal(mine.sa_off[:n], ref.sa_off[:n])
    assert mine.names == ref.names
    np.testing.assert_array_equal(mine.seq_lengths, ref.seq_lengths)
    np.testing.assert_array_equal(mine.seq_term_order, ref.seq_term_order)


@needs_oracle
def test_builder_matches_reference_fmi_more_shapes(tmp_path):
    """Sweep nseq/e combinations including nseq % 2^e == 0 edge cases."""
    for seed, nseq, e in [(1, 8, 3), (2, 16, 4), (3, 33, 3), (4, 5, 5)]:
        rng = random.Random(seed)
        records = make_db_records(rng, nseq=nseq)
        d = tmp_path / f"db{seed}"
        d.mkdir()
        fasta = str(d / "db.faa")
        write_fasta(records, fasta)
        fmi = oracle_build_index(fasta, str(d), sa_exp=e)
        ref = fmi_reader.read_fmi(fmi)
        mine = py_builder.build_index(records, chpt_exp=e)
        np.testing.assert_array_equal(
            mine.bwt[: mine.length], ref.bwt[: ref.length]
        )
        n = min(len(mine.sa_seq), len(ref.sa_seq))
        assert len(mine.sa_seq) - n <= 1
        np.testing.assert_array_equal(mine.sa_seq[:n], ref.sa_seq[:n])
        np.testing.assert_array_equal(mine.sa_off[:n], ref.sa_off[:n])
        assert mine.names == ref.names


def test_rank_bruteforce():
    rng = random.Random(7)
    records = make_db_records(rng, nseq=12)
    idx = py_builder.build_index(records)
    bwt = idx.bwt[: idx.length]
    ks = np.array(
        [rng.randrange(0, idx.length + 1) for _ in range(300)], dtype=np.int64
    )
    cs = np.array([rng.randrange(0, idx.alen) for _ in range(300)], dtype=np.int64)
    got = idx.rank(cs, ks)
    want = np.array([(bwt[:k] == c).sum() for c, k in zip(cs, ks)])
    np.testing.assert_array_equal(got, want)


def test_get_suffix_roundtrip():
    """get_suffix must invert the suffix array for every sorted position."""
    rng = random.Random(11)
    records = make_db_records(rng, nseq=10)
    idx = py_builder.build_index(records)

    # reconstruct ground-truth sorted suffixes the same way as the builder
    seqs = [py_builder.translate_db_sequence(s) for _, s in records]
    nseq = len(seqs)
    idx_w = max(1, (nseq.bit_length() + 7) // 8)
    suff = []
    for i, s in enumerate(seqs):
        sb = s.tobytes() + b"\x00" + i.to_bytes(idx_w, "big")
        for p in range(len(s)):
            suff.append((sb[p:], i, p))
    suff.sort(key=lambda x: x[0])
    order = sorted(range(nseq), key=lambda i: seqs[i].tobytes() + b"\x00" + i.to_bytes(idx_w, "big"))
    content_rank = {i: r for r, i in enumerate(order)}

    for r, (_, i, p) in enumerate(suff):
        k = nseq + r
        iseq, pos = idx.get_suffix(k)
        assert (iseq, pos) == (content_rank[i], p), (k, i, p)


def test_save_load_roundtrip(tmp_path):
    rng = random.Random(5)
    records = make_db_records(rng, nseq=8)
    idx = py_builder.build_index(records)
    idx.save(str(tmp_path / "ktx"))
    idx2 = idx.load(str(tmp_path / "ktx"))
    np.testing.assert_array_equal(idx.bwt, idx2.bwt)
    np.testing.assert_array_equal(idx.occ, idx2.occ)
    np.testing.assert_array_equal(idx.sa_seq, idx2.sa_seq)
    assert idx.names == idx2.names
    assert idx.length == idx2.length and idx.nseq == idx2.nseq


def test_parse_taxid():
    assert parse_taxid("AX1235.1_4567") == 4567
    assert parse_taxid("WP_12345.1_987") == 987
    assert parse_taxid("987") == 987
    assert parse_taxid("foo") == 0


def test_native_builder_matches_py_builder():
    from kaiju_tpu.index import native_builder

    for seed, nseq in [(61, 8), (62, 25), (63, 40)]:
        rng = random.Random(seed)
        records = make_db_records(rng, nseq=nseq)
        a = py_builder.build_index(records)
        b = native_builder.build_index(records)
        np.testing.assert_array_equal(a.bwt, b.bwt)
        np.testing.assert_array_equal(a.C, b.C)
        np.testing.assert_array_equal(a.occ, b.occ)
        np.testing.assert_array_equal(a.sa_seq, b.sa_seq)
        np.testing.assert_array_equal(a.sa_off, b.sa_off)
        assert a.names == b.names
        np.testing.assert_array_equal(a.seq_lengths, b.seq_lengths)
        np.testing.assert_array_equal(a.seq_term_order, b.seq_term_order)


@needs_oracle
def test_native_builder_matches_reference_fmi(db_env):
    from kaiju_tpu.index import native_builder

    ref = fmi_reader.read_fmi(db_env["fmi"])
    mine = native_builder.build_index(db_env["records"], chpt_exp=ref.chpt_exp)
    np.testing.assert_array_equal(mine.bwt[: mine.length], ref.bwt[: ref.length])
    n = min(len(mine.sa_seq), len(ref.sa_seq))
    np.testing.assert_array_equal(mine.sa_seq[:n], ref.sa_seq[:n])
    np.testing.assert_array_equal(mine.sa_off[:n], ref.sa_off[:n])
    assert mine.names == ref.names


def test_big_builder_matches_sais_builder():
    """Bucketed threaded builder (kt_build_bwt_big) vs SA-IS, including
    homopolymer runs (the run-leap path) and terminator edge cases."""
    from kaiju_tpu.index import native_builder
    from kaiju_tpu.index.py_builder import translate_db_sequence

    for seed, nseq in [(71, 8), (72, 40), (73, 64)]:
        rng = random.Random(seed)
        records = make_db_records(rng, nseq=nseq)
        # adversarial extras: long runs with tails below/above the run
        # letter, run-final sequences, single-letter sequences
        records += [
            ("X1_101", "K" * 300 + "A"),
            ("X2_102", "K" * 250 + "Y"),
            ("X3_103", "A" * 400),
            ("X4_104", "C"),
            ("X5_105", "AC" * 120),
        ]
        names = [n for n, _ in records]
        seqs = [
            translate_db_sequence(s, MAKEDB_ALPHABET) for _, s in records
        ]
        a = native_builder.build_index_from_codes(names, seqs, builder="sais")
        b = native_builder.build_index_from_codes(
            names, seqs, builder="big", n_threads=2
        )
        np.testing.assert_array_equal(a.bwt, b.bwt)
        np.testing.assert_array_equal(a.C, b.C)
        np.testing.assert_array_equal(a.sa_seq, b.sa_seq)
        np.testing.assert_array_equal(a.sa_off, b.sa_off)
        assert a.names == b.names
        np.testing.assert_array_equal(a.seq_term_order, b.seq_term_order)


@needs_oracle
@pytest.mark.parametrize("flags", [[], ["-s"], ["-r"], ["-r", "-s"]])
def test_mkdb_dna_options_vs_mkbwt(tmp_path, flags):
    """mkdb's -a DNA / -r revcomp / -s revsort reproduce the reference
    kaiju-mkbwt byte-for-byte on the BWT (reference: mkbwt.c:803-903,
    readFasta.c:187-205)."""
    import os
    import subprocess

    from conftest import ORACLE_BIN
    from kaiju_tpu.index import fmi_reader
    from kaiju_tpu.index.core import KaijuIndex

    rng = random.Random(1234)
    records = []
    for i in range(12):
        n = rng.randint(20, 120)
        records.append(
            (f"seq{i}", "".join(rng.choice("ACGTN") for _ in range(n)))
        )
    fasta = str(tmp_path / "dna.fa")
    with open(fasta, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n{seq}\n")
    prefix = str(tmp_path / "ref")
    subprocess.run(
        [os.path.join(ORACLE_BIN, "kaiju-mkbwt"), "-n", "1", "-e", "3",
         "-a", "DNA", "-l", "1", "-o", prefix] + flags + [fasta],
        check=True, capture_output=True,
    )
    subprocess.run(
        [os.path.join(ORACLE_BIN, "kaiju-mkfmi"), prefix],
        check=True, capture_output=True,
    )
    ref = fmi_reader.read_fmi(prefix + ".fmi")

    ktx = str(tmp_path / "mine.ktx")
    from kaiju_tpu.tools import mkdb

    assert mkdb.main(["-o", ktx, "-e", "3", "-a", "DNA"] + flags
                     + [fasta]) == 0
    mine = KaijuIndex.load(ktx)
    assert mine.length == ref.length and mine.nseq == ref.nseq
    assert mine.alphabet == ref.alphabet
    import numpy as np

    assert np.array_equal(
        np.asarray(mine.bwt[: mine.length]),
        np.asarray(ref.bwt[: ref.length]),
    )
    assert np.array_equal(np.asarray(mine.C), np.asarray(ref.C))
