"""DB-build pipeline converters vs the reference binaries/scripts."""

import gzip
import os
import random
import subprocess

import pytest

from conftest import ORACLE_BIN, oracle_available, random_protein

needs_oracle = pytest.mark.skipif(
    not oracle_available(), reason="reference kaiju binaries not available"
)


def write_taxonomy(workdir):
    nodes = os.path.join(workdir, "nodes.dmp")
    merged = os.path.join(workdir, "merged.dmp")
    # 1 <- {2 (bacteria) <- 20 <- 21, 2157 <- 30, 2759 <- 40}, 10239 <- 50
    edges = {1: 1, 2: 1, 2157: 1, 2759: 1, 10239: 1,
             20: 2, 21: 20, 30: 2157, 40: 2759, 50: 10239}
    with open(nodes, "w") as fh:
        for n, p in edges.items():
            fh.write(f"{n}\t|\t{p}\t|\tspecies\t|\n")
    with open(merged, "w") as fh:
        fh.write("99\t|\t21\t|\n")   # 99 merged into 21
        fh.write("98\t|\t777\t|\n")  # merged into an unknown node
    return nodes, merged


def make_nr_inputs(workdir, rng):
    # accession map: mix of known, merged, unknown taxids
    a2t = os.path.join(workdir, "prot.accession2taxid.gz")
    rows = [
        ("ACC1.1", 21), ("ACC2.1", 30), ("ACC3.1", 99), ("ACC4.1", 12345),
        ("ACC5.1", 40), ("ACC6.1", 50), ("ACC7.1", 20), ("BAD0.1", 98),
    ]
    with gzip.open(a2t, "wt") as fh:
        fh.write("accession\taccession.version\ttaxid\tgi\n")
        for acc, tid in rows:
            fh.write(f"{acc.split('.')[0]}\t{acc}\t{tid}\t0\n")
    nr = os.path.join(workdir, "nr.faa")
    recs = [
        # single accession, bacteria -> kept
        (">ACC1.1 some protein [Foo]", random_protein(rng, 40)),
        # multi-header: LCA(21, 30) = 1 -> not under includes -> dropped
        (">ACC2.1 desc\x01ACC1.1 other", random_protein(rng, 35)),
        # merged taxid 99 -> 21 -> kept
        (">ACC3.1 via merged", random_protein(rng, 30)),
        # unknown taxid -> no ids -> dropped
        (">ACC4.1 unknown", random_protein(rng, 30)),
        # eukaryote -> dropped with default include list
        (">ACC5.1 euk", random_protein(rng, 30)),
        # virus -> kept
        (">ACC6.1 virus", random_protein(rng, 44)),
        # excluded accession -> dropped
        (">ACC7.1 excluded one", random_protein(rng, 33)),
        # no space in header: parser finds no accession -> dropped
        (">ACC1.1", random_protein(rng, 22)),
    ]
    with open(nr, "w") as fh:
        for hdr, seq in recs:
            fh.write(hdr + "\n")
            # split over 2 lines + junk chars
            mid = len(seq) // 2
            fh.write(seq[:mid] + "*x\n" + seq[mid:] + "\n")
    excluded = os.path.join(workdir, "excluded.txt")
    with open(excluded, "w") as fh:
        fh.write("ACC7.1\n")
    return a2t, nr, excluded


@needs_oracle
def test_convert_nr_matches_reference(tmp_path):
    rng = random.Random(7)
    w = str(tmp_path)
    nodes, merged = write_taxonomy(w)
    a2t, nr, excluded = make_nr_inputs(w, rng)

    ref_out = os.path.join(w, "ref.faa")
    subprocess.run(
        [os.path.join(ORACLE_BIN, "kaiju-convertNR"),
         "-t", nodes, "-m", merged, "-g", a2t, "-i", nr,
         "-e", excluded, "-a", "-o", ref_out],
        check=True, capture_output=True,
    )
    my_out = os.path.join(w, "mine.faa")
    from kaiju_tpu.tools.convert_nr import main as conv

    conv(["-t", nodes, "-m", merged, "-g", a2t, "-i", nr,
          "-e", excluded, "-a", "-o", my_out])
    assert open(my_out).read() == open(ref_out).read()


@needs_oracle
def test_convert_refseq_matches_reference(tmp_path):
    rng = random.Random(8)
    w = str(tmp_path)
    nodes, merged = write_taxonomy(w)
    a2t = os.path.join(w, "prot.accession2taxid.FULL.gz")
    with gzip.open(a2t, "wt") as fh:
        fh.write("accession.version\ttaxid\n")
        fh.write("WP_000001.1\t21\n")
        fh.write("WP_000002.1\t40\n")   # eukaryote
        fh.write("WP_000003.1\t99\n")   # merged -> 21 (ref truncates acc!)
        fh.write("XP_000004.1\t21\n")   # not WP_
        fh.write("WP_000005.1\t50\n")   # virus
    fasta = os.path.join(w, "in.faa")
    with open(fasta, "w") as fh:
        for acc in ["WP_000001.1", "WP_000002.1", "WP_000003.1",
                    "XP_000004.1", "WP_000005.1"]:
            fh.write(f">{acc} some protein\n")
            seq = random_protein(rng, 30)
            fh.write(seq[:15] + "bz*\n" + seq[15:] + "\n")

    ref_out = os.path.join(w, "ref.faa")
    with open(fasta) as fin:
        subprocess.run(
            [os.path.join(ORACLE_BIN, "kaiju-convertRefSeq"),
             "-t", nodes, "-m", merged, "-g", a2t, "-a", "-o", ref_out],
            check=True, capture_output=True, stdin=fin,
        )
    my_out = os.path.join(w, "mine.faa")
    from kaiju_tpu.tools.convert_refseq import main as conv

    conv(["-t", nodes, "-m", merged, "-g", a2t, "-a", "-o", my_out,
          "-i", fasta])
    assert open(my_out).read() == open(ref_out).read()


def _have_perl():
    try:
        subprocess.run(["perl", "-e", "1"], check=True, capture_output=True)
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _have_perl(), reason="perl not available")
def test_gbk2faa_matches_reference(tmp_path):
    w = str(tmp_path)
    gbk = os.path.join(w, "x.gbk")
    with open(gbk, "w") as fh:
        fh.write(
            'LOCUS       X\n'
            'FEATURES\n'
            '     source          1..100\n'
            '                     /db_xref="taxon:562"\n'
            '     CDS             1..30\n'
            '                     /protein_id="AAA1.1"\n'
            '                     /translation="MKVLAAGBZTT"\n'
            '     CDS             31..90\n'
            '                     /protein_id="AAA2.1"\n'
            '                     /translation="MKVLAAGXTTARNDCQEGHILKM\n'
            '                     FPSTWYVARNDbzCQEGHILKM\n'
            '                     FPSTW"\n'
            '//\n'
        )
    ref_out = os.path.join(w, "ref.faa")
    subprocess.run(
        ["perl", "/root/reference/util/kaiju-gbk2faa.pl", gbk, ref_out],
        check=True, capture_output=True,
    )
    my_out = os.path.join(w, "mine.faa")
    from kaiju_tpu.tools.gbk2faa import main as conv

    conv([gbk, my_out])
    assert open(my_out).read() == open(ref_out).read()


def test_makedb_index_only(tmp_path):
    """--index-only builds a loadable ktx index from an existing faa."""
    rng = random.Random(9)
    w = str(tmp_path)
    write_taxonomy(w)
    dbdir = os.path.join(w, "viruses")
    os.makedirs(dbdir)
    faa = os.path.join(dbdir, "kaiju_db_viruses.faa")
    with open(faa, "w") as fh:
        for i in range(12):
            fh.write(f">ACC{i}.1_{50}\n{random_protein(rng, 60)}\n")
    from kaiju_tpu.tools.makedb import main as makedb

    rc = makedb(["-s", "viruses", "--index-only", "-w", w])
    assert rc == 0
    from kaiju_tpu.index.core import KaijuIndex

    idx = KaijuIndex.load(os.path.join(dbdir, "kaiju_db_viruses.ktx"))
    assert idx.nseq == 12
