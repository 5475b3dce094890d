"""Bit-identical output parity: ExactClassifier vs the reference kaiju
binary on the same synthetic database and reads (SURVEY.md §4: the north
star is read-by-read identical TSV)."""

import os
import random

import pytest

from kaiju_tpu.engine.config import KaijuConfig
from kaiju_tpu.engine.core import ExactClassifier, format_output_line
from kaiju_tpu.index import fmi_reader
from kaiju_tpu.io.taxonomy import Taxonomy, parse_nodes_dmp

from conftest import needs_oracle, run_oracle_kaiju
from readgen import make_reads, make_protein_reads, write_fastq, write_reads_fasta


def _mine(db_env, cfg: KaijuConfig, reads, paired=None) -> str:
    index = fmi_reader.read_fmi(db_env["fmi"])
    tax = Taxonomy(parse_nodes_dmp(db_env["nodes"]))
    eng = ExactClassifier(index, tax, cfg)
    out = []
    for i, (name, seq) in enumerate(reads):
        seq2 = paired[i][1] if paired else None
        _, res = eng.classify_read(name, seq, seq2)
        out.append(format_output_line(name, res, cfg.verbose))
    return "".join(out)


def _oracle(db_env, reads, extra_args, paired=None, fasta=False) -> str:
    workdir = db_env["workdir"]
    tag = abs(hash((tuple(r[0] for r in reads), tuple(extra_args), fasta))) % 10**8
    rp = os.path.join(workdir, f"reads{tag}.{'fasta' if fasta else 'fastq'}")
    (write_reads_fasta if fasta else write_fastq)(reads, rp)
    args = ["-t", db_env["nodes"], "-f", db_env["fmi"], "-i", rp, "-z", "1"]
    if paired:
        rp2 = os.path.join(workdir, f"reads{tag}_2.fastq")
        write_fastq(paired, rp2)
        args += ["-j", rp2]
    return run_oracle_kaiju(args + list(extra_args))


def _diff(mine: str, ref: str) -> str:
    ml, rl = mine.splitlines(), ref.splitlines()
    msgs = []
    for i, (a, b) in enumerate(zip(ml, rl)):
        if a != b:
            msgs.append(f"line {i}:\n  mine: {a}\n  ref : {b}")
            if len(msgs) > 5:
                break
    if len(ml) != len(rl):
        msgs.append(f"line counts differ: {len(ml)} vs {len(rl)}")
    return "\n".join(msgs)


@needs_oracle
@pytest.mark.parametrize("verbose", [False, True])
def test_mem_parity(db_env, verbose):
    rng = random.Random(42)
    reads = make_reads(rng, db_env["records"], n=150)
    cfg = KaijuConfig(mode="mem", seg=False, use_Evalue=False, verbose=verbose)
    mine = _mine(db_env, cfg, reads)
    args = ["-a", "mem", "-X"] + (["-v"] if verbose else [])
    ref = _oracle(db_env, reads, args)
    assert mine == ref, _diff(mine, ref)


@needs_oracle
@pytest.mark.parametrize("verbose", [False, True])
def test_greedy_parity(db_env, verbose):
    rng = random.Random(43)
    reads = make_reads(rng, db_env["records"], n=150)
    cfg = KaijuConfig(mode="greedy", seg=False, verbose=verbose)
    mine = _mine(db_env, cfg, reads)
    args = ["-a", "greedy", "-X"] + (["-v"] if verbose else [])
    ref = _oracle(db_env, reads, args)
    assert mine == ref, _diff(mine, ref)


@needs_oracle
def test_greedy_no_evalue_more_mismatches(db_env):
    rng = random.Random(44)
    reads = make_reads(rng, db_env["records"], n=80)
    cfg = KaijuConfig(
        mode="greedy", seg=False, verbose=True, mismatches=5, min_score=45,
        use_Evalue=True, min_Evalue=1.0,
    )
    mine = _mine(db_env, cfg, reads)
    ref = _oracle(
        db_env, reads, ["-a", "greedy", "-X", "-v", "-e", "5", "-s", "45", "-E", "1.0"]
    )
    assert mine == ref, _diff(mine, ref)


@needs_oracle
def test_paired_parity(db_env):
    rng = random.Random(45)
    r1 = make_reads(rng, db_env["records"], n=60)
    r2 = make_reads(rng, db_env["records"], n=60)
    r2 = [(r1[i][0], r2[i][1]) for i in range(60)]  # same names
    for mode_args, cfg in [
        (["-a", "mem", "-X"], KaijuConfig(mode="mem", seg=False, use_Evalue=False)),
        (["-a", "greedy", "-X"], KaijuConfig(mode="greedy", seg=False)),
    ]:
        mine = _mine(db_env, cfg, r1, paired=r2)
        ref = _oracle(db_env, r1, mode_args, paired=r2)
        assert mine == ref, _diff(mine, ref)


@needs_oracle
def test_protein_input_parity(db_env):
    rng = random.Random(46)
    reads = make_protein_reads(rng, db_env["records"], n=80)
    for mode_args, cfg in [
        (
            ["-a", "mem", "-X", "-p"],
            KaijuConfig(mode="mem", seg=False, use_Evalue=False, input_is_protein=True),
        ),
        (
            ["-a", "greedy", "-X", "-p", "-v"],
            KaijuConfig(mode="greedy", seg=False, input_is_protein=True, verbose=True),
        ),
    ]:
        mine = _mine(db_env, cfg, reads)
        ref = _oracle(db_env, reads, mode_args, fasta=True)
        assert mine == ref, _diff(mine, ref)


def _lowcomp_reads(rng, records, n=100):
    """Reads with low-complexity protein stretches to exercise SEG."""
    from readgen import reverse_translate, revcomp

    aas = "ACDEFGHIKLMNPQRSTVWY"
    reads = []
    for i in range(n):
        name = f"lc{i:04d}"
        _, prot = records[rng.randrange(len(records))]
        plen = rng.randint(15, min(50, len(prot)))
        start = rng.randrange(0, len(prot) - plen + 1)
        sub = prot[start : start + plen]
        kind = i % 5
        if kind == 0:  # homopolymer insert
            a = rng.choice(aas)
            sub = sub[: plen // 2] + a * rng.randint(8, 20) + sub[plen // 2 :]
        elif kind == 1:  # dipeptide repeat
            a, b = rng.choice(aas), rng.choice(aas)
            sub = a + (a + b) * rng.randint(5, 12) + sub
        elif kind == 2:  # low-complexity tail
            a = rng.choice("PQS")
            sub = sub + a * rng.randint(6, 15)
        elif kind == 3:  # two low-complexity islands
            sub = ("S" * rng.randint(7, 14) + sub[: plen // 2]
                   + "K" * rng.randint(7, 14) + sub[plen // 2 :])
        dna = reverse_translate(rng, sub)
        if i % 2:
            dna = revcomp(dna)
        reads.append((name, dna))
    return reads


@needs_oracle
@pytest.mark.parametrize("mode", ["mem", "greedy"])
def test_seg_parity(db_env, mode):
    rng = random.Random(47)
    reads = _lowcomp_reads(rng, db_env["records"], n=100)
    reads += make_reads(rng, db_env["records"], n=50)
    cfg = KaijuConfig(
        mode=mode, seg=True, use_Evalue=(mode == "greedy"), verbose=True
    )
    mine = _mine(db_env, cfg, reads)
    ref = _oracle(db_env, reads, ["-a", mode, "-x", "-v"])
    assert mine == ref, _diff(mine, ref)
