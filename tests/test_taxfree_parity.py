"""kaijux / kaijup (taxonomy-free) parity vs the reference binaries."""

import os
import random
import subprocess

import pytest

from kaiju_tpu.engine.config import KaijuConfig
from kaiju_tpu.engine.core import ExactClassifier, format_output_line_x
from kaiju_tpu.index import fmi_reader

from conftest import ORACLE_BIN, needs_oracle
from readgen import make_reads, make_protein_reads, write_fastq, write_reads_fasta


def _mine(db_env, cfg, reads):
    index = fmi_reader.read_fmi(db_env["fmi"])
    eng = ExactClassifier(index, None, cfg)
    out = []
    for name, seq in reads:
        _, res = eng.classify_read(name, seq)
        out.append(format_output_line_x(name, res))
    return "".join(out)


def _oracle_x(db_env, binary, reads, extra, fasta=False):
    workdir = db_env["workdir"]
    tag = abs(hash((binary, tuple(r[0] for r in reads), tuple(extra)))) % 10**8
    rp = os.path.join(workdir, f"xreads{tag}.{'fasta' if fasta else 'fastq'}")
    (write_reads_fasta if fasta else write_fastq)(reads, rp)
    res = subprocess.run(
        [os.path.join(ORACLE_BIN, binary), "-f", db_env["fmi"], "-i", rp, "-z", "1"]
        + list(extra),
        check=True,
        capture_output=True,
        text=True,
    )
    return res.stdout


@needs_oracle
@pytest.mark.parametrize("mode", ["mem", "greedy"])
def test_kaijux_parity(db_env, mode):
    rng = random.Random(71)
    reads = make_reads(rng, db_env["records"], n=120)
    for verbose in (False, True):
        cfg = KaijuConfig(
            mode=mode, seg=True, taxonomy_free=True, verbose=verbose,
            use_Evalue=(mode == "greedy"),
        )
        mine = _mine(db_env, cfg, reads)
        args = ["-a", mode, "-x"] + (["-v"] if verbose else [])
        ref = _oracle_x(db_env, "kaijux", reads, args)
        assert mine == ref, (mode, verbose)


@needs_oracle
@pytest.mark.parametrize("mode", ["mem", "greedy"])
def test_kaijup_parity(db_env, mode):
    rng = random.Random(72)
    reads = make_protein_reads(rng, db_env["records"], n=100)
    for verbose in (False, True):
        cfg = KaijuConfig(
            mode=mode, seg=True, taxonomy_free=True, input_is_protein=True,
            verbose=verbose, use_Evalue=(mode == "greedy"),
        )
        mine = _mine(db_env, cfg, reads)
        args = ["-a", mode, "-x"] + (["-v"] if verbose else [])
        ref = _oracle_x(db_env, "kaijup", reads, args, fasta=True)
        assert mine == ref, (mode, verbose)
