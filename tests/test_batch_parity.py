"""Batched (device-kernel) classification must be bit-identical to the
sequential exact engine and hence to the reference binary."""

import random

import pytest

from kaiju_tpu.engine.batch import BatchRunner
from kaiju_tpu.engine.config import KaijuConfig
from kaiju_tpu.engine.core import ExactClassifier, format_output_line
from kaiju_tpu.index import fmi_reader
from kaiju_tpu.io.taxonomy import Taxonomy, parse_nodes_dmp

from conftest import needs_oracle, run_oracle_kaiju
from readgen import make_reads, make_protein_reads, write_fastq
from test_exact_parity import _lowcomp_reads, _oracle, _diff


def _lines_batch(db_env, cfg, reads):
    index = fmi_reader.read_fmi(db_env["fmi"])
    tax = Taxonomy(parse_nodes_dmp(db_env["nodes"]))
    runner = BatchRunner(index, tax, cfg)
    return "".join(
        runner.classify_to_lines([(n, s, None) for n, s in reads])
    )


@needs_oracle
@pytest.mark.parametrize(
    "mode,verbose", [("mem", False), ("mem", True), ("greedy", False), ("greedy", True)]
)
def test_batch_matches_oracle(db_env, mode, verbose):
    rng = random.Random(52)
    reads = make_reads(rng, db_env["records"], n=120)
    reads += _lowcomp_reads(rng, db_env["records"], n=40)
    cfg = KaijuConfig(
        mode=mode, seg=True, use_Evalue=(mode == "greedy"), verbose=verbose
    )
    mine = _lines_batch(db_env, cfg, reads)
    args = ["-a", mode, "-x"] + (["-v"] if verbose else [])
    ref = _oracle(db_env, reads, args)
    assert mine == ref, _diff(mine, ref)


@needs_oracle
def test_batch_protein_input(db_env):
    rng = random.Random(53)
    reads = make_protein_reads(rng, db_env["records"], n=60)
    cfg = KaijuConfig(
        mode="greedy", seg=True, input_is_protein=True, verbose=True
    )
    mine = _lines_batch(db_env, cfg, reads)
    ref = _oracle(db_env, reads, ["-a", "greedy", "-x", "-p", "-v"], fasta=True)
    assert mine == ref, _diff(mine, ref)


@needs_oracle
def test_batch_paired(db_env):
    rng = random.Random(54)
    r1 = make_reads(rng, db_env["records"], n=50)
    r2 = make_reads(rng, db_env["records"], n=50)
    r2 = [(r1[i][0], r2[i][1]) for i in range(50)]
    index = fmi_reader.read_fmi(db_env["fmi"])
    tax = Taxonomy(parse_nodes_dmp(db_env["nodes"]))
    cfg = KaijuConfig(mode="greedy", seg=True)
    runner = BatchRunner(index, tax, cfg)
    mine = "".join(
        runner.classify_to_lines(
            [(r1[i][0], r1[i][1], r2[i][1]) for i in range(50)]
        )
    )
    ref = _oracle(db_env, r1, ["-a", "greedy", "-x"], paired=r2)
    assert mine == ref, _diff(mine, ref)
