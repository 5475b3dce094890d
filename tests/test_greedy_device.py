"""GreedyDevicePipeline (one fused device call) vs the reference binary."""

import random

import pytest

from kaiju_tpu.engine.config import KaijuConfig
from kaiju_tpu.engine.core import format_output_line
from kaiju_tpu.engine.greedy_device import GreedyDevicePipeline
from kaiju_tpu.index import fmi_reader
from kaiju_tpu.io.taxonomy import Taxonomy, parse_nodes_dmp

from conftest import needs_oracle
from readgen import make_reads, make_protein_reads
from test_exact_parity import _lowcomp_reads, _oracle, _diff


def _lines(db_env, cfg, reads):
    index = fmi_reader.read_fmi(db_env["fmi"])
    tax = Taxonomy(parse_nodes_dmp(db_env["nodes"]))
    pipe = GreedyDevicePipeline(index, tax, cfg)
    out = []
    for name, res in pipe.classify_batch(reads):
        out.append(format_output_line(name, res, cfg.verbose))
    return "".join(out)


@needs_oracle
@pytest.mark.parametrize("seg", [True, False])
def test_greedy_device_oracle(db_env, seg):
    rng = random.Random(81)
    reads = make_reads(rng, db_env["records"], n=120)
    reads += _lowcomp_reads(rng, db_env["records"], n=40)
    cfg = KaijuConfig(mode="greedy", seg=seg, use_Evalue=True)
    mine = _lines(db_env, cfg, [(n, s, None) for n, s in reads])
    ref = _oracle(db_env, reads, ["-a", "greedy", "-x" if seg else "-X"])
    assert mine == ref, _diff(mine, ref)


@needs_oracle
@pytest.mark.parametrize("mismatches", [0, 1, 5])
def test_greedy_device_mismatch_counts(db_env, mismatches):
    rng = random.Random(82)
    reads = make_reads(rng, db_env["records"], n=90)
    cfg = KaijuConfig(mode="greedy", seg=True, use_Evalue=True,
                      mismatches=mismatches)
    mine = _lines(db_env, cfg, [(n, s, None) for n, s in reads])
    ref = _oracle(db_env, reads, ["-a", "greedy", "-x", "-e", str(mismatches)])
    assert mine == ref, _diff(mine, ref)


@needs_oracle
def test_greedy_device_protein(db_env):
    rng = random.Random(83)
    reads = make_protein_reads(rng, db_env["records"], n=60)
    cfg = KaijuConfig(mode="greedy", seg=True, use_Evalue=True,
                      input_is_protein=True)
    mine = _lines(db_env, cfg, [(n, s, None) for n, s in reads])
    ref = _oracle(db_env, reads, ["-a", "greedy", "-x", "-p"], fasta=True)
    assert mine == ref, _diff(mine, ref)


@needs_oracle
def test_greedy_device_paired(db_env):
    rng = random.Random(84)
    r1 = make_reads(rng, db_env["records"], n=50)
    r2 = make_reads(rng, db_env["records"], n=50)
    r2 = [(r1[i][0], r2[i][1]) for i in range(50)]
    cfg = KaijuConfig(mode="greedy", seg=True, use_Evalue=True)
    mine = _lines(
        db_env, cfg, [(r1[i][0], r1[i][1], r2[i][1]) for i in range(50)]
    )
    ref = _oracle(db_env, r1, ["-a", "greedy", "-x"], paired=r2)
    assert mine == ref, _diff(mine, ref)
