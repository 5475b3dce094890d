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


@needs_oracle
def test_greedy_device_hybrid_long_matches(db_env):
    """Oracle parity for the last-level hybrid finish: a text-carrying
    index + long matches that outlive the FM burn-in, so the final
    mismatch level resolves ties via SA walks + direct text comparison
    (virtual id rows) instead of FM completion."""
    import random as _random

    from readgen import reverse_translate

    from kaiju_tpu.index import py_builder

    rng = _random.Random(95)
    reads = []
    for i in range(50):
        _, prot = db_env["records"][rng.randrange(len(db_env["records"]))]
        plen = min(rng.randint(30, 200), len(prot))
        start = rng.randrange(0, len(prot) - plen + 1)
        sub = list(prot[start : start + plen])
        if i % 2 and len(sub) > 40:  # one inner mutation: forces variants
            sub[len(sub) // 2] = "ACDEFGHIKLMNPQRSTVWY"[i % 20]
        reads.append((f"gh{i:03d}", reverse_translate(rng, "".join(sub))))
    cfg = KaijuConfig(mode="greedy")
    index = py_builder.build_index(db_env["records"])
    assert index.text is not None
    tax = Taxonomy(parse_nodes_dmp(db_env["nodes"]))
    pipe = GreedyDevicePipeline(index, tax, cfg)
    assert pipe._hyb_arrays()[0] is not None
    out = []
    for name, r in pipe.classify_batch([(n, s, None) for n, s in reads]):
        out.append(format_output_line(name, r, cfg.verbose))
    ref = _oracle(db_env, reads, [])
    assert "".join(out) == ref, _diff("".join(out), ref)
