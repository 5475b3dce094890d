"""MemFastPipeline (fused device search + device classify tail) must be
bit-identical to the reference binary, including the host fallback paths
for budget overflows."""

import os
import random

import pytest

from kaiju_tpu.engine.config import KaijuConfig
from kaiju_tpu.engine.core import format_output_line
from kaiju_tpu.engine.mem_fast import MemFastPipeline
from kaiju_tpu.index import fmi_reader
from kaiju_tpu.io.taxonomy import Taxonomy, parse_nodes_dmp

from conftest import needs_oracle
from readgen import make_reads, make_protein_reads
from test_exact_parity import _lowcomp_reads, _oracle, _diff


def _lines(db_env, cfg, reads, tweak=None):
    index = fmi_reader.read_fmi(db_env["fmi"])
    tax = Taxonomy(parse_nodes_dmp(db_env["nodes"]))
    pipe = MemFastPipeline(index, tax, cfg)
    if tweak:
        tweak(pipe)
    out = []
    for res in pipe.classify_stream([reads[: len(reads) // 2],
                                     reads[len(reads) // 2 :]]):
        for name, r in res:
            out.append(format_output_line(name, r, cfg.verbose))
    return "".join(out)


@needs_oracle
@pytest.mark.parametrize("verbose", [False, True])
@pytest.mark.parametrize("seg", [True, False])
def test_mem_fast_oracle(db_env, verbose, seg):
    rng = random.Random(81)
    reads = make_reads(rng, db_env["records"], n=120)
    reads += _lowcomp_reads(rng, db_env["records"], n=40)
    cfg = KaijuConfig(mode="mem", seg=seg, use_Evalue=False, verbose=verbose)
    mine = _lines(db_env, cfg, [(n, s, None) for n, s in reads])
    args = ["-a", "mem", "-x" if seg else "-X"] + (["-v"] if verbose else [])
    ref = _oracle(db_env, reads, args)
    assert mine == ref, _diff(mine, ref)


@needs_oracle
def test_mem_fast_tiny_budgets(db_env):
    """Shrink the device-tail budgets so the host fallback paths run for
    most reads; output must not change."""
    rng = random.Random(82)
    reads = make_reads(rng, db_env["records"], n=120)
    cfg = KaijuConfig(mode="mem", seg=True, use_Evalue=False)

    def tweak(pipe):
        pipe.S_SLOTS = 2
        pipe.R_BUDGET = 4

    mine = _lines(db_env, cfg, [(n, s, None) for n, s in reads], tweak)
    ref = _oracle(db_env, reads, ["-a", "mem", "-x"])
    assert mine == ref, _diff(mine, ref)


@needs_oracle
def test_mem_fast_protein(db_env):
    rng = random.Random(83)
    reads = make_protein_reads(rng, db_env["records"], n=60)
    cfg = KaijuConfig(mode="mem", seg=True, use_Evalue=False,
                      input_is_protein=True)
    mine = _lines(db_env, cfg, [(n, s, None) for n, s in reads])
    ref = _oracle(db_env, reads, ["-a", "mem", "-x", "-p"], fasta=True)
    assert mine == ref, _diff(mine, ref)


@needs_oracle
def test_mem_fast_paired(db_env):
    rng = random.Random(84)
    r1 = make_reads(rng, db_env["records"], n=50)
    r2 = make_reads(rng, db_env["records"], n=50)
    r2 = [(r1[i][0], r2[i][1]) for i in range(50)]
    cfg = KaijuConfig(mode="mem", seg=True, use_Evalue=False)
    mine = _lines(
        db_env, cfg, [(r1[i][0], r1[i][1], r2[i][1]) for i in range(50)]
    )
    ref = _oracle(db_env, r1, ["-a", "mem", "-x"], paired=r2)
    assert mine == ref, _diff(mine, ref)


@needs_oracle
def test_mem_fast_hybrid_long_matches(db_env):
    """Oracle parity for the hybrid text-comparison extension: a
    text-carrying index (py_builder) + reads whose fragments are LONG
    exact copies of DB sequences, so matches outlive the FM burn-in
    (fused_mem2.S1_STEPS) and resolve via SA walks + direct text
    comparison; duplicated DB content keeps some intervals wider than
    SW_WCAP, exercising the FM completion side too."""
    from readgen import reverse_translate

    from kaiju_tpu.index import py_builder
    from kaiju_tpu.ops import fused_mem2

    rng = random.Random(85)
    reads = []
    for i in range(60):
        _, prot = db_env["records"][rng.randrange(len(db_env["records"]))]
        plen = rng.randint(
            fused_mem2.S1_STEPS + 10, max(len(prot), fused_mem2.S1_STEPS + 11)
        )
        plen = min(plen, len(prot))
        start = rng.randrange(0, len(prot) - plen + 1)
        reads.append(
            (f"lr{i:03d}", reverse_translate(rng, prot[start : start + plen]))
        )
    # the classify half runs in a FRESH subprocess: this environment's
    # jaxlib deterministically segfaults compiling this (standalone-
    # fine) program from a long-lived process that already compiled
    # many others (see utils/jaxcache.py) — isolation sidesteps the
    # corrupted-process-state trigger without weakening the assertion
    import json
    import subprocess
    import sys

    worker = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, sys.argv[4])
sys.path.insert(0, os.path.dirname(sys.argv[4]))
import jax
jax.config.update("jax_platforms", "cpu")
from kaiju_tpu.engine.config import KaijuConfig
from kaiju_tpu.engine.core import format_output_line
from kaiju_tpu.engine.mem_fast import MemFastPipeline
from kaiju_tpu.index import py_builder
from kaiju_tpu.index.py_builder import read_fasta_records
from kaiju_tpu.io.taxonomy import Taxonomy, parse_nodes_dmp
records = read_fasta_records(sys.argv[1])
reads = json.load(open(sys.argv[2]))
cfg = KaijuConfig(mode="mem", seg=True, use_Evalue=False)
index = py_builder.build_index(records)
assert index.text is not None
tax = Taxonomy(parse_nodes_dmp(sys.argv[3]))
pipe = MemFastPipeline(index, tax, cfg)
assert pipe._hyb_arrays()[0] is not None  # hybrid actually enabled
out = []
for name, r in pipe.classify_batch([(n, s, None) for n, s in reads]):
    out.append(format_output_line(name, r, cfg.verbose))
sys.stdout.write("".join(out))
"""
    here = os.path.dirname(os.path.abspath(__file__))
    reads_json = os.path.join(db_env["workdir"], "hyb_reads.json")
    with open(reads_json, "w") as fh:
        json.dump(reads, fh)
    proc = subprocess.run(
        [sys.executable, "-c", worker, db_env["fasta"], reads_json,
         db_env["nodes"], here],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    ref = _oracle(db_env, reads, ["-a", "mem", "-x"])
    assert proc.stdout == ref, _diff(proc.stdout, ref)
