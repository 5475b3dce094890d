"""Cross-batch fragment memo tables must stay bounded: with a tiny
KAIJU_FRAG_CACHE_CAP the pipelines flush their generation caches
between batches (draining the lookahead first so outstanding uids stay
valid) and results are unchanged vs an unbounded run.

Reference behavior contract: the reference holds no cross-read state at
all (ConsumerThread.cpp processes each read independently), so any
cache here is purely a memoization — flushing it must be invisible.
"""

import random

import pytest

from kaiju_tpu.engine.config import KaijuConfig
from kaiju_tpu.engine.core import format_output_line
from kaiju_tpu.index import py_builder
from kaiju_tpu.io.taxonomy import Taxonomy

from conftest import make_db_records, random_dna


def _env():
    rng = random.Random(4242)
    records = make_db_records(rng, nseq=30)
    index = py_builder.build_index(records)
    nodes = {1: 1, 10: 1}
    nodes.update({100 + t: 10 for t in range(7)})
    tax = Taxonomy(nodes)
    reads = []
    for i in range(48):
        _, prot = records[rng.randrange(len(records))]
        ln = rng.randint(15, min(50, len(prot)))
        st = rng.randrange(0, len(prot) - ln + 1)
        reads.append((f"r{i}", prot[st : st + ln], None))
    for i in range(16):
        reads.append((f"n{i}", random_dna(rng, 120), None))
    return index, tax, reads


def _run(pipe, reads, nbatches=4):
    per = len(reads) // nbatches
    batches = [reads[i * per : (i + 1) * per] for i in range(nbatches)]
    out = []
    for res in pipe.classify_stream(batches):
        for name, r in res:
            out.append(format_output_line(name, r, False))
    return "".join(out)


def test_mem_cache_flush_invisible():
    from kaiju_tpu.engine.mem_fast import MemFastPipeline

    index, tax, reads = _env()
    preads = [r for r in reads if r[0].startswith("r")]
    cfg = KaijuConfig(mode="mem", seg=True, use_Evalue=False,
                      input_is_protein=True)
    base = MemFastPipeline(index, tax, cfg)
    base._device_tail = False  # exercise the uid-cache host path
    want = _run(base, preads)

    pipe = MemFastPipeline(index, tax, cfg)
    pipe._device_tail = False
    pipe._cache_cap = 4  # flush after nearly every batch
    got = _run(pipe, preads)
    assert got == want
    assert len(pipe._frags) <= pipe._cache_cap + len(preads) * 8


@pytest.mark.slow
def test_greedy_cache_flush_invisible():
    from kaiju_tpu.engine.greedy_fast import GreedyFastPipeline

    index, tax, reads = _env()
    cfg = KaijuConfig(mode="greedy", seg=True, use_Evalue=False,
                      mismatches=2)
    base = GreedyFastPipeline(index, tax, cfg)
    want = _run(base, reads)

    pipe = GreedyFastPipeline(index, tax, cfg)
    pipe._cache_cap = 4
    got = _run(pipe, reads)
    assert got == want
    assert len(pipe._frags) <= pipe._cache_cap + len(reads) * 16
