"""Producer-thread batch prefetching (reference analog:
kaiju.cpp:250-257's producer + bounded ProducerConsumerQueue): order
must be preserved, batch shapes identical to the synchronous path, and
parse errors must propagate to the consumer."""

import gzip

import pytest

from kaiju_tpu.io.fastx import FastxError, batched, prefetch_batches, read_reads


def test_prefetch_matches_batched():
    items = list(range(10007))
    got = [x for b in prefetch_batches(iter(items), 64) for x in b]
    assert got == items
    want = [len(b) for b in batched(iter(items), 64)]
    have = [len(b) for b in prefetch_batches(iter(items), 64)]
    assert want == have


def test_prefetch_propagates_errors():
    def boom():
        yield 1
        raise ValueError("parse error")

    with pytest.raises(ValueError, match="parse error"):
        list(prefetch_batches(boom(), 4))


def test_prefetch_over_real_fastq(tmp_path):
    p = tmp_path / "r.fastq.gz"
    with gzip.open(p, "wt") as fh:
        for i in range(257):
            fh.write(f"@r{i} extra\nACGTACGT\n+\nIIIIIIII\n")
    batches = list(prefetch_batches(read_reads(str(p)), 100))
    assert [len(b) for b in batches] == [100, 100, 57]
    assert batches[0][0] == ("r0", "ACGTACGT", None)


def test_prefetch_propagates_pairing_error(tmp_path):
    p1 = tmp_path / "a.fastq"
    p2 = tmp_path / "b.fastq"
    p1.write_text("@r0\nACGT\n+\nIIII\n@r1\nACGT\n+\nIIII\n")
    p2.write_text("@r0\nACGT\n+\nIIII\n")
    with pytest.raises(FastxError, match="more reads"):
        list(prefetch_batches(read_reads(str(p1), str(p2)), 10))
