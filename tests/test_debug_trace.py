"""-d per-read tracing parity: the stderr trace lines of our CLI must
match the reference binary's -d output (reference:
ConsumerThread.cpp:437-505) line for line on the shared prefixes.
"""

import os
import random
import subprocess
import sys

import pytest

from conftest import ORACLE_BIN, needs_oracle
from readgen import make_reads

PREFIXES = (
    "Searching fragment ",
    "No match for this fragment.",
    "Longest match is length ",
    "Match from ",
    "Match of length ",
)


def _trace(text):
    return [
        ln for ln in text.splitlines()
        if ln.startswith(PREFIXES)
    ]


def _write_fastq(reads, path):
    with open(path, "w") as fh:
        for name, seq in reads:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


@needs_oracle
@pytest.mark.parametrize("mode", ["greedy", "mem"])
def test_debug_trace_parity(db_env, tmp_path, mode):
    rng = random.Random(4711)
    reads = make_reads(rng, db_env["records"], n=8)
    rp = str(tmp_path / "reads.fastq")
    _write_fastq(reads, rp)

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    res = subprocess.run(
        [sys.executable, "-m", "kaiju_tpu.tools.kaiju",
         "-t", db_env["nodes"], "-f", db_env["fmi"], "-i", rp,
         "-a", mode, "-d", "-o", str(tmp_path / "mine.out")],
        capture_output=True, text=True, env=env, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr

    ref = subprocess.run(
        [os.path.join(ORACLE_BIN, "kaiju"), "-t", db_env["nodes"],
         "-f", db_env["fmi"], "-i", rp, "-z", "1", "-a", mode, "-d",
         "-o", str(tmp_path / "ref.out")],
        capture_output=True, text=True,
    )
    assert ref.returncode == 0, ref.stderr

    mine_t = _trace(res.stderr)
    ref_t = _trace(ref.stderr)
    assert mine_t == ref_t, (
        f"first divergence: "
        f"{next(((m, r) for m, r in zip(mine_t, ref_t) if m != r), None)}; "
        f"lens {len(mine_t)} vs {len(ref_t)}"
    )
    # and the classification output itself must be unchanged by -d
    assert (tmp_path / "mine.out").read_text() == (
        tmp_path / "ref.out"
    ).read_text()
