"""At-scale parity: MEM + Greedy vs the reference binary on the (cached)
multi-megabase bench database — tie widths, id caps, and SA-walk depths
only fire at this scale (reference CI analog:
/root/reference/test/viruses/sars-cov-2-SE.sh:9-31).

Marked slow: uses the bench DB from .bench_cache (built by bench.py; if
absent a smaller 8M-aa one is built and cached here the same way).
"""

import importlib
import os
import random
import subprocess
import sys

import pytest

from conftest import ORACLE_BIN, needs_oracle

pytestmark = [pytest.mark.slow, needs_oracle]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_READS = int(os.environ.get("KAIJU_SCALE_TEST_READS", 2000))


@pytest.fixture(scope="module")
def scale_env():
    """Bench DB + reads + reference .fmi, reusing bench.py's cache."""
    sys.path.insert(0, REPO)
    default = os.path.join(REPO, ".bench_cache", "db64M")
    if not os.path.exists(os.path.join(default, "db.ktx", "meta.json")):
        os.environ.setdefault("KAIJU_BENCH_DB_LETTERS", "8000000")
    import bench

    importlib.reload(bench)
    index, fasta, nodes = bench.build_db()
    reads, _ = bench.make_reads(fasta)
    prefix = os.path.join(bench.CACHE, "refdb")
    if not os.path.exists(prefix + ".fmi"):
        subprocess.run(
            [os.path.join(ORACLE_BIN, "kaiju-mkbwt"), "-n", "2", "-e", "3",
             "-a", "ACDEFGHIKLMNPQRSTVWY", "-o", prefix, fasta],
            check=True, capture_output=True,
        )
        subprocess.run(
            [os.path.join(ORACLE_BIN, "kaiju-mkfmi"), prefix],
            check=True, capture_output=True,
        )
    rng = random.Random(12345)
    sub = rng.sample(reads, min(N_READS, len(reads)))
    return {
        "index": index,
        "cache": bench.CACHE,
        "nodes": nodes,
        "fmi": prefix + ".fmi",
        "reads": sub,
    }


def _oracle_lines(env, reads, mode, tmp_path):
    rp = str(tmp_path / "reads.fastq")
    with open(rp, "w") as fh:
        for name, seq in reads:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    out = str(tmp_path / "ref.out")
    cmd = [os.path.join(ORACLE_BIN, "kaiju"), "-t", env["nodes"],
           "-f", env["fmi"], "-i", rp, "-z", "5", "-o", out]
    if mode == "mem":
        cmd += ["-a", "mem"]  # SEG on (default), matching the pipeline
    subprocess.run(cmd, check=True, capture_output=True)
    return sorted(open(out).read().splitlines())


def _mine_lines(env, reads, mode):
    from kaiju_tpu.engine.config import KaijuConfig
    from kaiju_tpu.engine.core import format_output_line
    from kaiju_tpu.io.taxonomy import Taxonomy, parse_nodes_dmp

    tax = Taxonomy(parse_nodes_dmp(env["nodes"]))
    fasta = os.path.join(env["cache"], "db.faa")
    kdir = os.path.join(env["cache"], "db.ktx")
    if mode == "mem":
        from kaiju_tpu.engine.mem_fast import MemFastPipeline

        cfg = KaijuConfig(mode="mem", seg=True, use_Evalue=False)
        pipe = MemFastPipeline(env["index"], tax, cfg,
                               kmer_cache_dir=kdir, source_fasta=fasta)
    else:
        from kaiju_tpu.engine.greedy_device import GreedyDevicePipeline

        cfg = KaijuConfig(mode="greedy")  # reference defaults e=3 s=65 E=0.01
        pipe = GreedyDevicePipeline(env["index"], tax, cfg,
                                    kmer_cache_dir=kdir, source_fasta=fasta)
    items = [(n, s, None) for n, s in reads]
    lines = []
    B = 1024
    batches = (items[i : i + B] for i in range(0, len(items), B))
    for results in pipe.classify_stream(batches):
        for name, res in results:
            lines.append(format_output_line(name, res, False).rstrip("\n"))
    return sorted(lines)


@pytest.mark.parametrize("mode", ["mem", "greedy"])
def test_at_scale_parity(scale_env, tmp_path, mode):
    reads = scale_env["reads"]
    ref = _oracle_lines(scale_env, reads, mode, tmp_path)
    mine = _mine_lines(scale_env, reads, mode)
    assert len(mine) == len(ref)
    bad = [(m, r) for m, r in zip(mine, ref) if m != r]
    assert not bad, f"{len(bad)} mismatching lines; first: {bad[:5]}"
