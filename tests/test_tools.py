"""CLI tools parity vs reference binaries (kaiju2table, kaiju2krona,
addTaxonNames, mergeOutputs) and end-to-end CLI smoke tests."""

import os
import random
import subprocess
import sys

import pytest

from conftest import ORACLE_BIN, needs_oracle, run_oracle_kaiju
from readgen import make_reads, write_fastq


def _make_kaiju_output(db_env, seed=81, n=200, extra=()):
    rng = random.Random(seed)
    reads = make_reads(rng, db_env["records"], n=n)
    rp = os.path.join(db_env["workdir"], f"toolreads{seed}.fastq")
    write_fastq(reads, rp)
    out = run_oracle_kaiju(
        ["-t", db_env["nodes"], "-f", db_env["fmi"], "-i", rp, "-z", "1"]
        + list(extra)
    )
    path = os.path.join(db_env["workdir"], f"kaiju{seed}.out")
    with open(path, "w") as fh:
        fh.write(out)
    return path


def _subproc_env():
    """Child processes must run pure-CPU: force the CPU platform and
    disable any out-of-process accelerator plugin registration (a sick
    device tunnel would otherwise hang the child at interpreter start)."""
    return dict(
        os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS=""
    )


def _run_tool(module, args):
    res = subprocess.run(
        [sys.executable, "-m", module] + args,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=_subproc_env(),
        timeout=600,
    )
    assert res.returncode == 0, res.stderr
    return res.stdout


def _run_oracle_tool(binary, args):
    res = subprocess.run(
        [os.path.join(ORACLE_BIN, binary)] + args,
        capture_output=True,
        text=True,
    )
    assert res.returncode == 0, res.stderr
    return res.stdout


@needs_oracle
@pytest.mark.parametrize(
    "extra",
    [[], ["-u"], ["-p"], ["-l", "superkingdom,genus,species"], ["-c", "5"],
     ["-m", "2.0"], ["-e"]],
)
def test_kaiju2table_parity(db_env, tmp_path, extra):
    kout = _make_kaiju_output(db_env)
    mine_path = str(tmp_path / "mine.tsv")
    ref_path = str(tmp_path / "ref.tsv")
    base = ["-t", db_env["nodes"], "-n", db_env["names"], "-r", "species"]
    _run_tool(
        "kaiju_tpu.tools.kaiju2table",
        base + ["-o", mine_path] + extra + [kout],
    )
    _run_oracle_tool("kaiju2table", base + ["-o", ref_path] + extra + [kout])
    assert open(mine_path).read() == open(ref_path).read()


@needs_oracle
def test_kaiju2krona_parity(db_env, tmp_path):
    kout = _make_kaiju_output(db_env, seed=82)
    mine_path = str(tmp_path / "mine.krona")
    ref_path = str(tmp_path / "ref.krona")
    base = ["-t", db_env["nodes"], "-n", db_env["names"], "-i", kout, "-u"]
    _run_tool("kaiju_tpu.tools.kaiju2krona", base + ["-o", mine_path])
    _run_oracle_tool("kaiju2krona", base + ["-o", ref_path])
    # the reference iterates a hash map: compare as line sets
    assert sorted(open(mine_path).read().splitlines()) == sorted(
        open(ref_path).read().splitlines()
    )


@needs_oracle
@pytest.mark.parametrize("extra", [[], ["-p"], ["-r", "superkingdom,species"], ["-u"]])
def test_addtaxonnames_parity(db_env, tmp_path, extra):
    kout = _make_kaiju_output(db_env, seed=83)
    base = ["-t", db_env["nodes"], "-n", db_env["names"], "-i", kout]
    mine = _run_tool(
        "kaiju_tpu.tools.kaiju_addTaxonNames",
        base + extra + ["-o", str(tmp_path / "m.out")],
    )
    _run_oracle_tool(
        "kaiju-addTaxonNames", base + extra + ["-o", str(tmp_path / "r.out")]
    )
    assert (tmp_path / "m.out").read_text() == (tmp_path / "r.out").read_text()


@needs_oracle
@pytest.mark.parametrize("conflict", ["1", "2", "lca", "lowest"])
def test_mergeoutputs_parity(db_env, tmp_path, conflict):
    k1 = _make_kaiju_output(db_env, seed=84)
    k2 = _make_kaiju_output(db_env, seed=85, extra=["-a", "mem"])
    # same reads in both files (names must align)
    base = ["-i", k1, "-j", k2, "-c", conflict, "-t", db_env["nodes"]]
    _run_tool(
        "kaiju_tpu.tools.kaiju_mergeOutputs", base + ["-o", str(tmp_path / "m.out")]
    )
    _run_oracle_tool(
        "kaiju-mergeOutputs", base + ["-o", str(tmp_path / "r.out")]
    )
    assert (tmp_path / "m.out").read_text() == (tmp_path / "r.out").read_text()


@needs_oracle
def test_mergeoutputs_score_parity(db_env, tmp_path):
    k1 = _make_kaiju_output(db_env, seed=86, extra=["-v"])
    k2 = _make_kaiju_output(db_env, seed=87, extra=["-a", "mem", "-v"])
    base = ["-i", k1, "-j", k2, "-c", "lca", "-s", "-t", db_env["nodes"]]
    _run_tool(
        "kaiju_tpu.tools.kaiju_mergeOutputs", base + ["-o", str(tmp_path / "m.out")]
    )
    _run_oracle_tool(
        "kaiju-mergeOutputs", base + ["-o", str(tmp_path / "r.out")]
    )
    assert (tmp_path / "m.out").read_text() == (tmp_path / "r.out").read_text()


@needs_oracle
def test_kaiju_cli_end_to_end(db_env, tmp_path):
    """Our kaiju CLI on .fmi input == reference kaiju binary output."""
    rng = random.Random(88)
    reads = make_reads(rng, db_env["records"], n=60)
    rp = str(tmp_path / "reads.fastq")
    write_fastq(reads, rp)
    out_path = str(tmp_path / "mine.out")
    res = subprocess.run(
        [sys.executable, "-m", "kaiju_tpu.tools.kaiju",
         "-t", db_env["nodes"], "-f", db_env["fmi"], "-i", rp,
         "-a", "greedy", "-o", out_path],
        capture_output=True, text=True, env=_subproc_env(), timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr
    ref = run_oracle_kaiju(
        ["-t", db_env["nodes"], "-f", db_env["fmi"], "-i", rp, "-z", "1",
         "-a", "greedy"]
    )
    assert open(out_path).read() == ref


@needs_oracle
def test_consistency_triangle(db_env, tmp_path):
    """The reference CI's internal-consistency checks
    (reference: test/viruses/sars-cov-2-SE.sh:9-31), on our own tools:
    1. kaiju-multi combined output == concatenation of per-sample runs;
    2. per-taxon table counts of individual samples sum to the combined
       table's counts;
    3. tables from single-sample kaiju == tables from kaiju-multi."""
    import collections

    rng = random.Random(91)
    samples = []
    for s in range(2):
        reads = make_reads(rng, db_env["records"], n=80)
        rp = os.path.join(str(tmp_path), f"s{s}.fastq")
        write_fastq(reads, rp)
        samples.append(rp)

    outs = []
    for s, rp in enumerate(samples):
        op = os.path.join(str(tmp_path), f"s{s}.out")
        _run_tool("kaiju_tpu.tools.kaiju",
                  ["-t", db_env["nodes"], "-f", db_env["fmi"],
                   "-i", rp, "-a", "greedy", "-o", op])
        outs.append(op)

    multi = _run_tool("kaiju_tpu.tools.kaiju_multi",
                      ["-t", db_env["nodes"], "-f", db_env["fmi"],
                       "-i", ",".join(samples), "-a", "greedy"])
    concat = "".join(open(o).read() for o in outs)
    assert sorted(multi.splitlines()) == sorted(concat.splitlines())

    # named multi outputs == single-sample outputs
    mouts = [os.path.join(str(tmp_path), f"m{s}.out") for s in range(2)]
    _run_tool("kaiju_tpu.tools.kaiju_multi",
              ["-t", db_env["nodes"], "-f", db_env["fmi"],
               "-i", ",".join(samples), "-o", ",".join(mouts),
               "-a", "greedy"])
    for o, m in zip(outs, mouts):
        assert open(o).read() == open(m).read()

    # table counts: per-sample sums == combined
    def counts(files):
        out = _run_tool(
            "kaiju_tpu.tools.kaiju2table",
            ["-t", db_env["nodes"], "-n", db_env["names"],
             "-r", "species", "-o", "/dev/stdout"] + files)
        c = collections.Counter()
        for line in out.splitlines()[1:]:
            f = line.split("\t")
            if len(f) >= 5:
                c[f[3]] += int(f[2])
        return c

    per = counts([outs[0]]) + counts([outs[1]])
    comb = counts(outs)
    assert per == comb


@needs_oracle
def test_verbose_parameter_dump(db_env, tmp_path):
    """-v startup parameter block on stderr is line-identical to the
    reference (reference: src/kaiju.cpp:204-221)."""
    rng = random.Random(92)
    reads = make_reads(rng, db_env["records"], n=4)
    rp = os.path.join(str(tmp_path), "r.fastq")
    write_fastq(reads, rp)

    def block(stderr):
        lines = stderr.splitlines()
        try:
            i = lines.index("Parameters: ")
        except ValueError:
            return None
        out = [lines[i]]
        for ln in lines[i + 1 :]:
            if not ln.startswith("  "):
                break
            out.append(ln)
        return out

    for mode in ("greedy", "mem"):
        args = ["-t", db_env["nodes"], "-f", db_env["fmi"], "-i", rp,
                "-a", mode, "-v", "-o", os.path.join(str(tmp_path), "o.out")]
        res = subprocess.run(
            [sys.executable, "-m", "kaiju_tpu.tools.kaiju"] + args,
            capture_output=True, text=True, env=_subproc_env(), timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert res.returncode == 0, res.stderr
        ref = subprocess.run(
            [os.path.join(ORACLE_BIN, "kaiju")] + args + ["-z", "1"],
            capture_output=True, text=True, timeout=600,
        )
        assert ref.returncode == 0, ref.stderr
        assert block(res.stderr) == block(ref.stderr) != None
