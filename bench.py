"""Benchmark: MEM + Greedy classification throughput vs 5-thread reference.

Builds (and caches) a deterministic synthetic protein database and read
set, classifies on the default JAX device (the TPU under the driver), and
compares end-to-end reads/s against the reference kaiju binary with
`-z 5` on the same database and reads, in both MEM (`-a mem`) and Greedy
(default, e=3 s=65 E=0.01) modes (BASELINE.md target: >= 10x per host).

MEASUREMENT-HONESTY NOTE (round 5): earlier rounds timed the reference
end-to-end on 20k reads, which billed its process startup + index load
to the reads and under-utilized its 5 threads — flattering our ratios.
This version measures BOTH sides at steady state: 65,536 reads, and the
reference's startup (measured with a 1-read input) subtracted, just as
our numbers exclude warmup/compile.  The corrected baselines are up to
2.3x higher than the round-4 ones (Greedy uniform 7.6k -> 17.6k r/s),
so vs_baseline ratios here are NOT comparable to earlier rounds' even
where our absolute reads/s improved.

Prints ONE JSON line; the headline metric is MEM reads/s, with the
Greedy numbers as extra keys:
  {"metric": "mem_reads_per_sec", "value": N, "unit": "reads/s",
   "vs_baseline": ratio, "greedy_reads_per_sec": N,
   "greedy_vs_baseline": ratio}
"""

import json
import os
import random
import subprocess
import sys
import time

import numpy as np

ORACLE_BIN = os.environ.get("KAIJU_ORACLE_BIN", "/tmp/kaiju-oracle/bin")
DB_LETTERS = int(os.environ.get("KAIJU_BENCH_DB_LETTERS", 64_000_000))
# enough reads that the pipelined stream reaches steady state (a 5-batch
# run spends ~2 batches filling/draining the lookahead); the reference
# binary is timed on the SAME read set
N_READS = int(os.environ.get("KAIJU_BENCH_READS", 65_536))
BATCH = int(os.environ.get("KAIJU_BENCH_BATCH", 4096))
CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    ".bench_cache",
    f"db{DB_LETTERS // 1_000_000}M",
)
# second, non-flattering DB: duplicated gene families, 90%-identity
# mutated copies, low-complexity stretches (round-2/3 review item —
# tie widths, SA-walk depths and bloom screen-out rates on random text
# are upper bounds; this DB shows the funnel surviving realistic
# repetition)
CACHE_REAL = CACHE + "real"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _write_db(cache, records):
    fasta = os.path.join(cache, "db.faa")
    nodes = os.path.join(cache, "nodes.dmp")
    with open(fasta, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n{seq}\n")
    with open(nodes, "w") as fh:
        fh.write("1\t|\t1\t|\tno rank\t|\n")
        fh.write("10\t|\t1\t|\tsuperkingdom\t|\n")
        for t in range(100, 197):
            fh.write(f"{t}\t|\t10\t|\tspecies\t|\n")
    return fasta, nodes


def _gen_uniform(rng, letters):
    aas = "ACDEFGHIKLMNPQRSTVWY"
    blob = bytes(rng.choices([ord(c) for c in aas], k=letters))
    records = []
    pos = 0
    i = 0
    while pos < len(blob) - 500:
        ln = rng.randint(150, 450)
        records.append(
            (f"ACC{i:07d}.1_{100 + i % 97}", blob[pos : pos + ln].decode())
        )
        pos += ln
        i += 1
    return records


def _gen_realistic(rng, letters):
    """Gene families: base genes copied exactly (under other taxa),
    copied at ~90% identity, and salted with low-complexity runs."""
    aas = "ACDEFGHIKLMNPQRSTVWY"
    records = []
    total = 0
    i = 0
    while total < letters:
        base = "".join(rng.choices(aas, k=rng.randint(150, 450)))
        fam = rng.randint(1, 6)  # copies of this family
        for c in range(fam):
            seq = base
            if c > 0 and rng.random() < 0.7:
                # ~90%-identity mutant
                s = list(seq)
                for _ in range(max(1, len(s) // 10)):
                    s[rng.randrange(len(s))] = rng.choice(aas)
                seq = "".join(s)
            if rng.random() < 0.10:
                # low-complexity insertion (homopolymer / dipeptide run)
                run = (rng.choice(aas) * rng.randint(8, 30)
                       if rng.random() < 0.5
                       else (rng.choice(aas) + rng.choice(aas))
                       * rng.randint(6, 15))
                p = rng.randrange(len(seq))
                seq = seq[:p] + run + seq[p:]
            records.append((f"ACC{i:07d}.1_{100 + i % 97}", seq))
            total += len(seq)
            i += 1
    return records


def build_db(realistic=False):
    from kaiju_tpu.index import native_builder
    from kaiju_tpu.index.core import KaijuIndex

    cache = CACHE_REAL if realistic else CACHE
    ktx = os.path.join(cache, "db.ktx")
    fasta = os.path.join(cache, "db.faa")
    nodes = os.path.join(cache, "nodes.dmp")
    if os.path.exists(os.path.join(ktx, "meta.json")) and os.path.exists(fasta):
        return KaijuIndex.load(ktx), fasta, nodes

    os.makedirs(cache, exist_ok=True)
    rng = random.Random(20240817)
    kind = "realistic" if realistic else "uniform"
    log(f"bench: generating synthetic DB ({kind}, "
        f"{DB_LETTERS/1e6:.0f}M aa)...")
    records = (_gen_realistic if realistic else _gen_uniform)(
        rng, DB_LETTERS
    )
    fasta, nodes = _write_db(cache, records)
    log("bench: building index (native)...")
    t0 = time.time()
    index = native_builder.build_index(records)
    log(f"bench: index built in {time.time()-t0:.1f}s")
    index.save(ktx)
    return index, fasta, nodes


def make_reads(fasta, cache=None):
    path = os.path.join(cache or CACHE, f"reads_{N_READS}.fastq")
    if os.path.exists(path):
        reads = []
        with open(path) as fh:
            while True:
                h = fh.readline()
                if not h:
                    break
                seq = fh.readline().strip()
                fh.readline()
                fh.readline()
                reads.append((h.strip()[1:], seq))
        return reads, path

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from readgen import make_reads as gen

    from kaiju_tpu.index.py_builder import read_fasta_records

    records = read_fasta_records(fasta)
    rng = random.Random(99)
    reads = gen(rng, records, n=N_READS)
    with open(path, "w") as fh:
        for name, seq in reads:
            fh.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    return reads, path


def run_mine(index, nodes, reads, mode="mem", cache=None):
    from kaiju_tpu.engine.config import KaijuConfig
    from kaiju_tpu.engine.core import format_output_line
    from kaiju_tpu.engine.greedy_fast import GreedyFastPipeline
    from kaiju_tpu.engine.mem_fast import MemFastPipeline
    from kaiju_tpu.io.taxonomy import Taxonomy, parse_nodes_dmp

    import jax

    log(f"bench: jax devices = {jax.devices()}")
    cache = cache or CACHE
    tax = Taxonomy(parse_nodes_dmp(nodes))
    fasta = os.path.join(cache, "db.faa")
    if mode == "mem":
        cfg = KaijuConfig(mode="mem", seg=True, use_Evalue=False)
        pipe = MemFastPipeline(
            index, tax, cfg, kmer_cache_dir=os.path.join(cache, "db.ktx"),
            source_fasta=fasta,
        )
    else:
        from kaiju_tpu.engine.greedy_device import GreedyDevicePipeline

        cfg = KaijuConfig(mode="greedy")  # reference defaults: e=3 s=65 E=0.01
        pipe = GreedyDevicePipeline(
            index, tax, cfg, kmer_cache_dir=os.path.join(cache, "db.ktx"),
            source_fasta=fasta,
        )
    items = [(n, s, None) for n, s in reads]
    # warmup on a full-size batch (compiles the production shape buckets;
    # executables persist in the on-disk compile cache across runs)
    t0 = time.time()
    pipe.classify_batch(items[:BATCH])
    log(f"bench: {mode} warmup ({BATCH} reads incl. compile) "
        f"{time.time()-t0:.1f}s")

    t0 = time.time()
    out_lines = []
    batches = (items[i : i + BATCH] for i in range(0, len(items), BATCH))
    for results in pipe.classify_stream(batches):
        for name, res in results:
            out_lines.append(format_output_line(name, res, cfg.verbose))
    dt = time.time() - t0
    log(f"bench: mine ({mode}) classified {len(items)} reads in {dt:.2f}s")
    flagged_frac = None
    if hasattr(pipe, "stats") and pipe.stats.get("reads"):
        flagged_frac = pipe.stats["flagged"] / pipe.stats["reads"]
        log(f"bench: {mode} host-replay fraction "
            f"{flagged_frac*100:.2f}% ({pipe.stats['flagged']} / "
            f"{pipe.stats['reads']})")
    return len(items) / dt, out_lines, flagged_frac


def run_reference(fasta, nodes, reads_path, mode="mem", cache_dir=None):
    """Reference kaiju -z 5 (-a mem / default greedy) on the same
    DB+reads; cached."""
    cache_dir = cache_dir or CACHE
    cache = os.path.join(cache_dir, f"baseline_{mode}_{N_READS}.json")
    if os.path.exists(cache):
        with open(cache) as fh:
            return json.load(fh)["reads_per_sec"]
    if not os.path.exists(os.path.join(ORACLE_BIN, "kaiju")):
        return None
    prefix = os.path.join(cache_dir, "refdb")
    fmi = prefix + ".fmi"
    if not os.path.exists(fmi):
        log("bench: building reference .fmi (kaiju-mkbwt/mkfmi)...")
        subprocess.run(
            [os.path.join(ORACLE_BIN, "kaiju-mkbwt"), "-n", "2", "-e", "3",
             "-a", "ACDEFGHIKLMNPQRSTVWY", "-o", prefix, fasta],
            check=True, capture_output=True,
        )
        subprocess.run(
            [os.path.join(ORACLE_BIN, "kaiju-mkfmi"), prefix],
            check=True, capture_output=True,
        )
    n_reads = sum(1 for _ in open(reads_path)) // 4
    out = os.path.join(cache_dir, f"ref_{mode}.out")

    def run_ref(inp):
        cmd = [os.path.join(ORACLE_BIN, "kaiju"), "-t", nodes, "-f", fmi,
               "-i", inp, "-z", "5", "-o", out]
        if mode == "mem":
            cmd += ["-a", "mem"]
        t0 = time.time()
        subprocess.run(cmd, check=True, capture_output=True)
        return time.time() - t0

    # steady-state rate: subtract the index-load startup (measured with
    # a 1-read input) — OUR numbers exclude warmup/index upload, so the
    # reference's ~1-2 s .fmi load must not be billed to its reads
    # either (at production read counts both vanish)
    one = os.path.join(cache_dir, "ref_one.fastq")
    if not os.path.exists(one):
        with open(reads_path) as src, open(one, "w") as dst:
            for _ in range(4):
                dst.write(src.readline())
    t_startup = min(run_ref(one), run_ref(one))
    dt = run_ref(reads_path)
    rps = n_reads / max(dt - t_startup, 1e-6)
    log(f"bench: reference kaiju ({mode}) -z 5: {n_reads} reads in "
        f"{dt:.2f}s (startup {t_startup:.2f}s excluded)")
    with open(cache, "w") as fh:
        json.dump({"reads_per_sec": rps, "seconds": dt,
                   "startup_seconds": t_startup}, fh)
    return rps


def main():
    result = {"metric": "mem_reads_per_sec", "unit": "reads/s"}
    skip_real = os.environ.get("KAIJU_BENCH_SKIP_REALISTIC")
    for realistic in (False, True):
        if realistic and skip_real:
            break
        cache = CACHE_REAL if realistic else CACHE
        index, fasta, nodes = build_db(realistic)
        reads, reads_path = make_reads(fasta, cache=cache)
        sfx = "_realistic" if realistic else ""
        for mode in ("mem", "greedy"):
            ref_rps = run_reference(fasta, nodes, reads_path, mode,
                                    cache_dir=cache)
            mine_rps, _, flagged = run_mine(index, nodes, reads, mode,
                                            cache=cache)
            vs = (mine_rps / ref_rps) if ref_rps else 0.0
            if mode == "mem" and not realistic:
                result["value"] = round(mine_rps, 1)
                result["vs_baseline"] = round(vs, 3)
            else:
                result[f"{mode}_reads_per_sec{sfx}"] = round(mine_rps, 1)
                result[f"{mode}_vs_baseline{sfx}"] = round(vs, 3)
            if flagged is not None:
                result[f"{mode}_replay_frac{sfx}"] = round(flagged, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
