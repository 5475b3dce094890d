"""Benchmark: MEM + Greedy classification throughput vs 5-thread reference.

Builds (and caches) a deterministic synthetic protein database and read
set, classifies on the default JAX device (the TPU under the driver), and
compares end-to-end reads/s against the reference kaiju binary with
`-z 5` on the same database and reads, in both MEM (`-a mem`) and Greedy
(default, e=3 s=65 E=0.01) modes (BASELINE.md target: >= 10x per host).

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
N_READS = int(os.environ.get("KAIJU_BENCH_READS", 20_000))
BATCH = int(os.environ.get("KAIJU_BENCH_BATCH", 4096))
CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    ".bench_cache",
    f"db{DB_LETTERS // 1_000_000}M",
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_db():
    from kaiju_tpu.index import native_builder
    from kaiju_tpu.index.core import KaijuIndex

    ktx = os.path.join(CACHE, "db.ktx")
    fasta = os.path.join(CACHE, "db.faa")
    nodes = os.path.join(CACHE, "nodes.dmp")
    if os.path.exists(os.path.join(ktx, "meta.json")) and os.path.exists(fasta):
        return KaijuIndex.load(ktx), fasta, nodes

    os.makedirs(CACHE, exist_ok=True)
    rng = random.Random(20240817)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    log(f"bench: generating synthetic DB ({DB_LETTERS/1e6:.0f}M aa)...")
    blob = bytes(rng.choices([ord(c) for c in aas], k=DB_LETTERS))
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
    with open(fasta, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n{seq}\n")
    with open(nodes, "w") as fh:
        fh.write("1\t|\t1\t|\tno rank\t|\n")
        fh.write("10\t|\t1\t|\tsuperkingdom\t|\n")
        for t in range(100, 197):
            fh.write(f"{t}\t|\t10\t|\tspecies\t|\n")
    log("bench: building index (native SA-IS)...")
    t0 = time.time()
    index = native_builder.build_index(records)
    log(f"bench: index built in {time.time()-t0:.1f}s")
    index.save(ktx)
    return index, fasta, nodes


def make_reads(fasta):
    path = os.path.join(CACHE, "reads.fastq")
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


def run_mine(index, nodes, reads, mode="mem"):
    from kaiju_tpu.engine.config import KaijuConfig
    from kaiju_tpu.engine.core import format_output_line
    from kaiju_tpu.engine.greedy_fast import GreedyFastPipeline
    from kaiju_tpu.engine.mem_fast import MemFastPipeline
    from kaiju_tpu.io.taxonomy import Taxonomy, parse_nodes_dmp

    import jax

    log(f"bench: jax devices = {jax.devices()}")
    tax = Taxonomy(parse_nodes_dmp(nodes))
    fasta = os.path.join(CACHE, "db.faa")
    if mode == "mem":
        cfg = KaijuConfig(mode="mem", seg=True, use_Evalue=False)
        pipe = MemFastPipeline(
            index, tax, cfg, kmer_cache_dir=os.path.join(CACHE, "db.ktx"),
            source_fasta=fasta,
        )
    else:
        from kaiju_tpu.engine.greedy_device import GreedyDevicePipeline

        cfg = KaijuConfig(mode="greedy")  # reference defaults: e=3 s=65 E=0.01
        pipe = GreedyDevicePipeline(
            index, tax, cfg, kmer_cache_dir=os.path.join(CACHE, "db.ktx"),
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
    return len(items) / dt, out_lines


def run_reference(fasta, nodes, reads_path, mode="mem"):
    """Reference kaiju -z 5 (-a mem / default greedy) on the same
    DB+reads; cached."""
    cache = os.path.join(CACHE, f"baseline_{mode}.json")
    legacy = os.path.join(CACHE, "baseline.json")
    if mode == "mem" and not os.path.exists(cache) and os.path.exists(legacy):
        cache = legacy
    if os.path.exists(cache):
        with open(cache) as fh:
            return json.load(fh)["reads_per_sec"]
    if not os.path.exists(os.path.join(ORACLE_BIN, "kaiju")):
        return None
    prefix = os.path.join(CACHE, "refdb")
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
    out = os.path.join(CACHE, f"ref_{mode}.out")
    cmd = [os.path.join(ORACLE_BIN, "kaiju"), "-t", nodes, "-f", fmi,
           "-i", reads_path, "-z", "5", "-o", out]
    if mode == "mem":
        cmd += ["-a", "mem"]
    t0 = time.time()
    subprocess.run(cmd, check=True, capture_output=True)
    dt = time.time() - t0
    rps = n_reads / dt
    log(f"bench: reference kaiju ({mode}) -z 5: {n_reads} reads in {dt:.2f}s")
    with open(cache, "w") as fh:
        json.dump({"reads_per_sec": rps, "seconds": dt}, fh)
    return rps


def main():
    index, fasta, nodes = build_db()
    reads, reads_path = make_reads(fasta)
    result = {"metric": "mem_reads_per_sec", "unit": "reads/s"}
    for mode in ("mem", "greedy"):
        ref_rps = run_reference(fasta, nodes, reads_path, mode)
        mine_rps, _ = run_mine(index, nodes, reads, mode)
        vs = (mine_rps / ref_rps) if ref_rps else 0.0
        if mode == "mem":
            result["value"] = round(mine_rps, 1)
            result["vs_baseline"] = round(vs, 3)
        else:
            result["greedy_reads_per_sec"] = round(mine_rps, 1)
            result["greedy_vs_baseline"] = round(vs, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
