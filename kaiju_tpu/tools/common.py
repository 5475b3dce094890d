"""Shared CLI plumbing: index loading, engine selection, output streams."""

from __future__ import annotations

import os
import sys

from ..engine.config import KaijuConfig
from ..index.core import KaijuIndex


def load_index(path: str) -> KaijuIndex:
    """Load either a reference-format .fmi file or a ktx directory."""
    if os.path.isdir(path):
        return KaijuIndex.load(path)
    from ..index import fmi_reader

    return fmi_reader.read_fmi(path)


def open_output(path: str | None):
    if path:
        return open(path, "w")
    return sys.stdout


def make_runner(index, taxonomy, cfg: KaijuConfig, args=None):
    """Best engine for the configuration: the vectorized MEM pipeline when
    applicable, the coroutine batch runner otherwise.  --mesh-index /
    --dist-* (or KAIJU_TPU_NPROCS & co.) select the sharded mesh
    classifiers, joining a multi-process jax.distributed runtime when a
    coordinator is given — each process then classifies and OUTPUTS the
    reads whose data-axis rows live on its devices, and the per-process
    outputs concatenate to the single-process byte stream
    (tests/test_multihost.py)."""
    kmer_dir = os.environ.get("KAIJU_TPU_CACHE")
    if kmer_dir is None and getattr(index, "source_dir", None):
        # cache the k-mer seed tables beside the index itself
        kmer_dir = index.source_dir
    n_index = int(getattr(args, "mesh_index", 0) or 0) if args else 0
    nprocs = int(
        (getattr(args, "dist_nprocs", 0) if args else 0)
        or os.environ.get("KAIJU_TPU_NPROCS", 0) or 0
    )
    if n_index or nprocs > 1:
        from ..parallel import multihost
        from ..parallel.sharded_fused import (
            ShardedGreedyClassifier,
            ShardedMemClassifier,
        )

        if nprocs > 1:
            coord = (
                (getattr(args, "dist_coordinator", None) if args else None)
                or os.environ.get("KAIJU_TPU_COORDINATOR")
            )
            pid = int(
                (getattr(args, "dist_pid", None) if args else None)
                or os.environ.get("KAIJU_TPU_PID", 0) or 0
            )
            if not coord:
                raise SystemExit(
                    "multi-process run needs --dist-coordinator "
                    "(or KAIJU_TPU_COORDINATOR)"
                )
            multihost.init_distributed(coord, nprocs, pid)
        n_index = n_index or 1
        mesh = multihost.make_global_mesh(n_index)
        if cfg.mode == "mem" and not cfg.taxonomy_free and not cfg.verbose:
            return ShardedMemClassifier(
                index, taxonomy, cfg, mesh, n_index, cache_dir=kmer_dir
            )
        if (cfg.mode == "greedy" and not cfg.taxonomy_free
                and not cfg.verbose):
            return ShardedGreedyClassifier(
                index, taxonomy, cfg, mesh, n_index, cache_dir=kmer_dir
            )
        raise SystemExit(
            "--mesh-index / --dist-* support mem and greedy modes "
            "without -v"
        )
    if getattr(cfg, "debug", False):
        # -d: sequential exact engine so per-fragment stderr traces
        # interleave exactly like the reference's single-threaded run
        # (ConsumerThread.cpp:437-470)
        from ..engine.core import ExactClassifier

        return ExactClassifier(index, taxonomy, cfg)
    if cfg.mode == "mem" and not cfg.taxonomy_free:
        from ..engine.mem_fast import MemFastPipeline

        return MemFastPipeline(index, taxonomy, cfg, kmer_cache_dir=kmer_dir)
    if cfg.mode == "greedy" and not cfg.taxonomy_free:
        if taxonomy is not None and not cfg.verbose:
            # fully-fused device path; verbose output needs names and
            # stays on the host-replay pipeline
            from ..engine.greedy_device import GreedyDevicePipeline

            return GreedyDevicePipeline(
                index, taxonomy, cfg, kmer_cache_dir=kmer_dir
            )
        from ..engine.greedy_fast import GreedyFastPipeline

        return GreedyFastPipeline(index, taxonomy, cfg, kmer_cache_dir=kmer_dir)
    from ..engine.batch import BatchRunner

    return BatchRunner(index, taxonomy, cfg)


def print_verbose_parameters(cfg: KaijuConfig, args, multi=False) -> None:
    """-v startup parameter dump, line-identical to the reference
    (reference: src/kaiju.cpp:204-221, kaiju-multi.cpp:205-219)."""
    err = sys.stderr
    err.write("Parameters: \n")
    err.write(
        f"  run mode: {'MEM' if cfg.mode == 'mem' else 'Greedy'}\n"
    )
    err.write(f"  minimum match length: {cfg.min_fragment_length}\n")
    if cfg.mode == "greedy":
        err.write(f"  seed length: {cfg.seed_length}\n")
        err.write(
            f"  minimum blosum62 score for matches: {cfg.min_score}\n"
        )
        err.write(f"  minimum E-value: {cfg.min_Evalue:g}\n")
        err.write(
            f"  max number of mismatches within a match: {cfg.mismatches}\n"
        )
    s = "s" if multi else ""
    err.write(f"  input file{s} 1: {args.input1}\n")
    if getattr(args, "input2", None):
        err.write(f"  input file{s} 2: {args.input2}\n")
    if multi:
        err.write(f"  output files: {getattr(args, 'output', '') or ''}\n")
    elif getattr(args, "output", None):
        err.write(f"  output file: {args.output}\n")
    else:
        err.write("  output to STDOUT\n")
    err.flush()


def classify_stream(runner, reads_iter, out, cfg: KaijuConfig, batch_size=4096):
    """Stream reads in batches through the runner, writing TSV lines."""
    from ..engine.core import format_output_line, format_output_line_x
    from ..io.fastx import prefetch_batches

    def emit(results):
        for item in results:
            if item is None:  # multi-process: read owned by a peer
                continue
            name, res = item
            if cfg.taxonomy_free:
                out.write(format_output_line_x(name, res))
            else:
                out.write(format_output_line(name, res, cfg.verbose))
        out.flush()

    batches = prefetch_batches(reads_iter, batch_size)
    if hasattr(runner, "classify_stream"):
        # pipelined: one batch of device lookahead
        for results in runner.classify_stream(batches):
            emit(results)
    else:
        for batch in batches:
            emit(runner.classify_batch(batch))


def add_engine_args(ap, protein_tool=False):
    ap.add_argument("-f", dest="fmi", required=True, help="database (.fmi or .ktx) file")
    ap.add_argument("-i", dest="input1", required=True, help="input reads (FASTA/FASTQ)")
    if not protein_tool:
        ap.add_argument("-j", dest="input2", help="second file for paired-end reads")
    ap.add_argument("-o", dest="output", help="output file (default: stdout)")
    ap.add_argument("-z", dest="threads", type=int, default=1, help="worker threads (compat; batching is automatic)")
    ap.add_argument("-a", dest="mode", choices=["mem", "greedy"], default="greedy")
    ap.add_argument("-e", dest="mismatches", type=int, default=3)
    ap.add_argument("-m", dest="min_fragment_length", type=int, default=11)
    ap.add_argument("-s", dest="min_score", type=int, default=65)
    ap.add_argument("-E", dest="min_evalue", type=float, default=0.01)
    ap.add_argument("-l", dest="seed_length", type=int, default=7)
    ap.add_argument("-x", dest="seg", action="store_true", default=True,
                    help="enable SEG low complexity filter (default)")
    ap.add_argument("-X", dest="seg", action="store_false",
                    help="disable SEG low complexity filter")
    ap.add_argument("-v", dest="verbose", action="store_true")
    ap.add_argument("-d", dest="debug", action="store_true",
                    help="per-read debug tracing on stderr (runs the "
                         "exact host engine)")
    ap.add_argument("-b", dest="batch_size", type=int, default=4096,
                    help="reads per device batch")
    ap.add_argument("--mesh-index", dest="mesh_index", type=int, default=0,
                    help="shard the index over N devices of a "
                         "(data x index) mesh (databases larger than "
                         "one chip's HBM; 0 = single-chip pipelines)")
    ap.add_argument("--dist-coordinator", dest="dist_coordinator",
                    help="host:port of process 0 for a multi-process "
                         "(multi-host) run (or KAIJU_TPU_COORDINATOR)")
    ap.add_argument("--dist-nprocs", dest="dist_nprocs", type=int,
                    default=0, help="total processes in the "
                    "jax.distributed runtime (or KAIJU_TPU_NPROCS)")
    ap.add_argument("--dist-pid", dest="dist_pid", type=int, default=None,
                    help="this process's id (or KAIJU_TPU_PID)")


def config_from_args(args, taxonomy_free=False, protein=False) -> KaijuConfig:
    cfg = KaijuConfig(
        mode=args.mode,
        seg=args.seg,
        verbose=args.verbose,
        debug=getattr(args, "debug", False),
        min_fragment_length=args.min_fragment_length,
        mismatches=args.mismatches,
        min_score=args.min_score,
        seed_length=args.seed_length,
        min_Evalue=args.min_evalue,
        use_Evalue=(args.mode == "greedy"),
        taxonomy_free=taxonomy_free,
        input_is_protein=protein or getattr(args, "protein", False),
    )
    cfg.validate()
    return cfg
