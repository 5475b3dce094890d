"""kaiju-multi-tpu: classify multiple samples with one index load
(reference: src/kaiju-multi.cpp: comma-separated -i/-j/-o lists, the
taxonomy and index are loaded once, samples processed sequentially;
without -o, all outputs go interleaved to stdout per sample order)."""

from __future__ import annotations

import argparse
import sys

from ..io.fastx import read_reads
from ..io.taxonomy import Taxonomy, parse_nodes_dmp
from .common import (
    add_engine_args,
    classify_stream,
    config_from_args,
    load_index,
    make_runner,
)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="kaiju-multi-tpu", description=__doc__)
    ap.add_argument("-t", dest="nodes", required=True)
    add_engine_args(ap)
    args = ap.parse_args(argv)

    in1 = args.input1.split(",")
    in2 = args.input2.split(",") if args.input2 else [None] * len(in1)
    outs = args.output.split(",") if args.output else [None] * len(in1)
    if len(in2) != len(in1):
        print("Error: -i and -j lists have different lengths", file=sys.stderr)
        return 1
    if args.output and len(outs) != len(in1):
        print("Error: -i and -o lists have different lengths", file=sys.stderr)
        return 1

    cfg = config_from_args(args)
    if cfg.verbose:
        from .common import print_verbose_parameters

        print_verbose_parameters(cfg, args, multi=True)
    index = load_index(args.fmi)
    tax = Taxonomy(parse_nodes_dmp(args.nodes))
    runner = make_runner(index, tax, cfg, args=args)

    for f1, f2, fo in zip(in1, in2, outs):
        out = open(fo, "w") if fo else sys.stdout
        classify_stream(runner, read_reads(f1, f2), out, cfg, args.batch_size)
        if fo:
            out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
