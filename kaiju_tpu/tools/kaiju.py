"""kaiju-tpu: taxonomic read classification CLI.

TPU-native equivalent of the reference `kaiju` binary
(reference: src/kaiju.cpp:427-451 for the flag surface).

    python -m kaiju_tpu.tools.kaiju -t nodes.dmp -f db.fmi -i reads.fastq
"""

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
    open_output,
)


def build_parser():
    ap = argparse.ArgumentParser(prog="kaiju-tpu", description=__doc__)
    ap.add_argument("-t", dest="nodes", required=True, help="nodes.dmp file")
    ap.add_argument("-p", dest="protein", action="store_true",
                    help="input sequences are protein sequences")
    add_engine_args(ap)
    return ap


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.protein and args.input2:
        print("Error: Protein input only supports one input file.", file=sys.stderr)
        return 1
    cfg = config_from_args(args)
    if cfg.verbose:
        from .common import print_verbose_parameters

        print_verbose_parameters(cfg, args)
    index = load_index(args.fmi)
    tax = Taxonomy(parse_nodes_dmp(args.nodes))
    runner = make_runner(index, tax, cfg, args=args)
    out = open_output(args.output)
    reads = read_reads(args.input1, args.input2)
    classify_stream(runner, reads, out, cfg, args.batch_size)
    if out is not sys.stdout:
        out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
