"""kaijux-tpu: taxonomy-free DNA read search (reference: src/kaijux.cpp)."""

from __future__ import annotations

import argparse
import sys

from ..io.fastx import read_reads
from .common import (
    add_engine_args,
    classify_stream,
    config_from_args,
    load_index,
    make_runner,
    open_output,
)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="kaijux-tpu", description=__doc__)
    add_engine_args(ap)
    args = ap.parse_args(argv)
    cfg = config_from_args(args, taxonomy_free=True)
    index = load_index(args.fmi)
    runner = make_runner(index, None, cfg)
    out = open_output(args.output)
    # kaijux searches paired files as independent reads
    # (reference: README.md:335-343)
    def reads():
        for name, s1, s2 in read_reads(args.input1, args.input2):
            yield name, s1, None
            if s2 is not None:
                yield name, s2, None

    classify_stream(runner, reads(), out, cfg, args.batch_size)
    if out is not sys.stdout:
        out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
