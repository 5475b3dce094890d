"""kaiju-tpu-mkdb: build a ktx index from a taxon-labeled protein FASTA.

Equivalent of kaiju-mkbwt + kaiju-mkfmi (reference: src/bwt/mkbwt.c,
mkfmi.c) in one step: linear-time native suffix sorting, TPU-friendly
plain-array output.  Can also convert an existing reference .fmi.
"""

from __future__ import annotations

import argparse
import sys
import time

from ..index import fmi_reader, native_builder
from ..index.alphabet import MAKEDB_ALPHABET
from ..index.py_builder import read_fasta_records


def main(argv=None):
    ap = argparse.ArgumentParser(prog="kaiju-tpu-mkdb", description=__doc__)
    ap.add_argument("-o", dest="output", required=True, help="output ktx directory")
    ap.add_argument("-e", dest="chpt_exp", type=int, default=3,
                    help="SA sample spacing exponent (default 3)")
    ap.add_argument("-a", dest="alphabet", default="ACDEFGHIKLMNPQRSTVWY",
                    help="letter alphabet (terminator is implicit)")
    ap.add_argument("--from-fmi", dest="from_fmi",
                    help="convert a reference .fmi instead of building from FASTA")
    ap.add_argument("--kmer", dest="kmer", action="store_true",
                    help="also precompute k-mer seed tables")
    ap.add_argument("input", nargs="?", help="protein FASTA (headers: acc_taxid)")
    args = ap.parse_args(argv)

    t0 = time.time()
    if args.from_fmi:
        index = fmi_reader.read_fmi(args.from_fmi)
    else:
        if not args.input:
            ap.error("need an input FASTA (or --from-fmi)")
        records = read_fasta_records(args.input)
        print(f"read {len(records)} sequences", file=sys.stderr)
        alphabet = "*" + args.alphabet
        index = native_builder.build_index(
            records, chpt_exp=args.chpt_exp, alphabet=alphabet
        )
    print(
        f"index built in {time.time()-t0:.1f}s: length={index.length} "
        f"nseq={index.nseq}",
        file=sys.stderr,
    )
    index.save(args.output)
    if args.kmer:
        from ..ops.kmer import KmerTables

        t0 = time.time()
        KmerTables.load_or_build(index, args.output)
        print(f"k-mer seed tables built in {time.time()-t0:.1f}s", file=sys.stderr)
    print(f"saved to {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
