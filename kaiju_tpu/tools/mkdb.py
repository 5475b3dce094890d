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
                    help="letter alphabet (terminator is implicit), or "
                         "DNA / RNA / protein (reference: mkbwt.c:882-903)")
    ap.add_argument("-r", dest="revcomp", action="store_true",
                    help="append the reverse complement of every sequence "
                         "(DNA only; reference: readFasta.c:187-205)")
    ap.add_argument("-s", dest="revsort", action="store_true",
                    help="terminators sort as reversed sequences instead "
                         "of input order (reference: mkbwt.c:803-817)")
    ap.add_argument("-c", dest="case_sens", action="store_true",
                    help="case-sensitive sequence reading")
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
        from ..index.alphabet import (
            NAMED_ALPHABETS,
            revcomp_dna,
            trans_table,
        )

        alphabet = NAMED_ALPHABETS.get(args.alphabet, "*" + args.alphabet)
        if args.revcomp:
            if args.alphabet not in ("DNA", "RNA"):
                ap.error("-r (reverse complement) works only for DNA/RNA")
            records = records + [
                (name, revcomp_dna(seq)) for name, seq in records
            ]
        import numpy as np

        table = trans_table(alphabet, case_sens=args.case_sens)
        names_in = [name for name, _ in records]
        seqs = []
        for _, seq in records:
            raw = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
            codes = table[raw]
            seqs.append(codes[codes > 0].astype(np.uint8))
        if args.revsort:
            # terminator order = ascending order of REVERSED sequences
            # (reference: mkbwt.c compare_strings_reverse / revSortSeqs);
            # feeding records in that order makes the builders' natural
            # input-order terminator tie-break produce the revsort BWT
            order = sorted(
                range(len(seqs)), key=lambda i: bytes(seqs[i][::-1])
            )
            names_in = [names_in[i] for i in order]
            seqs = [seqs[i] for i in order]
        index = native_builder.build_index_from_codes(
            names_in, seqs, chpt_exp=args.chpt_exp, alphabet=alphabet
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
