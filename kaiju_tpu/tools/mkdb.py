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
    ap.add_argument("-l", dest="length_mb", type=float, default=0.0,
                    help="length of the concatenated sequence in millions "
                         "(required when reading FASTA from stdin; "
                         "reference: mkbwt_vars.h:263, mkbwt.c:950)")
    ap.add_argument("-s", dest="revsort", action="store_true",
                    help="terminators sort as reversed sequences instead "
                         "of input order (reference: mkbwt.c:803-817)")
    ap.add_argument("-c", dest="case_sens", action="store_true",
                    help="case-sensitive sequence reading")
    ap.add_argument("--from-fmi", dest="from_fmi",
                    help="convert a reference .fmi instead of building from FASTA")
    ap.add_argument("--kmer", dest="kmer", action="store_true",
                    help="also precompute k-mer seed tables")
    ap.add_argument("--aot", dest="aot", action="store_true",
                    help="pre-export the fused classification programs "
                         "(MEM + Greedy default configs) next to the "
                         "index so the FIRST classify process on this "
                         "machine skips the minutes-long trace "
                         "(requires -t; implies --kmer)")
    ap.add_argument("-t", dest="nodes", default=None,
                    help="nodes.dmp (needed by --aot: the exported "
                         "programs bake in the taxonomy array shapes)")
    ap.add_argument("--aot-batch", dest="aot_batch", type=int,
                    default=4096, help="read-batch bucket to pre-export "
                    "(default 4096)")
    ap.add_argument("input", nargs="?", help="protein FASTA (headers: acc_taxid)")
    args = ap.parse_args(argv)

    t0 = time.time()
    if args.from_fmi:
        index = fmi_reader.read_fmi(args.from_fmi)
    else:
        if not args.input:
            ap.error("need an input FASTA (or --from-fmi); use '-' to "
                     "read from stdin")
        if args.input == "-" and args.length_mb <= 0:
            # mirror the reference's stdin contract (mkbwt.c:950): the
            # hint sizes its mmap; our in-memory reader only needs the
            # flag surface, so we enforce presence but not the value
            ap.error("need -l (length in millions) when reading from "
                     "stdin")
        records = read_fasta_records(args.input)
        print(f"read {len(records)} sequences", file=sys.stderr)
        from ..index.alphabet import (
            NAMED_ALPHABETS,
            revcomp_dna,
            trans_table,
        )

        alphabet = NAMED_ALPHABETS.get(args.alphabet, "*" + args.alphabet)
        if args.revcomp:
            # the reference documents -r as "Works only for DNA"
            # (mkbwt_vars.h:266); revcomp_dna complements A<->T, so an
            # RNA alphabet (*ACGUN) would silently wildcard-corrupt
            # every reverse strand — reject it
            if args.alphabet != "DNA":
                ap.error("-r (reverse complement) works only for DNA")
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
    if args.kmer or args.aot:
        from ..ops.kmer import KmerTables

        t0 = time.time()
        KmerTables.load_or_build(index, args.output)
        print(f"k-mer seed tables built in {time.time()-t0:.1f}s", file=sys.stderr)
    if args.aot:
        if not args.nodes:
            ap.error("--aot needs -t nodes.dmp (the exported programs "
                     "bake in the taxonomy array shapes)")
        t0 = time.time()
        prebuild_aot(index, args.output, args.nodes, args.aot_batch)
        print(f"AOT artifacts exported in {time.time()-t0:.1f}s",
              file=sys.stderr)
    print(f"saved to {args.output}", file=sys.stderr)
    return 0


def prebuild_aot(index, ktx_dir, nodes_path, batch=4096):
    """Export the fused MEM + Greedy programs (default configs) for the
    standard read-batch bucket by classifying one synthetic batch —
    the trace+lowering bill (minutes per process, NOT covered by the
    XLA compile cache) is paid once at build time instead of by the
    first classification run on each machine (utils/aot.py; artifacts
    are machine-keyed).  Learned funnel capacities persist too, so the
    first real run replays both without a single trace."""
    import random

    from ..engine.config import KaijuConfig
    from ..engine.greedy_device import GreedyDevicePipeline
    from ..engine.mem_fast import MemFastPipeline
    from ..io.taxonomy import Taxonomy, parse_nodes_dmp

    tax = Taxonomy(parse_nodes_dmp(nodes_path))
    rng = random.Random(7)
    reads = [
        (
            f"aot{i}",
            "".join(rng.choice("ACGT") for _ in range(200)),
            None,
        )
        for i in range(batch)
    ]
    for mode, cls, kw in (
        ("mem", MemFastPipeline, dict(seg=True, use_Evalue=False)),
        ("greedy", GreedyDevicePipeline, {}),
    ):
        cfg = KaijuConfig(mode=mode, **kw)
        pipe = cls(index, tax, cfg, kmer_cache_dir=ktx_dir)
        pipe.classify_batch(reads)
        print(f"  {mode}: exported", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
