"""Index builder backed by the native SA-IS library (kaiju_tpu.native).

Produces output identical to py_builder (the executable spec) and to the
reference kaiju-mkbwt/mkfmi toolchain, at scale: linear-time suffix sorting
in C++ instead of Python comparison sorting.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..native import get_lib
from .alphabet import MAKEDB_ALPHABET
from .core import KaijuIndex, finalize_index
from .py_builder import DEFAULT_CHPT_EXP, translate_db_sequence


def build_index(
    records: list[tuple[str, str]],
    chpt_exp: int = DEFAULT_CHPT_EXP,
    alphabet: str = MAKEDB_ALPHABET,
) -> KaijuIndex:
    names_in = [name for name, _ in records]
    seqs = [translate_db_sequence(seq, alphabet) for _, seq in records]
    return build_index_from_codes(names_in, seqs, chpt_exp, alphabet)


def build_index_from_codes(
    names_in: list[str],
    seqs: list[np.ndarray],
    chpt_exp: int = DEFAULT_CHPT_EXP,
    alphabet: str = MAKEDB_ALPHABET,
) -> KaijuIndex:
    nseq = len(seqs)
    for i, s in enumerate(seqs):
        if len(s) == 0:
            raise ValueError(f"empty sequence: {names_in[i]}")
    seq_len = np.array([len(s) for s in seqs], dtype=np.int64)
    codes = np.concatenate(seqs).astype(np.uint8)
    total = int(seq_len.sum())
    bwt_len = total + nseq
    e = chpt_exp
    # multiples of 2^e in [nseq, bwt_len)
    first = ((nseq + (1 << e) - 1) >> e) << e
    n_samples = max(0, ((bwt_len - 1) >> e) - (first >> e) + 1) if first < bwt_len else 0

    bwt = np.empty(bwt_len, dtype=np.uint8)
    content_rank = np.empty(nseq, dtype=np.int32)
    sa_seq = np.empty(max(1, n_samples), dtype=np.int32)
    sa_off = np.empty(max(1, n_samples), dtype=np.int32)

    lib = get_lib()
    rc = lib.kt_build_bwt(
        codes.ctypes.data_as(ctypes.c_void_p),
        seq_len.ctypes.data_as(ctypes.c_void_p),
        nseq,
        total,
        len(alphabet),
        e,
        bwt.ctypes.data_as(ctypes.c_void_p),
        content_rank.ctypes.data_as(ctypes.c_void_p),
        sa_seq.ctypes.data_as(ctypes.c_void_p),
        sa_off.ctypes.data_as(ctypes.c_void_p),
        n_samples,
    )
    if rc != 0:
        raise RuntimeError(f"kt_build_bwt failed with code {rc}")

    order = np.argsort(content_rank, kind="stable")  # content-rank r -> input
    names_sorted = [names_in[i] for i in order]
    # 0-separated text copy (m-mer screen construction, kaiju_tpu.ops.bloom)
    text = np.zeros(total + nseq, dtype=np.uint8)
    ends = np.cumsum(seq_len + 1)
    starts = ends - seq_len - 1
    for i, s in enumerate(seqs):
        text[starts[i] : ends[i] - 1] = s
    return finalize_index(
        bwt=bwt,
        alphabet=alphabet,
        nseq=nseq,
        chpt_exp=e,
        sa_seq=sa_seq[:n_samples],
        sa_off=sa_off[:n_samples],
        names=names_sorted,
        seq_lengths=seq_len[order],
        seq_term_order=order.astype(np.int32),
        text=text,
    )
