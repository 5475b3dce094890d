"""Device-resident FM index and batched query kernels (JAX).

The innermost operation everywhere is
    fmindex(c, k) = C[c] + occ[k >> 7, c] + count(bwt_block[k >> 7][:k&127] == c)
one occ gather + one 128-byte block-row gather + a masked compare-reduce —
the TPU-native replacement for the reference's checkpoint+byte-scan
(reference: src/bwt/compactfmi.c:267-307).  All kernels below are batched
over flat lane arrays and use static-shape masked iteration (lax.while_loop)
instead of the reference's per-query scalar loops.

Everything is int32: a single index shard is kept < 2^31 (large databases
are sharded across devices; see kaiju_tpu.parallel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index.core import BLOCK, KaijuIndex


def build_fused_records(index: KaijuIndex) -> np.ndarray:
    """Fused rank records: one int32 [nb+1, 64] row per BWT block.

    Words 0..31 = the occ checkpoint row; words 32..63 = the 128 BWT bytes
    little-endian packed 4-per-word.  A rank query then needs ONE row
    gather instead of two (XLA TPU gathers are row-rate bound, so this
    halves the hot-loop cost).  The extra final row covers k == length at
    a block boundary (occ end counts; padding bytes are PAD_CODE so they
    never match a letter).
    """
    blocks = np.asarray(index.bwt).reshape(-1, BLOCK)
    occ = np.asarray(index.occ, dtype=np.int32)
    nb = blocks.shape[0]
    rec = np.zeros((nb + 1, 64), dtype=np.int32)
    rec[:, :32] = occ[: nb + 1]
    packed = blocks.astype(np.uint32)
    words = (
        packed[:, 0::4]
        | (packed[:, 1::4] << 8)
        | (packed[:, 2::4] << 16)
        | (packed[:, 3::4] << 24)
    )
    rec[:nb, 32:] = words.view(np.int32)
    pad31 = np.uint32(31 | (31 << 8) | (31 << 16) | (31 << 24))
    rec[nb, 32:] = np.full(32, pad31, dtype=np.uint32).view(np.int32)
    return rec


class DeviceIndex:
    """Immutable device arrays for one index shard."""

    def __init__(self, index: KaijuIndex, device=None):
        put = partial(jax.device_put, device=device) if device else jax.device_put
        self.blocks = put(np.asarray(index.bwt).reshape(-1, BLOCK))
        self.occ = put(np.asarray(index.occ, dtype=np.int32))
        self.C = put(np.asarray(index.C, dtype=np.int32))
        self._rec_host = build_fused_records(index)
        self.rec = put(self._rec_host)
        self.sa_seq = put(np.asarray(index.sa_seq, dtype=np.int32))
        self.sa_off = put(np.asarray(index.sa_off, dtype=np.int32))
        self.length = int(index.length)
        self.nseq = int(index.nseq)
        self.chpt_exp = int(index.chpt_exp)
        self.alen = index.alen
        self._rec2 = None
        self._device = device
        self._index = index
        self._textp = None
        self._rank_start = None

    @property
    def rec2(self):
        """Paired fused records (lazy: 2x the rec memory)."""
        if self._rec2 is None:
            put = (
                partial(jax.device_put, device=self._device)
                if self._device
                else jax.device_put
            )
            self._rec2 = put(build_paired_records(self._rec_host))
        return self._rec2

    @property
    def has_text(self) -> bool:
        return self._index.text is not None

    @property
    def textp(self):
        """Paired 256-byte text rows: textp[b] = text[128b : 128b+256]
        (int8 letter codes, 0 separators; end padded with 0).  One row
        gather covers any 128-char window — the direct-comparison side
        of the hybrid long-match extension (see fused_mem2)."""
        if self._textp is None:
            put = (
                partial(jax.device_put, device=self._device)
                if self._device
                else jax.device_put
            )
            text = np.asarray(self._index.text, dtype=np.uint8)
            n = text.shape[0]
            ntb = (n + BLOCK - 1) // BLOCK
            flat = np.zeros(ntb * BLOCK + BLOCK, dtype=np.uint8)
            flat[:n] = text
            tp = np.lib.stride_tricks.as_strided(
                flat, shape=(ntb, 2 * BLOCK), strides=(BLOCK, 1)
            )
            self._textp = put(np.ascontiguousarray(tp.view(np.int8)))
        return self._textp

    @property
    def rank_start(self):
        """int32 [nseq]: global text start of the content-rank-r sequence."""
        if self._rank_start is None:
            put = (
                partial(jax.device_put, device=self._device)
                if self._device
                else jax.device_put
            )
            self._rank_start = put(
                self._index.rank_text_starts().astype(np.int32)
            )
        return self._rank_start

    @property
    def arrays(self):
        return (self.blocks, self.occ, self.C)


def _unpack_row(row):
    """[N, 64] fused row -> (occ_row [N, 32], bwt bytes [N, 128] int32)."""
    w = row[:, 32:].astype(jnp.uint32)
    b0 = w & 255
    b1 = (w >> 8) & 255
    b2 = (w >> 16) & 255
    b3 = (w >> 24) & 255
    bytes_ = jnp.stack([b0, b1, b2, b3], axis=-1).reshape(row.shape[0], BLOCK)
    return row[:, :32], bytes_.astype(jnp.int32)


def rank_row(row64, C, c, k):
    """fmindex from an already-gathered fused record row [N, 64].

    Word-level formulation with NO lane-crossing ops: the occ base is an
    iota-compare multiply-reduce and the in-block count tests packed
    bytes against per-byte-lane word thresholds (position 4w+t < off
    iff w < (off-t+3)>>2).  ~2x faster than unpacking the bytes and
    selecting lanes dynamically.
    """
    occ_row = row64[:, :32]
    words = row64[:, 32:].astype(jnp.uint32)
    lanes32 = jax.lax.broadcasted_iota(jnp.int32, occ_row.shape, 1)
    base = jnp.sum(jnp.where(lanes32 == c[:, None], occ_row, 0), axis=1)
    off = k & (BLOCK - 1)
    cnt = jnp.zeros(c.shape, jnp.int32)
    cu = c.astype(jnp.uint32)[:, None]
    for t in range(4):
        byt = (words >> (8 * t)) & 255
        th = ((off - t + 3) >> 2)[:, None]
        cnt = cnt + jnp.sum(
            (byt == cu) & (lanes32 < th), axis=1, dtype=jnp.int32
        )
    return C[c] + base + cnt


def rank_fused(rec, C, c, k):
    """fmindex via one fused-record gather per query."""
    b = k >> 7
    nb1 = rec.shape[0]
    row = rec[jnp.minimum(b, nb1 - 1)]
    return rank_row(row, C, c, k)


def build_paired_records(rec_np: np.ndarray) -> np.ndarray:
    """rec2[b] = rec[b] ++ rec[b+1]: one 512-byte row gather serves BOTH
    ends of a narrow SA interval (si1 - si0 <= 128 implies the end block
    is b or b+1) — the common case after a few extension steps, halving
    the gather count of the completion loops.  2x index memory."""
    return np.concatenate([rec_np[:-1], rec_np[1:]], axis=1)


# ---------------------------------------------------------------------------
# rank / fmindex
# ---------------------------------------------------------------------------


def fmindex(blocks, occ, C, c, k):
    """Batched FMindex: absolute SA position C[c] + occ_c(k), count
    excluding k (reference semantics, compactfmi.c:4-19).

    c, k: int32 [N].  Returns int32 [N].
    """
    b = k >> 7
    base = occ[b, c]
    nb = blocks.shape[0]
    row = blocks[jnp.minimum(b, nb - 1)]  # [N, BLOCK]
    off = k & (BLOCK - 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    cnt = jnp.sum(
        (row == c[:, None].astype(row.dtype)) & (lanes < off[:, None]),
        axis=1,
        dtype=jnp.int32,
    )
    return C[c] + base + cnt


# ---------------------------------------------------------------------------
# MEM wavefront: maximal backward extension for every end position
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=())
def extend_all(blocks, occ, C, codes, flen):
    """For every (fragment, end position j): the maximal backward extension.

    codes: uint8 [F, L] (letter codes, 0-padded), flen: int32 [F].
    Returns (start, si0, si1): int32 [F, L]; the match for end position j
    spans [start[f, j], j] with SA interval [si0, si1).  Lanes with
    j >= flen[f] are invalid (si1 <= si0).

    This is the reference's per-end-position loop (bwt.c:265-293 / 355-361)
    as a lockstep wavefront with active-lane masking.
    """
    F, L = codes.shape
    N = F * L
    flat = codes.reshape(-1).astype(jnp.int32)
    lane = jnp.arange(N, dtype=jnp.int32)
    f = lane // L
    j = lane % L
    valid = j < flen[f]

    c0 = jnp.where(valid, flat[lane], 0)
    si0 = C[c0]
    si1 = C[c0 + 1]
    i = j
    active = valid

    def cond(state):
        i, si0, si1, active = state
        return jnp.any(active & (i > 0))

    def body(state):
        i, si0, si1, active = state
        ext = active & (i > 0)
        cpos = jnp.where(ext, f * L + i - 1, 0)
        c = flat[cpos]
        n0 = fmindex(blocks, occ, C, c, si0)
        n1 = fmindex(blocks, occ, C, c, si1)
        ok = ext & (n0 < n1)
        si0 = jnp.where(ok, n0, si0)
        si1 = jnp.where(ok, n1, si1)
        i = jnp.where(ok, i - 1, i)
        return i, si0, si1, ok

    i, si0, si1, _ = jax.lax.while_loop(cond, body, (i, si0, si1, active))
    si0 = jnp.where(valid, si0, 0)
    si1 = jnp.where(valid, si1, 0)
    return (
        i.reshape(F, L),
        si0.reshape(F, L),
        si1.reshape(F, L),
    )


@partial(jax.jit, static_argnums=(5,))
def extend_all_scored(blocks, occ, C, codes, flen, min_len):
    """extend_all plus the order-independent MEM statistics on device:
    maxl[f] = the maximal match length of fragment f under greedyExact
    semantics, jstop[f] = the `i <= 1` break position (see
    kaiju_tpu.engine.mem_fast).  Keeps the [F, L] maps on device; only the
    [F] statistics need transfer."""
    start, si0, si1 = extend_all(blocks, occ, C, codes, flen)
    F, L = codes.shape
    jgrid = jax.lax.broadcasted_iota(jnp.int32, (F, L), 1)
    valid = jgrid < flen[:, None]
    length = jgrid - start + 1
    jstop = jnp.max(jnp.where(valid & (start <= 1), jgrid, -1), axis=1)
    eligible = valid & (jgrid >= jstop[:, None]) & (length >= min_len)
    maxl = jnp.max(jnp.where(eligible, length, 0), axis=1)
    return start, si0, si1, maxl, jstop


# ---------------------------------------------------------------------------
# Right-anchored resumed extension (Greedy num_mm > 0 fragments)
# ---------------------------------------------------------------------------


@jax.jit
def extend_from(blocks, occ, C, codes, start_i, si0, si1, active_in):
    """Resume backward extension from position start_i with interval
    [si0, si1) (reference: bwt.c:298-336 maxMatches_withStart loop).

    codes: uint8 [N, L] per-lane fragment codes; start_i: first unmatched
    position + 1 (the loop extends to codes[:, start_i-1] first).
    Returns final (i, si0, si1).
    """
    N, L = codes.shape
    flat = codes.reshape(-1).astype(jnp.int32)
    row = jnp.arange(N, dtype=jnp.int32)
    i = start_i

    def cond(state):
        i, si0, si1, active = state
        return jnp.any(active & (i > 0))

    def body(state):
        i, si0, si1, active = state
        ext = active & (i > 0)
        cpos = jnp.where(ext, row * L + i - 1, 0)
        c = flat[cpos]
        n0 = fmindex(blocks, occ, C, c, si0)
        n1 = fmindex(blocks, occ, C, c, si1)
        ok = ext & (n0 < n1)
        si0 = jnp.where(ok, n0, si0)
        si1 = jnp.where(ok, n1, si1)
        i = jnp.where(ok, i - 1, i)
        return i, si0, si1, ok

    i, si0, si1, _ = jax.lax.while_loop(cond, body, (i, si0, si1, active_in))
    return i, si0, si1


# ---------------------------------------------------------------------------
# UpdateSI probes (Greedy substitution enumeration)
# ---------------------------------------------------------------------------


@jax.jit
def probe_updates(blocks, occ, C, c, si0, si1):
    """Batched UpdateSI (reference: bwt.c:160-173): returns (n0, n1, ok)."""
    n0 = fmindex(blocks, occ, C, c, si0)
    n1 = fmindex(blocks, occ, C, c, si1)
    return n0, n1, n0 < n1


@jax.jit
def probe_updates_rec(rec, C, c, si0, si1):
    """UpdateSI probes via fused-record rank rows."""
    n0 = rank_fused(rec, C, c, si0)
    n1 = rank_fused(rec, C, c, si1)
    return n0, n1, n0 < n1


@jax.jit
def extend_from_flat(rec2, C, flat_codes, base, pos, subcode, start_i,
                     si0, si1, active_in):
    """Resumed extension whose per-lane sequence is a one-substitution
    variant of a fragment stored in the flat batch code array: lane n's
    character at local position x is flat_codes[base[n] + x], except
    x == pos[n] where it is subcode[n].  Avoids uploading per-lane code
    matrices for the Greedy co-simulation's variant extensions."""
    nb = rec2.shape[0]

    def body(st):
        i, a0, a1, act = st
        x = i - 1
        cpos = jnp.where(act, base + x, 0)
        c = jnp.where(x == pos, subcode, flat_codes[cpos].astype(jnp.int32))
        b0 = jnp.minimum(a0 >> 7, nb - 1)
        wide = act & ((a1 >> 7) > b0 + 1)

        def paired(_):
            pair = rec2[b0]
            n0 = rank_row(pair[:, :64], C, c, a0)
            n1 = jnp.where(
                (a1 >> 7) == b0,
                rank_row(pair[:, :64], C, c, a1),
                rank_row(pair[:, 64:], C, c, a1),
            )
            return n0, n1

        def twog(_):
            r0 = rec2[b0]
            r1 = rec2[jnp.minimum(a1 >> 7, nb - 1)]
            n0 = rank_row(r0[:, :64], C, c, a0)
            n1 = rank_row(r1[:, :64], C, c, a1)
            return n0, n1

        n0, n1 = jax.lax.cond(jnp.any(wide), twog, paired, None)
        ok = act & (n0 < n1)
        a0 = jnp.where(ok, n0, a0)
        a1 = jnp.where(ok, n1, a1)
        i = jnp.where(ok, i - 1, i)
        return i, a0, a1, ok & (i > 0)

    act = active_in & (start_i > 0)
    i, s0, s1, _ = jax.lax.while_loop(
        lambda st: jnp.any(st[3]), body, (start_i, si0, si1, act)
    )
    return i, s0, s1


@jax.jit
def extend_from_rec(rec2, C, codes, start_i, si0, si1, active_in):
    """maxMatches_withStart resumed extension via paired-record rows
    (reference: bwt.c:298-336); see extend_from for the contract."""
    from .fused_mem2 import _extend_paired  # local import: avoid cycle

    N, L = codes.shape
    flat = codes.reshape(-1)
    row = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
    base = row * L
    act = active_in & (start_i > 0)
    return _extend_paired(rec2, C, flat, base, start_i, si0, si1, act)


@partial(jax.jit, static_argnums=(5,))
def sa_lookup_fused(rec, C, sa_seq, sa_off, nseq, chpt_exp, k0):
    """Batched get_suffix via fused records (one gather per walk step)."""
    check = (1 << chpt_exp) - 1
    N = k0.shape[0]
    nb1 = rec.shape[0]

    def sample(k, steps):
        idx = (k >> chpt_exp) - ((nseq - 1) >> chpt_exp) - 1
        idx = jnp.clip(idx, 0, sa_seq.shape[0] - 1)
        return sa_seq[idx], sa_off[idx] + steps

    k = k0
    steps = jnp.zeros(N, dtype=jnp.int32)
    done = (k & check) == 0
    iseq, pos = sample(k, steps)

    def cond(state):
        k, steps, done, iseq, pos = state
        return jnp.any(~done)

    def body(state):
        k, steps, done, iseq, pos = state
        b = k >> 7
        row = rec[jnp.minimum(b, nb1 - 1)]
        occ_row, bytes_ = _unpack_row(row)
        off = k & (BLOCK - 1)
        c = jnp.take_along_axis(bytes_, off[:, None], axis=1)[:, 0]
        lanes = jax.lax.broadcasted_iota(jnp.int32, bytes_.shape, 1)
        cnt = jnp.sum(
            (bytes_ == c[:, None]) & (lanes < off[:, None]),
            axis=1,
            dtype=jnp.int32,
        )
        base = jnp.take_along_axis(occ_row, c[:, None], axis=1)[:, 0]
        k_new = C[c] + base + cnt
        hit_term = ~done & (c == 0)
        iseq = jnp.where(hit_term, k_new, iseq)
        pos = jnp.where(hit_term, steps, pos)
        stepping = ~done & ~hit_term
        k = jnp.where(stepping, k_new, k)
        steps = jnp.where(stepping, steps + 1, steps)
        at_chk = stepping & ((k & check) == 0)
        s_iseq, s_pos = sample(k, steps)
        iseq = jnp.where(at_chk, s_iseq, iseq)
        pos = jnp.where(at_chk, s_pos, pos)
        done = done | hit_term | at_chk
        return k, steps, done, iseq, pos

    _, _, _, iseq, pos = jax.lax.while_loop(
        cond, body, (k, steps, done, iseq, pos)
    )
    return iseq, pos


# ---------------------------------------------------------------------------
# SA lookup: LF-walk to a sampled slot or a terminator
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(7,))
def sa_lookup(blocks, occ, C, sa_seq, sa_off, nseq, k0, chpt_exp):
    """Batched get_suffix (reference: bwt.c:105-121).

    k0: int32 [N] SA positions.  Returns (iseq, pos): the content-rank
    sequence index and suffix offset for each position.
    """
    check = (1 << chpt_exp) - 1
    N = k0.shape[0]
    nb = blocks.shape[0]

    def sample(k, steps):
        idx = (k >> chpt_exp) - ((nseq - 1) >> chpt_exp) - 1
        idx = jnp.clip(idx, 0, sa_seq.shape[0] - 1)
        return sa_seq[idx], sa_off[idx] + steps

    k = k0
    steps = jnp.zeros(N, dtype=jnp.int32)
    done = (k & check) == 0
    iseq, pos = sample(k, steps)

    def cond(state):
        k, steps, done, iseq, pos = state
        return jnp.any(~done)

    def body(state):
        k, steps, done, iseq, pos = state
        b = k >> 7
        row = blocks[jnp.minimum(b, nb - 1)]
        off = k & (BLOCK - 1)
        c = jnp.take_along_axis(row, off[:, None], axis=1)[:, 0].astype(jnp.int32)
        lanes = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
        cnt = jnp.sum(
            (row == c[:, None].astype(row.dtype)) & (lanes < off[:, None]),
            axis=1,
            dtype=jnp.int32,
        )
        k_new = C[c] + occ[b, c] + cnt
        hit_term = ~done & (c == 0)
        # terminator: iseq is the LF result itself (content rank), pos=steps
        iseq = jnp.where(hit_term, k_new, iseq)
        pos = jnp.where(hit_term, steps, pos)
        stepping = ~done & ~hit_term
        k = jnp.where(stepping, k_new, k)
        steps = jnp.where(stepping, steps + 1, steps)
        at_chk = stepping & ((k & check) == 0)
        s_iseq, s_pos = sample(k, steps)
        iseq = jnp.where(at_chk, s_iseq, iseq)
        pos = jnp.where(at_chk, s_pos, pos)
        done = done | hit_term | at_chk
        return k, steps, done, iseq, pos

    _, _, _, iseq, pos = jax.lax.while_loop(
        cond, body, (k, steps, done, iseq, pos)
    )
    return iseq, pos
