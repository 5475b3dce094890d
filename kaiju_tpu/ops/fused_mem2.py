"""Fused MEM search v2: strip-phased extension over a flat fragment layout.

Single-call design for a high-latency link to the TPU (see fused_mem.py);
v2 additionally exploits the reference's early-exit structure
(bwt.c:261-296: scan end positions right-to-left, stop at the first
backward extension reaching query position <= 1) to avoid evaluating the
~90% of end positions that a matching fragment never needs:

  phase 1 (strip): extend only the top W end positions of every fragment.
    If any strip lane reaches i <= 1, that lane IS the fragment's jstop
    (it is the largest such j), every position >= jstop lies inside the
    strip, and the fragment is fully resolved.
  phase 2 (remainder): for unresolved fragments only (junk frames and
    mutated reads — exactly the set the reference scans fully), extend
    the remaining positions; junk lanes die in the k-mer seed gather.

Layout is flat: fragments are concatenated (frag_off offsets into a [P]
code array), so upload bytes and lane counts scale with actual content,
not padded [F, L] grids.  All statistics are segment reductions over the
flat position space; the output per fragment is (maxl, jstop, tie list)
— identical semantics to kaiju_tpu.engine.mem_fast's order-independent
MEM statistics (reference: ConsumerThread.cpp:543-628).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .device_index import rank_fused

NLET = 20
STRIP_W = 8


def _step(rec, C, flat_codes, base, st, rank_pair=None):
    i, a0, a1, act = st
    cpos = jnp.where(act, base + i - 1, 0)
    c = flat_codes[cpos].astype(jnp.int32)
    if rank_pair is not None:
        n0, n1 = rank_pair(c, a0, a1)
    else:
        n0 = rank_fused(rec, C, c, a0)
        n1 = rank_fused(rec, C, c, a1)
    ok = act & (n0 < n1)
    a0 = jnp.where(ok, n0, a0)
    a1 = jnp.where(ok, n1, a1)
    i = jnp.where(ok, i - 1, i)
    return i, a0, a1, ok & (i > 0)


def _extend(rec, C, flat_codes, base, i, s0, s1, act, rank_pair=None,
            any_fn=None):
    """Backward-extend lanes to completion (masked while_loop)."""
    anyf = any_fn or jnp.any
    i, s0, s1, _ = jax.lax.while_loop(
        lambda st: anyf(st[3]),
        lambda st: _step(rec, C, flat_codes, base, st, rank_pair),
        (i, s0, s1, act),
    )
    return i, s0, s1


def _extend_paired(rec2, C, flat_codes, base, i, s0, s1, act):
    """Completion loop with ONE 512-byte paired-row gather per step.

    After the seed + pre-steps every surviving interval is narrow
    (si1 - si0 <= 128 => end block is b0 or b0+1, both inside the
    paired row).  A rare wide lane flips that iteration to the
    two-gather body via lax.cond — correctness never depends on the
    narrowness assumption."""
    from .device_index import rank_row

    nb = rec2.shape[0]

    def body(st):
        i, a0, a1, act = st
        cpos = jnp.where(act, base + i - 1, 0)
        c = flat_codes[cpos].astype(jnp.int32)
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

    i, s0, s1, _ = jax.lax.while_loop(
        lambda st: jnp.any(st[3]), body, (i, s0, s1, act)
    )
    return i, s0, s1


def _extend_compacted(rec, C, flat_codes, base, i, s0, s1, act, pre, Ms,
                      rec2=None, rank_pair=None, any_fn=None):
    """Extend lanes: `pre` fixed steps on all lanes (kills the vast
    majority — junk dies within a step or two of the seed), then compact
    the survivors into an [Ms]-lane buffer on device and run the long
    tail to completion there.  Returns final (i, s0, s1) per input lane
    plus the survivor count (> Ms means the caller must retry bigger).

    This keeps the completion while_loop — whose cost is lanes x deepest
    extension — on a buffer sized for the survivors instead of the full
    lane population (~40x less work on junk-heavy batches)."""
    N = base.shape[0]
    st = (i, s0, s1, act)
    for _ in range(pre):
        st = _step(rec, C, flat_codes, base, st, rank_pair)
    i, s0, s1, act = st

    n_surv = jnp.sum(act, dtype=jnp.int32)
    slot = jnp.cumsum(act, dtype=jnp.int32) - 1
    slot = jnp.where(act & (slot < Ms), slot, Ms)

    def compact(vals, fill):
        out = jnp.full((Ms + 1,), fill, dtype=vals.dtype)
        return out.at[slot].set(vals, mode="drop")[:Ms]

    ci = compact(i, jnp.int32(0))
    c0 = compact(s0, jnp.int32(0))
    c1 = compact(s1, jnp.int32(0))
    cb = compact(base, jnp.int32(0))
    ca = compact(act, False)
    lane = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0]
    cl = compact(lane, jnp.int32(N))

    if rank_pair is not None:
        ci, c0, c1 = _extend(rec, C, flat_codes, cb, ci, c0, c1, ca,
                             rank_pair, any_fn)
    elif rec2 is not None:
        ci, c0, c1 = _extend_paired(rec2, C, flat_codes, cb, ci, c0, c1, ca)
    else:
        ci, c0, c1 = _extend(rec, C, flat_codes, cb, ci, c0, c1, ca)

    def scat(vals_full, cvals):
        return vals_full.at[jnp.where(ca, cl, N)].set(cvals, mode="drop")

    i = scat(jnp.concatenate([i, jnp.zeros(1, i.dtype)]), ci)[:N]
    s0 = scat(jnp.concatenate([s0, jnp.zeros(1, s0.dtype)]), c0)[:N]
    s1 = scat(jnp.concatenate([s1, jnp.zeros(1, s1.dtype)]), c1)[:N]
    return i, s0, s1, n_surv


def pre_steps_for(length: int, K: int) -> int:
    """Extension steps before survivor compaction: enough that a random
    (junk) lane is almost surely dead — one step past the expected
    maximal random-match depth log20(len) — minus the K seed steps."""
    import math

    return max(2, math.ceil(math.log(max(length, 400), 20)) + 2 - K)


def _search_phases(rec, C, seed_rec, flat_codes, frag_off, K, j0, M2, Ms,
                   rec2=None, pre=6, rank_pair=None, any_fn=None):
    """Shared strip + remainder search over the flat fragment layout.

    Returns a dict with the per-lane results of both phases plus the
    coordinate arrays (see fused_mem_search2 for the meanings)."""
    P = flat_codes.shape[0]
    F = frag_off.shape[0] - 1
    c32 = flat_codes.astype(jnp.int32)

    # per-position fragment id via boundary scatter + cumsum (a
    # searchsorted here costs ~15 gathers per position)
    parange = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
    bumps = jnp.zeros((P + 1,), jnp.int32).at[frag_off[1:F]].add(1)[:P]
    fid = jnp.cumsum(bumps)
    fid = jnp.clip(fid, 0, F - 1)
    fstart = frag_off[fid]
    flen_p = frag_off[fid + 1] - fstart
    j_local = parange - fstart

    # k-mer id ending at every flat position (windows never straddle a
    # fragment boundary for usable lanes because j0 >= K-1)
    kid = jnp.zeros((P,), dtype=jnp.int32)
    for t in range(K):
        sh = K - 1 - t
        shifted = jnp.pad(c32, (sh, 0))[:P]
        kid = kid + (shifted - 1) * (NLET ** (K - 1 - t))
    usable = (j_local >= j0) & (j_local < flen_p)
    kid = jnp.where(usable, kid, 0)

    flen_f = frag_off[1:] - frag_off[:-1]

    def seed(pos, lane_valid):
        """pos: flat end positions.  Returns (i_local, s0, s1, alive,
        resolved_now) — resolved_now = died inside the seed."""
        srow = seed_rec[jnp.where(lane_valid, kid[pos], 0)]
        d = jnp.where(lane_valid, srow[:, 2], 0)
        jl = pos - frag_off[fid[pos]]
        i = jnp.where(d > 0, jl - d + 1, jl)
        s0 = srow[:, 0]
        s1 = srow[:, 1]
        alive = lane_valid & (d == K) & (i > 0)
        return i, s0, s1, alive

    # ---- phase 1: top-W strip -----------------------------------------
    w = jax.lax.broadcasted_iota(jnp.int32, (F, STRIP_W), 1)
    strip_j = flen_f[:, None] - 1 - w
    strip_valid = strip_j >= j0
    strip_pos = jnp.where(strip_valid, frag_off[:-1, None] + strip_j, 0)
    sp = strip_pos.reshape(-1)
    sv = strip_valid.reshape(-1)
    i1, s01, s11, alive1 = seed(sp, sv)
    base1 = frag_off[fid[sp]]
    i1, s01, s11, nsurv1 = _extend_compacted(
        rec, C, flat_codes, base1, i1, s01, s11, alive1, pre, Ms,
        rec2=rec2, rank_pair=rank_pair, any_fn=any_fn,
    )

    # fragment resolved iff some strip lane reached i <= 1, or the strip
    # already covered every usable position
    found = jnp.any((i1.reshape(F, STRIP_W) <= 1) & strip_valid, axis=1)
    exhausted = flen_f - 1 - STRIP_W < j0
    resolved = found | exhausted

    # ---- phase 2: remaining positions of unresolved fragments ---------
    need2 = usable & ~resolved[fid] & (j_local < flen_p - STRIP_W)
    n2 = jnp.sum(need2, dtype=jnp.int32)
    slot = jnp.cumsum(need2, dtype=jnp.int32) - 1
    slot = jnp.where(need2 & (slot < M2), slot, M2)

    def compact(vals, fill):
        out = jnp.full((M2 + 1,), fill, dtype=vals.dtype)
        return out.at[slot].set(vals, mode="drop")[:M2]

    pos2 = compact(parange, jnp.int32(0))
    v2 = compact(need2, False)
    i2, s02, s12, alive2 = seed(pos2, v2)
    base2 = frag_off[fid[pos2]]
    i2, s02, s12, nsurv2 = _extend_compacted(
        rec, C, flat_codes, base2, i2, s02, s12, alive2, pre, Ms,
        rec2=rec2, rank_pair=rank_pair, any_fn=any_fn,
    )

    # ---- per-fragment coordinates of the two evaluated lane sets ------
    # strip lanes form a regular [F, W] grid (j descending in w); phase-2
    # lanes are a compacted [M2] set.  The two are disjoint, and every
    # phase-2 j is strictly below every strip j of the same fragment.
    i1g = i1.reshape(F, STRIP_W)
    s01g = s01.reshape(F, STRIP_W)
    s11g = s11.reshape(F, STRIP_W)
    len1 = strip_j - i1g + 1

    fid2 = fid[pos2]
    j2 = j_local[pos2]
    len2 = j2 - i2 + 1

    def seg_max(vals, seg):
        return jax.ops.segment_max(vals, seg, num_segments=F)

    jstop = jnp.maximum(
        jnp.max(jnp.where(strip_valid & (i1g <= 1), strip_j, -1), axis=1),
        seg_max(jnp.where(v2 & (i2 <= 1), j2, -1), fid2),
    )
    return dict(
        F=F, strip_j=strip_j, strip_valid=strip_valid,
        i1g=i1g, s01g=s01g, s11g=s11g, len1=len1,
        pos2=pos2, v2=v2, fid2=fid2, j2=j2, i2=i2, s02=s02, s12=s12,
        len2=len2, jstop=jstop, seg_max=seg_max,
        n2=n2, nsurv=jnp.maximum(nsurv1, nsurv2),
    )


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11, 12))
def fused_mem_search2(
    rec, C, seed_rec, flat_codes, frag_off, rec2, K, j0, min_len, M2, T, Ms,
    pre=6,
):
    """flat_codes: uint8 [P] concatenated fragment letter codes;
    frag_off: int32 [F+1] (monotone; last = true P; trailing pad fragment
    rows must repeat the end offset); kid_ok: bool scalar array (unused
    placeholder for future presence bitmaps).

    Static: K seed depth (>= 1; requires j0 >= K-1), j0, min_len, M2
    (phase-2 lane capacity), T (tie cap), Ms (survivor capacity of the
    post-PRE_STEPS compacted completion loops).

    Returns one packed int32 array [F+1, 2+3T]: rows 0..F-1 are
    (maxl, tie_cnt, tie_j[T], tie_s0[T], tie_s1[T]) per fragment; row F
    carries (n2, n_surv) in its first two columns.  n2 > M2 or
    n_surv > Ms means a capacity overflow: retry with the reported
    capacities.
    """
    ph = _search_phases(rec, C, seed_rec, flat_codes, frag_off, K, j0, M2,
                        Ms, rec2=rec2, pre=pre)
    maxl, tie_cnt, tie_j, tie_s0, tie_s1 = _mem_stats(ph, min_len, T)
    F = ph["F"]
    n2, nsurv = ph["n2"], ph["nsurv"]

    # single packed output => ONE device->host fetch on a high-latency
    # link: [F+1, 2+3T] int32; last row carries (n2, n_surv) in cols 0:2
    out = jnp.concatenate(
        [maxl[:, None], tie_cnt[:, None], tie_j, tie_s0, tie_s1], axis=1
    )
    scal = jnp.zeros((1, 2 + 3 * T), jnp.int32)
    scal = scal.at[0, 0].set(n2).at[0, 1].set(nsurv)
    return jnp.concatenate([out, scal], axis=0)


def _mem_stats(ph, min_len, T):
    """Per-fragment greedyExact statistics from the phase results:
    (maxl, tie_cnt, tie_j, tie_s0, tie_s1 — ties ascending j, capped T)."""
    F = ph["F"]
    strip_j, strip_valid = ph["strip_j"], ph["strip_valid"]
    s01g, s11g, len1 = ph["s01g"], ph["s11g"], ph["len1"]
    v2, fid2, j2 = ph["v2"], ph["fid2"], ph["j2"]
    s02, s12, len2 = ph["s02"], ph["s12"], ph["len2"]
    jstop, seg_max = ph["jstop"], ph["seg_max"]

    elig1 = strip_valid & (strip_j >= jstop[:, None]) & (len1 >= min_len)
    elig2 = v2 & (j2 >= jstop[fid2]) & (len2 >= min_len)
    maxl = jnp.maximum(
        jnp.max(jnp.where(elig1, len1, 0), axis=1),
        seg_max(jnp.where(elig2, len2, 0), fid2),
    )
    maxl = jnp.maximum(maxl, 0)

    tie1 = elig1 & (len1 == maxl[:, None]) & (maxl[:, None] > 0)
    tie2 = elig2 & (len2 == maxl[fid2]) & (maxl[fid2] > 0)
    cnt1 = jnp.sum(tie1, axis=1, dtype=jnp.int32)
    cnt2 = jax.ops.segment_sum(tie2.astype(jnp.int32), fid2, num_segments=F)
    tie_cnt = cnt1 + cnt2

    # phase-2 ties first (ascending j within the compacted order because
    # compaction preserves flat-position order)
    rank2g = jnp.cumsum(tie2.astype(jnp.int32)) - 1
    last2 = seg_max(jnp.where(tie2, rank2g, -1), fid2)
    first2 = last2 - jnp.maximum(cnt2, 1) + 1
    lr2 = rank2g - first2[fid2]
    dst2 = jnp.where(tie2 & (lr2 < T), fid2 * T + lr2, F * T)
    # strip ties after them, ascending j == descending w
    lr1 = (
        jnp.cumsum(tie1[:, ::-1].astype(jnp.int32), axis=1)[:, ::-1]
        - tie1.astype(jnp.int32)
    )
    lr1 = cnt2[:, None] + lr1
    fgrid = jax.lax.broadcasted_iota(jnp.int32, (F, STRIP_W), 0)
    dst1 = jnp.where(tie1 & (lr1 < T), fgrid * T + lr1, F * T).reshape(-1)

    def put(vals2, vals1, fill):
        out = jnp.full((F * T + 1,), fill, jnp.int32)
        out = out.at[dst2].set(vals2, mode="drop")
        out = out.at[dst1].set(vals1.reshape(-1), mode="drop")
        return out[:-1].reshape(F, T)

    tie_j = put(j2, strip_j, -1)
    tie_s0 = put(s02, s01g, 0)
    tie_s1 = put(s12, s11g, 0)
    return maxl, tie_cnt, tie_j, tie_s0, tie_s1


@partial(jax.jit, static_argnums=(6, 7, 8, 9, 10, 11, 12))
def fused_greedy_map(
    rec, C, seed_rec, flat_codes, frag_off, rec2, K, j0, Lmap, M2, Mout, Ms,
    pre=6,
):
    """Sparse maxMatches map for the Greedy engine: every evaluated end
    position j with j >= jstop(fragment) and match length >= Lmap, i.e.
    exactly the candidate set the reference's maxMatches insertion loop
    visits (reference: bwt.c:261-296 with max_matches = 0, so L never
    grows).  j0 must be Lmap - 1.

    Returns packed int32 [Mout+1, 5]: rows (fid, j, i, s0, s1), unsorted;
    last row = (n_rows, n2, n_surv, 0, 0).  Overflow on any of the three
    counts => retry with larger capacities.
    """
    ph = _search_phases(rec, C, seed_rec, flat_codes, frag_off, K, j0, M2,
                        Ms, rec2=rec2, pre=pre)
    F = ph["F"]
    strip_j, strip_valid = ph["strip_j"], ph["strip_valid"]
    i1g, s01g, s11g, len1 = ph["i1g"], ph["s01g"], ph["s11g"], ph["len1"]
    v2, fid2, j2 = ph["v2"], ph["fid2"], ph["j2"]
    i2, s02, s12, len2 = ph["i2"], ph["s02"], ph["s12"], ph["len2"]
    jstop = ph["jstop"]

    elig1 = (strip_valid & (strip_j >= jstop[:, None]) & (len1 >= Lmap)).reshape(-1)
    elig2 = v2 & (j2 >= jstop[fid2]) & (len2 >= Lmap)
    fgrid = jax.lax.broadcasted_iota(jnp.int32, (F, STRIP_W), 0).reshape(-1)

    both = jnp.concatenate([elig1, elig2])
    n_rows = jnp.sum(both, dtype=jnp.int32)
    slot = jnp.cumsum(both, dtype=jnp.int32) - 1
    slot = jnp.where(both & (slot < Mout), slot, Mout)

    def col(v1, v2_):
        vals = jnp.concatenate([v1, v2_])
        return jnp.zeros((Mout + 1,), jnp.int32).at[slot].set(
            vals, mode="drop"
        )[:Mout]

    out = jnp.stack(
        [
            col(fgrid, fid2),
            col(strip_j.reshape(-1), j2),
            col(i1g.reshape(-1), i2),
            col(s01g.reshape(-1), s02),
            col(s11g.reshape(-1), s12),
        ],
        axis=1,
    )
    scal = jnp.zeros((1, 5), jnp.int32)
    scal = (
        scal.at[0, 0].set(n_rows).at[0, 1].set(ph["n2"]).at[0, 2].set(ph["nsurv"])
    )
    return jnp.concatenate([out, scal], axis=0)
