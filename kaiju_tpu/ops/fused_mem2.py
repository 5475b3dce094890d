"""Fused MEM search v3: Bloom-screened, compaction-staged backward search.

Single-call device program for a high-latency link; v3 replaces v2's
strip-phased wavefront with a three-stage funnel whose cost is dominated
by ONE row gather per candidate end position:

  screen  every (fragment, end position) lane probes an m-mer presence
          bitmap (kaiju_tpu.ops.bloom): a position can host a recordable
          match (length >= min_len) only if its trailing m-mer exists in
          the database, so ~98% of junk lanes die after one gather.
  strip   the rightmost W screened positions of every fragment extend
          first (the reference scans right-to-left and stops at the
          first extension reaching query position <= 1, bwt.c:291-293;
          fragments resolved here never evaluate lower positions).
  remainder  screened positions of unresolved fragments only.

Extensions run on survivor-compacted lane buffers descending a halving
capacity ladder (TPU gathers are row-rate bound, so the gather bill
tracks the live lane count instead of the static capacity), and every
step costs ONE paired-record row gather (rec2[b] = rec[b] ++ rec[b+1];
a narrow SA interval's two ends live in adjacent blocks).

Per-fragment statistics are identical in semantics to the reference's
greedyExact scan (ConsumerThread.cpp:543-628, bwt.c:347-380) via the
order-independence argument in kaiju_tpu.engine.mem_fast: with
jstop = the largest end position whose maximal extension reaches query
position <= 1, maxl = max{ l_j : j >= jstop, l_j >= min_len } and the
tie set is { j : l_j == maxl }, all computable from any superset of the
positions the reference scans.  Screened-out lanes have l_j < min_len
(no false negatives in the bitmap), so they contribute neither maxl,
ties, nor an effective jstop — bit-exact parity is preserved.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bloom import GOLD, A32
from .device_index import rank_fused, rank_row

NLET = 20


# ---------------------------------------------------------------------------
# extension steps
# ---------------------------------------------------------------------------


def _step2(rec, C, flat_codes, base, st, rank_pair=None):
    """One masked backward-extension step, branch-free: two unpaired
    fused-record row gathers per lane (lax.cond branches copy their
    operands on TPU and cost more than the extra gather).
    st = (i, si0, si1, active)."""
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


def _paired_step(rec2, C, flat_codes, base, st, rank_pair=None):
    """One masked backward-extension step; ONE paired-row gather per lane
    (two when any lane's interval straddles >2 blocks — rare after the
    seed).  st = (i, si0, si1, active)."""
    i, a0, a1, act = st
    cpos = jnp.where(act, base + i - 1, 0)
    c = flat_codes[cpos].astype(jnp.int32)
    if rank_pair is not None:
        n0, n1 = rank_pair(c, a0, a1)
    else:
        nb = rec2.shape[0]
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


def _full_extend(rec, C, flat_codes, base, st, rank_pair, any_fn):
    anyf = any_fn or jnp.any
    i, s0, s1, _ = jax.lax.while_loop(
        lambda st: anyf(st[3]),
        lambda st: _step2(rec, C, flat_codes, base, st, rank_pair),
        st,
    )
    return i, s0, s1


def _extend_paired(rec2, C, flat_codes, base, i, s0, s1, act):
    """Backward-extend flat lanes to completion with paired-row gathers
    (used by the Greedy co-simulation's resumed extensions,
    kaiju_tpu.ops.device_index.extend_from_rec)."""
    i, s0, s1, _ = jax.lax.while_loop(
        lambda st: jnp.any(st[3]),
        lambda st: _paired_step(rec2, C, flat_codes, base, st),
        (i, s0, s1, act),
    )
    return i, s0, s1


# ---------------------------------------------------------------------------
# seeded, ladder-descent extension of a sparse lane set
# ---------------------------------------------------------------------------

LADDER_FLOOR = 2048  # smallest worklist rung


def _staged_extend(rec, C, seed_rec, flat_codes, frag_off, kid,
                   lane_fid, lane_j, act, K, cap0,
                   rank_pair=None, any_fn=None, count_fn=None, rec2=None):
    """Evaluate the maximal backward extension ending at each active lane.

    kid: PER-LANE K-mer id [N]; lane_fid/lane_j: fragment id and
    local end position per lane; act: lanes to evaluate.  Lanes compact
    into a [cap0] buffer, seed from the K-mer table, then descend a
    halving capacity ladder: at each rung the worklist extends only
    until the live count fits the next rung, then survivors compact
    down.  TPU gathers are row-rate bound, so the gather bill tracks the
    LIVE lane count (<= 2x true work) instead of the static capacity;
    rungs whose live count already fits the next capacity cost zero
    extension steps.  Everything is branch-free: lax.cond copies its
    operands on TPU, which costs more than an idle while_loop.

    Returns (i, s0, s1) per input lane -- inactive lanes get
    (lane_j + 1, 0, 0), i.e. a length-0 result -- plus `need`, the
    buffer capacity that would have sufficed (> cap0 means retry
    bigger; the ladder itself never drops lanes), and `bill`, a
    diagnostic: the sum of rung size over extension steps.
    """
    anyf = any_fn or jnp.any
    countf = count_fn or (lambda x: jnp.sum(x, dtype=jnp.int32))
    N = act.shape[0]
    n_act = jnp.sum(act, dtype=jnp.int32)
    slot = jnp.cumsum(act, dtype=jnp.int32) - 1
    slot = jnp.where(act & (slot < cap0), slot, cap0)

    def comp0(vals, fill):
        out = jnp.full((cap0 + 1,), fill, dtype=vals.dtype)
        return out.at[slot].set(vals, mode="drop")[:cap0]

    cact = comp0(act, False)
    ckid = comp0(jnp.where(act, kid, 0), jnp.int32(0))
    cjl = comp0(lane_j, jnp.int32(0))
    cbase = comp0(frag_off[lane_fid], jnp.int32(0))
    corig = comp0(
        jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0], jnp.int32(N)
    )

    # seed: one K-mer record gather per surviving lane (planar 1-D
    # tables avoid the whole-table cross-program-prefetch copy XLA
    # emits for a [20^K, 4] layout — see ROOFLINE.md)
    if isinstance(seed_rec, tuple):
        ckz = jnp.where(cact, ckid, 0)
        d = jnp.where(cact, seed_rec[2][ckz].astype(jnp.int32), 0)
        srow = None
        cs0 = jnp.where(cact, seed_rec[0][ckz], 0)
        cs1 = jnp.where(cact, seed_rec[1][ckz], 0)
        ci = jnp.where(d > 0, cjl - d + 1, cjl)
        alive = cact & (d == K) & (ci > 0)
    else:
        srow = seed_rec[jnp.where(cact, ckid, 0)]
        d = jnp.where(cact, srow[:, 2], 0)
    if srow is not None:
        ci = jnp.where(d > 0, cjl - d + 1, cjl)
        cs0 = jnp.where(cact, srow[:, 0], 0)
        cs1 = jnp.where(cact, srow[:, 1], 0)
        alive = cact & (d == K) & (ci > 0)

    # result accumulators (defaults: length-0 results)
    res_i = lane_j + 1
    res_s0 = jnp.zeros((N,), jnp.int32)
    res_s1 = jnp.zeros((N,), jnp.int32)

    def scatter(res, orig, vals, guard):
        idx = jnp.where(guard, orig, N)
        return jnp.concatenate([res, res[:1]]).at[idx].set(
            vals, mode="drop"
        )[:N]

    floor = min(cap0, LADDER_FLOOR)
    caps = []
    c = cap0
    while c > floor:
        caps.append(c)
        c //= 2
    caps.append(floor)

    bill = jnp.int32(0)  # gather-step bill: sum of rung size per step
    entry = cact  # first rung scatters seed-killed lanes too
    for cap in caps:
        is_last = cap == floor

        def cond(st, cap=cap, is_last=is_last):
            a = st[1][3]
            if is_last:
                return anyf(a)
            return anyf(a) & (countf(a) > cap // 2)

        def body(st, cap=cap, cbase=cbase):
            b, inner = st
            if rank_pair is None and rec2 is not None:
                # one paired-row gather per step (per-gather fixed cost
                # dominates at rung widths; see ROOFLINE.md)
                nxt = _paired_step(rec2, C, flat_codes, cbase, inner)
            else:
                nxt = _step2(rec, C, flat_codes, cbase, inner, rank_pair)
            return (b + cap, nxt)

        bill, (ci, cs0, cs1, alive) = jax.lax.while_loop(
            cond, body, (bill, (ci, cs0, cs1, alive))
        )
        res_i = scatter(res_i, corig, ci, entry)
        res_s0 = scatter(res_s0, corig, cs0, entry)
        res_s1 = scatter(res_s1, corig, cs1, entry)
        if is_last:
            break
        # compact live lanes (now guaranteed <= cap//2) down a rung
        cap_next = cap // 2
        slot2 = jnp.cumsum(alive, dtype=jnp.int32) - 1
        slot2 = jnp.where(alive & (slot2 < cap_next), slot2, cap_next)

        def comp2(vals, fill, slot2=slot2, cap_next=cap_next):
            out = jnp.full((cap_next + 1,), fill, dtype=vals.dtype)
            return out.at[slot2].set(vals, mode="drop")[:cap_next]

        ci = comp2(ci, jnp.int32(0))
        cs0 = comp2(cs0, jnp.int32(0))
        cs1 = comp2(cs1, jnp.int32(0))
        cbase = comp2(cbase, jnp.int32(0))
        corig = comp2(corig, jnp.int32(N))
        alive = comp2(alive, False)
        entry = alive

    return res_i, res_s0, res_s1, n_act, bill


# ---------------------------------------------------------------------------
# shared search phases
# ---------------------------------------------------------------------------


def _bloom_hash(cu, m):
    """Rolling polynomial hash of the m chars ENDING at each position
    (uint32 [N] char codes -> uint32 [N]); matches kaiju_tpu.ops.bloom."""
    h = jnp.zeros(cu.shape, jnp.uint32)
    a_t = np.uint32(1)
    for t in range(m):
        shifted = jnp.pad(cu, (t, 0))[: cu.shape[0]] if t else cu
        h = h + shifted * a_t
        a_t = np.uint32(int(a_t) * int(A32) & 0xFFFFFFFF)
    return h


def _search_phases(rec, C, seed_rec, flat_codes, frag_off, K, j0, M2, Ms,
                   rec2=None, bloom_words=None, m=0, lb=0, W=4,
                   rank_pair=None, any_fn=None, count_fn=None):
    """Screen + strip + remainder over the flat fragment layout.

    bloom_words/m/lb: the m-mer presence bitmap (None/0 = no screening —
    every usable position is evaluated; same results, more work).
    Returns the per-lane results of both phases (strip grid [F, W] with
    ascending j, remainder buffer [M2]) plus jstop and overflow counts.

    Ordering note: the strip phase computes its per-lane k-mer ids and
    bloom probes via narrow gathers BEFORE any full-P work, and the
    P-length pre-pass (fid map, k-mer ids, screen) runs AFTER the strip
    ladder and is consumed immediately by the remainder compaction —
    so no P-sized array is live across a while loop.  XLA stages
    loop-crossing buffers through scratch space with copies that cost
    more than this whole pre-pass (see ROOFLINE.md).
    """
    P = flat_codes.shape[0]
    F = frag_off.shape[0] - 1
    c32 = flat_codes.astype(jnp.int32)
    flen_f = frag_off[1:] - frag_off[:-1]

    # ---- phase 1: rightmost-W strip (ascending j in w) -----------------
    w = jax.lax.broadcasted_iota(jnp.int32, (F, W), 1)
    strip_j = flen_f[:, None] - W + w
    strip_valid = (strip_j >= j0) & (strip_j < flen_f[:, None])
    strip_pos = jnp.where(strip_valid, frag_off[:-1, None] + strip_j, 0)
    sp = strip_pos.reshape(-1)
    sv = strip_valid.reshape(-1)
    # per-lane k-mer id: K narrow gathers (windows stay inside the
    # fragment for valid lanes because j0 >= K-1)
    kid1 = jnp.zeros(sp.shape, jnp.int32)
    for t in range(K):
        kid1 = kid1 + (
            c32[jnp.where(sv, sp - t, 0)] - 1
        ) * (NLET ** t)
    # per-lane m-mer bloom probe (j0 >= m-1 for usable lanes)
    if bloom_words is not None and m > 0:
        hu = jnp.zeros(sp.shape, jnp.uint32)
        a_t = np.uint32(1)
        for t in range(m):
            hu = hu + c32[jnp.where(sv, sp - t, 0)].astype(
                jnp.uint32
            ) * a_t
            a_t = np.uint32(int(a_t) * int(A32) & 0xFFFFFFFF)
        idx1 = (hu * GOLD) >> np.uint32(32 - lb)
        ww1 = bloom_words[jnp.where(sv, (idx1 >> 5).astype(jnp.int32), 0)]
        act1 = sv & (((ww1 >> (idx1 & 31)) & 1) > 0)
    else:
        act1 = sv
    fgrid = jax.lax.broadcasted_iota(jnp.int32, (F, W), 0)
    i1, s01, s11, need1, bill1 = _staged_extend(
        rec, C, seed_rec, flat_codes,
        frag_off, kid1, fgrid.reshape(-1), strip_j.reshape(-1), act1,
        K, Ms, rank_pair=rank_pair, any_fn=any_fn, count_fn=count_fn,
        rec2=rec2,
    )
    i1g = i1.reshape(F, W)
    s01g = s01.reshape(F, W)
    s11g = s11.reshape(F, W)
    eval1 = act1.reshape(F, W)
    len1 = strip_j - i1g + 1

    # fragment resolved iff some evaluated strip lane reached i <= 1
    # (the reference's scan break) or the strip covered every usable
    # position
    found = jnp.any((i1g <= 1) & eval1, axis=1)
    exhausted = flen_f - W < j0
    resolved = found | exhausted

    # ---- P-length pre-pass (post-strip; consumed before the phase-2
    # ladder starts, so none of it crosses a loop boundary) --------------
    parange = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
    bumps = jnp.zeros((P + 1,), jnp.int32).at[frag_off[1:F]].add(1)[:P]
    fid = jnp.cumsum(bumps)
    fid = jnp.clip(fid, 0, F - 1)
    fstart = frag_off[fid]
    flen_p = frag_off[fid + 1] - fstart
    j_local = parange - fstart
    usable = (j_local >= j0) & (j_local < flen_p)

    # k-mer id ending at every flat position
    kid = jnp.zeros((P,), dtype=jnp.int32)
    for t in range(K):
        sh = K - 1 - t
        shifted = jnp.pad(c32, (sh, 0))[:P]
        kid = kid + (shifted - 1) * (NLET ** (K - 1 - t))
    kid = jnp.where(usable, kid, 0)

    # m-mer presence screen: ONE bitmap gather per usable position
    if bloom_words is not None and m > 0:
        idx = (_bloom_hash(c32.astype(jnp.uint32), m) * GOLD) >> np.uint32(
            32 - lb
        )
        wword = bloom_words[
            jnp.where(usable, (idx >> 5).astype(jnp.int32), 0)
        ]
        screened = usable & (((wword >> (idx & 31)) & 1) > 0)
    else:
        screened = usable

    # ---- phase 2: remaining screened positions of unresolved fragments
    need2_mask = screened & ~resolved[fid] & (j_local < flen_p - W)
    n2 = jnp.sum(need2_mask, dtype=jnp.int32)
    slot = jnp.cumsum(need2_mask, dtype=jnp.int32) - 1
    slot = jnp.where(need2_mask & (slot < M2), slot, M2)

    def compact(vals, fill):
        out = jnp.full((M2 + 1,), fill, dtype=vals.dtype)
        return out.at[slot].set(vals, mode="drop")[:M2]

    pos2 = compact(parange, jnp.int32(0))
    v2 = compact(need2_mask, False)
    fid2 = compact(fid, jnp.int32(0))
    j2 = compact(j_local, jnp.int32(0))
    kid2 = compact(kid, jnp.int32(0))
    i2, s02, s12, need2x, bill2 = _staged_extend(
        rec, C, seed_rec, flat_codes,
        frag_off, kid2, fid2, j2, v2, K, M2,
        rank_pair=rank_pair, any_fn=any_fn, count_fn=count_fn,
        rec2=rec2,
    )
    len2 = j2 - i2 + 1

    def seg_max(vals, seg):
        return jax.ops.segment_max(vals, seg, num_segments=F)

    jstop = jnp.maximum(
        jnp.max(jnp.where(eval1 & (i1g <= 1), strip_j, -1), axis=1),
        seg_max(jnp.where(v2 & (i2 <= 1), j2, -1), fid2),
    )
    # need (survivor-capacity overflow) scaled to the strip's Ms budget;
    # phase-2 ran at capacity M2, report in the same n2 slot
    n2 = jnp.maximum(n2, need2x)
    return dict(
        F=F, W=W, strip_j=strip_j, strip_valid=strip_valid, eval1=eval1,
        i1g=i1g, s01g=s01g, s11g=s11g, len1=len1,
        pos2=pos2, v2=v2, fid2=fid2, j2=j2, i2=i2, s02=s02, s12=s12,
        len2=len2, jstop=jstop, seg_max=seg_max,
        n2=n2, nsurv=need1, bill1=bill1, bill2=bill2,
    )


# ---------------------------------------------------------------------------
# per-fragment MEM statistics
# ---------------------------------------------------------------------------


def _mem_stats(ph, min_len, T):
    """Per-fragment greedyExact statistics from the phase results:
    (maxl, tie_cnt, tie_j, tie_s0, tie_s1 — ties ascending j, capped T)."""
    F, W = ph["F"], ph["W"]
    strip_j, eval1 = ph["strip_j"], ph["eval1"]
    s01g, s11g, len1 = ph["s01g"], ph["s11g"], ph["len1"]
    v2, fid2, j2 = ph["v2"], ph["fid2"], ph["j2"]
    s02, s12, len2 = ph["s02"], ph["s12"], ph["len2"]
    jstop, seg_max = ph["jstop"], ph["seg_max"]

    elig1 = eval1 & (strip_j >= jstop[:, None]) & (len1 >= min_len)
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

    # phase-2 ties first (every phase-2 j is below every strip j of the
    # same fragment; compaction preserved ascending flat order)
    rank2g = jnp.cumsum(tie2.astype(jnp.int32)) - 1
    last2 = seg_max(jnp.where(tie2, rank2g, -1), fid2)
    first2 = last2 - jnp.maximum(cnt2, 1) + 1
    lr2 = rank2g - first2[fid2]
    M2 = v2.shape[0]
    dst2 = jnp.where(tie2 & (lr2 < T), fid2 * T + lr2, F * T)
    # strip ties after them (w already ascends in j)
    lr1 = jnp.cumsum(tie1.astype(jnp.int32), axis=1) - tie1.astype(jnp.int32)
    lr1 = cnt2[:, None] + lr1
    fgrid = jax.lax.broadcasted_iota(jnp.int32, (F, W), 0)
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


# ---------------------------------------------------------------------------
# public fused entry points
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15))
def fused_mem_search2(
    rec, C, seed_rec, flat_codes, frag_off, rec2, bloom_words,
    K, j0, min_len, M2, T, Ms, m=0, lb=0, W=4,
):
    """flat_codes: uint8 [P] concatenated fragment letter codes;
    frag_off: int32 [F+1] (monotone; last = true P; trailing pad fragment
    rows must repeat the end offset); bloom_words: uint32 bitmap or None.

    Static: K seed depth (>= 1; requires j0 >= K-1), j0, min_len, M2
    (remainder lane capacity), T (tie cap), Ms (strip survivor capacity),
    m/lb (bitmap window length and size exponent; 0 = unscreened), W
    (strip width).

    Returns one packed int32 array [F+1, 2+3T]: rows 0..F-1 are
    (maxl, tie_cnt, tie_j[T], tie_s0[T], tie_s1[T]) per fragment; row F
    carries (n2, n_surv) in its first two columns.  n2 > M2 or
    n_surv > Ms means a capacity overflow: retry with the reported
    capacities.
    """
    ph = _search_phases(rec, C, seed_rec, flat_codes, frag_off, K, j0, M2,
                        Ms, rec2=rec2, bloom_words=bloom_words, m=m, lb=lb,
                        W=W)
    maxl, tie_cnt, tie_j, tie_s0, tie_s1 = _mem_stats(ph, min_len, T)
    F = ph["F"]
    out = jnp.concatenate(
        [maxl[:, None], tie_cnt[:, None], tie_j, tie_s0, tie_s1], axis=1
    )
    scal = jnp.zeros((1, 2 + 3 * T), jnp.int32)
    scal = scal.at[0, 0].set(ph["n2"]).at[0, 1].set(ph["nsurv"])
    if 2 + 3 * T >= 4:  # gather-bill diagnostics (strip, phase-2)
        scal = scal.at[0, 2].set(ph["bill1"]).at[0, 3].set(ph["bill2"])
    return jnp.concatenate([out, scal], axis=0)


@partial(jax.jit, static_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15))
def fused_greedy_map(
    rec, C, seed_rec, flat_codes, frag_off, rec2, bloom_words,
    K, j0, Lmap, M2, Mout, Ms, m=0, lb=0, W=4,
):
    """Sparse maxMatches map for the Greedy engine: every evaluated end
    position j with j >= jstop(fragment) and match length >= Lmap, i.e.
    exactly the candidate set the reference's maxMatches insertion loop
    visits (reference: bwt.c:261-296 with max_matches = 0, so L never
    grows).  j0 must be Lmap - 1; the bitmap must be built for m = Lmap.

    Returns packed int32 [Mout+1, 5]: rows (fid, j, i, s0, s1), unsorted;
    last row = (n_rows, n2, n_surv, 0, 0).  Overflow on any of the three
    counts => retry with larger capacities.
    """
    ph = _search_phases(rec, C, seed_rec, flat_codes, frag_off, K, j0, M2,
                        Ms, rec2=rec2, bloom_words=bloom_words, m=m, lb=lb,
                        W=W)
    F, W_ = ph["F"], ph["W"]
    strip_j, eval1 = ph["strip_j"], ph["eval1"]
    i1g, s01g, s11g, len1 = ph["i1g"], ph["s01g"], ph["s11g"], ph["len1"]
    v2, fid2, j2 = ph["v2"], ph["fid2"], ph["j2"]
    i2, s02, s12, len2 = ph["i2"], ph["s02"], ph["s12"], ph["len2"]
    jstop = ph["jstop"]

    elig1 = (eval1 & (strip_j >= jstop[:, None]) & (len1 >= Lmap)).reshape(-1)
    elig2 = v2 & (j2 >= jstop[fid2]) & (len2 >= Lmap)
    fgrid = jax.lax.broadcasted_iota(jnp.int32, (F, W_), 0).reshape(-1)

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
