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


def _step_c(rec, rec2, C, c, st, rank_pair=None):
    """One masked backward-extension step with the character ALREADY in
    hand (c int32 [N]).  Rank backend: injected rank_pair (mesh), paired
    rec2 rows, or two unpaired rec gathers.  st = (i, si0, si1, active)."""
    i, a0, a1, act = st
    if rank_pair is not None:
        n0, n1 = rank_pair(c, a0, a1)
    elif rec2 is not None:
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
    else:
        n0 = rank_fused(rec, C, c, a0)
        n1 = rank_fused(rec, C, c, a1)
    ok = act & (n0 < n1)
    a0 = jnp.where(ok, n0, a0)
    a1 = jnp.where(ok, n1, a1)
    i = jnp.where(ok, i - 1, i)
    return i, a0, a1, ok & (i > 0)


def _step2(rec, C, flat_codes, base, st, rank_pair=None):
    """One masked backward-extension step, branch-free: two unpaired
    fused-record row gathers per lane (lax.cond branches copy their
    operands on TPU and cost more than the extra gather).
    st = (i, si0, si1, active)."""
    i, a0, a1, act = st
    cpos = jnp.where(act, base + i - 1, 0)
    c = flat_codes[cpos].astype(jnp.int32)
    return _step_c(rec, None, C, c, st, rank_pair)


def _paired_step(rec2, C, flat_codes, base, st, rank_pair=None):
    """One masked backward-extension step; ONE paired-row gather per lane
    (two when any lane's interval straddles >2 blocks — rare after the
    seed).  st = (i, si0, si1, active)."""
    i, a0, a1, act = st
    cpos = jnp.where(act, base + i - 1, 0)
    c = flat_codes[cpos].astype(jnp.int32)
    return _step_c(None, rec2, C, c, st, rank_pair)


UNROLL = 4  # FM steps per while-loop iteration: every iteration of a
# lax.while_loop pays a fixed ~1 ms of loop-state staging copies +
# cond-reduce sync on TPU (measured, see ROOFLINE.md §3b), so
# data-dependent loops take several dependent steps per trip — dead
# lanes just keep their state, and the trip count (and its overhead)
# drops 4x.


def _burn(n, step_t, st):
    """n fixed dependent steps of step_t(t, st) -> st.

    On TPU they run STRAIGHT-LINE: no loop-state staging copies, no
    cond sync (ROOFLINE.md §3b).  On XLA:CPU long inline chains
    overflow the compiler's recursive passes' C stack (deterministic
    segfault in backend_compile), so there they run as a fori_loop —
    each body is a separate HLO computation, which caps the pass
    recursion depth.  Same semantics either way."""
    import jax as _jax

    if _jax.default_backend() == "cpu":
        return jax.lax.fori_loop(0, n, step_t, st)
    for t in range(n):
        st = step_t(t, st)
    return st


def _extend_paired(rec2, C, flat_codes, base, i, s0, s1, act):
    """Backward-extend flat lanes to completion with paired-row gathers
    (used by the Greedy co-simulation's resumed extensions,
    kaiju_tpu.ops.device_index.extend_from_rec)."""

    def body(st):
        for _ in range(UNROLL):
            st = _paired_step(rec2, C, flat_codes, base, st)
        return st

    i, s0, s1, _ = jax.lax.while_loop(
        lambda st: jnp.any(st[3]), body, (i, s0, s1, act),
    )
    return i, s0, s1


# ---------------------------------------------------------------------------
# hybrid long-match machinery: direct text comparison
# ---------------------------------------------------------------------------

SW_WCAP = 8      # max SA-interval width eligible for the text switch
S1_STEPS = 12    # full-width FM burn-in steps after the K-char seed
VBASE = 1 << 30  # tie rows >= VBASE are pre-resolved id rows (see below)


def _compact_cols(mask, cap, *cols, fills=None):
    """Compact masked rows of 1-D arrays into [cap] buffers (overflow
    rows dropped).  Returns (n, compacted...)."""
    n = jnp.sum(mask, dtype=jnp.int32)
    slot = jnp.cumsum(mask, dtype=jnp.int32) - 1
    slot = jnp.where(mask & (slot < cap), slot, cap)
    out = []
    for t, v in enumerate(cols):
        fill = 0 if fills is None else fills[t]
        buf = jnp.full((cap + 1,), fill, v.dtype).at[slot].set(
            v, mode="drop"
        )[:cap]
        out.append(buf)
    return (n, *out)


def build_flatp(flat_codes):
    """Paired 256-byte query rows from the flat fragment codes:
    flatp[b] = flat[128b : 128b+256] (int8; out-of-range padded 0), the
    query-side window source for the text-compare extension."""
    P = flat_codes.shape[0]
    Pb = (P + 127) // 128
    pad = jnp.zeros((Pb * 128 - P + 128,), flat_codes.dtype)
    fp = jnp.concatenate([flat_codes, pad])
    return jnp.concatenate(
        [fp[: Pb * 128].reshape(Pb, 128), fp[128:].reshape(Pb, 128)],
        axis=1,
    ).astype(jnp.int8)


def _align_rev(R, a):
    """out[:, u] = R[:, a - u] for u in 0..127 (R: [n, 256]); lanes with
    a - u < 0 read 0.  Per-lane variable shift via 8 rounds of
    static-shift + select (a dynamic per-lane gather along lanes would
    be a slow lane-crossing op on TPU)."""
    n, W2 = R.shape
    RV = jax.lax.rev(R, (1,))
    s = (W2 - 1) - a
    for b in range(8):
        sh = 1 << b
        shifted = jnp.concatenate(
            [RV[:, sh:], jnp.zeros((n, sh), R.dtype)], axis=1
        )
        RV = jnp.where(((s >> b) & 1)[:, None] > 0, shifted, RV)
    return RV[:, :128]


def _rev_window(flatp, qg, act):
    """w[:, t] = flat[qg - 1 - t] for t in 0..127 (0 when out of range):
    ONE paired-row gather + lane-local alignment.  Preloading a lane's
    next 128 query characters turns the per-FM-step char gather (a
    descriptor-rate-bound [N]-row gather per step) into a free static
    column read: in the burn-in and completion loops every ALIVE lane
    consumes exactly one character per step, so the character at step t
    since the window was taken is w[:, t]."""
    qtb = flatp.shape[0]
    start_q = jnp.maximum(qg - 128, 0)
    bq = start_q >> 7
    Qrow = flatp[jnp.clip(jnp.where(act, bq, 0), 0, qtb - 1)]
    a_q = qg - 1 - (bq << 7)
    return _align_rev(Qrow, a_q)


def _text_extend(textp, flatp, p, qg, avail_q, act, any_fn=None,
                 text_row=None):
    """Longest u such that text[p-1-t] == flat[qg-1-t] for all t < u,
    t < avail_q, t < p, and the text char is a letter (> 0) — the
    direct-comparison equivalent of running the FM extension loop for
    one known occurrence, 128 chars per round (2 row gathers) instead
    of one char per step.  text_row(bt, cont) -> [n, 256] overrides the
    local textp row gather (mesh: owner-computed + psum)."""
    anyf = any_fn or jnp.any
    n = p.shape[0]
    ntb = textp.shape[0] if textp is not None else 1
    qtb = flatp.shape[0]

    def body(st):
        ext, cont = st
        pe = p - ext
        start_t = jnp.maximum(pe - 128, 0)
        bt = start_t >> 7
        if text_row is not None:
            Trow = text_row(bt, cont)
        else:
            Trow = textp[jnp.clip(jnp.where(cont, bt, 0), 0, ntb - 1)]
        a_t = pe - 1 - (bt << 7)
        qe = qg - ext
        start_q = jnp.maximum(qe - 128, 0)
        bq = start_q >> 7
        Qrow = flatp[jnp.clip(jnp.where(cont, bq, 0), 0, qtb - 1)]
        a_q = qe - 1 - (bq << 7)
        Ta = _align_rev(Trow, a_t)
        Qa = _align_rev(Qrow, a_q)
        eq = (Ta == Qa) & (Ta > 0)
        u = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
        limit = jnp.minimum(pe, avail_q - ext)
        eqv = eq & (u < limit[:, None]) & cont[:, None]
        run = jnp.sum(
            jnp.cumsum(jnp.where(eqv, 0, 1), axis=1) == 0,
            axis=1, dtype=jnp.int32,
        )
        ext = ext + jnp.where(cont, run, 0)
        cont = cont & (run == 128) & (ext < avail_q) & (ext < p)
        return ext, cont

    ext, _ = jax.lax.while_loop(
        lambda st: anyf(st[1]), body,
        (jnp.zeros((n,), jnp.int32), act & (avail_q > 0) & (p > 0)),
    )
    return ext


def _ladder_walk(body, state0, N, done_of, set_done, anyf,
                 burn=8, rungs=2, unroll=4):
    """Run the LF-walk `body` over a tuple of [N]-lane state arrays with
    a COMPACTING LADDER: `burn` straight-line steps at full width (each
    step resolves a lane with prob ~1/2^chpt_exp, so most lanes finish
    early), then the not-done stragglers compact to half width, burn
    again, compact again, and an unrolled while-loop finishes the tail
    at width N >> rungs.  Without this, the straggler tail (~70 steps
    for the slowest of 32k lanes at chpt_exp=3) runs at FULL width —
    the single biggest gather bill in the classify tail (ROOFLINE §3b).

    done_of(st) -> bool [n]; set_done(st, done) -> st.  Lanes that
    overflow a rung's capacity (whp none — caps are 2x the expected
    straggler count) finish in the pre-rung buffer via a fallback loop.
    Results propagate by scattering the rung's state back into the
    wider buffer at its original lane indices."""
    st = _burn(burn, lambda _t, s: body(s), state0)

    def unrolled(st):
        for _ in range(unroll):
            st = body(st)
        return st

    pend = []  # (wide_st, orig_idx_in_wide, overflow_mask)
    n = N
    for _ in range(rungs):
        cap = max(n // 2, 128)
        undone = ~done_of(st)
        slot = jnp.cumsum(undone, dtype=jnp.int32) - 1
        in_rung = undone & (slot < cap)
        slot = jnp.where(in_rung, slot, cap)

        def comp(vals, fill):
            return jnp.full((cap + 1,), fill, vals.dtype).at[slot].set(
                vals, mode="drop"
            )[:cap]

        orig = comp(
            jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0],
            jnp.int32(n),
        )
        rung_st = tuple(comp(v, 0) for v in st)
        rung_st = set_done(rung_st, comp(in_rung, False) == 0)
        pend.append((st, orig, undone & ~in_rung))
        st = _burn(burn, lambda _t, s: body(s), rung_st)
        n = cap

    st = jax.lax.while_loop(
        lambda s: anyf(~done_of(s)), unrolled, st
    )

    # scatter rung results back out, widest last; overflow lanes (whp
    # none) finish in their original buffer
    for wide_st, orig, ov in reversed(pend):
        wn = wide_st[0].shape[0]
        idx = jnp.where(orig < wn, orig, wn)
        merged = tuple(
            jnp.concatenate([w, w[:1]]).at[idx].set(r, mode="drop")[:wn]
            for w, r in zip(wide_st, st)
        )
        merged = set_done(merged, done_of(merged) | ~ov)
        st = jax.lax.while_loop(
            lambda s: anyf(~done_of(s)), unrolled, merged
        )
    return st



def _walk_pos(rec, C, sa_seq, sa_off, nseq, chpt_exp, kf, any_fn=None):
    """Batched get_suffix returning BOTH (iseq, pos)
    (reference: bwt.c:105-121); kf: int32 [N] SA positions, pads should
    be positions divisible by 2^chpt_exp."""
    anyf = any_fn or jnp.any
    check = (1 << chpt_exp) - 1
    nb1 = rec.shape[0]
    N = kf.shape[0]

    def sample(k, steps):
        idx = (k >> chpt_exp) - ((nseq - 1) >> chpt_exp) - 1
        idx = jnp.clip(idx, 0, sa_seq.shape[0] - 1)
        return sa_seq[idx], sa_off[idx] + steps

    steps = jnp.zeros(N, jnp.int32)
    done = (kf & check) == 0
    iseq, pos = sample(kf, steps)

    def body(st):
        k, steps, done, iseq, pos = st
        b = k >> 7
        row = rec[jnp.minimum(b, nb1 - 1)]
        occ_row = row[:, :32]
        words = row[:, 32:].astype(jnp.uint32)
        offw = k & 127
        wlane = jax.lax.broadcasted_iota(jnp.int32, words.shape, 1)
        shift = ((offw & 3) * 8).astype(jnp.uint32)
        c = jnp.sum(
            jnp.where(
                wlane == (offw >> 2)[:, None],
                (words >> shift[:, None]) & 255,
                0,
            ),
            axis=1, dtype=jnp.int32,
        )
        cnt = jnp.zeros(c.shape, jnp.int32)
        cu = c.astype(jnp.uint32)[:, None]
        for t in range(4):
            byt = (words >> (8 * t)) & 255
            th = ((offw - t + 3) >> 2)[:, None]
            cnt = cnt + jnp.sum(
                (byt == cu) & (wlane < th), axis=1, dtype=jnp.int32
            )
        basew = jnp.sum(
            jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, occ_row.shape, 1)
                == c[:, None],
                occ_row, 0,
            ),
            axis=1,
        )
        k_new = C[c] + basew + cnt
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

    st = _ladder_walk(
        body, (kf, steps, done, iseq, pos), N,
        done_of=lambda s: s[2],
        set_done=lambda s, d: (s[0], s[1], d, s[3], s[4]),
        anyf=anyf,
    )
    return st[3], st[4]


# ---------------------------------------------------------------------------
# seeded, two-stage extension of a sparse lane set
# ---------------------------------------------------------------------------

LADDER_FLOOR = 2048  # smallest worklist rung (legacy ladder)


def _switch_pool(hyb, start_i, s0, s1, base, act, cap_occ, any_fn=None,
                 voff=0):
    """Occurrence-compacted text-switch pool, shared by the MEM
    funnel's stage-2 finish and the Greedy last-level hybrid: lanes
    whose SA interval is <= SW_WCAP wide compact ONE SLOT PER
    OCCURRENCE, SA-walk each occurrence to its text position
    (hyb["walk_pos"]), and finish the extension by direct text
    comparison (128 chars per gather, _text_extend) instead of one FM
    step per character.  Lanes that don't fit (wide intervals / pool
    overflow) stay out (in_pool False) — capacity never affects
    correctness; want_occ is the occupancy the pool WANTED so callers
    can grow capacity.

    start_i: per-lane remaining query chars (the comparison reads
    flat[base + start_i - 1 - t]); s0/s1: SA interval.  Returns
    (in_pool, sw_i, sw_s0, sw_s1, sw_ids, want_occ); sw_s0/s1 are
    VBASE+voff-encoded virtual rows whose occurrence ids sit in SA
    order in sw_ids (LF steps are monotone, so surviving occurrences
    keep their relative order; the id list equals ids_from_SI's,
    reference: ConsumerThread.cpp:799-845)."""
    anyf = any_fn or jnp.any
    N = act.shape[0]
    width = jnp.where(act, s1 - s0, SW_WCAP + 1)
    narrow = act & (width <= SW_WCAP) & (start_i > 0)
    occ_cnt = jnp.where(narrow, width, 0)
    occ_start = jnp.cumsum(occ_cnt) - occ_cnt
    in_pool = narrow & (occ_start + occ_cnt <= cap_occ)
    total_occ = jnp.sum(jnp.where(in_pool, occ_cnt, 0))
    want_occ = jnp.sum(occ_cnt)

    # pool slot -> owning lane: occ_start is strictly increasing over
    # in_pool lanes, so marking starts + cumsum yields the lane RANK
    # per slot; lane_idx maps rank -> lane row
    srange = jax.lax.broadcasted_iota(jnp.int32, (cap_occ, 1), 0)[:, 0]
    starts = jnp.zeros((cap_occ + 1,), jnp.int32).at[
        jnp.where(in_pool, occ_start, cap_occ)
    ].add(1, mode="drop")[:cap_occ]
    seg = jnp.cumsum(starts) - 1
    n_in = jnp.sum(in_pool, dtype=jnp.int32)
    _, lane_idx = _compact_cols(
        in_pool, cap_occ,
        jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0],
        fills=(N,),
    )
    pool_lane = lane_idx[jnp.clip(seg, 0, cap_occ - 1)]
    valid_s = (srange < total_occ) & (pool_lane < N)
    pl = jnp.where(valid_s, pool_lane, 0)
    pool_off = srange - occ_start[pl]
    chpt = hyb["chpt_exp"]
    pad_k = ((hyb["nseq"] >> chpt) + 1) << chpt
    pool_k = jnp.where(valid_s, s0[pl] + pool_off, pad_k)
    iseq, pos = hyb["walk_pos"](pool_k)
    # occurrence start in the global text, then compare backwards
    p = jnp.where(
        valid_s,
        hyb["rank_start"][
            jnp.clip(iseq, 0, hyb["rank_start"].shape[0] - 1)
        ] + pos,
        0,
    )
    qg = (base + start_i)[pl]
    avail_q = start_i[pl]
    ext = _text_extend(
        hyb.get("textp"), hyb["flatp"], p, qg, avail_q, valid_s,
        any_fn=any_fn, text_row=hyb.get("text_row"),
    )
    ext = jnp.where(valid_s, ext, -1)
    maxext_seg = jax.ops.segment_max(
        ext, jnp.where(valid_s, seg, cap_occ), num_segments=cap_occ + 1
    )[:cap_occ]
    ach = valid_s & (ext == maxext_seg[jnp.clip(seg, 0, cap_occ - 1)])
    # rank within the lane's slot run (ascending slot == ascending SA
    # order) -> compact achieving ids to the segment start so
    # sw_ids[occ_start + r] enumerates them
    incl = jnp.cumsum(ach.astype(jnp.int32))
    ex = incl - ach.astype(jnp.int32)
    seg_first = occ_start[pl]
    ex0 = ex[jnp.clip(seg_first, 0, cap_occ - 1)]
    rank = ex - ex0
    dst = jnp.where(ach, seg_first + rank, cap_occ)
    sw_ids = jnp.zeros((cap_occ + 1,), jnp.int32).at[dst].set(
        jnp.where(valid_s, iseq, 0), mode="drop"
    )[:cap_occ]
    n_ach_seg = jax.ops.segment_sum(
        ach.astype(jnp.int32), jnp.where(valid_s, seg, cap_occ),
        num_segments=cap_occ + 1,
    )[:cap_occ]
    # back to lane rows: rank r belongs to lane lane_idx[r]
    rrange = jax.lax.broadcasted_iota(jnp.int32, (cap_occ, 1), 0)[:, 0]
    lane_dst = jnp.where(rrange < n_in, lane_idx, N)
    maxext_lane = jnp.zeros((N + 1,), jnp.int32).at[lane_dst].set(
        maxext_seg, mode="drop"
    )[:N]
    n_ach_lane = jnp.zeros((N + 1,), jnp.int32).at[lane_dst].set(
        n_ach_seg, mode="drop"
    )[:N]
    sw_i = start_i - jnp.maximum(maxext_lane, 0)
    sw_s0 = VBASE + voff + occ_start
    sw_s1 = sw_s0 + jnp.maximum(n_ach_lane, 1)
    return in_pool, sw_i, sw_s0, sw_s1, sw_ids, want_occ


def _staged_extend(rec, C, seed_rec, flat_codes, frag_off, kid,
                   lane_fid, lane_j, act, K, cap0,
                   rank_pair=None, any_fn=None, count_fn=None, rec2=None,
                   hyb=None, flatp=None):
    """Evaluate the maximal backward extension ending at each active lane.

    kid: PER-LANE K-mer id [N]; lane_fid/lane_j: fragment id and local
    end position per lane; act: lanes to evaluate.  Two stages:

      burn-in  lanes compact into a [cap0] buffer, seed from the K-mer
               table, then take S1_STEPS fixed FM steps at full width —
               deep enough (K + S1_STEPS chars) that random-text lanes
               are dead and survivors are true long matches.
      finish   survivors compact into a [cap0 // 2] buffer.  Without
               `hyb`, they FM-step to completion at the compacted
               width.  With `hyb` (single-chip fused programs), lanes
               whose SA interval is <= SW_WCAP wide switch to DIRECT
               TEXT COMPARISON: one SA walk per occurrence resolves a
               text position, then 128 characters compare per row
               gather (_text_extend) instead of one per FM step —
               long matches cost ~3 sequential rounds instead of
               hundreds.  Wide-interval lanes stay on the FM loop.

    Returns (i, s0, s1) per input lane — inactive lanes get
    (lane_j + 1, 0, 0), i.e. a length-0 result — plus `need` (a
    capacity that would have sufficed; > cap0 means retry bigger),
    `bill` (diagnostic gather-step bill) and `sw_ids` (with hyb: the
    [cap0 // 2, SW_WCAP] pre-resolved sequence indices backing
    VBASE-encoded virtual result rows, else None).

    Virtual rows: a switched lane's result interval is
    (VBASE + (voff + row) * SW_WCAP, same + n_occurrences) — not SA
    positions, but an index into sw_ids where the FINAL interval's
    sequence indices already sit in SA order (LF steps are monotone, so
    surviving occurrences keep their relative order; the id list equals
    ids_from_SI's, reference: ConsumerThread.cpp:799-845).
    """
    anyf = any_fn or jnp.any
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

    def fm_step(st, base):
        if rank_pair is None and rec2 is not None:
            return _paired_step(rec2, C, flat_codes, base, st)
        return _step2(rec, C, flat_codes, base, st, rank_pair)

    step_rec = rec if rank_pair is not None or rec2 is None else None
    if flatp is None:
        flatp = build_flatp(flat_codes)

    # ---- stage 1: fixed-trip burn-in at full width, straight-line on
    # TPU (see _burn) with a PRELOADED character window: a while loop
    # would pay ~1 ms/iteration of loop-state staging copies + a
    # cond-reduce sync (ROOFLINE.md §3b), and a per-step char gather
    # would pay one more descriptor-rate-bound [cap0]-row gather per
    # step.  Alive lanes consume exactly one character per step, so
    # w1[:, t] IS the step-t character; dead lanes read garbage columns
    # but are masked. --------------------------------------------------
    w1 = _rev_window(flatp, cbase + ci, cact).astype(jnp.int32)

    def s1_step(t, st):
        c = jax.lax.dynamic_slice_in_dim(w1, t, 1, axis=1)[:, 0]
        return _step_c(step_rec, rec2, C, c, st, rank_pair)

    ci, cs0, cs1, alive = _burn(
        S1_STEPS, s1_step, (ci, cs0, cs1, alive)
    )
    bill = jnp.int32(S1_STEPS) * cap0
    res_i = scatter(res_i, corig, ci, cact)
    res_s0 = scatter(res_s0, corig, cs0, cact)
    res_s1 = scatter(res_s1, corig, cs1, cact)

    # ---- stage 2: compact survivors, finish --------------------------
    cap_sw = max(cap0 // 2, 128)
    n_alive1 = jnp.sum(alive, dtype=jnp.int32)
    need = jnp.maximum(n_act, 2 * n_alive1)
    slot2 = jnp.cumsum(alive, dtype=jnp.int32) - 1
    slot2 = jnp.where(alive & (slot2 < cap_sw), slot2, cap_sw)

    def comp2(vals, fill):
        out = jnp.full((cap_sw + 1,), fill, dtype=vals.dtype)
        return out.at[slot2].set(vals, mode="drop")[:cap_sw]

    ci2 = comp2(ci, jnp.int32(0))
    cs02 = comp2(cs0, jnp.int32(0))
    cs12 = comp2(cs1, jnp.int32(0))
    cbase2 = comp2(cbase, jnp.int32(0))
    corig2 = comp2(corig, jnp.int32(N))
    alive2 = comp2(alive, False)
    sw_ids = None

    if hyb is None:
        fm_lanes = alive2
    else:
        # occurrence-compacted switch pool (shared helper; widths are
        # mostly 1-2 after the burn-in depth, so the pool is
        # ~n_survivors wide, not cap * SW_WCAP).  Lanes that don't fit
        # (wide intervals / pool overflow) gracefully stay on the FM
        # completion loop — capacity never affects correctness; the
        # reported `need` grows cap0 until the pool fits.
        in_pool, sw_i, sw_s0, sw_s1, sw_ids, want_occ = _switch_pool(
            hyb, ci2, cs02, cs12, cbase2, alive2, cap_sw,
            any_fn=any_fn, voff=hyb.get("voff", 0),
        )
        fm_lanes = alive2 & ~in_pool
        need = jnp.maximum(need, 2 * want_occ)
        res_i = scatter(res_i, corig2, sw_i, in_pool)
        res_s0 = scatter(res_s0, corig2, sw_s0, in_pool)
        res_s1 = scatter(res_s1, corig2, sw_s1, in_pool)

    # FM completion for the remaining (wide-interval / non-hyb) lanes;
    # UNROLL dependent steps per trip amortize the loop overhead, and a
    # preloaded 128-char window replaces the per-step char gather
    # (dynamic column reads; the window covers 128 steps — the rare
    # lane still alive past that falls through to the char-gather loop)
    w2 = _rev_window(flatp, cbase2 + ci2, alive2).astype(jnp.int32)

    def s2_cond(st):
        tc, b, inner = st
        return (tc < 128) & anyf(inner[3])

    def s2_body(st):
        tc, b, inner = st
        for u in range(UNROLL):
            c = jax.lax.dynamic_slice_in_dim(w2, tc + u, 1, axis=1)[:, 0]
            inner = _step_c(step_rec, rec2, C, c, inner, rank_pair)
        return tc + UNROLL, b + UNROLL * cap_sw, inner

    _, bill, (fi, fs0, fs1, falive) = jax.lax.while_loop(
        s2_cond, s2_body,
        (jnp.int32(0), bill, (ci2, cs02, cs12, fm_lanes)),
    )

    def s3_body(st):
        b, inner = st
        for _ in range(UNROLL):
            inner = fm_step(inner, cbase2)
        return b + UNROLL * cap_sw, inner

    bill, (fi, fs0, fs1, _) = jax.lax.while_loop(
        lambda st: anyf(st[1][3]), s3_body,
        (bill, (fi, fs0, fs1, falive)),
    )
    res_i = scatter(res_i, corig2, fi, fm_lanes)
    res_s0 = scatter(res_s0, corig2, fs0, fm_lanes)
    res_s1 = scatter(res_s1, corig2, fs1, fm_lanes)

    return res_i, res_s0, res_s1, need, bill, sw_ids


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
                   rank_pair=None, any_fn=None, count_fn=None, hyb=None):
    """Screen + strip + remainder over the flat fragment layout.

    bloom_words/m/lb: the m-mer presence bitmap (None/0 = no screening —
    every usable position is evaluated; same results, more work).
    hyb: text-comparison hybrid arrays (see _staged_extend) or None.
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
    flatp = build_flatp(flat_codes)  # query-side 256-char rows, shared
    # by the extension windows and the hybrid text comparison

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
    hyb1 = dict(hyb, voff=0) if hyb is not None else None
    i1, s01, s11, need1, bill1, sw1 = _staged_extend(
        rec, C, seed_rec, flat_codes,
        frag_off, kid1, fgrid.reshape(-1), strip_j.reshape(-1), act1,
        K, Ms, rank_pair=rank_pair, any_fn=any_fn, count_fn=count_fn,
        rec2=rec2, hyb=hyb1, flatp=flatp,
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
    # ladder starts, so none of it crosses a loop boundary).  The
    # per-position fragment attributes (start, end, resolved) come from
    # scatter-at-starts + cummax fills, NOT frag_off[fid]-style gathers:
    # a [P]-row gather is descriptor-rate bound (~70 ms at P = 8M),
    # while a scan is bandwidth-bound (ROOFLINE.md §1) -----------------
    parange = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
    bumps = jnp.zeros((P + 1,), jnp.int32).at[frag_off[1:F]].add(1)[:P]
    fid = jnp.cumsum(bumps)
    fid = jnp.clip(fid, 0, F - 1)
    starts_v = frag_off[:F]

    def start_fill(vals):
        # vals[f] at position frag_off[f], forward-filled; vals must be
        # non-decreasing in f.  Ties (empty fragments share their start
        # with the next fragment) resolve to the LAST fragment at that
        # start — the owner of the positions that follow.
        arr = jnp.zeros((P,), jnp.int32).at[starts_v].max(
            vals, mode="drop"
        )
        return jax.lax.cummax(arr)

    fstart = start_fill(starts_v)
    fend = start_fill(frag_off[1 : F + 1])
    flen_p = fend - fstart
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
    # (per-position resolved bit via a tagged cummax fill, same reason)
    f_iota = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)[:, 0]
    resolved_p = (
        start_fill(f_iota * 2 + resolved.astype(jnp.int32)) & 1
    ) > 0
    need2_mask = screened & ~resolved_p & (j_local < flen_p - W)
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
    hyb2 = (
        dict(hyb, voff=max(Ms // 2, 128)) if hyb is not None else None
    )
    i2, s02, s12, need2x, bill2, sw2 = _staged_extend(
        rec, C, seed_rec, flat_codes,
        frag_off, kid2, fid2, j2, v2, K, M2,
        rank_pair=rank_pair, any_fn=any_fn, count_fn=count_fn,
        rec2=rec2, hyb=hyb2, flatp=flatp,
    )
    sw_ids = (
        jnp.concatenate([sw1, sw2], axis=0) if hyb is not None else None
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
        n2=n2, nsurv=need1, bill1=bill1, bill2=bill2, sw_ids=sw_ids,
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
