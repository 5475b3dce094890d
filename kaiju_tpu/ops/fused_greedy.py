"""End-to-end fused Greedy classification: one device program per batch.

The reference Greedy classifier is a per-read best-first branch-and-bound
search (reference: ConsumerThread.cpp:424-541).  This program runs the
whole batch level-synchronously on device:

  level 0   the sparse maxMatches candidate map of every fragment
            (shared _search_phases funnel), the inserted-node rule of
            bwt.c:225-252, per-node eval scores, per-read running best
  level k   the exact substitution fan-out of ConsumerThread.cpp:346-395
            from the level-(k-1) frontier, pruned by the read's CURRENT
            best (a lagging bound: always <= the reference's bound at the
            corresponding push, so the explored set is a superset of the
            reference's, and extra evals score below their upper bound —
            the final per-read best is EXACT; argument in
            kaiju_tpu/engine/greedy_fast.py's module docstring)
  ties      every eval event scoring == the read's final best is a tie;
            tie sets match the reference exactly whenever the per-read
            count fits max_matches_SI (over-cap reads are flagged for the
            host replay), because any eval at the final best has queue
            key >= best at every pop and is therefore processed by the
            reference too
  tail      SA resolution + capped unique-id semantics + LCA via the
            shared ranges_lca (kaiju_tpu.ops.fused_classify)

The host applies the E-value gate and replays flagged reads through the
exact host machinery (kaiju_tpu.engine.greedy_fast).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .device_index import rank_row
from .fused_classify import _sa_walk_local, ranges_lca
from .fused_mem2 import (
    S1_STEPS,
    UNROLL,
    _search_phases,
    _switch_pool,
    _walk_pos,
    build_flatp,
)

FLAG_TIE_OVER = 1   # more ties than max_matches_SI -> host replay
FLAG_NEED_MORE = 2  # SA position budget R exhausted before the id cap

BIG = jnp.int32(0x3FFFFFFF)


def _seg_suffix_min_excl(vals, seg_id):
    """Exclusive suffix-min of vals within equal-seg_id runs (ascending
    buffer order; the suffix direction is DESCENDING j)."""
    n = vals.shape[0]
    incl = vals
    off = 1
    while off < n:
        shifted = jnp.concatenate([incl[off:], jnp.full((off,), BIG)])
        same = jnp.concatenate(
            [seg_id[off:] == seg_id[:-off], jnp.zeros((off,), bool)]
        )
        incl = jnp.minimum(incl, jnp.where(same, shifted, BIG))
        off <<= 1
    excl = jnp.concatenate([incl[1:], jnp.full((1,), BIG)])
    last = jnp.concatenate([seg_id[1:] != seg_id[:-1], jnp.ones((1,), bool)])
    return jnp.where(last, BIG, excl)


def _paired_rank2(rec2, C, c, a0, a1, act):
    """(rank(c, a0), rank(c, a1)) with ONE paired-row gather per lane when
    the interval spans <= 2 blocks (the common case), plus one extra
    masked gather pass only when some lane is wider."""
    nb = rec2.shape[0]
    b0 = jnp.minimum(jnp.where(act, a0, 0) >> 7, nb - 1)
    wide = act & ((a1 >> 7) > b0 + 1)

    def narrow(_):
        pair = rec2[b0]
        n0 = rank_row(pair[:, :64], C, c, a0)
        n1 = jnp.where(
            (a1 >> 7) == b0,
            rank_row(pair[:, :64], C, c, a1),
            rank_row(pair[:, 64:], C, c, a1),
        )
        return n0, n1

    def mixed(_):
        pair = rec2[b0]
        n0 = rank_row(pair[:, :64], C, c, a0)
        r1 = rec2[jnp.minimum(jnp.where(act, a1, 0) >> 7, nb - 1)]
        n1 = rank_row(r1[:, :64], C, c, a1)
        n1 = jnp.where(
            ~wide & ((a1 >> 7) == b0), rank_row(pair[:, :64], C, c, a1), n1
        )
        return n0, n1

    return jax.lax.cond(jnp.any(wide), mixed, narrow, None)


def _extend_two_stage(rank_pair2, flat_codes, base, pos, subcode,
                      start_i, s0, s1, act, cap2, any_fn=None,
                      flatp=None):
    """Two-stage resumed extension (maxMatches_withStart semantics,
    reference: bwt.c:298-336): S1_STEPS fixed FM steps at full width kill
    the spurious variants, then the true long matches compact into a
    [cap2] buffer and run to completion at a fraction of the width — the
    run-to-completion tail at full fan-out width was the dominant cost
    of the variant levels.  Returns (i, s0, s1, n_surv); n_surv > cap2
    means the compaction overflowed (caller retries bigger).

    With `flatp`, each stage preloads its lanes' next 128 query chars
    as a window (one row gather) instead of one char gather per step —
    alive lanes consume exactly one char per step, so the step-t char
    is window column t (see fused_mem2._rev_window)."""
    from .fused_mem2 import _rev_window

    anyf = any_fn or jnp.any
    N = act.shape[0]

    def stepc(st, c_raw, pos_, sub_):
        i, a0, a1, alive = st
        x = i - 1
        c = jnp.where(x == pos_, sub_, c_raw)
        n0, n1 = rank_pair2(c, a0, a1, alive)
        ok = alive & (n0 < n1)
        a0 = jnp.where(ok, n0, a0)
        a1 = jnp.where(ok, n1, a1)
        i = jnp.where(ok, i - 1, i)
        return i, a0, a1, ok & (i > 0)

    def step(st, base_, pos_, sub_):
        i, a0, a1, alive = st
        cpos = jnp.where(alive, base_ + i - 1, 0)
        return stepc(st, flat_codes[cpos].astype(jnp.int32), pos_, sub_)

    act = act & (start_i > 0)
    w1 = _rev_window(flatp, base + start_i, act).astype(jnp.int32)

    # fixed-trip burn-in, UNROLL steps per trip: fewer loop-state
    # staging copies than step-per-trip, but the early exit survives —
    # when a read's best already prunes the whole fan-out (common on
    # family-copy text) the burn-in costs one cond-check, not 12 steps
    def s1_cond(st):
        t, inner = st
        return (t < S1_STEPS) & anyf(inner[3])

    def s1_body(st):
        t, inner = st
        for u in range(UNROLL):
            c = jax.lax.dynamic_slice_in_dim(w1, t + u, 1, axis=1)[:, 0]
            inner = stepc(inner, c, pos, subcode)
        return t + UNROLL, inner

    _, (i, a0, a1, alive) = jax.lax.while_loop(
        s1_cond, s1_body, (jnp.int32(0), (start_i, s0, s1, act))
    )

    n_surv = jnp.sum(alive, dtype=jnp.int32)
    slot = jnp.cumsum(alive, dtype=jnp.int32) - 1
    slot = jnp.where(alive & (slot < cap2), slot, cap2)

    def comp(vals, fill):
        out = jnp.full((cap2 + 1,), fill, dtype=vals.dtype)
        return out.at[slot].set(vals, mode="drop")[:cap2]

    ci = comp(i, jnp.int32(0))
    ca0 = comp(a0, jnp.int32(0))
    ca1 = comp(a1, jnp.int32(0))
    cb = comp(base, jnp.int32(0))
    cp = comp(pos, jnp.int32(-2))
    csub = comp(subcode, jnp.int32(0))
    corig = comp(
        jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)[:, 0], jnp.int32(N)
    )
    calive = comp(alive, False)

    # windowed completion (128 steps), then a char-gather loop for the
    # rare straggler still alive past the window
    w2 = _rev_window(flatp, cb + ci, calive).astype(jnp.int32)

    def s2_cond(st):
        tc, inner = st
        return (tc < 128) & anyf(inner[3])

    def s2_body(st):
        tc, inner = st
        for u in range(UNROLL):
            c = jax.lax.dynamic_slice_in_dim(w2, tc + u, 1, axis=1)[:, 0]
            inner = stepc(inner, c, cp, csub)
        return tc + UNROLL, inner

    _, (fi, f0, f1, fal) = jax.lax.while_loop(
        s2_cond, s2_body, (jnp.int32(0), (ci, ca0, ca1, calive))
    )

    def s3_body(st):
        for _ in range(UNROLL):
            st = step(st, cb, cp, csub)
        return st

    fi, f0, f1, _ = jax.lax.while_loop(
        lambda st: anyf(st[3]), s3_body, (fi, f0, f1, fal)
    )

    def scatter(res, vals):
        idx = jnp.where(calive, corig, N)
        return jnp.concatenate([res, res[:1]]).at[idx].set(
            vals, mode="drop"
        )[:N]

    return scatter(i, fi), scatter(a0, f0), scatter(a1, f1), n_surv


def _compact(mask, cap, *cols, fills=None):
    """Compact masked rows of equal-length 1-D arrays into [cap] buffers.
    Returns (n, compacted...); n may exceed cap (caller retries bigger)."""
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


@partial(jax.jit, static_argnums=tuple(range(19, 40)))
def fused_greedy_classify(
    # device index + tables
    rec, C, rec2, seed_rec, bloom_words,
    sa_seq, sa_off, seq_tax, parent, depth,
    textp, rank_start,
    # batch
    flat_codes, frag_off, frag_rid,
    # scoring tables
    diag_tab, submat, subcode_tab, subdiag_tab,
    # static config
    B, K, j0, Lmap, mfl, min_score, mismatches,
    M2, Ms, Mn, Mv, Mt, Mh, T, R, cap, nseq, chpt_exp, m=0, lb=0, W=4,
):
    """flat_codes uint8 [P]; frag_off int32 [F+1] (monotone, trailing pad
    rows repeat the end offset); frag_rid int32 [F] (read id per fragment
    instance, pad rows = B).

    diag_tab int32 [32]: BLOSUM62 diagonal per letter code (0 for
    non-letters); submat / subcode_tab / subdiag_tab int32 [32, 19]: per
    ORIGINAL letter code, the 19 substitutions in the reference's
    descending-score order — B62[orig, sub], sub letter code, diag[sub].

    Static: B reads; K seed depth; j0 = Lmap-1; Lmap = min(seed_length,
    mfl); mfl = min_fragment_length; mismatches; capacities M2/Ms
    (search funnel), Mn (level-0 nodes), Mv (variants per level), Mt
    (tie rows); T = max_matches_SI; R = SA position budget; cap =
    max_match_ids.

    Returns int32 [B+1, 8]: per read (lca, best, flags, n_ids, 0, 0, 0, 0);
    last row = (n2, n_surv, n_nodes, max n_variants, n_ties, 0, 0, 0) for
    the capacity-retry loop.
    """

    def rank_pair2(c, a0, a1, act):
        return _paired_rank2(rec2, C, c, a0, a1, act)

    def walk_fn(kf):
        return _sa_walk_local(rec, C, sa_seq, sa_off, nseq, chpt_exp, kf)

    def search_fn(M2_, Ms_):
        return _search_phases(rec, C, seed_rec, flat_codes, frag_off, K,
                              j0, M2_, Ms_, rec2=rec2,
                              bloom_words=bloom_words, m=m, lb=lb, W=W)

    hyb = None
    if textp is not None:
        hyb = dict(
            textp=textp, rank_start=rank_start,
            flatp=build_flatp(flat_codes),
            nseq=nseq, chpt_exp=chpt_exp,
            walk_pos=lambda kf: _walk_pos(
                rec, C, sa_seq, sa_off, nseq, chpt_exp, kf
            ),
        )

    return greedy_core(
        search_fn, rank_pair2, walk_fn, None,
        seq_tax, parent, depth, flat_codes, frag_off, frag_rid,
        diag_tab, submat, subcode_tab, subdiag_tab,
        B, Lmap, mfl, min_score, mismatches,
        M2, Ms, Mn, Mv, Mt, Mh, T, R, cap, nseq, chpt_exp, hyb=hyb,
    )


def greedy_core(
    search_fn, rank_pair2, walk_fn, any_fn,
    seq_tax, parent, depth, flat_codes, frag_off, frag_rid,
    diag_tab, submat, subcode_tab, subdiag_tab,
    B, Lmap, mfl, min_score, mismatches,
    M2, Ms, Mn, Mv, Mt, Mh, T, R, cap, nseq, chpt_exp, hyb=None,
):
    """The fused Greedy program over injected index primitives:
    search_fn(M2, Ms) -> _search_phases dict; rank_pair2(c, a0, a1,
    act) -> (n0, n1); walk_fn(kf) -> sequence index per SA position;
    any_fn for lockstep while-loop conditions (psum over the index axis
    of a mesh, plain jnp.any on one chip); hyb: text-comparison arrays
    + a (iseq, pos) walk closure for the last-level hybrid finish
    (None on the mesh path)."""
    F = frag_off.shape[0] - 1
    sw3 = None
    want3 = jnp.int32(0)
    flatp_g = build_flatp(flat_codes)  # query windows for the resumed
    # extensions (deduped with the search funnel's copy by XLA CSE)

    # ---- per-position diag-score prefix sums (calcScore via prefix
    # sums; reference: ConsumerThread.cpp:397-404) ----------------------
    diag_flat = diag_tab[flat_codes.astype(jnp.int32)]
    prefflat = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(diag_flat, dtype=jnp.int32)]
    )

    def pref(fid, x):
        off = frag_off[jnp.minimum(fid, F)]
        return prefflat[off + x] - prefflat[off]

    # ---- level-0 search funnel ----------------------------------------
    ph = search_fn(M2, Ms)
    strip_j, eval1 = ph["strip_j"], ph["eval1"]      # [F, W]
    W = strip_j.shape[1]
    i1g, s01g, s11g, len1 = ph["i1g"], ph["s01g"], ph["s11g"], ph["len1"]
    v2, fid2, j2 = ph["v2"], ph["fid2"], ph["j2"]    # [M2]
    i2, s02, s12, len2 = ph["i2"], ph["s02"], ph["s12"], ph["len2"]
    jstop = ph["jstop"]

    elig1 = eval1 & (strip_j >= jstop[:, None]) & (len1 >= Lmap)
    elig2 = v2 & (j2 >= jstop[fid2]) & (len2 >= Lmap)

    # ---- inserted-node rule (reference: bwt.c:225-252 via
    # greedy_fast._max_matches): scanning j DESCENDING, a candidate is
    # inserted iff its match start i is < every higher-j candidate's i --
    iv1 = jnp.where(elig1, i1g, BIG)
    excl1_cols = []
    run = jnp.full((F,), BIG, jnp.int32)
    for w in range(W - 1, -1, -1):  # strip_j ascends in w
        excl1_cols.append(run)
        run = jnp.minimum(run, iv1[:, w])
    excl1 = jnp.stack(excl1_cols[::-1], axis=1)  # [F, W]
    ins1 = elig1 & (i1g < excl1)
    strip_min = run

    iv2 = jnp.where(elig2, i2, BIG)
    excl2 = _seg_suffix_min_excl(iv2, jnp.where(v2, fid2, -1))
    excl2 = jnp.minimum(excl2, strip_min[fid2])
    ins2 = elig2 & (i2 < excl2)

    # ---- compact nodes into one buffer --------------------------------
    node_mask = jnp.concatenate([ins1.reshape(-1), ins2])
    fgrid = jax.lax.broadcasted_iota(jnp.int32, (F, W), 0).reshape(-1)
    n_nodes, nd_on_i, nd_fid, nd_qi, nd_j, nd_s0, nd_s1 = _compact(
        node_mask, Mn,
        node_mask.astype(jnp.int32),
        jnp.concatenate([fgrid, fid2]),
        jnp.concatenate([i1g.reshape(-1), i2]),
        jnp.concatenate([strip_j.reshape(-1), j2]),
        jnp.concatenate([s01g.reshape(-1), s02]),
        jnp.concatenate([s11g.reshape(-1), s12]),
    )
    nd_on = nd_on_i > 0
    nd_ql = jnp.where(nd_on, nd_j - nd_qi + 1, 0)
    frag_rid_p = jnp.concatenate([frag_rid, jnp.full((1,), B, jnp.int32)])
    nd_rid = jnp.where(nd_on, frag_rid_p[jnp.minimum(nd_fid, F)], B)
    nd_effL = jnp.where(nd_on, nd_qi + nd_ql, 1)  # right-anchored spans

    # ---- level-0 eval + per-read best (eval_match_scores over all
    # inserted nodes with ql >= mfl; reference: ConsumerThread.cpp:751) --
    nd_score = jnp.clip(pref(nd_fid, nd_effL) - pref(nd_fid, nd_qi), 0, None)
    nd_eval = nd_on & (nd_ql >= mfl) & (nd_score >= min_score)
    best = jax.ops.segment_max(
        jnp.where(nd_eval, nd_score, 0), nd_rid, num_segments=B + 1,
    )[:B]
    best = jnp.maximum(best, 0)

    # ---- planned-node rule (walk_group_heads: length groups descending
    # up to AND INCLUDING the first multi-member group; reference:
    # ConsumerThread.cpp:477) --------------------------------------------
    QLCAP = 512
    gkey = jnp.where(nd_on, nd_fid * QLCAP + jnp.minimum(nd_ql, QLCAP - 1),
                     BIG)
    # multi-member (fid, ql) groups via sort + adjacent-equal instead of
    # a dense [F * QLCAP] segment buffer (which would be ~0.5 GB at
    # production batch sizes): rows sharing a key sort adjacent
    mt_rows = gkey.shape[0]
    sk, si = jax.lax.sort(
        (gkey, jax.lax.broadcasted_iota(jnp.int32, (mt_rows, 1), 0)[:, 0]),
        num_keys=1,
    )
    eq_prev = jnp.concatenate(
        [jnp.zeros((1,), bool), sk[1:] == sk[:-1]]
    )
    eq_next = jnp.concatenate(
        [sk[:-1] == sk[1:], jnp.zeros((1,), bool)]
    )
    dup_sorted = (eq_prev | eq_next) & (sk < BIG)
    multi = jnp.zeros((mt_rows,), bool).at[si].set(dup_sorted)
    multi = nd_on & multi
    ql_t = jax.ops.segment_max(
        jnp.where(multi, nd_ql, -1), jnp.where(nd_on, nd_fid, F),
        num_segments=F + 1,
    )[:F]
    nd_planned = nd_on & (
        nd_ql >= jnp.maximum(ql_t, -1)[jnp.minimum(nd_fid, F - 1)]
    )

    # ---- variant levels -------------------------------------------------
    tie_srcs = [(nd_rid, nd_s0, nd_s1, nd_eval, nd_score)]
    max_nv = jnp.int32(0)

    fr = dict(
        on=nd_planned, fid=nd_fid, rid=nd_rid, qi=nd_qi,
        effL=nd_effL, s0=nd_s0, s1=nd_s1,
        delta=jnp.zeros((Mn,), jnp.int32), diffc=jnp.zeros((Mn,), jnp.int32),
        matchlen=nd_ql, num_mm=jnp.zeros((Mn,), jnp.int32),
    )
    Msrc = Mn
    for level in range(1, mismatches + 1):
        # substitution fan-out at qi-1, descending BLOSUM order, pruned
        # at max(read best, min_score) (reference: ConsumerThread.cpp:
        # 346-395; descending order makes break == filter)
        el = fr["on"] & (fr["qi"] > 0) & (fr["effL"] >= mfl)
        origc = flat_codes[
            jnp.where(
                el, frag_off[jnp.minimum(fr["fid"], F)] + fr["qi"] - 1, 0
            )
        ].astype(jnp.int32)
        whole = jnp.clip(
            pref(fr["fid"], fr["effL"]) + fr["delta"] + fr["diffc"], 0, None
        )
        basev = whole - diag_tab[origc]
        sa_m = basev[:, None] + submat[origc]  # [Msrc, 19]
        thr = jnp.maximum(
            best[jnp.minimum(jnp.where(el, fr["rid"], 0), B - 1)], min_score
        )
        keep = el[:, None] & (sa_m >= thr[:, None])
        srows = jax.lax.broadcasted_iota(jnp.int32, (Msrc, 19), 0)
        scols = jax.lax.broadcasted_iota(jnp.int32, (Msrc, 19), 1)

        n_v, v_onz, v_row, v_col = _compact(
            keep.reshape(-1), Mv,
            keep.reshape(-1).astype(jnp.int32),
            srows.reshape(-1), scols.reshape(-1),
        )
        max_nv = jnp.maximum(max_nv, n_v)
        v_on = v_onz > 0
        v_row = jnp.minimum(v_row, Msrc - 1)

        def g(a):
            return a[v_row]

        v_fid = g(fr["fid"])
        v_rid = jnp.where(v_on, g(fr["rid"]), B)
        v_qi = g(fr["qi"])
        v_effL = jnp.where(v_on, g(fr["effL"]), 1)
        v_oc = g(origc)
        v_code = subcode_tab[v_oc, v_col]
        v_subscore = submat[v_oc, v_col]
        v_subdiag = subdiag_tab[v_oc, v_col]
        v_diffc = g(fr["diffc"]) + v_subscore - v_subdiag
        v_delta = g(fr["delta"]) + v_subdiag - diag_tab[v_oc]
        v_matchlen = jnp.where(v_on, g(fr["matchlen"]) + 1, 1)
        v_nm = g(fr["num_mm"]) + 1

        # UpdateSI probe (reference: bwt.c:160-173)
        n0, n1 = rank_pair2(
            jnp.where(v_on, v_code, 0),
            jnp.where(v_on, g(fr["s0"]), 0),
            jnp.where(v_on, g(fr["s1"]), 0), v_on,
        )
        p_ok = v_on & (n0 < n1)

        # resumed extension (maxMatches_withStart, bwt.c:298-336)
        start_i = jnp.where(p_ok, v_effL - v_matchlen, 0)
        cap2 = max(Mv // 4, 2048)
        v_base = frag_off[jnp.minimum(v_fid, F)]
        fm_act = p_ok
        if level == mismatches and hyb is not None:
            # the last level's intervals feed only the tie rows, so
            # narrow lanes can finish by direct text comparison and
            # return pre-resolved virtual id rows; pool capacity Mh has
            # its own retry channel (output col 5)
            in_pool, sw_i, sw_s0, sw_s1, sw3, want3 = _switch_pool(
                hyb, start_i, n0, n1, v_base, p_ok, Mh, any_fn=any_fn
            )
            fm_act = p_ok & ~in_pool
        i_res, r0, r1, n_surv_v = _extend_two_stage(
            rank_pair2, flat_codes, v_base,
            v_qi - 1, v_code, start_i, n0, n1, fm_act, cap2, any_fn=any_fn,
            flatp=flatp_g,
        )
        if level == mismatches and hyb is not None:
            i_res = jnp.where(in_pool, sw_i, i_res)
            r0 = jnp.where(in_pool, sw_s0, r0)
            r1 = jnp.where(in_pool, sw_s1, r1)
        # fold stage-2 overflow into the Mv retry channel: growing Mv
        # past 4 * n_surv_v grows cap2 past the survivor count
        max_nv = jnp.maximum(
            max_nv, jnp.where(n_surv_v > cap2, 4 * n_surv_v, 0)
        )
        i_res = jnp.where(p_ok, i_res, 1)
        ml = v_effL - i_res
        L_req = jnp.where(v_nm == mismatches, mfl, v_matchlen)
        has_si = p_ok & (ml >= L_req)
        score = jnp.clip(
            pref(v_fid, v_effL) - pref(v_fid, i_res) + v_delta + v_diffc,
            0, None,
        )
        e_ok = has_si & (ml >= mfl) & (score >= min_score)
        lv_best = jax.ops.segment_max(
            jnp.where(e_ok, score, 0), v_rid, num_segments=B + 1,
        )[:B]
        best = jnp.maximum(best, jnp.maximum(lv_best, 0))
        tie_srcs.append((v_rid, r0, r1, e_ok, score))

        if level == mismatches:
            break
        fr = dict(
            on=has_si, fid=v_fid, rid=v_rid, qi=i_res, effL=v_effL,
            s0=r0, s1=r1, delta=v_delta, diffc=v_diffc,
            matchlen=jnp.where(has_si, ml, 1), num_mm=v_nm,
        )
        Msrc = Mv

    # ---- tie rows: every eval event at the read's FINAL best ----------
    best_p = jnp.concatenate([best, jnp.zeros((1,), jnp.int32)])
    t_rid = jnp.concatenate([s[0] for s in tie_srcs])
    t_s0 = jnp.concatenate([s[1] for s in tie_srcs])
    t_s1 = jnp.concatenate([s[2] for s in tie_srcs])
    t_tie = jnp.concatenate([
        s[3] & (s[4] == best_p[jnp.minimum(s[0], B)]) & (s[4] > 0)
        for s in tie_srcs
    ])
    n_ties, c_on, c_rid, c_s0, c_s1 = _compact(
        t_tie, Mt, t_tie.astype(jnp.int32), t_rid, t_s0, t_s1,
        fills=(0, B, 0, 0),
    )
    # stable sort by read id; order within a read is arbitrary, which is
    # output-invisible whenever the count fits max_matches_SI (over-cap
    # reads are flagged below)
    c_rid, c_s0, c_s1 = jax.lax.sort(
        (c_rid, c_s0, c_s1), num_keys=1, is_stable=True
    )
    mt_idx = jax.lax.broadcasted_iota(jnp.int32, (Mt, 1), 0)[:, 0]
    first_idx = jax.ops.segment_min(
        jnp.where(c_rid < B, mt_idx, BIG), jnp.minimum(c_rid, B),
        num_segments=B + 1,
    )[:B]
    rank = mt_idx - first_idx[jnp.minimum(c_rid, B - 1)]
    tie_cnt = jax.ops.segment_sum(
        (c_rid < B).astype(jnp.int32), jnp.minimum(c_rid, B),
        num_segments=B + 1,
    )[:B]
    keep_t = (c_rid < B) & (rank < T)
    dst = jnp.where(keep_t, c_rid * T + rank, B * T)
    g_s0 = jnp.zeros((B * T + 1,), jnp.int32).at[dst].set(
        c_s0, mode="drop"
    )[:-1].reshape(B, T)
    g_s1 = jnp.zeros((B * T + 1,), jnp.int32).at[dst].set(
        c_s1, mode="drop"
    )[:-1].reshape(B, T)
    contrib = g_s1 > g_s0

    # ---- SA resolution + capped ids + LCA (shared tail) ----------------
    lca, n_ids, need_more, _total = ranges_lca(
        g_s0, g_s1, contrib, walk_fn, seq_tax, parent, depth, R, cap,
        nseq, chpt_exp, any_fn=any_fn, sw_ids=sw3,
    )
    lca = jnp.where(best > 0, lca, 0)
    flags = (tie_cnt > T).astype(jnp.int32) * FLAG_TIE_OVER + (
        need_more.astype(jnp.int32) * FLAG_NEED_MORE
    )

    out = jnp.zeros((B + 1, 8), jnp.int32)
    out = out.at[:B, 0].set(lca).at[:B, 1].set(best)
    out = out.at[:B, 2].set(flags).at[:B, 3].set(n_ids)
    out = out.at[B, 0].set(ph["n2"]).at[B, 1].set(ph["nsurv"])
    out = out.at[B, 2].set(n_nodes).at[B, 3].set(max_nv)
    out = out.at[B, 4].set(n_ties)
    out = out.at[B, 5].set(want3 if hyb is not None else jnp.int32(0))
    return out
