"""End-to-end fused MEM classification: search + SA resolution + taxid
mapping + capped id-set semantics + LCA in ONE device program.

The host uploads the flat fragment codes, the per-read pop-order slot
table, and (once) the taxonomy arrays; it downloads 16 bytes per read.
Everything the reference classifier does after fragment extraction —
greedyExact statistics (ConsumerThread.cpp:543-628), SA-position walks
(bwt.c:105-121), taxon-id enumeration with the max_match_ids cap
(ConsumerThread.cpp:799-845) and the LCA climb (util.cpp:194-263) —
happens on device with exact semantics; reads whose enumeration exceeds
the device budgets are flagged for host fallback (rare).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .fused_mem2 import (
    _ladder_walk,
    _mem_stats,
    _search_phases,
    build_flatp,
)

FLAG_TIE_OVER = 1  # a contributing fragment had more ties than T
FLAG_NEED_MORE = 2  # position budget R exhausted before the id cap


@partial(jax.jit,
         static_argnums=(15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27))
def fused_mem_classify(
    rec, C, seed_rec, flat_codes, frag_off, rf_rows,
    sa_seq, sa_off, seq_tax, parent, depth, rec2, bloom_words,
    textp, rank_start,
    K, j0, min_len, M2, Ms, T, R, cap, nseq, chpt_exp, m=0, lb=0, W=4,
):
    """rf_rows: int32 [B, S] — fragment row per (read, pop-order slot),
    -1 = pad.  parent/depth: int32 [max_taxid+1]; depth 0 = absent,
    parent[1] = 1.  cap = max_match_ids.  textp/rank_start: paired text
    rows + per-content-rank text starts for the hybrid long-match
    extension (None disables it).

    Returns packed int32 [B+1, 4]: (lca, score, flags, n_ids) per read;
    last row = (n2, n_surv, 0, 0) for the capacity retry.
    """
    hyb = None
    if textp is not None:
        from .fused_mem2 import _walk_pos

        hyb = dict(
            textp=textp, rank_start=rank_start, flatp=build_flatp(flat_codes),
            nseq=nseq, chpt_exp=chpt_exp,
            walk_pos=lambda kf: _walk_pos(
                rec, C, sa_seq, sa_off, nseq, chpt_exp, kf
            ),
        )
    ph = _search_phases(rec, C, seed_rec, flat_codes, frag_off, K, j0, M2,
                        Ms, rec2=rec2, bloom_words=bloom_words, m=m, lb=lb,
                        W=W, hyb=hyb)
    stats = _mem_stats(ph, min_len, T)

    def walk_fn(kf):
        return _sa_walk_local(rec, C, sa_seq, sa_off, nseq, chpt_exp, kf)

    lca, longest, flags, n_ids = classify_tail(
        stats, rf_rows, walk_fn, seq_tax, parent, depth, T, R, cap,
        nseq, chpt_exp, sw_ids=ph["sw_ids"],
    )
    out = jnp.stack([lca, longest, flags, n_ids], axis=1)
    scal = jnp.zeros((1, 4), jnp.int32)
    scal = scal.at[0, 0].set(ph["n2"]).at[0, 1].set(ph["nsurv"])
    return jnp.concatenate([out, scal], axis=0)


def _sa_walk_local(rec, C, sa_seq, sa_off, nseq, chpt_exp, kf):
    """Batched get_suffix -> content-rank sequence index
    (reference: bwt.c:105-121); kf: int32 [N] SA positions (positions
    divisible by 2^chpt_exp resolve immediately — use them as pads)."""
    check = (1 << chpt_exp) - 1
    nb1 = rec.shape[0]
    N = kf.shape[0]

    def sample(k, steps):
        idx = (k >> chpt_exp) - ((nseq - 1) >> chpt_exp) - 1
        idx = jnp.clip(idx, 0, sa_seq.shape[0] - 1)
        return sa_seq[idx], sa_off[idx] + steps

    steps = jnp.zeros(N, jnp.int32)
    done = (kf & check) == 0
    iseq, _pos = sample(kf, steps)
    state0 = (kf, steps, done.astype(jnp.int32), iseq)

    def body(st):
        k, steps, done_i, iseq = st
        done = done_i > 0
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
            axis=1,
            dtype=jnp.int32,
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
                occ_row,
                0,
            ),
            axis=1,
        )
        k_new = C[c] + basew + cnt
        hit_term = ~done & (c == 0)
        iseq = jnp.where(hit_term, k_new, iseq)
        stepping = ~done & ~hit_term
        k = jnp.where(stepping, k_new, k)
        steps = jnp.where(stepping, steps + 1, steps)
        at_chk = stepping & ((k & check) == 0)
        s_iseq, _sp = sample(k, steps)
        iseq = jnp.where(at_chk, s_iseq, iseq)
        done = done | hit_term | at_chk
        return k, steps, done.astype(jnp.int32), iseq

    st = _ladder_walk(
        body, state0, N,
        done_of=lambda s: s[2] > 0,
        set_done=lambda s, d: (s[0], s[1], d.astype(jnp.int32), s[3]),
        anyf=jnp.any,
    )
    return st[3]


def ranges_lca(t_s0, t_s1, contrib, walk_fn, seq_tax, parent, depth, R, cap,
               nseq, chpt_exp, any_fn=None, sw_ids=None):
    """Shared classification tail: expand the per-read candidate SA
    ranges ([B, G] with a contrib mask) into the first R positions,
    resolve each via an SA walk, apply the reference's capped unique-id
    semantics (ConsumerThread.cpp:799-845) and the LCA climb
    (util.cpp:194-263).  Returns (lca, n_ids, need_more, total).

    Rows with s0 >= VBASE are virtual pre-resolved rows from the hybrid
    text-comparison extension (fused_mem2._staged_extend): their
    positions index `sw_ids` directly instead of SA-walking."""
    anyf = any_fn or jnp.any
    B, G = t_s0.shape
    sizes = jnp.where(contrib, t_s1 - t_s0, 0)
    csum = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(sizes, axis=1)], axis=1
    )
    total = csum[:, -1]

    # segment of output position r = #{cs <= r} - 1, via a broadcast
    # compare-sum (a vmapped searchsorted lowers to slow per-row loops)
    rr = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
    seg = (
        jnp.sum(
            (csum[:, None, :] <= rr[:, :, None]).astype(jnp.int32), axis=2
        )
        - 1
    )
    seg = jnp.clip(seg, 0, G - 1)
    valid_pos = rr < jnp.minimum(total, R)[:, None]
    # flat 1-D gathers (per-row take_along_axis is a slow lane-crossing
    # select on TPU)
    brow = jax.lax.broadcasted_iota(jnp.int32, (B, R), 0)
    base = t_s0.reshape(-1)[(brow * G + seg).reshape(-1)].reshape(B, R)
    cs_at = csum.reshape(-1)[
        (brow * (G + 1) + seg).reshape(-1)
    ].reshape(B, R)
    off = rr - cs_at
    pad_k = ((nseq >> chpt_exp) + 1) << chpt_exp
    from .fused_mem2 import VBASE

    pre = valid_pos & (base >= VBASE)  # virtual pre-resolved rows
    walkable = valid_pos & ~pre
    k0 = jnp.where(walkable, base + off, pad_k)
    # compact the real positions before the walk: most (read, r) lanes
    # are pads, and walk cost is gather-rate-bound per LANE per step
    NR = B * R
    vflat = walkable.reshape(-1)
    kflat = k0.reshape(-1)
    slot = jnp.cumsum(vflat, dtype=jnp.int32) - 1
    n_walk = jnp.sum(vflat, dtype=jnp.int32)
    # capacity: half the full lane count (power of two for stable shapes);
    # overflow falls back to walking everything unpacked
    Mk = max(NR // 4, 128)
    kc = jnp.full((Mk + 1,), pad_k, jnp.int32).at[
        jnp.where(vflat & (slot < Mk), slot, Mk)
    ].set(kflat, mode="drop")[:Mk]
    fits = n_walk <= Mk
    kc = jnp.where(fits, kc, pad_k)
    iseq_c = walk_fn(kc)
    iseq_full = walk_fn(jnp.where(fits, pad_k, kflat))
    iseq = jnp.where(
        fits,
        jnp.concatenate([iseq_c, iseq_c[:1]])[
            jnp.where(vflat, jnp.minimum(slot, Mk), Mk)
        ],
        iseq_full,
    )
    if sw_ids is not None:
        sw_flat = sw_ids.reshape(-1)
        pre_flat = pre.reshape(-1)
        sw_idx = jnp.clip(
            (base + off).reshape(-1) - VBASE, 0, sw_flat.shape[0] - 1
        )
        iseq = jnp.where(pre_flat, sw_flat[sw_idx], iseq)
    vflat = valid_pos.reshape(-1)

    tax = jnp.where(
        vflat,
        seq_tax[jnp.clip(iseq, 0, seq_tax.shape[0] - 1)],
        -1,
    ).reshape(B, R)

    # ---- capped unique-id set (reference: ConsumerThread.cpp:799-845) -
    eq = (tax[:, :, None] == tax[:, None, :]) & valid_pos[:, :, None] & (
        valid_pos[:, None, :]
    )
    earlier = (
        jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
        < jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    )
    uniq = valid_pos & ~jnp.any(eq & earlier[None], axis=2)
    prior = jnp.cumsum(uniq.astype(jnp.int32), axis=1) - uniq.astype(jnp.int32)
    included = uniq & (prior <= cap)
    n_ids = jnp.sum(included, axis=1, dtype=jnp.int32)
    uniq_at_R = jnp.sum(uniq, axis=1, dtype=jnp.int32)
    need_more = (total > R) & (uniq_at_R <= cap)

    # ---- LCA (reference: util.cpp:194-263) ----------------------------
    maxtax = parent.shape[0]
    tid = jnp.where(included, tax, -1)
    present = included & (tax >= 0) & (tax < maxtax) & (
        depth[jnp.clip(tax, 0, maxtax - 1)] > 0
    )
    any_present = jnp.any(present, axis=1)
    # neutral-fill every lane with the read's first present id
    first_idx = jnp.argmax(present, axis=1)
    barange = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]
    first_id = tid.reshape(-1)[barange * R + first_idx]
    ids = jnp.where(present, tid, first_id[:, None])
    ids = jnp.clip(ids, 0, maxtax - 1)
    d = depth[ids]
    dmin = jnp.min(jnp.where(present, d, 0x7FFFFFFF), axis=1)
    dmin = jnp.where(any_present, dmin, 0)
    lift = d - dmin[:, None]
    lift = jnp.where(present, lift, 0)

    def lift_cond(st):
        return anyf(st[1] > 0)

    def lift_body(st):
        ids, lift = st
        stepping = lift > 0
        return jnp.where(stepping, parent[ids], ids), lift - stepping

    ids, _ = jax.lax.while_loop(lift_cond, lift_body, (ids, lift))

    def climb_cond(st):
        return anyf(st != st[:, :1])

    def climb_body(st):
        same = jnp.all(st == st[:, :1], axis=1)
        return jnp.where(same[:, None], st, parent[st])

    ids = jax.lax.while_loop(climb_cond, climb_body, ids)
    lca_climb = jnp.where(any_present, ids[:, 0], 0)

    # single-unique-id shortcut returns the id even outside the tree
    first_uid_idx = jnp.argmax(included, axis=1)
    first_uid = tax.reshape(-1)[barange * R + first_uid_idx]
    lca = jnp.where(n_ids == 1, first_uid, lca_climb)
    lca = jnp.where(n_ids > 0, lca, 0)
    return lca, n_ids, need_more, total


def classify_tail(stats, rf_rows, walk_fn, seq_tax, parent, depth, T, R, cap,
                  nseq, chpt_exp, any_fn=None, sw_ids=None):
    """Per-read MEM classification from per-fragment statistics: longest
    reduction, tie-range expansion, then the shared ranges_lca tail.
    Returns (lca, longest, flags, n_ids), each int32 [B]."""
    maxl, tie_cnt, tie_j, tie_s0, tie_s1 = stats
    F = maxl.shape[0]
    B, S = rf_rows.shape

    # ---- per-read longest + contributing slots ------------------------
    rf = jnp.where(rf_rows >= 0, rf_rows, F)
    maxl_p = jnp.concatenate([maxl, jnp.zeros(1, jnp.int32)])
    slot_maxl = maxl_p[rf]  # [B, S]
    longest = jnp.max(slot_maxl, axis=1)
    contrib = (rf_rows >= 0) & (slot_maxl == longest[:, None]) & (
        longest[:, None] > 0
    )

    zrow = jnp.zeros((1, T), jnp.int32)
    t_s0 = jnp.concatenate([tie_s0, zrow])[rf].reshape(B, S * T)
    t_s1 = jnp.concatenate([tie_s1, zrow])[rf].reshape(B, S * T)
    t_cnt = jnp.concatenate([tie_cnt, jnp.zeros(1, jnp.int32)])[rf]
    tie_over = jnp.any(contrib & (t_cnt > T), axis=1)
    contrib_g = jnp.repeat(contrib, T, axis=1)

    lca, n_ids, need_more, _total = ranges_lca(
        t_s0, t_s1, contrib_g, walk_fn, seq_tax, parent, depth, R, cap,
        nseq, chpt_exp, any_fn=any_fn, sw_ids=sw_ids,
    )
    lca = jnp.where(longest > 0, lca, 0)
    flags = tie_over.astype(jnp.int32) * FLAG_TIE_OVER + (
        need_more.astype(jnp.int32) * FLAG_NEED_MORE
    )
    return lca, longest, flags, n_ids
