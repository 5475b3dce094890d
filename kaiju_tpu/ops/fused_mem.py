"""Single-call fused MEM search: seed + extension + statistics on device.

One jit invocation per batch replaces the staged host-compaction loop of
the earlier pipeline: with the TPU behind a high-latency link, every
host<->device round trip costs tens of milliseconds, so the whole
per-fragment search — k-mer seeding, lane compaction, the full backward
extension (reference semantics: src/bwt/bwt.c:261-296, 347-380), and the
order-independent MEM statistics — runs inside one compiled program.  The
host sends [F, L] letter codes and receives only [F]-sized statistics plus
a capped per-fragment tie list.

Pipeline inside the kernel:
  1. seed every (fragment, end-position) lane with ONE row gather from the
     packed K-mer record table (kaiju_tpu.ops.kmer.packed_seed_rec): the
     first K backward steps and the junk-lane death test in one gather;
  2. compact surviving lanes into a fixed M-lane array on device
     (cumsum scatter — no host round trip);
  3. run the backward-extension while_loop to completion on the compact
     lanes (two fused-record rank gathers per step,
     kaiju_tpu.ops.device_index.rank_fused);
  4. scatter results back to the [F, L] grid and reduce to per-fragment
     statistics: maxl (the greedyExact maximal match length), jstop (the
     `i <= 1` stop position), and the ascending-j list of tie positions
     with their SA intervals, capped at T per fragment (tie_cnt reports
     the true count so the host can fall back on overflow).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .device_index import rank_fused

NLET = 20


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def fused_mem_search(rec, C, seed_rec, codes, flen, K, j0, min_len, M, T):
    """codes: uint8 [F, L]; flen: int32 [F].  Static: K (seed depth; 0 =
    no seeding), j0 (first usable end position), min_len, M (compact lane
    capacity), T (tie cap).

    Returns (maxl[F], jstop[F], tie_cnt[F], tie_j[F,T], tie_s0[F,T],
    tie_s1[F,T], n_alive scalar).  If n_alive > M the caller must retry
    with a larger M; if tie_cnt[f] > T the caller must recompute fragment
    f via the full-map path.
    """
    F, L = codes.shape
    c32 = codes.astype(jnp.int32)
    jgrid = jax.lax.broadcasted_iota(jnp.int32, (F, L), 1)
    valid = (jgrid >= j0) & (jgrid < flen[:, None])

    if K > 0:
        # ---- 1. seed: one row gather per lane --------------------------
        kid = jnp.zeros((F, L), dtype=jnp.int32)
        for t in range(K):
            # letter at j - (K-1) + t, weight NLET^(K-1-t)
            sh = K - 1 - t
            shifted = jnp.pad(c32, ((0, 0), (sh, 0)))[:, :L]
            kid = kid + (shifted - 1) * (NLET ** (K - 1 - t))
        kid = jnp.where(valid, kid, 0)
        srow = seed_rec[kid.reshape(-1)]  # [F*L, 4]
        s0 = srow[:, 0].reshape(F, L)
        s1 = srow[:, 1].reshape(F, L)
        d = jnp.where(valid, srow[:, 2].reshape(F, L), 0)
        i0 = jnp.where(d > 0, jgrid - d + 1, jgrid)
        alive = valid & (d == K) & (i0 > 0)
    else:
        c0 = jnp.where(valid, c32, 0)
        s0 = C[c0]
        s1 = C[c0 + 1]
        nonempty = s0 < s1
        i0 = jgrid
        alive = valid & nonempty & (i0 > 0)
        # letter absent entirely: reference still counts the length-1
        # pseudo-match (bwt.c:269-274) => keep i = j, dead interval
        s0 = jnp.where(nonempty, s0, 0)
        s1 = jnp.where(nonempty, s1, 0)

    # ---- 2. device-side compaction ------------------------------------
    aflat = alive.reshape(-1)
    n_alive = jnp.sum(aflat, dtype=jnp.int32)
    slot = jnp.cumsum(aflat, dtype=jnp.int32) - 1
    slot = jnp.where(aflat & (slot < M), slot, M)  # M = drop slot
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (F * L, 1), 0)[:, 0]

    def compact(vals, fill):
        out = jnp.full((M + 1,), fill, dtype=vals.dtype)
        return out.at[slot].set(vals, mode="drop")[:M]

    ci = compact(i0.reshape(-1), jnp.int32(0))
    cs0 = compact(s0.reshape(-1), jnp.int32(0))
    cs1 = compact(s1.reshape(-1), jnp.int32(0))
    clane = compact(lane_idx, jnp.int32(0))
    cact = compact(aflat, False)
    cf = clane // L

    # ---- 3. full extension while_loop ---------------------------------
    flat_codes = c32.reshape(-1)

    def cond(state):
        i, a0, a1, act = state
        return jnp.any(act)

    def body(state):
        i, a0, a1, act = state
        cpos = jnp.where(act, cf * L + i - 1, 0)
        c = flat_codes[cpos]
        n0 = rank_fused(rec, C, c, a0)
        n1 = rank_fused(rec, C, c, a1)
        ok = act & (n0 < n1)
        a0 = jnp.where(ok, n0, a0)
        a1 = jnp.where(ok, n1, a1)
        i = jnp.where(ok, i - 1, i)
        return i, a0, a1, ok & (i > 0)

    ci, cs0, cs1, _ = jax.lax.while_loop(cond, body, (ci, cs0, cs1, cact))

    # ---- 4. scatter back + statistics ---------------------------------
    i_fin = i0.reshape(-1).at[clane].set(ci, mode="drop").reshape(F, L)
    s0_fin = s0.reshape(-1).at[clane].set(cs0, mode="drop").reshape(F, L)
    s1_fin = s1.reshape(-1).at[clane].set(cs1, mode="drop").reshape(F, L)

    length = jgrid - i_fin + 1
    jstop = jnp.max(jnp.where(valid & (i_fin <= 1), jgrid, -1), axis=1)
    eligible = valid & (jgrid >= jstop[:, None]) & (length >= min_len)
    maxl = jnp.max(jnp.where(eligible, length, 0), axis=1)

    tie = eligible & (length == maxl[:, None]) & (maxl[:, None] > 0)
    tie_cnt = jnp.sum(tie, axis=1, dtype=jnp.int32)
    # first T tie positions in ascending j: stable sort of (~tie, j)
    order = jnp.argsort(jnp.where(tie, jgrid, L + jgrid), axis=1)[:, :T]
    tmask = jnp.take_along_axis(tie, order, axis=1)
    tie_j = jnp.where(tmask, jnp.take_along_axis(jgrid, order, axis=1), -1)
    tie_s0 = jnp.where(tmask, jnp.take_along_axis(s0_fin, order, axis=1), 0)
    tie_s1 = jnp.where(tmask, jnp.take_along_axis(s1_fin, order, axis=1), 0)
    return maxl, jstop, tie_cnt, tie_j, tie_s0, tie_s1, n_alive
