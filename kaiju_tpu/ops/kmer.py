"""K-mer seed tables: precomputed backward-search intervals.

For every k-mer (over the 20 letter codes 1..20) up to depth K, the SA
interval after k backward-extension steps is precomputed.  Seeding a lane
with its trailing k-mer replaces the first K extension steps with host
table lookups — most non-matching end positions die inside the table and
never issue a device rank query at all.

This is new relative to the reference (which starts every extension from
scratch, bwt.c:267-269) but exact: the table IS the first K steps.
"""

from __future__ import annotations

import os

import numpy as np

from ..index.core import KaijuIndex

NLET = 20  # letter codes 1..20 (makedb alphabet)


def default_depth(index: KaijuIndex) -> int:
    """Deep enough that a random k-mer is likely absent (kills junk lanes
    at seed time), capped by table memory (20^K * 16 B)."""
    import math

    k = math.ceil(math.log(max(index.length, 2), NLET)) + 1
    return max(4, min(6, k))


class KmerTables:
    """tables[d] = (si0, si1) int64 arrays of size NLET^d, d = 1..K.

    Index of k-mer c_1..c_d (c_1 = leftmost, letter codes 1..20):
    sum (c_i - 1) * NLET^(d-i).
    """

    def __init__(self, tables: list[tuple[np.ndarray, np.ndarray]]):
        self.tables = tables
        self.K = len(tables)

    @classmethod
    def build(cls, index: KaijuIndex, K: int | None = None) -> "KmerTables":
        K = K or default_depth(index)
        # materialize (the index may be mmap-backed; fancy indexing on a
        # memmap is pathologically slow)
        blocks = np.ascontiguousarray(index.blocks)
        occ = np.ascontiguousarray(index.occ)
        C = np.ascontiguousarray(index.C)
        lanes = np.arange(128, dtype=np.int64)

        def fmindex(c, k):
            b = k >> 7
            base = occ[b, c].astype(np.int64)
            rows = blocks[np.minimum(b, len(blocks) - 1)]
            off = (k & 127)[:, None]
            cnt = ((rows == c[:, None]) & (lanes < off)).sum(axis=1)
            return C[c] + base + cnt

        tables = []
        # depth 1: InitialSI per letter (reference: bwt.c:146-152)
        codes = np.arange(1, NLET + 1, dtype=np.int64)
        si0 = index.C[codes]
        si1 = index.C[codes + 1]
        tables.append((si0, si1))
        chunk = 1 << 21
        for _d in range(2, K + 1):
            p0, p1 = tables[-1]
            n = len(p0)
            # prepend each letter c: new interval = UpdateSI(c, prev)
            n0 = np.zeros(n * NLET, dtype=np.int64)
            n1 = np.zeros(n * NLET, dtype=np.int64)
            for ci, c in enumerate(codes):
                for lo in range(0, n, chunk):
                    hi = min(n, lo + chunk)
                    s0 = p0[lo:hi]
                    s1 = p1[lo:hi]
                    alive = s0 < s1
                    if not alive.any():
                        continue
                    carr = np.full(int(alive.sum()), c, dtype=np.int64)
                    n0a = fmindex(carr, s0[alive])
                    n1a = fmindex(carr, s1[alive])
                    ok = n0a < n1a
                    idx = ci * n + lo + np.flatnonzero(alive)[ok]
                    n0[idx] = n0a[ok]
                    n1[idx] = n1a[ok]
            tables.append((n0, n1))
        return cls(tables)

    @classmethod
    def build_device(cls, index: KaijuIndex, K: int, device_index) -> "KmerTables":
        """Build the per-depth interval tables with batched device rank
        probes (UpdateSI over every (letter, previous k-mer) pair) — the
        host build is minutes of scalar numpy; this is ~a second of TPU
        time for K=5."""
        import jax.numpy as jnp

        from . import device_index as dev

        codes = np.arange(1, NLET + 1, dtype=np.int64)
        si0 = index.C[codes]
        si1 = index.C[codes + 1]
        tables = [(si0, si1)]
        CHUNK = 1 << 22
        for _d in range(2, K + 1):
            p0, p1 = tables[-1]
            n = len(p0)
            c = np.repeat(np.arange(1, NLET + 1, dtype=np.int32), n)
            s0 = np.tile(p0, NLET).astype(np.int32)
            s1 = np.tile(p1, NLET).astype(np.int32)
            n0 = np.zeros(n * NLET, dtype=np.int64)
            n1 = np.zeros(n * NLET, dtype=np.int64)
            for lo in range(0, n * NLET, CHUNK):
                hi = min(n * NLET, lo + CHUNK)
                # pad to a power-of-two bucket: one compiled shape
                m = 1024
                while m < hi - lo:
                    m *= 2
                cc = np.zeros(m, np.int32)
                cs0 = np.zeros(m, np.int32)
                cs1 = np.zeros(m, np.int32)
                cc[: hi - lo] = c[lo:hi]
                cs0[: hi - lo] = s0[lo:hi]
                cs1[: hi - lo] = s1[lo:hi]
                r0, r1, ok = (
                    np.asarray(a)[: hi - lo]
                    for a in dev.probe_updates(
                        device_index.blocks, device_index.occ,
                        device_index.C,
                        jnp.asarray(cc), jnp.asarray(cs0), jnp.asarray(cs1),
                    )
                )
                n0[lo:hi] = np.where(ok, r0, 0)
                n1[lo:hi] = np.where(ok, r1, 0)
            # empty previous intervals must stay empty
            alive = np.tile(p0 < p1, NLET)
            n0[~alive] = 0
            n1[~alive] = 0
            tables.append((n0, n1))
        return cls(tables)

    # ---- persistence --------------------------------------------------

    def save(self, dirpath: str) -> None:
        os.makedirs(dirpath, exist_ok=True)
        for d, (s0, s1) in enumerate(self.tables, start=1):
            np.save(os.path.join(dirpath, f"si0_{d}.npy"), s0)
            np.save(os.path.join(dirpath, f"si1_{d}.npy"), s1)

    @classmethod
    def load_or_build(cls, index: KaijuIndex, cache_dir: str | None, K=None,
                      device_index=None):
        K = K or default_depth(index)
        path = os.path.join(cache_dir, f"kmer{K}") if cache_dir else None
        if path and os.path.exists(os.path.join(path, f"si0_{K}.npy")):
            tables = [
                (
                    np.load(os.path.join(path, f"si0_{d}.npy")),
                    np.load(os.path.join(path, f"si1_{d}.npy")),
                )
                for d in range(1, K + 1)
            ]
            return cls(tables)
        if device_index is not None:
            t = cls.build_device(index, K, device_index)
        else:
            t = cls.build(index, K)
        if path:
            try:
                t.save(path)
            except OSError:
                pass
        return t

    # ---- packed single-gather seed records ----------------------------

    def packed_seed_rec(self, K: int | None = None) -> np.ndarray:
        """[NLET^K, 4] int32 rows (si0, si1, d*, 0): for each K-mer id, the
        DEEPEST d <= K whose d-suffix (= the first d backward-extension
        steps) has a non-empty interval, with that interval.  d* == 0 means
        even the last letter is absent from the DB.

        One row gather replaces the whole per-depth descent — the seed step
        of the fused device search (kaiju_tpu.ops.fused_mem2).
        """
        K = K or self.K
        K = min(K, self.K)
        n = NLET**K
        rec = np.zeros((n, 4), dtype=np.int32)
        ids = np.arange(n, dtype=np.int64)
        for d in range(1, K + 1):
            sub = ids % (NLET**d) if d < K else ids
            t0, t1 = self.tables[d - 1]
            s0 = t0[sub]
            s1 = t1[sub]
            pres = s0 < s1
            rec[pres, 0] = s0[pres].astype(np.int32)
            rec[pres, 1] = s1[pres].astype(np.int32)
            rec[pres, 2] = d
        return rec

    def planar_seed(self, K: int | None = None):
        """packed_seed_rec as three planar 1-D arrays (s0, s1, d): XLA
        cross-program-prefetches a [20^K, 4] table wholesale into scratch
        space on every execution (~44 ms for K=5 on v5e); planar arrays
        gather straight from HBM."""
        rec = self.packed_seed_rec(K)
        return (
            np.ascontiguousarray(rec[:, 0]),
            np.ascontiguousarray(rec[:, 1]),
            np.ascontiguousarray(rec[:, 2]).astype(np.int8),
        )
