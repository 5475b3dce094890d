"""Sharded fused MEM classification over a (data x index) device mesh.

The full single-call classification program (seed + strip-phased
extension + statistics + SA walks + capped id sets + LCA; see
kaiju_tpu.ops.fused_classify) under jax.shard_map:

  * "data" axis: each device group gets its own read sub-batch (flat
    fragment codes + pop-order slot table), embarrassingly parallel.
  * "index" axis: BWT blocks / occ checkpoints / SA samples are
    partitioned into contiguous position ranges.  Every rank query and
    every SA-walk step is owner-computed — the owning shard contributes
    its local checkpoint+count, all others contribute zero — and a psum
    over the index axis assembles the value, riding the ICI.

While-loop conditions are psum'd so all index shards iterate in
lockstep.  The k-mer seed table, C array, and taxonomy arrays are small
and replicated.  This is how databases larger than one chip's HBM
(refseq_ref = 54 GB) run: aggregate HBM holds the index once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.greedy_device import QLCAP
from ..index.core import BLOCK
from ..ops.fused_classify import classify_tail
from ..ops.fused_mem2 import _mem_stats, _search_phases
from .sharded_index import ShardedIndexArrays


def _any_psum(x):
    return jax.lax.psum(jnp.sum(x.astype(jnp.int32)), "index") > 0


def _hyb_uploads(sh):
    """(textp rows, rank_start) host arrays for the hybrid, or minimal
    dummies when the index ships no text / is too large for the
    VBASE virtual-row encoding (the builders then compile with the
    hybrid disabled and never read them)."""
    if sh.has_text and sh.length < (1 << 30):
        return sh.textp_sh, sh.rank_start
    return (
        np.zeros((sh.n_shards, 1, 2 * BLOCK), np.int8),
        np.zeros(1, np.int32),
    )


def _make_rank1(blocks_s, occ_s, shard_base, C, nb_s):
    """Owner-computes rank over the index axis: the owning shard
    contributes checkpoint+count, the rest contribute zero, psum
    assembles (call only inside shard_map)."""
    S_ = jax.lax.axis_size("index")
    my = jax.lax.axis_index("index")

    def rank1(c, k):
        b = k >> 7
        owner = jnp.minimum(b // nb_s, S_ - 1)
        mine = owner == my
        lb = jnp.clip(b - my * nb_s, 0, nb_s - 1)
        row = blocks_s[lb]
        off = k & (BLOCK - 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
        cnt = jnp.sum(
            (row == c[:, None].astype(row.dtype)) & (lanes < off[:, None]),
            axis=1, dtype=jnp.int32,
        )
        local = jnp.where(mine, occ_s[lb, c] + cnt, 0)
        total = jax.lax.psum(local, "index")
        return C[c] + shard_base[owner, c] + total

    return rank1


def _make_walk(blocks_s, occ_s, shard_base, C, sa_seq_s, sa_off_s,
               nb_s, ns_s, nseq, chpt_exp, want_pos=False):
    """Owner-computes SA walk (get_suffix; reference bwt.c:105-121) on
    the index axis, loops psum-lockstepped (call only inside shard_map).
    With want_pos the walk also returns the suffix offset (the sharded
    analog of fused_mem2._walk_pos, used by the hybrid switch pool)."""
    S_ = jax.lax.axis_size("index")
    my = jax.lax.axis_index("index")
    check = (1 << chpt_exp) - 1

    def walk_fn(kf):
        N = kf.shape[0]

        def sample(k, steps):
            idx = (k >> chpt_exp) - ((nseq - 1) >> chpt_exp) - 1
            idx = jnp.clip(idx, 0, S_ * ns_s - 1)
            owner = jnp.minimum(idx // ns_s, S_ - 1)
            li = jnp.clip(idx - my * ns_s, 0, ns_s - 1)
            mine = owner == my
            iseq = jax.lax.psum(jnp.where(mine, sa_seq_s[li], 0), "index")
            pos = jax.lax.psum(jnp.where(mine, sa_off_s[li], 0), "index")
            return iseq, pos + steps

        steps = jnp.zeros(N, jnp.int32)
        done = (kf & check) == 0
        iseq, pos = sample(kf, steps)

        def body(st):
            k, steps, done, iseq, pos = st
            b = k >> 7
            owner = jnp.minimum(b // nb_s, S_ - 1)
            mine = owner == my
            lb = jnp.clip(b - my * nb_s, 0, nb_s - 1)
            row = blocks_s[lb]
            off = k & (BLOCK - 1)
            lanes = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
            cb = jnp.sum(
                jnp.where(
                    mine[:, None] & (lanes == off[:, None]),
                    row.astype(jnp.int32), 0,
                ),
                axis=1,
            )
            c = jax.lax.psum(cb, "index")
            cnt = jnp.sum(
                (row == c[:, None].astype(row.dtype))
                & (lanes < off[:, None]),
                axis=1, dtype=jnp.int32,
            )
            local = jnp.where(mine, occ_s[lb, c] + cnt, 0)
            k_new = C[c] + shard_base[owner, c] + jax.lax.psum(
                local, "index"
            )
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
            lambda st: _any_psum(~st[2]), body,
            (kf, steps, done, iseq, pos),
        )
        return (iseq, pos) if want_pos else iseq

    return walk_fn


def _make_hyb(sh, textp_s, rank_start, flat_codes, walk_pos_fn):
    """Sharded hybrid arrays for the switch pool: the text side is
    sharded by the same position ranges as the BWT, so each text row
    gather owner-computes + psums exactly like a rank query
    (ROOFLINE.md §5); the query side (flatp) is data-shard local."""
    from ..ops.fused_mem2 import build_flatp

    ntb_s = sh.ntb_s
    S_ = jax.lax.axis_size("index")
    my = jax.lax.axis_index("index")

    def text_row(bt, cont):
        owner = jnp.minimum(bt // ntb_s, S_ - 1)
        mine = (owner == my) & cont
        lb = jnp.clip(bt - my * ntb_s, 0, ntb_s - 1)
        row = textp_s[lb].astype(jnp.int32)
        return jax.lax.psum(jnp.where(mine[:, None], row, 0), "index")

    return dict(
        textp=None, text_row=text_row, rank_start=rank_start,
        flatp=build_flatp(flat_codes), nseq=sh.nseq,
        chpt_exp=sh.chpt_exp, walk_pos=walk_pos_fn,
    )


def make_sharded_mem_classify(
    mesh: Mesh,
    sh: ShardedIndexArrays,
    *,
    K: int,
    j0: int,
    min_len: int,
    M2: int,
    Ms: int,
    T: int,
    R: int,
    cap: int,
    m: int = 0,
    lb: int = 0,
):
    """Builds the jitted sharded classify step.

    Per-data-shard inputs (leading axis = n_data):
      flat_codes uint8 [D, P], frag_off int32 [D, F+1],
      rf_rows int32 [D, B, S]
    Index-shard inputs from ShardedIndexArrays; seed_rec / seq_tax /
    parent / depth replicated.  Returns int32 [D, B, 4].
    """
    nb_s = sh.nb_s
    ns_s = sh.ns_s
    nseq = sh.nseq
    chpt_exp = sh.chpt_exp
    use_hyb = sh.has_text and sh.length < (1 << 30)  # VBASE encoding

    def per_device(
        blocks_s, occ_s, shard_base, C, sa_seq_s, sa_off_s,
        seed_rec, seq_tax, parent, depth, bloom_words,
        textp_s, rank_start,
        flat_codes, frag_off, rf_rows,
    ):
        blocks_s = blocks_s[0]
        occ_s = occ_s[0]
        sa_seq_s = sa_seq_s[0]
        sa_off_s = sa_off_s[0]
        flat_codes = flat_codes[0]
        frag_off = frag_off[0]
        rf_rows = rf_rows[0]
        rank1 = _make_rank1(blocks_s, occ_s, shard_base, C, nb_s)

        def rank_pair(c, a0, a1):
            return rank1(c, a0), rank1(c, a1)

        walk_pos_fn = _make_walk(blocks_s, occ_s, shard_base, C, sa_seq_s,
                                 sa_off_s, nb_s, ns_s, nseq, chpt_exp,
                                 want_pos=True)
        hyb = None
        if use_hyb:
            hyb = _make_hyb(sh, textp_s[0], rank_start, flat_codes,
                            walk_pos_fn)

        ph = _search_phases(
            None, C, seed_rec, flat_codes, frag_off, K, j0, M2, Ms,
            rec2=None, rank_pair=rank_pair, any_fn=_any_psum,
            bloom_words=bloom_words if m > 0 else None, m=m, lb=lb,
            hyb=hyb,
        )
        stats = _mem_stats(ph, min_len, T)

        def walk_fn(kf):
            return walk_pos_fn(kf)[0]

        lca, longest, flags, n_ids = classify_tail(
            stats, rf_rows, walk_fn, seq_tax, parent, depth, T, R, cap,
            nseq, chpt_exp, any_fn=_any_psum, sw_ids=ph["sw_ids"],
        )
        out = jnp.stack([lca, longest, flags, n_ids], axis=1)
        # trailing stats row: funnel overflow counters, pmax'd over the
        # WHOLE mesh so every data shard (and hence every PROCESS in a
        # multi-host run) sees the same values — the capacity-retry
        # decision must be identical everywhere or SPMD programs would
        # diverge (engine/mem_fast._collect_tail is the single-chip
        # analog)
        stats_row = jnp.stack([
            jax.lax.pmax(ph["n2"], ("data", "index")),
            jax.lax.pmax(ph["nsurv"], ("data", "index")),
            jnp.int32(0), jnp.int32(0),
        ])[None]
        return jnp.concatenate([out, stats_row], axis=0)[None]

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P("index"), P("index"), None, None,   # blocks, occ, base, C
            P("index"), P("index"),               # SA samples
            None, None, None, None, None,         # seed/tax/bloom tables
            P("index"), None,                     # text rows, rank_start
            P("data"), P("data"), P("data"),      # per-data-shard queries
        ),
        out_specs=P("data"),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_greedy_classify(
    mesh: Mesh,
    sh: ShardedIndexArrays,
    *,
    B: int,
    K: int,
    j0: int,
    Lmap: int,
    mfl: int,
    min_score: int,
    mismatches: int,
    M2: int,
    Ms: int,
    Mn: int,
    Mv: int,
    Mt: int,
    T: int,
    R: int,
    cap: int,
    m: int = 0,
    lb: int = 0,
):
    """Jitted sharded Greedy step: the full fused program
    (kaiju_tpu.ops.fused_greedy.greedy_core — level-0 funnel, inserted
    nodes, substitution fan-out levels, ties, SA walks, LCA) with every
    rank and SA query owner-computed over the "index" axis and psum'd,
    while-loops lockstepped with _any_psum.  Per-data-shard inputs as in
    make_sharded_mem_classify plus frag_rid int32 [D, F]."""
    from ..ops.fused_greedy import greedy_core

    nb_s = sh.nb_s
    ns_s = sh.ns_s
    nseq = sh.nseq
    chpt_exp = sh.chpt_exp
    use_hyb = sh.has_text and sh.length < (1 << 30)  # VBASE encoding

    def per_device(
        blocks_s, occ_s, shard_base, C, sa_seq_s, sa_off_s,
        seed_rec, seq_tax, parent, depth, bloom_words,
        diag_tab, submat, subcode_tab, subdiag_tab,
        textp_s, rank_start,
        flat_codes, frag_off, frag_rid,
    ):
        blocks_s = blocks_s[0]
        occ_s = occ_s[0]
        sa_seq_s = sa_seq_s[0]
        sa_off_s = sa_off_s[0]
        flat_codes = flat_codes[0]
        frag_off = frag_off[0]
        frag_rid = frag_rid[0]
        rank1 = _make_rank1(blocks_s, occ_s, shard_base, C, nb_s)

        def rank_pair(c, a0, a1):
            return rank1(c, a0), rank1(c, a1)

        def rank_pair2(c, a0, a1, act):
            a0c = jnp.where(act, a0, 0)
            a1c = jnp.where(act, a1, 0)
            return rank1(c, a0c), rank1(c, a1c)

        walk_pos_fn = _make_walk(blocks_s, occ_s, shard_base, C, sa_seq_s,
                                 sa_off_s, nb_s, ns_s, nseq, chpt_exp,
                                 want_pos=True)
        hyb = None
        if use_hyb:
            hyb = _make_hyb(sh, textp_s[0], rank_start, flat_codes,
                            walk_pos_fn)

        def search_fn(M2_, Ms_):
            # NO hyb in the level-0 funnel: its node intervals feed the
            # variant levels' rank probes, which need real SA intervals
            # (the hybrid's virtual rows only work in tie rows) — same
            # restriction as the single-chip fused_greedy_classify
            return _search_phases(
                None, C, seed_rec, flat_codes, frag_off, K, j0, M2_, Ms_,
                rec2=None, rank_pair=rank_pair, any_fn=_any_psum,
                bloom_words=bloom_words if m > 0 else None, m=m, lb=lb,
            )

        def walk_fn(kf):
            return walk_pos_fn(kf)[0]

        out = greedy_core(
            search_fn, rank_pair2, walk_fn, _any_psum,
            seq_tax, parent, depth, flat_codes, frag_off, frag_rid,
            diag_tab, submat, subcode_tab, subdiag_tab,
            B, Lmap, mfl, min_score, mismatches,
            M2, Ms, Mn, Mv, Mt, max(Mv // 4, 2048), T, R, cap,
            nseq, chpt_exp, hyb=hyb,
        )
        # overflow counters pmax'd over the whole mesh: every process
        # must take the same capacity-retry decision (see the MEM
        # builder's stats_row note)
        out = out.at[B, :].set(
            jax.lax.pmax(out[B, :], ("data", "index"))
        )
        return out[None]

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P("index"), P("index"), None, None,   # blocks, occ, base, C
            P("index"), P("index"),               # SA samples
            None, None, None, None, None,         # seed/tax/bloom tables
            None, None, None, None,               # scoring tables
            P("index"), None,                     # text rows, rank_start
            P("data"), P("data"), P("data"),      # per-data-shard queries
        ),
        out_specs=P("data"),
        check_vma=False,
    )
    return jax.jit(fn)


class ShardedGreedyClassifier:
    """Greedy classification on a (data x index) mesh: host fragmenting
    per data shard, one fused sharded device program, capacity-retry,
    and exact host replay of flagged reads — the mesh analog of
    engine/greedy_device.GreedyDevicePipeline."""

    def __init__(self, index, taxonomy, config, mesh: Mesh, n_index: int,
                 cache_dir: str | None = None):
        import math

        from ..engine.fragments_native import NativeFragmenter2
        from ..engine.greedy_device import greedy_scoring_tables
        from ..engine.mem_fast import SEED_K
        from ..index.alphabet import trans_table
        from ..ops.bloom import load_words
        from ..ops.kmer import KmerTables
        from ..utils.capstore import CapStore

        assert config.mode == "greedy"
        self.cfg = config
        self.index = index
        self.mesh = mesh
        self.n_data = mesh.shape["data"]
        self.sh = ShardedIndexArrays(index, n_index)
        cache_dir = cache_dir or index.source_dir
        want_K = min(SEED_K, config.seed_length)
        self.kmer = KmerTables.load_or_build(index, cache_dir, K=want_K)
        self.seed_K = min(want_K, self.kmer.K)
        self._seed_rec = self.kmer.packed_seed_rec(self.seed_K)
        self._lmap = min(config.seed_length, config.min_fragment_length)
        got = load_words(index, cache_dir, self._lmap)
        self._bloom_np, self._bloom_m, self._bloom_lb = (
            got if got else (np.zeros(1, np.uint32), 0, 0)
        )
        par, dep = taxonomy.dense_arrays()
        self._parent = par
        self._depth = dep
        self._seq_tax = np.asarray(index.seq_taxids, dtype=np.int32)
        trans = trans_table(index.alphabet)
        self._tabs = greedy_scoring_tables(index.alphabet, trans)
        self._math = math
        self.R = 32
        self.S = 16
        # mesh funnel budgets: persisted per DB + config signature so a
        # fresh process starts at steady state (utils/capstore.py)
        self._caps = CapStore(cache_dir, "mesh_greedy", sig=config.cap_sig())
        self._m2 = self._caps.get("m2", 65536)
        self._ms = self._caps.get("ms", 16384)
        self._mn = self._caps.get("mn", 32768)
        self._mv = self._caps.get("mv", 65536)
        self._mt = self._caps.get("mt", 16384)
        self._fns: dict = {}
        self._tax = taxonomy
        self._host = None
        self._frag2 = NativeFragmenter2(
            "greedy", config.min_fragment_length, config.min_score,
            config.seg, config.input_is_protein,
        )
        self._dev = None  # device-resident index + tables (upload ONCE)

    @staticmethod
    def _bucket(n, lo):
        b = lo
        while b < n:
            b *= 2
        return b

    def _index_args(self):
        """Device-resident sharded index + replicated tables, uploaded
        once per process and reused by every classify call (the
        reference likewise loads the index once for all samples,
        kaiju-multi.cpp:307).  multihost.put_global keeps a
        multi-process runtime to its locally-owned shards."""
        if self._dev is None:
            from . import multihost

            def put(arr, spec):
                return multihost.put_global(
                    np.asarray(arr), self.mesh, spec
                )

            sh = self.sh
            diag, submat, subcode, subdiag = self._tabs
            textp, rstart = _hyb_uploads(sh)
            self._dev = (
                put(sh.blocks_sh, P("index")), put(sh.occ_local, P("index")),
                put(sh.shard_base, P()), put(sh.C, P()),
                put(sh.sa_seq_sh, P("index")), put(sh.sa_off_sh, P("index")),
                put(self._seed_rec, P()), put(self._seq_tax, P()),
                put(self._parent, P()), put(self._depth, P()),
                put(self._bloom_np, P()),
                put(diag, P()), put(submat, P()), put(subcode, P()),
                put(subdiag, P()),
                put(textp, P("index")), put(rstart, P()),
            )
        return self._dev

    def _fn(self, B):
        cfg = self.cfg
        key = (B, self._m2, self._ms, self._mn, self._mv, self._mt)
        if key not in self._fns:
            self._fns[key] = make_sharded_greedy_classify(
                self.mesh, self.sh,
                B=B, K=self.seed_K, j0=self._lmap - 1, Lmap=self._lmap,
                mfl=cfg.min_fragment_length, min_score=cfg.min_score,
                mismatches=cfg.mismatches,
                M2=self._m2, Ms=self._ms, Mn=self._mn, Mv=self._mv,
                Mt=self._mt, T=cfg.max_matches_SI, R=self.R,
                cap=cfg.max_match_ids,
                m=self._bloom_m, lb=self._bloom_lb,
            )
        return self._fns[key]

    def submit_batch(self, reads):
        """Fragments `reads` across the data axis and dispatches the
        fused sharded Greedy step asynchronously; the sharded index
        stays device-resident across calls (see _index_args)."""
        cfg = self.cfg
        D = self.n_data
        per = -(-len(reads) // D)
        pad = per * D - len(reads)
        items = list(reads) + [("~pad", "", None)] * pad
        parts = []
        P_cap = 1024
        F_cap = 128
        fallback = set()
        for d in range(D):
            sub = items[d * per : (d + 1) * per]
            flat, chars, frag_off, n_frags, _k, rf, oflow = self._frag2.run(
                sub, self.S, self._bucket
            )
            parts.append((flat, frag_off, rf, oflow))
            P_cap = max(P_cap, flat.shape[0])
            F_cap = max(F_cap, frag_off.shape[0] - 1)
        shards = []
        for d, (flat, frag_off, rf, oflow) in enumerate(parts):
            fl = np.zeros(P_cap, np.uint8)
            fl[: flat.shape[0]] = flat
            of = np.full(F_cap + 1, frag_off[-1], np.int32)
            of[: frag_off.shape[0]] = frag_off
            frag_rid = np.full(F_cap, per, dtype=np.int32)
            rows = rf[rf >= 0]
            rids = np.broadcast_to(
                np.arange(per, dtype=np.int32)[:, None], rf.shape
            )[rf >= 0]
            frag_rid[rows] = rids
            flens = np.diff(of)
            for fr_ in np.flatnonzero(flens >= QLCAP):
                if frag_rid[fr_] < per:
                    fallback.add(d * per + int(frag_rid[fr_]))
            for r in np.flatnonzero(oflow):
                fallback.add(d * per + int(r))
            shards.append((fl, of, frag_rid))

        flat = np.stack([s[0] for s in shards])
        off = np.stack([s[1] for s in shards])
        rid = np.stack([s[2] for s in shards])
        caps = (self._m2, self._ms, self._mn, self._mv, self._mt)
        out = self._dispatch(per, flat, off, rid)
        return (reads, per, fallback, (flat, off, rid), caps, out)

    def _dispatch(self, per, flat, off, rid):
        from . import multihost

        def put(arr, spec):
            return multihost.put_global(arr, self.mesh, spec)

        return self._fn(per)(
            *self._index_args(),
            put(flat, P("data")), put(off, P("data")), put(rid, P("data")),
        )

    def collect_batch(self, state):
        """Fetches a submitted batch, growing capacities + re-running on
        overflow, then applies the host E-value gate and the exact host
        replay of flagged reads."""
        from ..engine.core import ClassifyResult
        from ..ops.fused_greedy import FLAG_NEED_MORE, FLAG_TIE_OVER

        from . import multihost

        cfg = self.cfg
        reads, per, fallback, args, caps, out = state
        flat, off, rid = args
        while True:
            rows = multihost.local_rows(out)  # {d: [B+1, 8]}
            any_row = next(iter(rows.values()))
            n2 = int(any_row[per, 0])
            n_surv = int(any_row[per, 1])
            n_nodes = int(any_row[per, 2])
            max_nv = int(any_row[per, 3])
            n_ties = int(any_row[per, 4])
            want_h = int(any_row[per, 5])
            # compare against the caps baked into the executable that
            # produced THIS batch (self._* may have grown for a later
            # in-flight batch; accepting against grown caps would keep
            # silently-dropped lanes)
            m2, ms, mn, mv, mt = caps
            if (n2 <= m2 and n_surv <= ms and n_nodes <= mn
                    and max_nv <= mv and n_ties <= mt
                    and want_h <= max(mv // 4, 2048)):
                break
            self._m2 = min(
                self._bucket(max(self._m2, n2), 4096),
                self._bucket(int(flat.shape[1]), 4096),
            )
            self._ms = self._bucket(max(self._ms, n_surv), 4096)
            self._mn = self._bucket(max(self._mn, n_nodes), 4096)
            # the hybrid pool capacity is Mv // 4, so pool overflow
            # (correct but slow) grows Mv past 4x the wanted occupancy
            self._mv = self._bucket(
                max(self._mv, max_nv, 4 * want_h), 4096
            )
            self._mt = self._bucket(max(self._mt, n_ties), 4096)
            self._caps.update(m2=self._m2, ms=self._ms, mn=self._mn,
                              mv=self._mv, mt=self._mt)
            caps = (self._m2, self._ms, self._mn, self._mv, self._mt)
            out = self._dispatch(per, flat, off, rid)

        local = set()
        for d, arr in rows.items():
            for r in range(per):
                g = d * per + r
                if g >= len(reads):
                    continue
                local.add(g)
                if int(arr[r, 2]) & (FLAG_TIE_OVER | FLAG_NEED_MORE):
                    fallback.add(g)
        redo = {}
        fb = sorted(g for g in fallback if g < len(reads) and g in local)
        if fb:
            if self._host is None:
                from ..engine.greedy_fast import GreedyFastPipeline

                self._host = GreedyFastPipeline(self.index, self._tax, cfg)
            sub = [reads[g] for g in fb]
            for g, (_n, res) in zip(fb, self._host.classify_batch(sub)):
                redo[g] = res

        from ..constants import LAMBDA, LN_2, LN_K

        results = []
        for g, (name, s1, s2) in enumerate(reads):
            if g not in local:
                results.append(None)
                continue
            if g in redo:
                results.append((name, redo[g]))
                continue
            d, r = divmod(g, per)
            lca, best, _fl, n_ids = (int(x) for x in rows[d][r, :4])
            if best <= 0 or n_ids == 0:
                results.append((name, ClassifyResult(False, 0)))
                continue
            if cfg.use_Evalue:
                qlen = (
                    float(len(s1)) if cfg.input_is_protein
                    else len(s1) / 3.0 + (len(s2) / 3.0 if s2 else 0.0)
                )
                bitscore = (LAMBDA * best - LN_K) / LN_2
                evalue = (
                    float(self.index.db_length) * qlen
                    * self._math.pow(2.0, -bitscore)
                )
                if evalue > cfg.min_Evalue:
                    results.append((name, ClassifyResult(False, 0)))
                    continue
            results.append((name, ClassifyResult(lca > 0, lca, score=best)))
        return results

    def classify_reads(self, reads):
        return self.collect_batch(self.submit_batch(reads))

    def classify_stream(self, batches, depth: int = 2):
        """Pipelined mesh classification: submit keeps `depth` batches
        in flight so host fragmenting overlaps device compute (mesh
        analog of engine/greedy_device.classify_stream)."""
        from collections import deque

        q: deque = deque()
        for batch in batches:
            q.append(self.submit_batch(batch))
            if len(q) > depth:
                yield self.collect_batch(q.popleft())
        while q:
            yield self.collect_batch(q.popleft())


class ShardedMemClassifier:
    """Convenience driver: shards an index + taxonomy over a mesh and
    classifies read batches with the fused sharded step."""

    def __init__(self, index, taxonomy, config, mesh: Mesh, n_index: int,
                 cache_dir: str | None = None):
        from ..engine.mem_fast import SEED_K, TIE_CAP
        from ..ops.bloom import load_words
        from ..ops.kmer import KmerTables
        from ..utils.capstore import CapStore

        self.cfg = config
        self.index = index
        self.mesh = mesh
        self.n_data = mesh.shape["data"]
        self.sh = ShardedIndexArrays(index, n_index)
        cache_dir = cache_dir or index.source_dir
        K = min(SEED_K, config.min_fragment_length)
        self.kmer = KmerTables.load_or_build(index, cache_dir, K=K)
        self.seed_K = min(K, self.kmer.K)
        self._seed_rec = self.kmer.packed_seed_rec(self.seed_K)
        got = load_words(index, cache_dir, config.min_fragment_length)
        self._bloom_np, self._bloom_m, self._bloom_lb = (
            got if got else (np.zeros(1, np.uint32), 0, 0)
        )
        par, dep = taxonomy.dense_arrays()
        self._parent = par
        self._depth = dep
        self._seq_tax = np.asarray(index.seq_taxids, dtype=np.int32)
        self.T = TIE_CAP
        self.R = 32
        self.S = 16
        # sticky funnel budgets: grow on overflow (shape change = new
        # executable), never shrink; persisted per DB + config signature
        self._caps = CapStore(cache_dir, "mesh_mem", sig=config.cap_sig())
        self._m2 = self._caps.get("m2", 65536)
        self._ms = self._caps.get("ms", 16384)
        self._fns: dict = {}
        self._tax = taxonomy
        self._host = None  # lazy single-device fallback for flagged reads
        self._dev = None  # device-resident index + tables (upload ONCE)

    def _index_args(self):
        """Device-resident sharded index + replicated tables, uploaded
        once per process (cf. the reference loading the index once for
        all samples, kaiju-multi.cpp:307).  Uploads go through
        multihost.put_global, so in a multi-process (DCN) runtime each
        process materialises only the shards its local devices own."""
        if self._dev is None:
            from . import multihost

            def put(arr, spec):
                return multihost.put_global(
                    np.asarray(arr), self.mesh, spec
                )

            sh = self.sh
            textp, rstart = _hyb_uploads(sh)
            self._dev = (
                put(sh.blocks_sh, P("index")), put(sh.occ_local, P("index")),
                put(sh.shard_base, P()), put(sh.C, P()),
                put(sh.sa_seq_sh, P("index")), put(sh.sa_off_sh, P("index")),
                put(self._seed_rec, P()), put(self._seq_tax, P()),
                put(self._parent, P()), put(self._depth, P()),
                put(self._bloom_np, P()),
                put(textp, P("index")), put(rstart, P()),
            )
        return self._dev

    def _fn(self, M2, Ms):
        key = (M2, Ms)
        if key not in self._fns:
            self._fns[key] = make_sharded_mem_classify(
                self.mesh, self.sh,
                K=self.seed_K, j0=self.cfg.min_fragment_length - 1,
                min_len=self.cfg.min_fragment_length,
                M2=M2, Ms=Ms, T=self.T, R=self.R,
                cap=self.cfg.max_match_ids,
                m=self._bloom_m, lb=self._bloom_lb,
            )
        return self._fns[key]

    @staticmethod
    def _bucket(n, lo):
        b = lo
        while b < n:
            b *= 2
        return b

    def classify(self, per_shard_batches):
        """per_shard_batches: list of n_data (flat, frag_off, rf_rows).

        Returns int32 [D, B, 4] per read: (lca, longest, flags, n_ids).
        Funnel-budget overflow (n2 > M2 or survivors > Ms) is handled
        here — budgets grow and the batch reruns, mirroring the
        single-chip retry (engine/mem_fast.py _collect_tail); FLAG_*
        columns are the caller's contract (see classify_reads)."""
        flat = np.stack([b[0] for b in per_shard_batches])
        off = np.stack([b[1] for b in per_shard_batches])
        rf = np.stack([b[2] for b in per_shard_batches])

        def put(arr, spec):
            return jax.device_put(arr, NamedSharding(self.mesh, spec))

        while True:
            out = np.asarray(self._fn(self._m2, self._ms)(
                *self._index_args(),
                put(flat, P("data")), put(off, P("data")), put(rf, P("data")),
            ))
            n2 = int(out[:, -1, 0].max())
            n_surv = int(out[:, -1, 1].max())
            if n2 <= self._m2 and n_surv <= self._ms:
                return out[:, :-1, :]
            P_ = int(flat.shape[1])
            self._m2 = min(
                self._bucket(max(self._m2, n2), 4096),
                self._bucket(P_, 4096),
            )
            self._ms = self._bucket(max(self._ms, n_surv), 4096)
            self._caps.update(m2=self._m2, ms=self._ms)

    def submit_batch(self, reads):
        """Fragments `reads` across the data axis and dispatches the
        sharded step asynchronously (index stays device-resident)."""
        from ..engine.fragments_native import NativeFragmenter
        from ..index.alphabet import trans_table

        cfg = self.cfg
        D = self.n_data
        per = -(-len(reads) // D)
        pad = per * D - len(reads)
        items = list(reads) + [("~pad", "", None)] * pad
        if getattr(self, "_frag", None) is None:
            self._frag = NativeFragmenter(
                "mem", cfg.min_fragment_length, cfg.min_score, cfg.seg,
                cfg.input_is_protein,
            )
        trans = trans_table(self.index.alphabet)
        shards = []
        fallback = set()
        flat_cap = 0
        parts = []
        for d in range(D):
            sub = items[d * per : (d + 1) * per]
            frags, orders = self._frag.run(sub)
            enc = [
                trans[np.frombuffer(f.encode(), np.uint8)] for f in frags
            ]
            parts.append((sub, enc, orders))
            flat_cap = max(flat_cap, sum(len(e) for e in enc))
        flat_cap = self._bucket(max(flat_cap, 1), 1024)
        F_cap = self._bucket(
            max(max(len(p[1]) for p in parts), 1), 128
        )
        for d, (sub, enc, orders) in enumerate(parts):
            flat = np.zeros(flat_cap, np.uint8)
            offs = np.zeros(F_cap + 1, np.int32)
            pos = 0
            for fi, e in enumerate(enc):
                offs[fi] = pos
                flat[pos : pos + len(e)] = e
                pos += len(e)
            offs[len(enc):] = pos
            rf = np.full((per, self.S), -1, np.int32)
            for r, o in enumerate(orders):
                if len(o) > self.S:
                    fallback.add(d * per + r)
                rf[r, : len(o)] = o[: self.S]
            shards.append((flat, offs, rf))

        from . import multihost

        def put(arr, spec):
            return multihost.put_global(arr, self.mesh, spec)

        flat = np.stack([s[0] for s in shards])
        off = np.stack([s[1] for s in shards])
        rf = np.stack([s[2] for s in shards])
        caps = (self._m2, self._ms)
        out = self._fn(*caps)(
            *self._index_args(),
            put(flat, P("data")), put(off, P("data")), put(rf, P("data")),
        )
        return (reads, per, fallback, (flat, off, rf), caps, out)

    def collect_batch(self, state):
        """Fetch + capacity-retry + flagged-read host replay.

        Multi-process: every process fetches only its ADDRESSABLE
        data-axis rows and returns results (with host replay) for THOSE
        reads, None elsewhere — the caller merges per-process outputs.
        The overflow counters are pmax'd over the whole mesh inside the
        program, so every process takes the same retry decision.
        Single-process: all rows are local and no entry is None."""
        from ..engine.mem_fast import MemFastPipeline
        from ..ops.fused_classify import FLAG_NEED_MORE, FLAG_TIE_OVER
        from . import multihost

        cfg = self.cfg
        reads, per, fallback, args, caps, out = state
        flat, off, rf = args

        def put(arr, spec):
            return multihost.put_global(arr, self.mesh, spec)

        while True:
            rows = multihost.local_rows(out)  # {d: [B+1, 4]}
            any_row = next(iter(rows.values()))
            n2 = int(any_row[-1, 0])
            n_surv = int(any_row[-1, 1])
            # validate against THIS batch's dispatch-time caps, not the
            # (possibly since-grown) current ones
            if n2 <= caps[0] and n_surv <= caps[1]:
                break
            P_ = int(flat.shape[1])
            self._m2 = min(
                self._bucket(max(self._m2, n2), 4096),
                self._bucket(P_, 4096),
            )
            self._ms = self._bucket(max(self._ms, n_surv), 4096)
            self._caps.update(m2=self._m2, ms=self._ms)
            caps = (self._m2, self._ms)
            out = self._fn(*caps)(
                *self._index_args(),
                put(flat, P("data")), put(off, P("data")),
                put(rf, P("data")),
            )

        local = set()
        for d, arr in rows.items():
            for r in range(per):
                g = d * per + r
                if g >= len(reads):
                    continue
                local.add(g)
                if int(arr[r, 2]) & (FLAG_TIE_OVER | FLAG_NEED_MORE):
                    fallback.add(g)
        redo = {}
        fb = sorted(g for g in fallback if g < len(reads) and g in local)
        if fb:
            if self._host is None:
                self._host = MemFastPipeline(
                    self.index, self._tax, cfg
                )
            sub = [reads[g] for g in fb]
            for g, (_n, res) in zip(fb, self._host.classify_batch(sub)):
                redo[g] = res

        from ..engine.core import ClassifyResult

        results = []
        for g, (name, _s1, _s2) in enumerate(reads):
            if g not in local:
                results.append(None)
                continue
            if g in redo:
                results.append((name, redo[g]))
                continue
            d, r = divmod(g, per)
            lca, score, _fl, n_ids = (int(x) for x in rows[d][r])
            if score == 0 or n_ids == 0:
                results.append((name, ClassifyResult(False, 0)))
            else:
                results.append(
                    (name, ClassifyResult(lca > 0, lca, score=score))
                )
        return results

    def classify_reads(self, reads):
        """Read-level driver: fragments `reads`, spreads them across the
        data axis, classifies on the mesh, and replays flagged reads
        (tie overflow / SA budget / fragment-slot overflow) through the
        exact single-device pipeline — the mesh analog of
        engine/mem_fast.py's _collect_tail fallback."""
        return self.collect_batch(self.submit_batch(reads))

    def classify_stream(self, batches, depth: int = 2):
        """Pipelined mesh classification with `depth` in-flight batches."""
        from collections import deque

        q: deque = deque()
        for batch in batches:
            q.append(self.submit_batch(batch))
            if len(q) > depth:
                yield self.collect_batch(q.popleft())
        while q:
            yield self.collect_batch(q.popleft())
