"""Multi-device FM-index: reads data-parallel, index position-sharded.

The reference is single-node shared-memory only (SURVEY.md §2.5); the
TPU-native scale-out story is:

  * "data" mesh axis: read/fragment batches are sharded — embarrassingly
    parallel, mirrors the reference's consumer threads.
  * "index" mesh axis: the BWT block array and occ checkpoints are
    partitioned into contiguous position ranges, one per device, so
    databases larger than one chip's HBM (refseq_ref = 54 GB) fit in
    aggregate HBM.

Rank queries under index sharding use owner-computes + psum: for
rank_c(k), only the device owning block k>>7 contributes its local
checkpoint+scan value; every other device contributes 0; a psum over the
index axis assembles the result, and the global prefix (counts in all
shards before the owner) comes from a small replicated [S, 32] table.
Each backward-extension step is then: local gathers + one int32 psum that
rides the ICI — no gather routing, no ragged all-to-all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..index.core import BLOCK, KaijuIndex


class ShardedIndexArrays:
    """Host-side partitioning of a KaijuIndex into S position shards."""

    def __init__(self, index: KaijuIndex, n_shards: int):
        self.n_shards = n_shards
        blocks = np.asarray(index.bwt).reshape(-1, BLOCK)
        occ = np.asarray(index.occ, dtype=np.int32)
        nb = blocks.shape[0]
        nb_s = -(-nb // n_shards)
        pad = nb_s * n_shards - nb
        if pad:
            blocks = np.concatenate(
                [blocks, np.full((pad, BLOCK), 31, dtype=blocks.dtype)]
            )
            occ = np.concatenate([occ, np.repeat(occ[-1:], pad, axis=0)])
        # occ has nb+1 rows originally; after pad it has nb+pad+1
        self.nb_s = nb_s
        self.blocks_sh = blocks.reshape(n_shards, nb_s, BLOCK)
        # per-shard local occ (nb_s+1 rows) and global prefix at shard start
        occ_local = np.zeros((n_shards, nb_s + 1, occ.shape[1]), dtype=np.int32)
        shard_base = np.zeros((n_shards, occ.shape[1]), dtype=np.int32)
        for s in range(n_shards):
            lo = s * nb_s
            occ_local[s] = occ[lo : lo + nb_s + 1] - occ[lo]
            shard_base[s] = occ[lo]
        self.occ_local = occ_local
        self.shard_base = shard_base
        self.C = np.asarray(index.C, dtype=np.int32)
        # SA samples sharded evenly by sample slot
        ns = len(index.sa_seq)
        ns_s = max(1, -(-ns // n_shards))
        sa_seq = np.zeros(ns_s * n_shards, dtype=np.int32)
        sa_off = np.zeros(ns_s * n_shards, dtype=np.int32)
        sa_seq[:ns] = index.sa_seq
        sa_off[:ns] = index.sa_off
        self.ns_s = ns_s
        self.sa_seq_sh = sa_seq.reshape(n_shards, ns_s)
        self.sa_off_sh = sa_off.reshape(n_shards, ns_s)
        self.nseq = index.nseq
        self.chpt_exp = index.chpt_exp
        self.length = index.length
        # text shards for the hybrid long-match extension: paired
        # 256-byte rows (row b covers text[128b : 128b+256]), sharded
        # by ROW RANGE over the index axis — the same position ranges
        # as the BWT blocks, so the text side owner-computes exactly
        # like rank queries (ROOFLINE.md §5); rank_start is [nseq]
        # int32, replicated like seq_tax
        self.has_text = index.text is not None
        self.textp_sh = None
        self.rank_start = None
        self.ntb_s = 0
        if self.has_text:
            text = np.asarray(index.text, dtype=np.uint8)
            n = text.shape[0]
            ntb = (n + BLOCK - 1) // BLOCK
            ntb_s = -(-ntb // n_shards)
            flat = np.zeros(ntb_s * n_shards * BLOCK + BLOCK, dtype=np.uint8)
            flat[:n] = text
            tp = np.lib.stride_tricks.as_strided(
                flat, shape=(ntb_s * n_shards, 2 * BLOCK), strides=(BLOCK, 1)
            )
            self.ntb_s = ntb_s
            self.textp_sh = np.ascontiguousarray(tp.view(np.int8)).reshape(
                n_shards, ntb_s, 2 * BLOCK
            )
            self.rank_start = index.rank_text_starts().astype(np.int32)


def _sharded_fmindex(blocks_s, occ_s, shard_base, C, nb_s, c, k):
    """Per-device body: rank via owner-computes; psum over 'index'."""
    S = jax.lax.axis_size("index")
    my = jax.lax.axis_index("index")
    b = k >> 7
    owner = jnp.minimum(b // nb_s, S - 1)
    mine = owner == my
    local_b = jnp.clip(b - my * nb_s, 0, nb_s)
    row = blocks_s[jnp.minimum(local_b, nb_s - 1)]
    off = k & (BLOCK - 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    cnt = jnp.sum(
        (row == c[:, None].astype(row.dtype)) & (lanes < off[:, None]),
        axis=1,
        dtype=jnp.int32,
    )
    local = jnp.where(mine, occ_s[local_b, c] + cnt, 0)
    total = jax.lax.psum(local, "index")
    return C[c] + shard_base[owner, c] + total


def make_sharded_extend_all(mesh: Mesh, sh: ShardedIndexArrays):
    """Builds a jitted sharded extend_all over the given mesh.

    Inputs: codes [F, L] uint8 (sharded over 'data'), flen [F].
    Outputs (start, si0, si1) [F, L] sharded over 'data'.
    """
    nb_s = sh.nb_s

    def per_device(blocks_s, occ_s, shard_base, C, codes, flen):
        blocks_s = blocks_s[0]  # shard_map keeps a size-1 shard dim
        occ_s = occ_s[0]
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
            # psum'd activity so every index-shard iterates in lockstep
            return jax.lax.psum(
                jnp.sum((active & (i > 0)).astype(jnp.int32)), "index"
            ) > 0

        def body(state):
            i, si0, si1, active = state
            ext = active & (i > 0)
            cpos = jnp.where(ext, f * L + i - 1, 0)
            c = flat[cpos]
            n0 = _sharded_fmindex(blocks_s, occ_s, shard_base, C, nb_s, c, si0)
            n1 = _sharded_fmindex(blocks_s, occ_s, shard_base, C, nb_s, c, si1)
            ok = ext & (n0 < n1)
            si0 = jnp.where(ok, n0, si0)
            si1 = jnp.where(ok, n1, si1)
            i = jnp.where(ok, i - 1, i)
            return i, si0, si1, ok

        i, si0, si1, _ = jax.lax.while_loop(cond, body, (i, si0, si1, active))
        si0 = jnp.where(valid, si0, 0)
        si1 = jnp.where(valid, si1, 0)
        return i.reshape(F, L), si0.reshape(F, L), si1.reshape(F, L)

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P("index"), P("index"), None, None,  # index arrays
            P("data"), P("data"),  # queries
        ),
        out_specs=(P("data"), P("data"), P("data")),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_sa_lookup(mesh: Mesh, sh: ShardedIndexArrays):
    """Sharded get_suffix walk: BWT byte + rank owner-computed per step;
    SA samples owner-gathered the same way."""
    nb_s = sh.nb_s
    ns_s = sh.ns_s
    nseq = sh.nseq
    e = sh.chpt_exp
    check = (1 << e) - 1

    def per_device(blocks_s, occ_s, shard_base, C, sa_seq_s, sa_off_s, k0):
        blocks_s = blocks_s[0]  # shard_map keeps a size-1 shard dim
        occ_s = occ_s[0]
        sa_seq_s = sa_seq_s[0]
        sa_off_s = sa_off_s[0]
        S = jax.lax.axis_size("index")
        my = jax.lax.axis_index("index")
        N = k0.shape[0]

        def sample(k, steps):
            idx = (k >> e) - ((nseq - 1) >> e) - 1
            idx = jnp.clip(idx, 0, S * ns_s - 1)
            owner = jnp.minimum(idx // ns_s, S - 1)
            li = jnp.clip(idx - my * ns_s, 0, ns_s - 1)
            mine = owner == my
            iseq = jax.lax.psum(jnp.where(mine, sa_seq_s[li], 0), "index")
            pos = jax.lax.psum(jnp.where(mine, sa_off_s[li], 0), "index")
            return iseq, pos + steps

        k = k0
        steps = jnp.zeros(N, dtype=jnp.int32)
        done = (k & check) == 0
        iseq, pos = sample(k, steps)

        def cond(state):
            k, steps, done, iseq, pos = state
            return jax.lax.psum(jnp.sum((~done).astype(jnp.int32)), "index") > 0

        def body(state):
            k, steps, done, iseq, pos = state
            b = k >> 7
            owner = jnp.minimum(b // nb_s, S - 1)
            mine = owner == my
            local_b = jnp.clip(b - my * nb_s, 0, nb_s)
            row = blocks_s[jnp.minimum(local_b, nb_s - 1)]
            off = k & (BLOCK - 1)
            c_local = jnp.take_along_axis(row, off[:, None], axis=1)[:, 0]
            c = jax.lax.psum(
                jnp.where(mine, c_local.astype(jnp.int32), 0), "index"
            )
            lanes = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
            cnt = jnp.sum(
                (row == c[:, None].astype(row.dtype)) & (lanes < off[:, None]),
                axis=1,
                dtype=jnp.int32,
            )
            local = jnp.where(mine, occ_s[local_b, c] + cnt, 0)
            k_new = C[c] + shard_base[owner, c] + jax.lax.psum(local, "index")
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

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            P("index"), P("index"), None, None, P("index"), P("index"),
            P("data"),
        ),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    return jax.jit(fn)


def make_mesh(n_index_shards: int = 1, devices=None) -> Mesh:
    """(data, index) mesh over available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % n_index_shards == 0, (n, n_index_shards)
    arr = np.array(devices).reshape(n // n_index_shards, n_index_shards)
    return Mesh(arr, axis_names=("data", "index"))
