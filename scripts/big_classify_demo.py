"""Classify reads against a >2^31-symbol index on a device mesh.

Round-4 built and verified a 4.4 Gaa BWT (BIGBUILD.log) but never
classified against it; this script closes that gap end-to-end:

  1. build a synthetic protein DB of --letters symbols with
     kt_build_bwt_big (int64 native builder, kaiju_tpu/native/bigsais.cpp);
  2. SAVE it as a sharded ktx directory: per-shard BWT blocks, per-shard
     LOCAL int32 occ checkpoints + int64 global shard bases (the int32-
     per-shard design the index sharding anticipates: each shard holds
     < 2^31 positions, only the shard base needs 64 bits), sharded SA
     samples, int64 C;
  3. load it across an N-device mesh (owner-computes layout of
     kaiju_tpu/parallel/sharded_index.py), recording load wall time and
     per-device resident bytes;
  4. classify --reads protein reads with a fused int64 owner-computes
     MEM step under shard_map: per-end-position maximal backward
     extensions (psum-assembled ranks), host greedyExact statistics
     (the order-independence argument of engine/mem_fast.py), sharded
     SA walks for the tie intervals, LCA on host;
  5. verify parity on --verify sampled reads against a pure-host
     big-rank classifier over the same BWT (independent int64 occ).

Positions in a >2^31 index do not fit the production funnel's int32
lanes; this is the int64 variant of the same owner-computes step
(every rank is local gather + one psum over the "index" axis,
ROOFLINE.md §5).  Run it on the CPU mesh:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/big_classify_demo.py --letters 4400000000

Writes BIGCLASSIFY.log + one JSON summary line.
"""

from __future__ import annotations

import argparse
import ctypes
import json
import os
import resource
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "1")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# the environment's sitecustomize may already have imported jax with a
# TPU platform pinned; positions > 2^31 need x64 and the virtual CPU
# mesh, so override through jax.config (backends initialize lazily)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kaiju_tpu.index.alphabet import MAKEDB_ALPHABET
from kaiju_tpu.index.native_builder import get_lib

BLOCK = 128


def log(fh, msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    fh.write(line + "\n")
    fh.flush()


def peak_rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


# ---------------------------------------------------------------------------
# build + save
# ---------------------------------------------------------------------------


def build_db(fh, letters, threads, seed, allow_small):
    alen = len(MAKEDB_ALPHABET)
    rng = np.random.default_rng(seed)
    t0 = time.time()
    lens = []
    tot = 0
    while tot < letters:
        n = int(rng.integers(150, 451))
        lens.append(n)
        tot += n
    nseq = len(lens)
    seq_len = np.asarray(lens, dtype=np.int64)
    N = tot + nseq
    if not allow_small:
        assert N > (1 << 31) + 1_000_000, "demo must exceed the int32 cap"
    text = np.empty(N, dtype=np.uint8)
    ends = np.cumsum(seq_len + 1)
    starts = ends - seq_len - 1
    chunk = 1 << 28
    for i in range(0, N, chunk):
        j = min(N, i + chunk)
        text[i:j] = rng.integers(1, alen, size=j - i, dtype=np.uint8)
    text[ends - 1] = 0
    tstart = np.zeros(nseq + 1, dtype=np.int64)
    tstart[1:] = ends
    # taxid per INPUT sequence (bench-style star tree under root)
    taxids = (100 + np.arange(nseq, dtype=np.int64) % 97).astype(np.int32)
    log(fh, f"text ready: N={N} ({N/2**31:.2f} x 2^31) nseq={nseq} "
            f"{time.time()-t0:.0f}s RSS {peak_rss_gb():.1f}G")

    e = 5
    first = ((nseq + (1 << e) - 1) >> e) << e
    n_samples = ((N - 1) >> e) - (first >> e) + 1
    bwt = np.empty(N, dtype=np.uint8)
    content_rank = np.empty(nseq, dtype=np.int32)
    sa_seq = np.empty(n_samples, dtype=np.int32)
    sa_off64 = np.empty(n_samples, dtype=np.int64)
    t0 = time.time()
    lib = get_lib()
    rc = lib.kt_build_bwt_big(
        text.ctypes.data_as(ctypes.c_void_p),
        tstart.ctypes.data_as(ctypes.c_void_p),
        nseq, N, alen, e, threads,
        bwt.ctypes.data_as(ctypes.c_void_p),
        content_rank.ctypes.data_as(ctypes.c_void_p),
        sa_seq.ctypes.data_as(ctypes.c_void_p),
        sa_off64.ctypes.data_as(ctypes.c_void_p),
        n_samples,
    )
    assert rc == 0, f"kt_build_bwt_big rc={rc}"
    log(fh, f"BWT built in {time.time()-t0:.0f}s RSS {peak_rss_gb():.1f}G")
    return dict(
        alen=alen, N=N, nseq=nseq, e=e, first=first, text=text,
        starts=starts, ends=ends, seq_len=seq_len, bwt=bwt,
        content_rank=content_rank, sa_seq=sa_seq, sa_off=sa_off64,
        taxids=taxids,
    )


def save_sharded_ktx(fh, db, path, n_shards):
    """Sharded big-index layout: per-shard blocks + LOCAL int32 occ +
    int64 shard bases (each shard holds < 2^31 positions; only the
    global prefix needs 64 bits), sharded SA samples, int64 C."""
    os.makedirs(path, exist_ok=True)
    t0 = time.time()
    alen, N = db["alen"], db["N"]
    bwt = db["bwt"]
    nb = (N + BLOCK - 1) // BLOCK
    nb_s = -(-nb // n_shards)
    C = np.zeros(alen + 1, dtype=np.int64)
    shard_base = np.zeros((n_shards, alen), dtype=np.int64)
    run = np.zeros(alen, dtype=np.int64)
    for s in range(n_shards):
        lo, hi = s * nb_s * BLOCK, min((s + 1) * nb_s * BLOCK, N)
        blk = np.full(nb_s * BLOCK, 255, dtype=np.uint8)
        if hi > lo:
            blk[: hi - lo] = bwt[lo:hi]
        blk2 = blk.reshape(nb_s, BLOCK)
        # local occ: int32 by construction (shard < 2^31 positions)
        occ_l = np.zeros((nb_s + 1, alen), dtype=np.int32)
        for c in range(alen):
            occ_l[1:, c] = (blk2 == c).sum(axis=1)
        np.cumsum(occ_l, axis=0, out=occ_l)
        shard_base[s] = run
        run = run + occ_l[-1].astype(np.int64)
        np.save(os.path.join(path, f"blocks_{s}.npy"), blk2)
        np.save(os.path.join(path, f"occ_{s}.npy"), occ_l)
    np.cumsum(run, out=C[1:])
    ns = len(db["sa_seq"])
    ns_s = max(1, -(-ns // n_shards))
    sa_seq = np.zeros(ns_s * n_shards, np.int32)
    sa_off = np.zeros(ns_s * n_shards, np.int64)
    sa_seq[:ns] = db["sa_seq"]
    sa_off[:ns] = db["sa_off"]
    np.save(os.path.join(path, "sa_seq.npy"),
            sa_seq.reshape(n_shards, ns_s))
    np.save(os.path.join(path, "sa_off.npy"),
            sa_off.reshape(n_shards, ns_s))
    np.save(os.path.join(path, "shard_base.npy"), shard_base)
    np.save(os.path.join(path, "C.npy"), C)
    np.save(os.path.join(path, "seq_tax.npy"),
            db["taxids"][np.argsort(db["content_rank"], kind="stable")])
    meta = dict(N=int(N), nseq=int(db["nseq"]), alen=alen, e=db["e"],
                first=int(db["first"]), n_shards=n_shards, nb_s=int(nb_s),
                ns_s=int(ns_s))
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    sz = sum(os.path.getsize(os.path.join(path, f))
             for f in os.listdir(path))
    log(fh, f"sharded ktx saved: {sz/1e9:.2f} GB in {time.time()-t0:.0f}s "
            f"({n_shards} shards x {nb_s} blocks)")
    return meta


# ---------------------------------------------------------------------------
# mesh classification (int64 owner-computes)
# ---------------------------------------------------------------------------


def load_mesh(fh, path, meta):
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    S = meta["n_shards"]
    devs = jax.devices()
    assert len(devs) >= S, (len(devs), S)
    mesh = Mesh(np.array(devs[:S]).reshape(1, S), ("data", "index"))
    t0 = time.time()

    def put_sharded(name):
        arrs = [np.load(os.path.join(path, f"{name}_{s}.npy"))
                for s in range(S)]
        stacked = np.stack(arrs)
        return jax.device_put(
            stacked, NamedSharding(mesh, P("index"))
        )

    def put_split(name):
        return jax.device_put(
            np.load(os.path.join(path, f"{name}.npy")),
            NamedSharding(mesh, P("index")),
        )

    def put_rep(name):
        return jax.device_put(
            np.load(os.path.join(path, f"{name}.npy")),
            NamedSharding(mesh, P()),
        )

    arrs = dict(
        blocks=put_sharded("blocks"), occ=put_sharded("occ"),
        sa_seq=put_split("sa_seq"), sa_off=put_split("sa_off"),
        shard_base=put_rep("shard_base"), C=put_rep("C"),
        seq_tax=put_rep("seq_tax"),
    )
    for v in arrs.values():
        v.block_until_ready()
    per_dev = sum(
        sum(s.data.nbytes for s in v.addressable_shards) // S
        for v in arrs.values()
    )
    log(fh, f"mesh load: {time.time()-t0:.1f}s, ~{per_dev/1e6:.0f} MB "
            f"per device x {S} devices")
    return mesh, arrs


def make_mesh_mem_step(mesh, meta, L):
    """Fused int64 sharded MEM step: extensions for every end position
    of [R, L] reads + SA walks for their maximal-match intervals."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    nb_s = meta["nb_s"]
    ns_s = meta["ns_s"]
    e = meta["e"]
    first = meta["first"]
    check = (1 << e) - 1

    def per_device(blocks, occ, shard_base, C, sa_seq, sa_off, codes):
        blocks = blocks[0]
        occ = occ[0]
        sa_seq = sa_seq[0]
        sa_off = sa_off[0]
        S_ = jax.lax.axis_size("index")
        my = jax.lax.axis_index("index")

        def rank1(c, k):
            b = (k >> 7).astype(jnp.int64)
            owner = jnp.minimum(b // nb_s, S_ - 1)
            mine = owner == my
            lb = jnp.clip(b - my * nb_s, 0, nb_s - 1).astype(jnp.int32)
            row = blocks[lb]
            off = (k & (BLOCK - 1)).astype(jnp.int32)
            lanes = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
            cnt = jnp.sum(
                (row == c[:, None].astype(row.dtype))
                & (lanes < off[:, None]),
                axis=1, dtype=jnp.int32,
            )
            local = jnp.where(
                mine, occ[lb, c].astype(jnp.int64) + cnt, 0
            )
            tot = jax.lax.psum(local, "index")
            base = shard_base[jnp.clip(owner, 0, S_ - 1), c]
            return C[c] + base + tot

        R, Lr = codes.shape
        NL = R * Lr
        flat = codes.reshape(-1).astype(jnp.int32)
        lane = jnp.arange(NL, dtype=jnp.int32)
        r = lane // Lr
        j = lane % Lr
        valid = flat > 0
        c0 = jnp.where(valid, flat, 1)
        s0 = C[c0]
        s1 = C[c0 + 1]
        i = j
        act = valid

        def cond(st):
            return jax.lax.psum(
                jnp.sum((st[3] & (st[0] > 0)).astype(jnp.int32)), "index"
            ) > 0

        def body(st):
            i, s0, s1, act = st
            for _ in range(2):
                ext = act & (i > 0)
                cpos = jnp.where(ext, r * Lr + i - 1, 0)
                c = jnp.where(flat[cpos] > 0, flat[cpos], 1)
                n0 = rank1(c, s0)
                n1 = rank1(c, s1)
                ok = ext & (flat[cpos] > 0) & (n0 < n1)
                s0 = jnp.where(ok, n0, s0)
                s1 = jnp.where(ok, n1, s1)
                i = jnp.where(ok, i - 1, i)
                act = ok
            return i, s0, s1, act

        i, s0, s1, _ = jax.lax.while_loop(cond, body, (i, s0, s1, act))

        # SA walk the FIRST position of every maximal interval to a
        # content-rank sequence index (ids for the host LCA); the host
        # decides which intervals contribute
        def walk(kf):
            def sample(k, steps):
                idx = ((k - first) >> e).astype(jnp.int64)
                idx = jnp.clip(idx, 0, S_ * ns_s - 1)
                owner = jnp.minimum(idx // ns_s, S_ - 1)
                li = jnp.clip(idx - my * ns_s, 0, ns_s - 1).astype(
                    jnp.int32
                )
                mine = owner == my
                iseq = jax.lax.psum(
                    jnp.where(mine, sa_seq[li], 0), "index"
                )
                pos = jax.lax.psum(
                    jnp.where(mine, sa_off[li], 0), "index"
                )
                return iseq, pos + steps

            at_sample = (kf >= first) & (((kf - first) & check) == 0)
            steps = jnp.zeros(kf.shape, jnp.int64)
            done = at_sample | (kf < 0)
            iseq0, _p = sample(jnp.maximum(kf, first), steps)
            iseq = jnp.where(at_sample, iseq0, -1).astype(jnp.int64)

            def wcond(st):
                return jax.lax.psum(
                    jnp.sum((~st[2]).astype(jnp.int32)), "index"
                ) > 0

            def wbody(st):
                k, steps, done, iseq = st
                b = (k >> 7).astype(jnp.int64)
                owner = jnp.minimum(b // nb_s, S_ - 1)
                mine = owner == my
                lb = jnp.clip(b - my * nb_s, 0, nb_s - 1).astype(jnp.int32)
                row = blocks[lb]
                off = (k & (BLOCK - 1)).astype(jnp.int32)
                lanes = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
                cb = jnp.sum(
                    jnp.where(
                        mine[:, None] & (lanes == off[:, None]),
                        row.astype(jnp.int32), 0,
                    ), axis=1,
                )
                c = jax.lax.psum(cb, "index")
                cz = jnp.clip(c, 0, C.shape[0] - 2)
                cnt = jnp.sum(
                    (row == c[:, None].astype(row.dtype))
                    & (lanes < off[:, None]),
                    axis=1, dtype=jnp.int32,
                )
                local = jnp.where(
                    mine, occ[lb, cz].astype(jnp.int64) + cnt, 0
                )
                k_new = C[cz] + shard_base[
                    jnp.clip(owner, 0, S_ - 1), cz
                ] + jax.lax.psum(local, "index")
                hit = ~done & (c == 0)
                iseq = jnp.where(hit, k_new, iseq)
                stepping = ~done & ~hit
                k = jnp.where(stepping, k_new, k)
                steps = jnp.where(stepping, steps + 1, steps)
                at_chk = stepping & (k >= first) & (
                    ((k - first) & check) == 0
                )
                s_iseq, _sp = sample(jnp.maximum(k, first), steps)
                iseq = jnp.where(at_chk, s_iseq.astype(jnp.int64), iseq)
                done = done | hit | at_chk
                return k, steps, done, iseq

            _, _, _, iseq = jax.lax.while_loop(
                wcond, wbody, (jnp.maximum(kf, 0), steps, done, iseq)
            )
            return jnp.where(kf >= 0, iseq, -1)

        ids = walk(jnp.where(s1 > s0, s0, jnp.int64(-1)))
        return (
            i.reshape(R, Lr)[None], s0.reshape(R, Lr)[None],
            s1.reshape(R, Lr)[None], ids.reshape(R, Lr)[None],
        )

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P("index"), P("index"), None, None,
                  P("index"), P("index"), P("data")),
        out_specs=(P("data"), P("data"), P("data"), P("data")),
        check_vma=False,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# host oracle (independent int64 rank over the same BWT)
# ---------------------------------------------------------------------------


class HostOracle:
    def __init__(self, db):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from big_build_demo import BigRank

        self.br = BigRank(db["bwt"], db["alen"])
        self.db = db
        self.order = np.argsort(db["content_rank"], kind="stable")
        self.e = db["e"]
        self.first = db["first"]

    def classify(self, codes, min_len=11):
        """greedyExact MEM semantics for one protein read (codes 1..20):
        per-end-position maximal extensions, jstop, maxl, tie taxids."""
        br = self.br
        L = len(codes)
        exts = []
        for j in range(L):
            c = int(codes[j])
            s0, s1 = int(br.C[c]), int(br.C[c + 1])
            i = j
            while i > 0 and s0 < s1:
                c = int(codes[i - 1])
                n0, n1 = br.fmindex(c, s0), br.fmindex(c, s1)
                if n0 >= n1:
                    break
                s0, s1, i = n0, n1, i - 1
            exts.append((i, s0, s1))
        jstop = max(
            (j for j in range(L) if exts[j][0] <= 1), default=-1
        )
        maxl = 0
        for j in range(L):
            i, s0, s1 = exts[j]
            ln = j - i + 1
            if j >= jstop and ln >= min_len and s1 > s0:
                maxl = max(maxl, ln)
        if maxl == 0:
            return 0, set()
        ids = set()
        for j in range(L):
            i, s0, s1 = exts[j]
            if j >= jstop and (j - i + 1) == maxl and s1 > s0:
                for k in range(s0, min(s1, s0 + 16)):
                    ids.add(self.sa_id(k))
        taxs = {int(self.db["taxids"][self.order[r]]) for r in ids}
        return maxl, taxs

    def sa_id(self, k):
        br = self.br
        steps = 0
        while True:
            if k >= self.first and ((k - self.first) & ((1 << self.e) - 1)) == 0:
                return int(self.db["sa_seq"][(k - self.first) >> self.e])
            c = int(br.bwt[k])
            if c == 0:
                return int(k)
            k = br.fmindex(c, k)
            steps += 1
            assert steps < 10_000


# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--letters", type=int, default=4_400_000_000)
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--reads", type=int, default=1024)
    ap.add_argument("--read-len", type=int, default=64)
    ap.add_argument("--verify", type=int, default=24)
    ap.add_argument("--seed", type=int, default=20260821)
    ap.add_argument("--allow-small", action="store_true")
    ap.add_argument("--out", default=None, help="sharded ktx dir "
                    "(default: .bench_cache/bigktx)")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fh = open(os.path.join(root, "BIGCLASSIFY.log"), "w")
    out = args.out or os.path.join(root, ".bench_cache", "bigktx")

    db = build_db(fh, args.letters, args.threads, args.seed,
                  args.allow_small)
    meta = save_sharded_ktx(fh, db, out, args.shards)

    # reads: substrings of DB sequences (some mutated), some junk
    rng = np.random.default_rng(7)
    L = args.read_len
    reads = np.zeros((args.reads, L), dtype=np.uint8)
    truth = np.zeros(args.reads, dtype=np.int64)
    for t in range(args.reads):
        kind = t % 4
        if kind == 3:
            reads[t] = rng.integers(1, db["alen"], size=L)
            truth[t] = -1
            continue
        iseq = int(rng.integers(0, db["nseq"]))
        ln = int(db["seq_len"][iseq])
        take = min(L, ln)
        p = int(db["starts"][iseq]) + int(rng.integers(0, ln - take + 1))
        reads[t, :take] = db["text"][p : p + take]
        if kind == 1:
            for _ in range(2):
                reads[t, int(rng.integers(0, take))] = int(
                    rng.integers(1, db["alen"])
                )
        truth[t] = int(db["taxids"][iseq])

    import jax

    log(fh, f"jax devices: {len(jax.devices())} "
            f"({jax.default_backend()})")
    mesh, arrs = load_mesh(fh, out, meta)
    step = make_mesh_mem_step(mesh, meta, L)

    t0 = time.time()
    i_a, s0_a, s1_a, ids_a = (
        np.asarray(a) for a in step(
            arrs["blocks"], arrs["occ"], arrs["shard_base"], arrs["C"],
            arrs["sa_seq"], arrs["sa_off"], jax.device_put(reads),
        )
    )
    compile_s = time.time() - t0
    t0 = time.time()
    i_a, s0_a, s1_a, ids_a = (
        np.asarray(a) for a in step(
            arrs["blocks"], arrs["occ"], arrs["shard_base"], arrs["C"],
            arrs["sa_seq"], arrs["sa_off"], jax.device_put(reads),
        )
    )
    step_s = time.time() - t0
    i_a, s0_a, s1_a, ids_a = (
        a[0] for a in (i_a, s0_a, s1_a, ids_a)
    )
    seq_tax = np.load(os.path.join(out, "seq_tax.npy"))

    # host statistics from the mesh extensions (greedyExact semantics)
    min_len = 11
    n_cls = 0
    results = []
    for t in range(args.reads):
        lens = np.where(
            (reads[t] > 0) & (s1_a[t] > s0_a[t]),
            np.arange(L) - i_a[t] + 1, 0,
        )
        got = (reads[t] > 0) & (i_a[t] <= 1) & (s1_a[t] > s0_a[t])
        jstop = int(np.max(np.where(got, np.arange(L), -1)))
        elig = (np.arange(L) >= jstop) & (lens >= min_len)
        maxl = int(np.max(np.where(elig, lens, 0)))
        taxs = set()
        if maxl > 0:
            for j in np.nonzero(elig & (lens == maxl))[0]:
                r = int(ids_a[t, j])
                if r >= 0:
                    if r < len(seq_tax):
                        taxs.add(int(seq_tax[r]))
        results.append((maxl, taxs))
        if maxl > 0 and taxs:
            n_cls += 1
    log(fh, f"mesh classify: {args.reads} reads, compile+run "
            f"{compile_s:.1f}s, steady step {step_s:.1f}s "
            f"({args.reads/step_s:.0f} reads/s), {n_cls} classified")

    # parity vs the pure-host big-rank oracle on sampled reads
    t0 = time.time()
    oracle = HostOracle(db)
    n_ok = 0
    for t in range(0, args.reads, max(1, args.reads // args.verify))[
        : args.verify
    ]:
        codes = reads[t][reads[t] > 0]
        maxl_h, taxs_h = oracle.classify(codes, min_len)
        maxl_m, taxs_m = results[t]
        assert maxl_h == maxl_m, (t, maxl_h, maxl_m)
        if maxl_h > 0:
            # the mesh walks only the first position per tie interval;
            # the host oracle's id set is a superset
            assert taxs_m <= taxs_h or taxs_m == taxs_h, (t, taxs_m, taxs_h)
            assert taxs_m, t
            if truth[t] >= 0:
                assert int(truth[t]) in taxs_h, (t, truth[t], taxs_h)
        n_ok += 1
    log(fh, f"parity OK: {n_ok} sampled reads match the host big-rank "
            f"oracle ({time.time()-t0:.0f}s)")

    summary = dict(
        metric="big_index_mesh_classify", letters=int(db["N"]),
        over_2_31=float(db["N"] / 2**31), shards=args.shards,
        reads=args.reads, reads_per_sec=round(args.reads / step_s, 1),
        classified=n_cls, verified=n_ok,
        peak_rss_gb=round(peak_rss_gb(), 1),
    )
    log(fh, json.dumps(summary))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
