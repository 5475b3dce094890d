"""Sharded (multi-device) search vs single-device kernels on the 8-way
virtual CPU mesh."""

import random

import numpy as np
import pytest

import jax

from kaiju_tpu.engine.search import _extend_backward
from kaiju_tpu.index import py_builder
from kaiju_tpu.index.alphabet import encode_protein
from kaiju_tpu.parallel import sharded_index as shx

from conftest import make_db_records


@pytest.fixture(scope="module")
def env():
    rng = random.Random(31)
    records = make_db_records(rng, nseq=16)
    idx = py_builder.build_index(records)
    return rng, records, idx


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_extend_all(env, n_shards):
    rng, records, idx = env
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = shx.make_mesh(n_index_shards=n_shards)
    sh = shx.ShardedIndexArrays(idx, n_shards)
    fn = shx.make_sharded_extend_all(mesh, sh)

    frags = []
    for _ in range(16):
        _, prot = records[rng.randrange(len(records))]
        ln = rng.randint(6, min(30, len(prot)))
        st = rng.randrange(0, len(prot) - ln + 1)
        frags.append(prot[st : st + ln])
    L = 32
    F = 16  # divisible by data-axis size
    codes = np.zeros((F, L), dtype=np.uint8)
    flen = np.zeros(F, dtype=np.int32)
    for fi, s in enumerate(frags):
        e = encode_protein(s, idx.alphabet)
        codes[fi, : len(e)] = e
        flen[fi] = len(e)

    start, si0, si1 = (
        np.asarray(a)
        for a in fn(sh.blocks_sh, sh.occ_local, sh.shard_base, sh.C, codes, flen)
    )
    for fi, s in enumerate(frags):
        e = encode_protein(s, idx.alphabet)
        for j in range(len(e)):
            i, h0, h1 = _extend_backward(idx, e, j)
            assert (start[fi, j], si0[fi, j], si1[fi, j]) == (i, h0, h1)


def test_sharded_sa_lookup(env):
    rng, _, idx = env
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    n_shards = 4
    mesh = shx.make_mesh(n_index_shards=n_shards)
    sh = shx.ShardedIndexArrays(idx, n_shards)
    fn = shx.make_sharded_sa_lookup(mesh, sh)
    N = 64
    ks = np.array(
        [rng.randrange(idx.nseq, idx.length) for _ in range(N)], dtype=np.int32
    )
    iseq, pos = (
        np.asarray(a)
        for a in fn(
            sh.blocks_sh, sh.occ_local, sh.shard_base, sh.C,
            sh.sa_seq_sh, sh.sa_off_sh, ks,
        )
    )
    for n, k in enumerate(ks):
        wi, wp = idx.get_suffix(int(k))
        assert (iseq[n], pos[n]) == (wi, wp), k
