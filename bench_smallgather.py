"""Microbench: gathers from SMALL 1-D tables (seq_tax / parent / depth
pattern in classify_tail) — suspected pathological copy on TPU."""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

print(jax.devices(), file=sys.stderr)
rng = np.random.default_rng(0)


def timeit(fn, *args, reps=5):
    np.asarray(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.time() - t0) / reps


@jax.jit
def g1(tab, idx):
    return jnp.sum(tab[idx], dtype=jnp.int32)


@jax.jit
def g_clip(tab, idx):
    return jnp.sum(tab[jnp.clip(idx, 0, tab.shape[0] - 1)], dtype=jnp.int32)


@jax.jit
def g_where2d(tab2d, idx):
    # tab reshaped [n/128, 128]: gather row then select lane
    r = tab2d[idx >> 7]
    lanes = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
    return jnp.sum(
        jnp.where(lanes == (idx & 127)[:, None], r, 0), dtype=jnp.int32
    )


for tab_n in (213305, 262144, 2097152):
    tab = jnp.asarray(rng.integers(0, 1000, size=tab_n, dtype=np.int32))
    pad = (-tab_n) % 128
    tab2d = jnp.asarray(
        np.pad(np.asarray(tab), (0, pad)).reshape(-1, 128)
    )
    for nidx in (131072,):
        idx = jnp.asarray(rng.integers(0, tab_n, size=nidx, dtype=np.int32))
        print(f"tab={tab_n} n={nidx}: "
              f"plain {timeit(g1, tab, idx)*1000:.2f} ms, "
              f"clip {timeit(g_clip, tab, idx)*1000:.2f} ms, "
              f"2d-row {timeit(g_where2d, tab2d, idx)*1000:.2f} ms")
