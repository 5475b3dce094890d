"""Microbenchmark: XLA row-gather rates on the real TPU.

Measures rows/s for random row gathers from an HBM-resident table at
various row widths and batch sizes, plus a dependent-chain while_loop
(the backward-extension access pattern).  These constants decide the
MEM/Greedy kernel design.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

print("devices:", jax.devices(), file=sys.stderr)

NB = 500_000


def timeit(fn, *args, reps=5):
    fn(*args)  # compile
    # fetch to synchronize (axon tunnel: block_until_ready is a no-op)
    np.asarray(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.time() - t0) / reps


@partial(jax.jit, static_argnums=(2,))
def gather_sum(tab, idx, reps):
    def body(i, acc):
        rows = tab[(idx + i) % tab.shape[0]]
        return acc + jnp.sum(rows, dtype=jnp.int32)

    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))


@partial(jax.jit, static_argnums=(2,))
def chain_gather(tab, idx, steps):
    """Dependent pointer-chase: next row index depends on current row."""
    def body(i, idx):
        rows = tab[idx]
        return (idx + rows[:, 0] + i) % tab.shape[0]

    return jax.lax.fori_loop(0, steps, body, idx)


@partial(jax.jit, static_argnums=(2,))
def gather_1d(tab1d, idx, reps):
    def body(i, acc):
        vals = tab1d[(idx + i) % tab1d.shape[0]]
        return acc + jnp.sum(vals, dtype=jnp.int32)

    return jax.lax.fori_loop(0, reps, body, jnp.int32(0))


def main():
    rng = np.random.default_rng(0)
    for width in (8, 16, 32, 64, 128):
        tab = jnp.asarray(
            rng.integers(1, 100, size=(NB, width), dtype=np.int32)
        )
        for n in (32768, 262144, 1048576):
            idx = jnp.asarray(rng.integers(0, NB, size=n, dtype=np.int32))
            reps = 8
            dt = timeit(gather_sum, tab, idx, reps)
            rows_s = n * reps / dt
            gbs = rows_s * width * 4 / 1e9
            print(f"gather [{NB},{width}] n={n}: {dt*1000:.2f} ms "
                  f"-> {rows_s/1e6:.1f} M rows/s, {gbs:.1f} GB/s")

    # dependent chain at width 64 (the rec row shape)
    tab = jnp.asarray(rng.integers(1, 100, size=(NB, 64), dtype=np.int32))
    for n in (32768, 262144):
        idx = jnp.asarray(rng.integers(0, NB, size=n, dtype=np.int32))
        steps = 16
        dt = timeit(chain_gather, tab, idx, steps)
        rows_s = n * steps / dt
        print(f"chain  [{NB},64] n={n} steps={steps}: {dt*1000:.2f} ms "
              f"-> {rows_s/1e6:.1f} M rows/s")

    # 1-D element gather (4 bytes per query)
    tab1 = jnp.asarray(rng.integers(1, 100, size=(NB * 64,), dtype=np.int32))
    for n in (262144, 1048576):
        idx = jnp.asarray(
            rng.integers(0, NB * 64, size=n, dtype=np.int32)
        )
        dt = timeit(gather_1d, tab1, idx, 8)
        print(f"gather1d [{NB*64}] n={n}: {dt*1000:.2f} ms "
              f"-> {n*8/dt/1e6:.1f} M elems/s")


if __name__ == "__main__":
    main()
