"""Pallas row-gather experiments vs the XLA gather baseline.

XLA's HBM row gather measured ~74-88 M rows/s on this chip regardless of
row width 64/128 (bench_gather.py) — descriptor-rate bound, ~23 GB/s of
~800 GB/s HBM.  These kernels test whether hand-issued DMA pipelines beat
that; the winner becomes the rank kernel.  Mosaic constraint: HBM row
slices must be 128-lane aligned, so rows are [128] int32 (512 B) — the
paired-record layout (rec2) the search kernels want anyway.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), file=sys.stderr)

NB = 250_000
W = 128


def timeit(fn, *args, reps=5):
    np.asarray(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.time() - t0) / reps


# ---------------------------------------------------------------------------
# A: issue CH row-DMAs, wait all, emit block
# ---------------------------------------------------------------------------


def _dma_gather_kernel(idx_ref, tab_ref, out_ref, sem, *, CH):
    def issue(i, _):
        pltpu.make_async_copy(
            tab_ref.at[idx_ref[i]], out_ref.at[i], sem
        ).start()
        return 0

    jax.lax.fori_loop(0, CH, issue, 0)

    def drain(i, _):
        pltpu.make_async_copy(
            tab_ref.at[idx_ref[i]], out_ref.at[i], sem
        ).wait()
        return 0

    jax.lax.fori_loop(0, CH, drain, 0)


@partial(jax.jit, static_argnums=(2,))
def dma_gather(tab, idx, CH):
    N = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // CH,),
        in_specs=[
            pl.BlockSpec((CH,), lambda g: (g,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (CH, W), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    kern = partial(_dma_gather_kernel, CH=CH)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        grid_spec=grid_spec,
    )(idx, tab)


# ---------------------------------------------------------------------------
# B: gather into VMEM scratch, vectorized rank-style reduce -> [CH] per step
# ---------------------------------------------------------------------------


def _dma_rank_kernel(idx_ref, tab_ref, out_ref, rows, sem, *, CH):
    def issue(i, _):
        pltpu.make_async_copy(
            tab_ref.at[idx_ref[i]], rows.at[i], sem
        ).start()
        return 0

    jax.lax.fori_loop(0, CH, issue, 0)

    def drain(i, _):
        pltpu.make_async_copy(
            tab_ref.at[idx_ref[i]], rows.at[i], sem
        ).wait()
        return 0

    jax.lax.fori_loop(0, CH, drain, 0)
    out_ref[:] = jnp.sum(rows[:], axis=1)


@partial(jax.jit, static_argnums=(2,))
def dma_rank(tab, idx, CH):
    N = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // CH,),
        in_specs=[
            pl.BlockSpec((CH,), lambda g: (g,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (CH,), lambda g: (g,), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((CH, W), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kern = partial(_dma_rank_kernel, CH=CH)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        grid_spec=grid_spec,
    )(idx, tab)


def main():
    rng = np.random.default_rng(0)
    tab_np = rng.integers(1, 100, size=(NB, W), dtype=np.int32)
    tab = jnp.asarray(tab_np)

    for n in (262144,):
        idx_np = rng.integers(0, NB, size=n, dtype=np.int32)
        idx = jnp.asarray(idx_np)
        for CH in (256, 512, 1024, 2048):
            try:
                out = np.asarray(dma_gather(tab, idx, CH))
                ok = np.array_equal(out, tab_np[idx_np])
                dt = timeit(dma_gather, tab, idx, CH)
                print(f"A dma_gather n={n} CH={CH}: {dt*1000:.2f} ms "
                      f"-> {n/dt/1e6:.1f} M rows/s correct={ok}", flush=True)
            except Exception as e:
                print(f"A dma_gather CH={CH}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
        for CH in (512, 1024, 2048):
            try:
                out = np.asarray(dma_rank(tab, idx, CH))
                ok = np.array_equal(out, tab_np[idx_np].sum(axis=1, dtype=np.int32))
                dt = timeit(dma_rank, tab, idx, CH)
                print(f"B dma_rank   n={n} CH={CH}: {dt*1000:.2f} ms "
                      f"-> {n/dt/1e6:.1f} M rows/s correct={ok}", flush=True)
            except Exception as e:
                print(f"B dma_rank   CH={CH}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
