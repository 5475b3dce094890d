"""Pallas row-gather experiments vs the XLA gather baseline.

XLA's HBM row gather measured ~74-88 M rows/s on this chip regardless of
row width 64/128 (bench_gather.py) — descriptor-rate bound, ~23 GB/s of
~800 GB/s HBM.  These kernels test whether hand-issued DMA pipelines or
VMEM-staged tiles beat that; the winner becomes the rank kernel.
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

NB = 500_000
W = 64


def timeit(fn, *args, reps=5):
    np.asarray(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.time() - t0) / reps


# ---------------------------------------------------------------------------
# A: per-row DMA pipeline, depth NS, CH rows per grid step
# ---------------------------------------------------------------------------


def _dma_gather_kernel(idx_ref, tab_ref, out_ref, sems, *, CH, NS):
    g = pl.program_id(0)
    base = g * CH

    def get(i, slot):
        return pltpu.make_async_copy(
            tab_ref.at[idx_ref[base + i]],
            out_ref.at[i],
            sems.at[slot],
        )

    def warm(i, _):
        get(i, i).start()
        return 0

    jax.lax.fori_loop(0, NS, warm, 0)

    def body(i, _):
        slot = jax.lax.rem(i, NS)
        get(i, slot).wait()

        @pl.when(i + NS < CH)
        def _():
            get(i + NS, slot).start()

        return 0

    jax.lax.fori_loop(0, CH, body, 0)


@partial(jax.jit, static_argnums=(2, 3))
def dma_gather(tab, idx, CH, NS):
    N = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // CH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (CH, W), lambda g, s: (g, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NS,))],
    )
    kern = partial(_dma_gather_kernel, CH=CH, NS=NS)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        grid_spec=grid_spec,
    )(idx, tab)


# ---------------------------------------------------------------------------
# B: same, but rank-reduce rows in VMEM after landing (fused compute)
# ---------------------------------------------------------------------------


def _dma_rank_kernel(idx_ref, tab_ref, out_ref, rows, sems, *, CH, NS):
    g = pl.program_id(0)
    base = g * CH

    def get(i, slot):
        return pltpu.make_async_copy(
            tab_ref.at[idx_ref[base + i]], rows.at[slot], sems.at[slot]
        )

    def warm(i, _):
        get(i, i).start()
        return 0

    jax.lax.fori_loop(0, NS, warm, 0)

    def body(i, _):
        slot = jax.lax.rem(i, NS)
        get(i, slot).wait()
        out_ref[i] = jnp.sum(rows[slot])

        @pl.when(i + NS < CH)
        def _():
            get(i + NS, slot).start()

        return 0

    jax.lax.fori_loop(0, CH, body, 0)


@partial(jax.jit, static_argnums=(2, 3))
def dma_rank(tab, idx, CH, NS):
    N = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // CH,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (CH,), lambda g, s: (g,), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((NS, W), jnp.int32),
            pltpu.SemaphoreType.DMA((NS,)),
        ],
    )
    kern = partial(_dma_rank_kernel, CH=CH, NS=NS)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.int32),
        grid_spec=grid_spec,
    )(idx, tab)


# ---------------------------------------------------------------------------
# C: VMEM-resident tile, vector gather via take
# ---------------------------------------------------------------------------

TILE = 16384  # rows in VMEM (16384*64*4 = 4 MB)


def _vmem_gather_kernel(tab_ref, idx_ref, out_ref):
    idx = idx_ref[:]
    out_ref[:] = jnp.take(tab_ref[:], idx, axis=0, indices_are_sorted=False,
                          unique_indices=False, mode="clip")


@jax.jit
def vmem_gather(tab_tile, idx):
    N = idx.shape[0]
    return pl.pallas_call(
        _vmem_gather_kernel,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab_tile, idx)


def main():
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(1, 100, size=(NB, W), dtype=np.int32))

    for n in (262144,):
        idx = jnp.asarray(rng.integers(0, NB, size=n, dtype=np.int32))
        for CH, NS in ((512, 8), (1024, 16), (2048, 16), (4096, 32)):
            try:
                dt = timeit(dma_gather, tab, idx, CH, NS)
                print(f"A dma_gather n={n} CH={CH} NS={NS}: {dt*1000:.2f} ms "
                      f"-> {n/dt/1e6:.1f} M rows/s", flush=True)
            except Exception as e:
                print(f"A dma_gather CH={CH} NS={NS}: FAIL {type(e).__name__}: {e}",
                      flush=True)
        for CH, NS in ((1024, 16), (2048, 32)):
            try:
                dt = timeit(dma_rank, tab, idx, CH, NS)
                print(f"B dma_rank   n={n} CH={CH} NS={NS}: {dt*1000:.2f} ms "
                      f"-> {n/dt/1e6:.1f} M rows/s", flush=True)
            except Exception as e:
                print(f"B dma_rank   CH={CH} NS={NS}: FAIL {type(e).__name__}: {e}",
                      flush=True)

    tile = jnp.asarray(rng.integers(1, 100, size=(TILE, W), dtype=np.int32))
    for n in (65536, 262144):
        idx = jnp.asarray(rng.integers(0, TILE, size=n, dtype=np.int32))
        try:
            dt = timeit(vmem_gather, tile, idx)
            print(f"C vmem_gather n={n} tile={TILE}: {dt*1000:.2f} ms "
                  f"-> {n/dt/1e6:.1f} M rows/s", flush=True)
        except Exception as e:
            print(f"C vmem_gather: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
