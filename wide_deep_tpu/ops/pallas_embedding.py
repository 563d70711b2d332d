"""Pallas TPU kernel: embedding row gather with fused combiner weights.

``pallas_gather_weight(table, ids, wts)`` computes
``table[ids] * wts[..., None]`` — the deep arm's pre-combine lookup — as a
hand-written TPU kernel: the table stays in HBM, id blocks ride in SMEM so
row addresses are available for DMA issue, and rows are double-buffered
HBM->VMEM ahead of the weighted write-out.

Status (measured on v5e, production shapes): XLA's native fused gather is
the better choice for these small rows (4-32 floats; DMA-per-row overhead
dominates), so the model keeps ``jnp.take`` — see models/deep.py.  The
kernel is kept as the framework's reference Pallas pattern for the cases
where it wins: larger embedding dims (>=128 lanes) and sharded tables whose
lookups pipeline with the cross-chip collective.  Tested in interpreter mode
on CPU (tests/test_pallas.py) and runnable on TPU via ``interpret=False``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_B = 8


def _gather_kernel(ids_ref, wts_ref, table_ref, out_ref, scratch, sem):
    """One program handles a [TB, L] block of ids.

    ids_ref:  SMEM [TB, L] int32 — row ids (addresses for DMA)
    wts_ref:  VMEM [TB, L] f32   — combiner weights
    table_ref: HBM [R, D]        — the embedding table (not blocked)
    out_ref:  VMEM [TB, L, D]    — weighted rows out
    scratch:  VMEM [2, 1, D]     — double buffer
    sem:      DMA semaphores [2]
    """
    TB, L = ids_ref.shape
    D = out_ref.shape[-1]
    n = TB * L

    def dma(slot, flat_idx):
        i = flat_idx // L
        l = flat_idx % L
        row = ids_ref[i, l]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 1), :],
            scratch.at[slot],
            sem.at[slot])

    # warm-up: start the first row's DMA
    dma(0, 0).start()

    def body(flat_idx, _):
        slot = jax.lax.rem(flat_idx, 2)
        next_slot = jax.lax.rem(flat_idx + 1, 2)

        @pl.when(flat_idx + 1 < n)
        def _():
            dma(next_slot, flat_idx + 1).start()

        dma(slot, flat_idx).wait()
        i = flat_idx // L
        l = flat_idx % L
        w = wts_ref[i, l]
        out_ref[i, l, :] = scratch[slot, 0, :] * w
        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def pallas_gather_weight(table: jnp.ndarray, ids: jnp.ndarray,
                         wts: jnp.ndarray, block_b: int = DEFAULT_BLOCK_B,
                         interpret: bool = False) -> jnp.ndarray:
    """[R, D] table, [B, L] ids/wts -> [B, L, D] weighted rows."""
    B, L = ids.shape
    R, D = table.shape
    if B % block_b != 0:
        raise ValueError(f"batch {B} not divisible by block {block_b}")
    grid = (B // block_b,)
    return pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, L), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_b, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec((block_b, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), table.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 1, D), table.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ids, wts, table)
