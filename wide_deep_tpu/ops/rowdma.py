"""Per-row-DMA scatter-assign of unique sorted rows into a huge table.

The compact sparse-optimizer path (optim/sparse.py) updates ~25.6k unique
touched rows of the 10M-row d32 table per step.  XLA lowers each
``.at[uids].set/.add`` to a serial per-row loop (~117 ns/row for 64 B
rows; ~6.2 ms/step across the param + accumulator buffers at production
shapes — ARCHITECTURE.md round-3 log).  This kernel instead issues one
async row copy per touched row with a ring of DMA semaphores keeping
copies in flight: measured **~81 ns/row** on v5e, 2.5x XLA's loop
(tools/microbench_rowdma_scatter.py).

Hardware constraint (measured, jax 0.9.0 Mosaic): the row slice must be
EXACTLY one 128-lane float32 tile — f32 [R, 128] works; f32 [R, 32/64]
and int8/int16 bitcast views all fail to compile.  That constraint is why
optim/sparse.py stores fused-layout tables: param + optimizer slots side
by side in one f32 [rows, 128] matrix, updated by ONE row copy each.

Reference semantics anchor: the in-place row writes of SparseApplyAdagrad
/ SparseApplyFtrl (/root/reference/python/lib/joint.py:224-262).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FUSED_WIDTH = 128   # one 128-lane f32 tile per row: the only row shape the
                    # DMA engine accepts for dynamic single-row copies
_CHUNK = 512        # uids processed per grid step
_RING = 8           # DMA semaphores in flight (8 vs 32 measured equal)


def _kernel(n_rows: int, uids_ref, rows_ref, table_ref, out_ref, sems):
    """Grid step t copies rows [t*_CHUNK, (t+1)*_CHUNK) to their uid rows.

    uids are SORTED UNIQUE with out-of-range sentinel padding at the tail
    (ops/scatter.make_compact_plan): sentinel entries are skipped — their
    start and wait share the same uid predicate, so every semaphore slot
    pairs start/wait consistently."""
    t = pl.program_id(0)

    def copy(i):
        k = t * _CHUNK + i
        return pltpu.make_async_copy(
            rows_ref.at[pl.ds(k, 1)],
            out_ref.at[pl.ds(uids_ref[k], 1)],
            sems.at[jax.lax.rem(i, _RING)])

    def valid(i):
        k = t * _CHUNK + i
        return (uids_ref[k] >= 0) & (uids_ref[k] < n_rows)

    def body(i, _):
        @pl.when((i >= _RING) & valid(i - _RING))
        def _():
            copy(i - _RING).wait()

        @pl.when(valid(i))
        def _():
            copy(i).start()

        return 0

    jax.lax.fori_loop(0, _CHUNK, body, 0, unroll=False)

    def drain(i, _):
        @pl.when(valid(_CHUNK - _RING + i))
        def _():
            copy(_CHUNK - _RING + i).wait()

        return 0

    jax.lax.fori_loop(0, _RING, drain, 0, unroll=False)


def rowdma_scatter_rows(table: jnp.ndarray, uids: jnp.ndarray,
                        new_rows: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Scatter-assign ``new_rows`` [N, 128] f32 into ``table`` [R, 128] f32
    at sorted-unique ``uids`` [N] int32 (out-of-range sentinels dropped).

    Semantically ``table.at[uids].set(new_rows, mode="drop",
    unique_indices=True, indices_are_sorted=True)``; the table buffer is
    donated to the kernel (in-place row writes, no full-table copy).

    On CPU (tests, virtual meshes) the XLA scatter is used — the kernel's
    per-row interpret-mode emulation is ~1000x slower than the real thing
    and the XLA path is the semantic reference anyway.
    """
    n = uids.shape[0]
    r, d = table.shape
    assert d == FUSED_WIDTH and new_rows.shape[1] == FUSED_WIDTH, (
        "row-DMA scatter needs one 128-lane f32 tile per row (see module "
        "docstring)")
    assert table.dtype == jnp.float32 == new_rows.dtype
    if interpret:
        return table.at[uids].set(new_rows, mode="drop",
                                  unique_indices=True,
                                  indices_are_sorted=True)
    pad = (-n) % _CHUNK
    if pad:
        # pad with sentinel uids (skipped in-kernel)
        uids = jnp.concatenate([uids, jnp.full((pad,), r, jnp.int32)])
        new_rows = jnp.concatenate(
            [new_rows, jnp.zeros((pad, d), new_rows.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((n + pad) // _CHUNK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # new_rows
            pl.BlockSpec(memory_space=pltpu.HBM),   # table (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_RING,))],
    )
    return pl.pallas_call(
        functools.partial(_kernel, r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={2: 0},  # 1 scalar-prefetch + new_rows -> table
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(uids, new_rows, table)
