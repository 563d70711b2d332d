"""Pallas range-scatter: MXU one-hot matmuls instead of XLA's serial scatter.

THE problem (measured, v5e, production d8 shapes — ARCHITECTURE.md):
``zeros[1.2M, 8].at[ids_1M].add(g)`` costs ~46 ms in XLA — ~45 ns per id
row, independent of id order or ``indices_are_sorted`` — because TPU XLA
lowers scatter to a serial per-update loop.  That one op is over 40% of the
wide_deep train step.

The kernel here requires ids SORTED ascending plus a tiling that caps each
grid step's row range (built host-side: build_scatter_tiles is the
reference implementation; cpp/fastdata.cc emits the same arrays with the
batch).  Each grid step then:

    1. DMAs a [W] window of ids and its [W, D] grad rows into VMEM
       (window starts 128-aligned so Mosaic can tile the dynamic slice;
       the tile's live ids sit at [off, off+count) inside the window),
    2. builds a one-hot [MAXR, W] tile (iota == ids - row_lo, invalid
       lanes masked) and matmuls it with the grads on the MXU -> dense
       [MAXR, D] partial sum,
    3. read-modify-writes the [MAXR, D] output slab at the 256-aligned
       row_lo (sequential DMA; the grid is sequential, so overlapping
       slabs cannot race).

Duplicates sum inside the matmul (deterministic).  Total traffic is
O(N x D) streamed + O(n_tiles x MAXR x D) sequential slab RMW — no random
access at all.  Measured vs the 46 ms XLA scatter: ARCHITECTURE.md round 2.

Reference semantics anchor: this computes exactly the embedding-gradient
accumulation the reference's SparseApplyAdagrad consumed
(/root/reference/python/lib/joint.py:224-262); only the schedule changes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_IDS = 1024     # max live ids per grid step (one-hot matmul N dimension);
                 # MUST match cpp/fastdata.cc kTIds (parity test enforces)
MAXR = 2048     # row-range cap per grid step (output slab height); total
                 # matmul work scales with n_tiles x MAXR, so keep it just
                 # above the typical 1024-id row span (~1200 rows at d8
                 # density)
ALIGN_IDS = 128  # stream windows start at multiples of this (lane tiling)
ALIGN_ROWS = 256 # slab offsets are multiples of this (sublane tiling; the
                 # FeaturePlan aligns table rows to 256 already)
WINDOW = T_IDS + ALIGN_IDS  # DMA window: aligned start + worst-case offset


def n_tiles_for(n_ids: int, rows: int, t_ids: int = T_IDS,
                maxr: int = MAXR) -> int:
    """Static upper bound on tiles: a new tile starts every t_ids ids OR
    when the (aligned) running range exceeds maxr — at most
    N/T + rows/(maxr - ALIGN_ROWS) + 1 splits for sorted ids.

    ``rows`` is the RAW table row count — padding to the slab grid is
    applied here so every producer/consumer (Python spec, Python tiler, C++
    emitter, kernel wrapper) agrees on the array size for any rows."""
    rows = _rows_pad(rows, maxr)
    return int(np.ceil(n_ids / t_ids)
               + np.ceil(rows / max(maxr - ALIGN_ROWS, 1)) + 1)


def build_scatter_tiles(ids_sorted: np.ndarray, rows: int,
                        t_ids: int = T_IDS, maxr: int = MAXR
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                   np.ndarray]:
    """Host-side tiling of a sorted id stream.

    -> (starts, offs, counts, row_los), each [n_tiles_for(...)] int32,
    padded with empty tiles.  Per tile: the live ids are
    ``ids_sorted[starts+offs : starts+offs+counts]`` with
    ``starts % ALIGN_IDS == 0``, ``offs < ALIGN_IDS``, ``counts <= t_ids``,
    ``row_los % ALIGN_ROWS == 0``, ``row_los <= min(ids)`` and
    ``max(ids) - row_los < maxr``; consecutive tiles partition the stream.
    """
    n = int(ids_sorted.shape[0])
    n_tiles = n_tiles_for(n, rows, t_ids, maxr)
    starts = np.zeros(n_tiles, np.int32)
    offs = np.zeros(n_tiles, np.int32)
    counts = np.zeros(n_tiles, np.int32)
    row_los = np.zeros(n_tiles, np.int32)
    rows_pad = _rows_pad(rows, maxr)
    max_lo = rows_pad - maxr  # multiple of ALIGN_ROWS by construction
    t = 0
    i = 0
    while i < n:
        lo = (int(ids_sorted[i]) // ALIGN_ROWS) * ALIGN_ROWS
        lo = min(lo, max_lo)
        j_cap = min(i + t_ids, n)
        j = int(np.searchsorted(ids_sorted[i:j_cap], lo + maxr,
                                side="left")) + i
        assert j > i, (i, int(ids_sorted[i]), lo, rows)  # id out of range
        starts[t] = (i // ALIGN_IDS) * ALIGN_IDS
        offs[t] = i - starts[t]
        counts[t] = j - i
        row_los[t] = lo
        t += 1
        i = j
    assert t <= n_tiles, (t, n_tiles)
    return starts, offs, counts, row_los


def _rows_pad(rows: int, maxr: int = MAXR) -> int:
    """Output rows padded so every ALIGN_ROWS-aligned slab fits."""
    aligned = ((rows + ALIGN_ROWS - 1) // ALIGN_ROWS) * ALIGN_ROWS
    return max(aligned, maxr)


def _kernel(starts_ref, offs_ref, counts_ref, rowlos_ref, ids_ref, gt_ref,
            zero_ref, out_ref, ids_s, g_s, slab, sems):
    # everything runs TRANSPOSED ([D, ...]) so every dynamic DMA slice is
    # along a 128-aligned lane dimension (Mosaic tiling requirement);
    # the wrapper transposes in/out once per call.  The id/grad stream DMAs
    # are double-buffered (tile t+1 prefetched during tile t's matmul); the
    # slab RMW stays strictly ordered because consecutive tiles' row ranges
    # may overlap.
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    off = offs_ref[t]
    count = counts_ref[t]
    row_lo = pl.multiple_of(rowlos_ref[t], ALIGN_ROWS)
    d, maxr = slab.shape
    window = g_s.shape[2]
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def stream_in(tile, buf, sem_base):
        start = pl.multiple_of(starts_ref[tile], ALIGN_IDS)
        in_ids = pltpu.make_async_copy(
            ids_ref.at[0, pl.ds(start, window)], ids_s.at[buf, 0],
            sems.at[sem_base])
        in_g = pltpu.make_async_copy(
            gt_ref.at[:, pl.ds(start, window)], g_s.at[buf],
            sems.at[sem_base + 1])
        in_ids.start()
        in_g.start()
        return in_ids, in_g

    @pl.when(t == 0)
    def _():
        stream_in(0, 0, 0)

    @pl.when(t + 1 < n_tiles)
    def _():
        stream_in(jnp.minimum(t + 1, n_tiles - 1), nxt, 2 * nxt)

    # always drain this tile's stream (started at t-1, or just above for
    # t=0) so no DMA is left in flight on trailing empty tiles
    start = pl.multiple_of(starts_ref[t], ALIGN_IDS)
    pltpu.make_async_copy(ids_ref.at[0, pl.ds(start, window)],
                          ids_s.at[slot, 0], sems.at[2 * slot]).wait()
    pltpu.make_async_copy(gt_ref.at[:, pl.ds(start, window)],
                          g_s.at[slot], sems.at[2 * slot + 1]).wait()

    @pl.when(count > 0)
    def _():
        in_slab = pltpu.make_async_copy(
            out_ref.at[:, pl.ds(row_lo, maxr)], slab, sems.at[4])
        in_slab.start()
        # live lanes are [off, off+count); others map to -1 (never matches)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
        valid = (lane >= off) & (lane < off + count)
        local = jnp.where(valid, ids_s[slot, 0:1, :] - row_lo, -1)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (maxr, window), 0)
                  == local).astype(gt_ref.dtype)
        # [D, W] x [MAXR, W] contracting W -> [D, MAXR] on the MXU
        part = jax.lax.dot_general(
            g_s[slot], onehot, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        in_slab.wait()
        slab[:] = slab[:] + part.astype(slab.dtype)
        out_w = pltpu.make_async_copy(
            slab, out_ref.at[:, pl.ds(row_lo, maxr)], sems.at[4])
        out_w.start()
        out_w.wait()


def range_scatter_add(ids_sorted: jnp.ndarray, g_sorted: jnp.ndarray,
                      starts: jnp.ndarray, offs: jnp.ndarray,
                      counts: jnp.ndarray, row_los: jnp.ndarray, rows: int,
                      out_dtype=None, interpret: bool = False) -> jnp.ndarray:
    """Sorted-stream scatter-add -> dense [rows, D] gradient.

    Equivalent to ``zeros([rows, D]).at[ids_sorted].add(g_sorted)`` given the
    build_scatter_tiles contract; validated against the XLA scatter in
    tests/test_scatter_kernel.py.
    """
    n, d = g_sorted.shape
    out_dtype = out_dtype or g_sorted.dtype
    n_tiles = starts.shape[0]
    # sublane tiling: the transposed feature axis must be a multiple of 8
    # (fused fold tables have D+n_logits columns, e.g. 9 or 17)
    d_pad = ((d + 7) // 8) * 8
    # pad streams so every aligned [start, start+WINDOW) window is in range;
    # transpose so the id-stream axis is the (128-tiled) lane dimension
    ids_p = jnp.pad(ids_sorted, (0, WINDOW)).reshape(1, -1)
    g_t = jnp.pad(g_sorted, ((0, WINDOW), (0, d_pad - d))).T  # [Dp, N+W]
    # the slab DMA reads MAXR rows at row_lo; pad up (alignment / tiny
    # tables) and slice the result back
    rows_pad = _rows_pad(rows)
    zeros = jnp.zeros((d_pad, rows_pad), out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # ids (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),   # grads [D, N+W]
            pl.BlockSpec(memory_space=pl.ANY),   # zeros (aliased to out)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 1, WINDOW), jnp.int32),       # double-buffered ids
            pltpu.VMEM((2, d_pad, WINDOW), g_sorted.dtype),  # .. grads
            pltpu.VMEM((d_pad, MAXR), out_dtype),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d_pad, rows_pad), out_dtype),
        input_output_aliases={6: 0},  # 4 scalar-prefetch + ids + g -> zeros
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, offs, counts, row_los, ids_p, g_t, zeros)
    out = out.T[:rows]
    return out[:, :d] if d_pad != d else out


# ------------------------------------------------------ window-scatter mode
# Sparse-stream variant of the range kernel (the d16 case: 102k ids over
# 1.5M rows).  The range kernel's tiles there are mostly-empty slabs — its
# read-modify-write sweeps ~rows x D twice and loses to XLA's serial
# scatter (measured round 2).  Window mode instead assigns tile t the FIXED
# row window [t*MAXR, (t+1)*MAXR): windows partition the output exactly, so
# every slab is WRITE-ONLY (no RMW read, no zeros init, no aliasing), and
# the stream window per tile shrinks to a static cap sized from the mean
# occupancy.  A batch whose hottest window overflows the cap sets ok=0 and
# falls back to the XLA scatter for that group (never wrong, only slower).


def window_cap(n_ids: int, rows: int) -> int:
    """Static per-window id cap: 4x the mean ids-per-window,
    ALIGN_IDS-aligned, clamped to [ALIGN_IDS, T_IDS]."""
    n_tiles = max((rows + MAXR - 1) // MAXR, 1)
    mean = n_ids / n_tiles
    cap = int(np.ceil(4.0 * mean / ALIGN_IDS)) * ALIGN_IDS
    return max(ALIGN_IDS, min(cap, T_IDS))


def window_rows_pad(rows: int) -> int:
    return max((rows + MAXR - 1) // MAXR, 1) * MAXR


def window_batch_spec(n_ids: int, rows: int):
    """Shapes/dtypes of the per-batch window-plan arrays."""
    nt = window_rows_pad(rows) // MAXR
    return {"ids": ((n_ids,), np.int32),
            "perm": ((n_ids,), np.int32),
            "tiles": ((3, nt), np.int32),   # starts, offs, counts
            "ok": ((1,), np.int32)}


def make_window_plan(ids_flat: np.ndarray, rows: int,
                     weights_flat: Optional[np.ndarray] = None):
    """Host: flat id vector -> {ids, perm, tiles, ok} window-plan arrays.

    Sorted stream + per-fixed-window (start, off, count); ok=0 when any
    window's id count exceeds the static window_cap (consumer falls back
    to the XLA scatter for this batch).

    ``weights_flat``: entries with weight 0 are packed-pool PADDING whose
    gradients are exactly zero (the pool weight multiplies the gathered
    row) — they are remapped to an out-of-window sentinel so a pool's
    padding (all id 0) cannot overflow window 0's cap."""
    n = int(ids_flat.shape[0])
    spec = window_batch_spec(n, rows)
    out = {k: np.zeros(shape, dt) for k, (shape, dt) in spec.items()}
    if weights_flat is not None:
        sentinel = window_rows_pad(rows)  # beyond the last window
        ids_flat = np.where(weights_flat != 0, ids_flat,
                            sentinel).astype(np.int32)
    order = np.argsort(ids_flat, kind="stable").astype(np.int32)
    ids_sorted = ids_flat[order].astype(np.int32)
    out["ids"], out["perm"] = ids_sorted, order
    nt = spec["tiles"][0][1]
    cap = window_cap(n, rows)
    bounds = np.searchsorted(
        ids_sorted, np.arange(nt + 1, dtype=np.int64) * MAXR, side="left")
    counts = np.diff(bounds)
    if counts.max(initial=0) > cap:
        return out  # ok stays 0: hottest window overflowed the static cap
    starts = (bounds[:-1] // ALIGN_IDS) * ALIGN_IDS
    out["tiles"][0] = starts
    out["tiles"][1] = bounds[:-1] - starts
    out["tiles"][2] = counts
    out["ok"][0] = 1
    return out


def _window_kernel(starts_ref, offs_ref, counts_ref, ids_ref, gt_ref,
                   out_ref, ids_s, g_s, sems):
    # transposed ([D, ...]) like _kernel; out_ref is a BLOCKED [D, MAXR]
    # window written once per grid step — windows partition the rows, so
    # there is no read-modify-write and no zeros initialization at all
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    off = offs_ref[t]
    count = counts_ref[t]
    row_lo = t * MAXR
    window = g_s.shape[2]
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def stream_in(tile, buf, sem_base):
        start = pl.multiple_of(starts_ref[tile], ALIGN_IDS)
        pltpu.make_async_copy(ids_ref.at[0, pl.ds(start, window)],
                              ids_s.at[buf, 0], sems.at[sem_base]).start()
        pltpu.make_async_copy(gt_ref.at[:, pl.ds(start, window)],
                              g_s.at[buf], sems.at[sem_base + 1]).start()

    @pl.when(t == 0)
    def _():
        stream_in(0, 0, 0)

    @pl.when(t + 1 < n_tiles)
    def _():
        stream_in(jnp.minimum(t + 1, n_tiles - 1), nxt, 2 * nxt)

    start = pl.multiple_of(starts_ref[t], ALIGN_IDS)
    pltpu.make_async_copy(ids_ref.at[0, pl.ds(start, window)],
                          ids_s.at[slot, 0], sems.at[2 * slot]).wait()
    pltpu.make_async_copy(gt_ref.at[:, pl.ds(start, window)],
                          g_s.at[slot], sems.at[2 * slot + 1]).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
    valid = (lane >= off) & (lane < off + count)
    local = jnp.where(valid, ids_s[slot, 0:1, :] - row_lo, -1)
    maxr = out_ref.shape[1]
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (maxr, window), 0)
              == local).astype(gt_ref.dtype)
    part = jax.lax.dot_general(
        g_s[slot], onehot, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # [D, MAXR]
    out_ref[...] = part.astype(out_ref.dtype)    # count==0 writes zeros


def window_scatter_add(ids_sorted: jnp.ndarray, g_sorted: jnp.ndarray,
                       starts: jnp.ndarray, offs: jnp.ndarray,
                       counts: jnp.ndarray, rows: int, wcap: int,
                       out_dtype=None, interpret: bool = False
                       ) -> jnp.ndarray:
    """Sorted-stream scatter-add -> dense [rows, D], write-only fixed
    windows (see the window-mode note above).  Requires the
    make_window_plan contract: every window's ids fit in ``wcap``."""
    n, d = g_sorted.shape
    out_dtype = out_dtype or g_sorted.dtype
    d_pad = ((d + 7) // 8) * 8
    w = wcap + ALIGN_IDS
    ids_p = jnp.pad(ids_sorted, (0, w)).reshape(1, -1)
    g_t = jnp.pad(g_sorted, ((0, w), (0, d_pad - d))).T  # [Dp, N+W]
    rows_pad = window_rows_pad(rows)
    n_tiles = rows_pad // MAXR

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # ids (manual DMA)
            pl.BlockSpec(memory_space=pl.ANY),   # grads [D, N+W]
        ],
        out_specs=pl.BlockSpec((d_pad, MAXR), lambda t, *_: (0, t)),
        scratch_shapes=[
            pltpu.VMEM((2, 1, w), jnp.int32),
            pltpu.VMEM((2, d_pad, w), g_sorted.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        _window_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d_pad, rows_pad), out_dtype),
        interpret=interpret,
    )(starts, offs, counts, ids_p, g_t)
    out = out.T[:rows]
    return out[:, :d] if d_pad != d else out


def apply_window_plan(plan_arrays, g_flat: jnp.ndarray, rows: int,
                      out_dtype=None, interpret: bool = False
                      ) -> jnp.ndarray:
    """Device: scatter-add by a window plan, falling back to the XLA
    scatter when the host flagged overflow (ok=0)."""
    out_dtype = out_dtype or g_flat.dtype
    n, d = g_flat.shape
    wcap = window_cap(n, rows)
    tiles = plan_arrays["tiles"]

    def kernel_path(_):
        g_sorted = jnp.take(g_flat, plan_arrays["perm"], axis=0)
        return window_scatter_add(
            plan_arrays["ids"], g_sorted, tiles[0], tiles[1], tiles[2],
            rows, wcap, out_dtype=out_dtype, interpret=interpret)

    def xla_path(_):
        # plan ids are sorted but equivalent to the raw stream under add
        return (jnp.zeros((rows, d), out_dtype)
                .at[plan_arrays["ids"]]
                .add(jnp.take(g_flat, plan_arrays["perm"], axis=0)
                     .astype(out_dtype), mode="drop"))

    if _ASSUME_PLANS_OK:
        # host-dispatched branchless program (Trainer checked ok=1)
        return kernel_path(0)
    return jax.lax.cond(plan_arrays["ok"][0] > 0, kernel_path, xla_path, 0)


# ------------------------------------------------------- host-side plumbing
PALLAS_SCATTER_MIN_IDS = 1 << 17   # below this XLA's ~45 ns/id serial
                                   # scatter beats the kernel's per-tile
                                   # overheads (production d32: 25.6k ids)
PALLAS_WINDOW_MIN_IDS = 1 << 16    # window mode (sparse streams) pays
                                   # ~rows/MAXR fixed tile costs; needs
                                   # enough ids to beat 45 ns/id XLA


COMPACT_FRAC = 0.875  # static live-id cap as a fraction of the stream; a
                      # batch whose live count exceeds it takes the full
                      # (uncompacted) branch — never wrong, only unshrunk

# EXPERIMENTAL (default off; measured a LOSS — keep off).  When True, the
# device programs assume every host plan is kernel-valid (ok=1) and
# live-cap compact — no lax.cond, one branch compiled.  Motivation was the
# profile's multi-ms cond spans (round 4); the measurement killed it: the
# branchless production step did not finish compiling within 900 s on v5e
# (BENCH_ASSUME_OK=1, vs 46 s with the conds), i.e. the conds are
# load-bearing for XLA's compile behavior here, and their spans in the
# profile are operand-wait, not branch cost.  Recorded so it isn't
# retried; the flag stays for kernel-level A/B on other shapes.
_ASSUME_PLANS_OK = False


def set_assume_plans_ok(value: bool) -> None:
    global _ASSUME_PLANS_OK
    _ASSUME_PLANS_OK = bool(value)


def assume_plans_ok() -> bool:
    return _ASSUME_PLANS_OK


def plans_ok_on_host(batch) -> bool:
    """Host-side check that every plan in a (numpy) batch qualifies for
    the branchless device program: kernel-valid (``*_ok_*`` all 1) and
    single-stream ``scat_live_*`` counts within the static compact cap.
    Sharded plans (multi-device) keep their device conds regardless."""
    for k, v in batch.items():
        if "_ok_" in k:
            arr = np.asarray(v)
            # sharded ok arrays ([S] entries) belong to the exchange path,
            # which keeps its device cond regardless of the flag — a
            # legitimate per-shard ok=0 fallback must not veto the batch
            if arr.size == 1 and not np.all(arr > 0):
                return False
        if k.startswith("scat_live_"):
            ids = batch.get(k.replace("_live_", "_ids_"))
            if ids is not None and np.asarray(ids).ndim == 1:
                cap = live_cap(int(np.asarray(ids).shape[0]))
                if np.any(np.asarray(v) > cap):
                    return False
    return True


def live_cap(n_ids: int) -> int:
    """Static cap on live (non-padding) ids for the compacted branch of
    apply_scatter_plan: ALIGN_IDS-aligned COMPACT_FRAC of the stream."""
    cap = int(np.ceil(n_ids * COMPACT_FRAC / ALIGN_IDS)) * ALIGN_IDS
    return min(n_ids, cap)


def scatter_batch_spec(n_ids: int, rows: int):
    """Shapes/dtypes of the per-batch scatter-plan arrays."""
    nt = n_tiles_for(n_ids, rows)
    return {"ids": ((n_ids,), np.int32),
            "perm": ((n_ids,), np.int32),
            "tiles": ((4, nt), np.int32),
            "live": ((1,), np.int32)}


def make_scatter_plan(ids_flat: np.ndarray, rows: int,
                      weights_flat: Optional[np.ndarray] = None):
    """Host: flat (unsorted) id vector -> {ids, perm, tiles, live} arrays.

    ``perm`` maps sorted position -> original flat position (stable), so
    ``g_flat[perm]`` is the grad stream aligned with ``ids``.

    ``weights_flat``: entries with weight 0 are packed-pool PADDING whose
    gradients are exactly zero — they are remapped to an out-of-range
    sentinel so they sort to the stream TAIL, are excluded from every
    tile, and (when the live count fits the static live_cap) from the
    device-side perm gather too (the compacted branch of
    apply_scatter_plan).  ``live`` is the non-padding count.
    """
    n = int(ids_flat.shape[0])
    sentinel = _rows_pad(rows)  # beyond the last slab; kMaxr-padded rows
    if weights_flat is not None:
        ids_flat = np.where(weights_flat != 0, ids_flat,
                            sentinel).astype(np.int32)
    order = np.argsort(ids_flat, kind="stable").astype(np.int32)
    ids_sorted = ids_flat[order].astype(np.int32)
    live = int(np.searchsorted(ids_sorted, sentinel, side="left"))
    nt = n_tiles_for(n, rows)
    starts, offs, counts, row_los = build_scatter_tiles(
        ids_sorted[:live], rows)
    tiles = np.zeros((4, nt), np.int32)
    for i, arr in enumerate((starts, offs, counts, row_los)):
        tiles[i, :arr.shape[0]] = arr
    return {"ids": ids_sorted, "perm": order, "tiles": tiles,
            "live": np.array([live], np.int32)}


def apply_scatter_plan(plan_arrays, g_flat: jnp.ndarray, rows: int,
                       out_dtype=None, interpret: bool = False
                       ) -> jnp.ndarray:
    """Device: scatter-add ``g_flat`` [N, D] by the host plan -> [rows, D].

    When the plan carries a ``live`` count (weight-0 padding sorted to the
    stream tail) and the batch's live count fits the static live_cap, the
    perm gather and the kernel stream shrink to the cap (~12-25% fewer
    random row gathers at production occupancies); an over-cap batch takes
    the full branch, bit-identical to the uncompacted path."""
    tiles = plan_arrays["tiles"]
    n, _ = g_flat.shape

    def run(ids, perm, tile4):
        g_sorted = jnp.take(g_flat, perm, axis=0)
        return range_scatter_add(
            ids, g_sorted, tile4[0], tile4[1], tile4[2], tile4[3], rows,
            out_dtype=out_dtype, interpret=interpret)

    live = plan_arrays.get("live")
    cap = live_cap(n)
    if live is None or cap >= n:
        return run(plan_arrays["ids"], plan_arrays["perm"], tiles)
    nt_cap = n_tiles_for(cap, rows)
    if _ASSUME_PLANS_OK:
        # host-dispatched branchless program (Trainer checked live <= cap)
        return run(plan_arrays["ids"][:cap], plan_arrays["perm"][:cap],
                   tiles[:, :nt_cap])
    return jax.lax.cond(
        live[0] <= cap,
        lambda _: run(plan_arrays["ids"][:cap], plan_arrays["perm"][:cap],
                      tiles[:, :nt_cap]),
        lambda _: run(plan_arrays["ids"], plan_arrays["perm"], tiles),
        0)


# ----------------------------------------------------------- compact plans
# Dedup plans for the fused sparse optimizer (optim/sparse.py
# apply_compact_update): the per-entry cotangent stream is scatter-added
# into a COMPACT row space (one row per unique table id) by the range
# kernel, so huge tables (production d32: 25.6k ids over 10M rows) never
# materialize a dense [rows, D] gradient or sweep their optimizer slots.
# Reference semantics anchor: SparseApplyAdagrad over IndexedSlices
# (/root/reference/python/lib/joint.py:224-262) — tf also deduplicated ids
# and summed slice gradients before the row update.


def compact_plan_spec(n_ids: int):
    """Shapes/dtypes of a compact (dedup) scatter plan for an [n_ids] batch
    stream.  The compact row space is at most n_ids rows."""
    nt = n_tiles_for(n_ids, n_ids)
    return {"uids": ((n_ids,), np.int32),   # unique table rows, sentinel-pad
            "ids": ((n_ids,), np.int32),    # compact rank per sorted entry
            "perm": ((n_ids,), np.int32),
            "tiles": ((4, nt), np.int32)}


def make_compact_plan(ids_flat: np.ndarray, rows: int):
    """Host: flat id vector -> {uids, ids, perm, tiles} np arrays.

    ``ids`` is the sorted stream's compact rank (0,0,1,2,2,...) — scatter
    target rows in the compact space; ``perm`` maps sorted position ->
    original flat position; ``uids[r]`` is the table row of compact rank r,
    padded with distinct ascending sentinels >= rows (out of range:
    consumers gather with clipping and scatter with mode='drop')."""
    n = int(ids_flat.shape[0])
    spec = compact_plan_spec(n)
    order = np.argsort(ids_flat, kind="stable").astype(np.int32)
    ids_sorted = ids_flat[order].astype(np.int32)
    first = np.empty(n, bool)
    first[0] = True
    np.not_equal(ids_sorted[1:], ids_sorted[:-1], out=first[1:])
    compact = (np.cumsum(first) - 1).astype(np.int32)
    u = int(compact[-1]) + 1
    # sentinel padding: distinct ascending values >= rows, so the consumer's
    # sorted-unique scatter (mode='drop') stays honest about uniqueness
    uids = (rows + np.arange(n, dtype=np.int64)).astype(np.int32)
    uids[:u] = ids_sorted[first]
    starts, offs, counts, row_los = build_scatter_tiles(compact, n)
    nt = spec["tiles"][0][1]
    tiles = np.zeros((4, nt), np.int32)
    k = starts.shape[0]
    assert k <= nt, (k, nt)
    tiles[0, :k], tiles[1, :k] = starts, offs
    tiles[2, :k], tiles[3, :k] = counts, row_los
    return {"uids": uids, "ids": compact, "perm": order, "tiles": tiles}


def sharded_compact_plan_spec(n_ids: int, n_shards: int):
    """Shapes/dtypes of PER-TABLE-SHARD compact plans (the multi-device
    fused-optimizer path, optim/sparse.apply_fused_sharded_update): same
    row-shard layout discipline as the sharded scatter plans."""
    cap = shard_cap(n_ids, n_shards)
    nt = n_tiles_for(cap, cap)
    return {"uids": ((n_shards, cap), np.int32),
            "ids": ((n_shards, cap), np.int32),
            "perm": ((n_shards, cap), np.int32),
            "tiles": ((n_shards, 4, nt), np.int32),
            "ok": ((n_shards,), np.int32),
            "live": ((n_shards,), np.int32)}


def make_sharded_compact_plan(ids_flat: np.ndarray, rows: int,
                              n_shards: int):
    """Host: flat id vector -> per-shard compact (dedup) plans.

    Shard s gets make_compact_plan of ITS slice of the globally-sorted
    stream, with ``uids`` LOCALIZED to the shard's row range and ``perm``
    mapping into the GLOBAL flat stream (each device gathers its grad rows
    from the all-gathered cotangent).  ``ok[s]`` is 0 when the shard's
    stream overflows the static cap (consumer falls back to the serial
    per-row update for that shard); ``live[s]`` is the shard's entry count
    (live-cap compaction, shard_live_cap).  Global-batch hosts only
    (single-process meshes or the input service), like the other sharded
    plans."""
    n = int(ids_flat.shape[0])
    if rows % n_shards:
        raise ValueError(f"rows {rows} % n_shards {n_shards} != 0")
    shard_rows = rows // n_shards
    spec = sharded_compact_plan_spec(n, n_shards)
    cap = spec["ids"][0][1]
    nt = spec["tiles"][0][2]
    out = {k: np.zeros(shape, dt) for k, (shape, dt) in spec.items()}
    # sentinel-pad every shard's uids with distinct ascending values >=
    # shard_rows (consumers gather clipped + scatter with drop semantics)
    out["uids"][:] = (shard_rows
                      + np.arange(cap, dtype=np.int64)[None, :]).astype(
                          np.int32)
    order = np.argsort(ids_flat, kind="stable").astype(np.int32)
    ids_sorted = ids_flat[order].astype(np.int32)
    bounds = np.searchsorted(
        ids_sorted, np.arange(n_shards + 1, dtype=np.int64) * shard_rows,
        side="left")
    for s in range(n_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        cnt = hi - lo
        out["live"][s] = cnt
        if cnt > cap:
            continue  # ok stays 0
        out["ok"][s] = 1
        if cnt == 0:
            continue  # valid empty plan
        local = ids_sorted[lo:hi] - s * shard_rows
        first = np.empty(cnt, bool)
        first[0] = True
        np.not_equal(local[1:], local[:-1], out=first[1:])
        compact = (np.cumsum(first) - 1).astype(np.int32)
        u = int(compact[-1]) + 1
        out["uids"][s, :u] = local[first]
        out["ids"][s, :cnt] = compact
        out["perm"][s, :cnt] = order[lo:hi]
        starts, offs, counts, row_los = build_scatter_tiles(compact, cap)
        k = starts.shape[0]
        assert k <= nt, (k, nt)
        out["tiles"][s, 0, :k], out["tiles"][s, 1, :k] = starts, offs
        out["tiles"][s, 2, :k], out["tiles"][s, 3, :k] = counts, row_los
    return out


# ------------------------------------------------------------- dedup plans
# Host side of the dedup exchange (parallel/exchange.dedup_sharded_gather,
# train.yaml sharded_lookup: dedup): per table shard, the UNIQUE ids the
# whole batch needs (localized, sentinel-padded to a static cap), plus a
# per-entry flat slot (shard*cap + position) mapping each batch entry to
# its row in the all-gathered unique-row block.  The exchange then moves
# O(unique x D) row payload instead of the dense exchange's O(B x P x D) —
# the win grows with id duplication (hot keys).
DEDUP_SLACK = 1.5  # cap = slack x the expected unique count per shard


def dedup_cap(n_ids: int, rows: int, n_shards: int) -> int:
    """Static per-shard unique-id cap: DEDUP_SLACK x the expected unique
    count of n_ids uniform draws over rows (hashed ids; real skew only
    LOWERS the unique count), ALIGN_IDS-aligned, clamped by the always-safe
    bounds (shard_rows, n_ids)."""
    shard_rows = rows // n_shards
    lam = n_ids / float(rows)
    e_unique = rows * (1.0 - np.exp(-lam))
    cap = int(np.ceil(DEDUP_SLACK * e_unique / n_shards / ALIGN_IDS)
              ) * ALIGN_IDS
    safe = ((shard_rows + ALIGN_IDS - 1) // ALIGN_IDS) * ALIGN_IDS
    return max(ALIGN_IDS, min(cap, safe, n_ids))


def dedup_batch_spec(n_ids: int, rows: int, n_shards: int,
                     batch_shape) -> dict:
    """Shapes/dtypes of the per-batch dedup-plan arrays."""
    cap = dedup_cap(n_ids, rows, n_shards)
    return {"uids": ((n_shards, cap), np.int32),
            "slots": (tuple(batch_shape), np.int32)}


def make_dedup_plan(ids: np.ndarray, rows: int, n_shards: int):
    """Host: [B, P] id matrix -> {uids [S, cap], slots [B, P]} np arrays.

    ``uids[s]`` holds shard s's unique ids LOCALIZED to its row range,
    sorted, padded with the sentinel ``shard_rows`` (out of local range:
    gathers mask it, scatters drop it); ``slots[b, p]`` = s*cap + j where
    entry (b, p)'s id is ``uids[s, j]``.  Raises when a shard's unique
    count exceeds the static cap — raise train.yaml ``dedup`` slack or use
    the dense exchange for such data."""
    flat = ids.reshape(-1)
    n = int(flat.shape[0])
    if rows % n_shards:
        raise ValueError(f"rows {rows} % n_shards {n_shards} != 0")
    shard_rows = rows // n_shards
    cap = dedup_cap(n, rows, n_shards)
    uniq, inverse = np.unique(flat, return_inverse=True)
    if len(uniq) and (uniq[0] < 0 or uniq[-1] >= rows):
        # an out-of-range id would fall outside every shard's bounds and
        # leave its pos entry unassigned — garbage slots, silently wrong
        # gathers.  Fail loudly like the C++ emitter (fastdata.cc -2) and
        # the other plan builders' sentinels/asserts.
        raise ValueError(
            f"dedup plan: ids out of range [0, {rows}): "
            f"min={int(uniq[0])}, max={int(uniq[-1])} — miswired feature "
            f"or wrong table rows")
    bounds = np.searchsorted(
        uniq, np.arange(n_shards + 1, dtype=np.int64) * shard_rows,
        side="left")
    counts = np.diff(bounds)
    if counts.max(initial=0) > cap:
        raise ValueError(
            f"dedup exchange: a table shard needs {int(counts.max())} "
            f"unique ids > static cap {cap} (n_ids={n}, rows={rows}, "
            f"shards={n_shards}); unusually spread ids — raise "
            f"DEDUP_SLACK or use sharded_lookup: explicit")
    uids = np.full((n_shards, cap), shard_rows, np.int32)
    pos = np.empty(len(uniq), np.int64)
    for s in range(n_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        uids[s, :hi - lo] = uniq[lo:hi] - s * shard_rows
        pos[lo:hi] = s * cap + np.arange(hi - lo)
    slots = pos[inverse].reshape(ids.shape).astype(np.int32)
    return {"uids": uids, "slots": slots}


# ---------------------------------------------------------- sharded plans
# Per-table-shard plans for multi-device meshes: the host sorts the global id
# stream once, splits it at the (static) shard row boundaries, and emits one
# localized stream + tiling per shard.  Each device then runs the kernel on
# ITS shard's stream inside shard_map (parallel/exchange.py
# planned_sharded_gather) — the multi-chip analog of the reference's
# per-PS-task sharded gradient scatter (/root/reference/python/lib/
# joint.py:140-143, 224-262).
#
# Per-shard streams are padded to a static cap of SHARD_SLACK x the even
# split (hashed ids spread ~uniformly; the slack absorbs skew).  A shard
# whose id count exceeds the cap gets ok=0 and empty tiles — the device
# falls back to the XLA scatter for that shard only, so hot-key skew
# degrades performance, never correctness.
SHARD_SLACK = 2  # integer so the C++ emitter computes the identical cap


def shard_cap(n_ids: int, n_shards: int) -> int:
    """Static per-shard stream length: SHARD_SLACK x the even split,
    ALIGN_IDS-aligned, never above n_ids.  MUST match cpp/fastdata.cc
    shard_cap (parity test enforces)."""
    cap = (n_ids * SHARD_SLACK + n_shards - 1) // n_shards
    cap = ((cap + ALIGN_IDS - 1) // ALIGN_IDS) * ALIGN_IDS
    return min(cap, n_ids)


# per-shard live-cap (the sharded analog of live_cap/COMPACT_FRAC): the
# 2x-slack cap above means a shard's stream is typically less than half
# live — hashed ids spread ~evenly (~n/S) and weight-0 pool padding
# (~15-22% at production occupancies) is routed out of every shard.  The
# consumer (parallel/exchange._planned_gather_bwd) conds on the plan's
# per-shard ``live`` count: when it fits this tighter static cap, the
# device-side perm gather and the kernel stream run on the compacted
# prefix (about half the random row crossings); an over-cap shard takes
# the full-width branch — never wrong, only unshrunk.  Rational 5/4 so
# cpp/fastdata.cc computes the identical cap in integers.
SHARD_LIVE_NUM = 5
SHARD_LIVE_DEN = 4


def shard_live_cap(n_ids: int, n_shards: int) -> int:
    """Static compacted per-shard stream length: 1.25x the even split,
    ALIGN_IDS-aligned, never above shard_cap."""
    cap = ((n_ids * SHARD_LIVE_NUM + n_shards * SHARD_LIVE_DEN - 1)
           // (n_shards * SHARD_LIVE_DEN))
    cap = ((cap + ALIGN_IDS - 1) // ALIGN_IDS) * ALIGN_IDS
    return min(cap, shard_cap(n_ids, n_shards))


def sharded_scatter_batch_spec(n_ids: int, rows: int, n_shards: int):
    """Shapes/dtypes of the per-batch sharded scatter-plan arrays."""
    cap = shard_cap(n_ids, n_shards)
    nt = n_tiles_for(cap, rows // n_shards)
    return {"ids": ((n_shards, cap), np.int32),
            "perm": ((n_shards, cap), np.int32),
            "tiles": ((n_shards, 4, nt), np.int32),
            "ok": ((n_shards,), np.int32),
            "live": ((n_shards,), np.int32)}


def make_sharded_scatter_plan(ids_flat: np.ndarray, rows: int,
                              n_shards: int,
                              weights_flat: Optional[np.ndarray] = None):
    """Host: flat id vector -> per-shard {ids, perm, tiles, ok} np arrays.

    ``ids[s]`` holds shard s's ids LOCALIZED to its row range (id -
    s*shard_rows), sorted ascending, zero-padded past its live count;
    ``perm[s]`` maps sorted position -> position in the GLOBAL flat stream
    (so each device gathers its grad rows from the all-gathered cotangent);
    ``tiles[s]`` is the build_scatter_tiles output padded with empty tiles;
    ``ok[s]`` is 0 when the shard's id count overflowed the static cap
    (consumer must fall back to an XLA scatter for that shard).

    ``weights_flat``: entries with weight 0 are packed-pool PADDING whose
    gradients are exactly zero — remapped to an out-of-range sentinel so
    they land in NO shard.  Without the remap every padding entry (id 0)
    counts against SHARD 0's cap: at production padding occupancies
    (~15-22%) and 8 shards, shard 0's count (~n*(1/8 + padding)) exceeds
    the 2x-even-split cap every batch, permanently demoting the row-shard
    that holds the hottest rows to the XLA fallback.

    ``live[s]`` is shard s's id count — the consumer's per-shard live-cap
    compaction conds on it (shard_live_cap above)."""
    n = int(ids_flat.shape[0])
    if rows % n_shards:
        raise ValueError(f"rows {rows} % n_shards {n_shards} != 0")
    shard_rows = rows // n_shards
    spec = sharded_scatter_batch_spec(n, rows, n_shards)
    cap = spec["ids"][0][1]
    nt = spec["tiles"][0][2]
    out = {k: np.zeros(shape, dt) for k, (shape, dt) in spec.items()}
    if weights_flat is not None:
        ids_flat = np.where(weights_flat != 0, ids_flat,
                            rows).astype(np.int32)
    order = np.argsort(ids_flat, kind="stable").astype(np.int32)
    ids_sorted = ids_flat[order].astype(np.int32)
    bounds = np.searchsorted(
        ids_sorted, np.arange(n_shards + 1, dtype=np.int64) * shard_rows,
        side="left")
    for s in range(n_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        cnt = hi - lo
        out["live"][s] = cnt
        if cnt > cap:
            continue  # ok stays 0: consumer falls back to XLA for shard s
        out["ok"][s] = 1
        if cnt == 0:
            continue  # valid empty plan (all tiles empty)
        local = ids_sorted[lo:hi] - s * shard_rows
        out["ids"][s, :cnt] = local
        out["perm"][s, :cnt] = order[lo:hi]
        starts, offs, counts, row_los = build_scatter_tiles(
            local, shard_rows)
        k = starts.shape[0]
        assert k <= nt, (k, nt)
        out["tiles"][s, 0, :k] = starts
        out["tiles"][s, 1, :k] = offs
        out["tiles"][s, 2, :k] = counts
        out["tiles"][s, 3, :k] = row_los
    return out


def sharded_window_batch_spec(n_ids: int, rows: int, n_shards: int):
    """Shapes/dtypes of per-shard WINDOW-mode plan arrays.  Same layout as
    the sharded range plan but tiles are [3, n_windows] (starts, offs,
    counts — window t covers the FIXED local rows [t*MAXR, (t+1)*MAXR)),
    which is how consumers (parallel/exchange.py) tell the modes apart."""
    cap = shard_cap(n_ids, n_shards)
    nt = window_rows_pad(rows // n_shards) // MAXR
    return {"ids": ((n_shards, cap), np.int32),
            "perm": ((n_shards, cap), np.int32),
            "tiles": ((n_shards, 3, nt), np.int32),
            "ok": ((n_shards,), np.int32),
            "live": ((n_shards,), np.int32)}


def make_sharded_window_plan(ids_flat: np.ndarray, rows: int, n_shards: int,
                             weights_flat: Optional[np.ndarray] = None):
    """Host: flat id vector -> per-shard window-mode {ids, perm, tiles, ok}.

    The sparse-stream analog of make_sharded_scatter_plan (the d16 case on
    a mesh: too few ids for range mode, enough to beat the XLA serial
    scatter with write-only fixed windows).  ``ok[s]`` is 0 when shard s's
    stream overflowed the cap OR one of its windows overflowed the static
    window_cap(cap, shard_rows); weight-0 padding is remapped out of every
    shard (zero gradients, see make_sharded_scatter_plan); ``live[s]`` is
    shard s's id count (the consumer's live-cap compaction)."""
    n = int(ids_flat.shape[0])
    if rows % n_shards:
        raise ValueError(f"rows {rows} % n_shards {n_shards} != 0")
    shard_rows = rows // n_shards
    spec = sharded_window_batch_spec(n, rows, n_shards)
    cap = spec["ids"][0][1]
    nt = spec["tiles"][0][2]
    wcap = window_cap(cap, shard_rows)
    out = {k: np.zeros(shape, dt) for k, (shape, dt) in spec.items()}
    if weights_flat is not None:
        ids_flat = np.where(weights_flat != 0, ids_flat,
                            rows).astype(np.int32)
    order = np.argsort(ids_flat, kind="stable").astype(np.int32)
    ids_sorted = ids_flat[order].astype(np.int32)
    shard_bounds = np.searchsorted(
        ids_sorted, np.arange(n_shards + 1, dtype=np.int64) * shard_rows,
        side="left")
    for s in range(n_shards):
        lo, hi = int(shard_bounds[s]), int(shard_bounds[s + 1])
        cnt = hi - lo
        out["live"][s] = cnt
        if cnt > cap:
            continue  # ok stays 0: consumer falls back to XLA for shard s
        local = ids_sorted[lo:hi] - s * shard_rows
        bounds = np.searchsorted(
            local, np.arange(nt + 1, dtype=np.int64) * MAXR, side="left")
        counts = np.diff(bounds)
        if counts.max(initial=0) > wcap:
            continue  # hot window: ok stays 0
        out["ok"][s] = 1
        if cnt == 0:
            continue  # valid empty plan (all windows empty)
        out["ids"][s, :cnt] = local
        out["perm"][s, :cnt] = order[lo:hi]
        starts = (bounds[:-1] // ALIGN_IDS) * ALIGN_IDS
        out["tiles"][s, 0] = starts
        out["tiles"][s, 1] = bounds[:-1] - starts
        out["tiles"][s, 2] = counts
    return out
