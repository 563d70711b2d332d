#!/usr/bin/env python
"""Microbenchmark: dynamic row gather from a VMEM-resident buffer inside a
Pallas kernel vs XLA's HBM random row gather.

Motivation (round 3): the range-scatter kernel consumes grads in id-sorted
order, produced today by an XLA permute gather ``g[perm]`` at ~5 ns/row
(d8: 5.4 ms, d4: 2.7 ms per step).  But g itself is w * dpool[seg] where
dpool is only [B, D] (~1 MB) — small enough to sit VMEM-resident.  If
Mosaic can gather 1024 dpool rows per grid step by a dynamic index vector
at VPU speed, the kernel can build g_sorted itself and the permute gather
disappears.  This bench answers: does it lower, and at what ns/row?

Timing discipline: chained lax.scan with a real data dependency (see
memory: unchained microbenches read ~0 through the axon tunnel).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, D = 25600, 8
N_IDS = 1 << 20          # ~1M, the d8 stream size
TILE = 1024


def _gather_kernel(seg_ref, w_ref, dpool_ref, out_ref):
    # dpool_ref: full [B, D] resident block; seg_ref: [TILE] int32 in SMEM?
    # try vector fancy-indexing (jnp.take) — the lowering under test
    seg = seg_ref[...]
    rows = jnp.take(dpool_ref[...], seg, axis=0)  # [TILE, D]
    out_ref[...] = rows * w_ref[...][:, None]


def kernel_gather(seg, w, dpool):
    n = seg.shape[0]
    grid = n // TILE
    return pl.pallas_call(
        _gather_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda t: (t,)),
            pl.BlockSpec((TILE,), lambda t: (t,)),
            pl.BlockSpec((B, D), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, D), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((n, D), jnp.float32),
    )(seg, w, dpool)


def xla_gather(seg, w, dpool):
    return dpool[seg] * w[:, None]


def timeit(fn, *args, iters=30):
    # chain: fold the output back into the first row of dpool so each
    # iteration depends on the previous (defeats tunnel-async illusions)
    seg, w, dpool = args

    def body(carry, _):
        out = fn(seg, w, carry)
        carry = carry.at[0, :].add(out[:TILE].sum(0) * 1e-9)
        return carry, ()

    run = jax.jit(lambda d: jax.lax.scan(body, d, None, length=iters)[0])
    r = run(dpool); r.block_until_ready()          # compile+warm
    t0 = time.perf_counter()
    r = run(dpool); r.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    rng = np.random.default_rng(0)
    seg = jnp.asarray(rng.integers(0, B, N_IDS), jnp.int32)
    w = jnp.asarray(rng.random(N_IDS), jnp.float32)
    dpool = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

    print(f"devices: {jax.devices()}")
    # correctness first (tiny)
    small = seg[:4 * TILE]
    try:
        got = kernel_gather(small, w[:4 * TILE], dpool)
        want = xla_gather(small, w[:4 * TILE], dpool)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)
        print("kernel lowers + matches XLA on", small.shape[0], "ids")
    except Exception as e:  # noqa: BLE001 — report the lowering failure
        print(f"kernel FAILED to lower/run: {type(e).__name__}: {e}")
        return

    dt_k = timeit(kernel_gather, seg, w, dpool)
    dt_x = timeit(xla_gather, seg, w, dpool)
    print(f"pallas vmem-gather: {dt_k*1e3:.3f} ms  "
          f"({dt_k/N_IDS*1e9:.2f} ns/row)")
    print(f"xla hbm gather:     {dt_x*1e3:.3f} ms  "
          f"({dt_x/N_IDS*1e9:.2f} ns/row)")


if __name__ == "__main__":
    main()
