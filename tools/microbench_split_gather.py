#!/usr/bin/env python
"""Microbenchmark: one big random row gather vs K parallel split gathers.

Question (round 4): the measured ~5 ns/random-row-crossing gather floor
(ARCHITECTURE.md "Where the remaining 31.7 ms goes") — is it a memory-system
limit, or a per-op DMA issue rate?  If XLA schedules independent gathers on
separate async copy streams, splitting the d8 forward gather (1.024M rows)
into K independent gathers of N/K rows each could overlap them and cut the
chain by up to Kx.  This bench answers that with the production shapes:
[1.2M, 9] bf16 fused d8 table, 1M-row id stream.

Timing discipline: chained lax.scan with a real data dependency through the
TABLE (so the K gathers inside one iteration stay independent of each other
but each iteration depends on the last — defeats tunnel-async illusions).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

R, D = 1_203_200, 9          # the fused d8 table (rows, cols) from bench.py
N_IDS = 1 << 20              # ~1M, the d8 forward stream size


def make_gather(k):
    """Return fn(table, ids) -> scalar folding k split gathers."""

    def fn(table, ids):
        n = ids.shape[0]
        part = n // k
        acc = jnp.zeros((), jnp.float32)
        for i in range(k):
            seg = jax.lax.dynamic_slice_in_dim(ids, i * part, part)
            rows = jnp.take(table, seg, axis=0)          # [part, D]
            acc = acc + rows.astype(jnp.float32).sum()
        return acc

    return fn


def make_gather_concat(k):
    """Concat variant — the form the model's forward would use: K split
    gathers whose results concatenate back to the [N, D] row block."""

    def fn(table, ids):
        n = ids.shape[0]
        part = n // k
        outs = [jnp.take(table,
                         jax.lax.dynamic_slice_in_dim(ids, i * part, part),
                         axis=0) for i in range(k)]
        rows = jnp.concatenate(outs, axis=0) if k > 1 else outs[0]
        return rows.astype(jnp.float32).sum()

    return fn


def timeit(fn, table, ids, iters=30):
    # ids rides as an ARGUMENT, not a closure: a closed-over device array
    # constant makes lowering fetch it back host-side (minutes through a
    # remote tunnel — see models/deep.py PlanConstants)
    def run_fn(t, idv):
        def body(carry, _):
            s = fn(carry, idv)
            return carry.at[0, 0].add(s * 1e-12), ()

        return jax.lax.scan(body, t, None, length=iters)[0]

    run = jax.jit(run_fn)
    r = run(table, ids); r.block_until_ready()        # compile + warm
    t0 = time.perf_counter()
    r = run(table, ids); r.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((R, D)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, R, N_IDS), jnp.int32)
    print(f"devices: {jax.devices()}")
    print(f"table [{R}, {D}] bf16, {N_IDS} random ids")

    base = None
    for k in (1, 2, 4, 8):
        dt = timeit(make_gather(k), table, ids)
        if base is None:
            base = dt
        print(f"sum    k={k}: {dt*1e3:7.3f} ms  ({dt/N_IDS*1e9:5.2f} ns/row)"
              f"  speedup {base/dt:4.2f}x")
    for k in (2, 4):
        dt = timeit(make_gather_concat(k), table, ids)
        print(f"concat k={k}: {dt*1e3:7.3f} ms  ({dt/N_IDS*1e9:5.2f} ns/row)"
              f"  speedup {base/dt:4.2f}x")


if __name__ == "__main__":
    main()
