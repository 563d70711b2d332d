#!/usr/bin/env python
"""One-off TPU validation: ops/rowdma.rowdma_scatter_rows kernel path vs its
XLA-scatter reference (the interpret path), including sentinel skipping and
the CHUNK padding edge.  CPU tests exercise only the XLA fallback; run this
on the real chip after touching the kernel."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from wide_deep_tpu.ops.rowdma import FUSED_WIDTH, rowdma_scatter_rows

    rng = np.random.default_rng(0)
    for r, n, sent_frac in ((1 << 20, 4096, 0.25),      # CHUNK-aligned n
                            (1 << 20, 3000, 0.3),       # padding edge
                            (10_000_128, 25_600, 0.2)): # production shape
        uids = np.sort(rng.choice(r, n, replace=False)).astype(np.int32)
        # sprinkle sentinel (out-of-range) ids at the TAIL like
        # make_compact_plan's padding
        n_sent = int(n * sent_frac)
        if n_sent:
            uids[-n_sent:] = r
        rows = jnp.asarray(rng.standard_normal((n, FUSED_WIDTH)), jnp.float32)
        table = jnp.asarray(
            rng.standard_normal((r, FUSED_WIDTH)) * 0.01, jnp.float32)
        uids_j = jnp.asarray(uids)
        got = rowdma_scatter_rows(table, uids_j, rows)
        want = rowdma_scatter_rows(table, uids_j, rows, interpret=True)
        live = uids[uids < r]
        np.testing.assert_array_equal(np.asarray(got[live[:512]]),
                                      np.asarray(want[live[:512]]))
        # untouched + near-sentinel rows unchanged
        probe = np.setdiff1d(np.arange(0, r, max(r // 997, 1)), live)[:512]
        np.testing.assert_array_equal(np.asarray(got[probe]),
                                      np.asarray(want[probe]))
        print(f"ok r={r} n={n} sentinels={n_sent}", flush=True)
    print("rowdma kernel == XLA reference on all cases")


if __name__ == "__main__":
    main()
