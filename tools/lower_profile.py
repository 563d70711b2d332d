#!/usr/bin/env python
"""Profile WHERE the production train step's jit lowering time goes.

Round-4 finding (BENCH_PHASE_TIMERS): warmup = trace 0.6 s + lower ~89 s +
compile-or-cache-load ~58 s + execute 0.1 s on this 2-core host — the
persistent compilation cache cannot help with the first two.  This tool
cProfiles the lower() call and sizes the emitted module so the cost has a
name; it found the 89-355 s: ONE eager jnp.asarray constant
(models/deep.py PlanConstants.indicator_wide_rows) whose device buffer the
MLIR constant handler fetched back through the remote tunnel.

The program under test is bench.make_program() — the EXACT program bench.py
measures (same env knobs: BENCH_BATCH_SIZE, BENCH_SCATTER, BENCH_SPARSE,
BENCH_PACK_BUDGET), so this never drifts from what production compiles.

  timeout 900 python tools/lower_profile.py
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import numpy as np

    import bench

    prog = bench.make_program()
    t0 = time.time()
    traced = prog.step.trace(prog.p_struct, prog.ms_struct, prog.opt_struct,
                             prog.batch,
                             jax.ShapeDtypeStruct((2,), np.uint32), 0)
    print(f"trace {time.time()-t0:.1f}s", flush=True)
    print(f"jaxpr eqns: {len(traced.jaxpr.eqns)}", flush=True)

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    lowered = traced.lower()
    prof.disable()
    print(f"lower {time.time()-t0:.1f}s", flush=True)
    s = io.StringIO()
    pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())

    t0 = time.time()
    blob = lowered.compiler_ir("stablehlo").operation.get_asm(
        binary=True, enable_debug_info=False)
    print(f"stablehlo bytes: {len(blob)/1e6:.1f} MB "
          f"(serialize {time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
