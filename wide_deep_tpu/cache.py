"""Persistent XLA compilation cache setup.

On a real TPU host the on-disk cache makes every process after the first
start in seconds, and the CLIs, bench and the driver entry points all call
this.  Override the location with JAX_COMPILATION_CACHE_DIR; set it empty
to disable.

Remote-compile tunnels (PALLAS_AXON_REMOTE_COMPILE=1) are the exception,
and the cache is OFF there unless JAX_COMPILATION_CACHE_DIR is set
explicitly: the plugin's executable-deserialize path is slower than
compiling — measured on the production train step (round 4,
tools/lower_profile.py + JAX_DEBUG_LOG_MODULES=jax._src.compiler):
raw remote compile 41.8 s, while a persistent-cache HIT still took
300-520 s end-to-end (the 16 MB executable's deserialize/load through
the tunnel), every single run.  A cache that quadruples warmup is not a
cache.
"""

import logging
import os

log = logging.getLogger("wide_deep_tpu.cache")


def enable_compilation_cache() -> None:
    explicit = "JAX_COMPILATION_CACHE_DIR" in os.environ
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/wdt_jax_cache")
    if not cache_dir:
        return
    # "0"/"" mean the tunnel is OFF (matching the repo's flag convention,
    # e.g. BENCH_SPARSE=0) — only a truthy value disables the cache
    tunnel = os.environ.get("PALLAS_AXON_REMOTE_COMPILE") not in (None, "",
                                                                  "0")
    if tunnel and not explicit:
        log.info("persistent compile cache off: remote-compile tunnel "
                 "deserializes slower than it compiles (set "
                 "JAX_COMPILATION_CACHE_DIR to force)")
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass
