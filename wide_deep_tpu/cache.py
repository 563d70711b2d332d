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

_cache_active = False


def persistent_cache_active() -> bool:
    """True when enable_compilation_cache() actually turned the on-disk
    cache on.  Gates the AOT prewarm (Trainer._prewarm, bench.py): the
    jit CALL path does not reuse an AOT-compiled executable in-process
    (measured round 5: AOT compile 54.2 s, then the first call paid its
    own 218.9 s remote compile), so an explicit trace/lower/compile chain
    only pays off when its result lands in the persistent cache for the
    call path to HIT — i.e. exactly when this returns True."""
    return _cache_active


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
        global _cache_active
        _cache_active = True
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass
