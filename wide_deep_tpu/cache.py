"""Persistent XLA compilation cache setup.

Compiles of the full train step take minutes on remote-compile TPU
tunnels; the on-disk cache makes every process after the first start in
seconds.  Called from the CLIs, bench and the driver entry points.
Override the location with JAX_COMPILATION_CACHE_DIR; set it empty to
disable.
"""

import os


def enable_compilation_cache() -> None:
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/wdt_jax_cache")
    if not cache_dir:
        return
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass
