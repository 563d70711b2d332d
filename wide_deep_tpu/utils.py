"""Small cross-cutting utilities (reference python/lib/utils/util.py parity).

``timer`` / ``elapse_time`` instrumentation decorators, schema dtype mapping
for clients, and profiling hooks around jax.profiler (the reference had no
profiler integration at all — SURVEY.md §5.1)."""

from __future__ import annotations

import contextlib
import functools
import logging
import os
import time
from typing import Dict, Optional

log = logging.getLogger("wide_deep_tpu")


def timer(info: str = ""):
    """Decorator printing the wrapped call's wall time (util.py:18-29)."""

    def decorate(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            start = time.time()
            result = fn(*args, **kwargs)
            log.info("%s elapsed %.2f s", info or fn.__name__,
                     time.time() - start)
            return result
        return wrapper
    return decorate


def elapse_time(start: float) -> float:
    """Seconds elapsed since ``start`` (util.py:32-33)."""
    return round(time.time() - start, 3)


def column_to_dtype(config) -> Dict[str, str]:
    """Schema column -> dtype name for client-side serialization
    (util.py:61-80): label + identity + continuous are numeric, everything
    else string."""
    feature_conf = config.read_feature_conf()
    out = {config.label_column: "int64"}
    for name in config.schema_columns()[1:]:
        conf = feature_conf.get(name)
        if conf is None:
            out[name] = "string"
        elif conf["type"] == "continuous":
            out[name] = "float32"
        elif conf["transform"] == "identity":
            out[name] = "int64"
        else:
            out[name] = "string"
    return out


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """jax.profiler trace scope; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    import jax
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", logdir)
