"""Persistent XLA compilation cache setup.

The batched kernels compile per (lane-count, step-count) bucket; caching
compiled executables on disk makes every process after the first start
warm (both CPU and TPU backends honor the cache).
"""

from __future__ import annotations

import os

_done = False


def enable_compilation_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import jax

        cache_dir = os.environ.get(
            "ZSTD_TPU_JAX_CACHE", os.path.expanduser("~/.cache/zstd_tpu_jax")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover — cache is an optimization only
        pass
