"""Persistent XLA compilation cache.

The classification kernels are large fused programs (20-45 s to compile
against a remote TPU); caching compiled executables on disk makes every
process after the first start instantly.
"""

from __future__ import annotations

import os

_done = False


def enable_compile_cache(path: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    path = path or os.environ.get(
        "KAIJU_TPU_COMPILE_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "kaiju_tpu", "jax_cache"
        ),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
