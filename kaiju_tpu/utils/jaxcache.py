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
    if os.environ.get("KAIJU_TPU_NO_COMPILE_CACHE"):
        # this environment's jaxlib segfaults inside
        # LoadedExecutable.serialize() for some large XLA:CPU
        # executables when the persistent cache writes them; the CPU
        # test lane sets this to trade warm starts for stability (the
        # TPU backend's serialize path is unaffected)
        return
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
        # this environment's zstandard binding segfaults inside
        # ZstdCompressor on the multi-MB fused executables (observed
        # repeatedly under the test lane); jax falls back to zlib when
        # the module is absent, so force that path
        from jax._src import compilation_cache as _cc

        _cc.zstandard = None
    except Exception:
        pass
