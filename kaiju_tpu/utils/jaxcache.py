"""Persistent XLA compilation cache.

The classification kernels are large fused programs (20-45 s to compile
against a remote TPU); caching compiled executables on disk makes every
process after the first start instantly.
"""

from __future__ import annotations

import os

_done = False


def call_on_big_stack(fn, *args, **kw):
    """Invoke fn on a dedicated thread with a 512 MB stack.

    XLA:CPU's recursive compiler passes segfault when the MAIN thread's
    stack cannot grow (its headroom depends on the address-space layout
    and shrinks as a long-lived process maps more memory — observed as
    deterministic lane-position-dependent crashes in backend_compile).
    A worker thread's stack is sized at creation, immune to both.  Use
    for calls that may trigger a large compile."""
    import threading

    old = threading.stack_size(1 << 29)
    try:
        out: dict = {}

        def run():
            try:
                out["v"] = fn(*args, **kw)
            except BaseException as e:  # propagate to caller
                out["e"] = e

        t = threading.Thread(target=run, name="kaiju-compile")
        t.start()
        t.join()
    finally:
        threading.stack_size(old)
    if "e" in out:
        raise out["e"]
    return out["v"]


def raise_stack_limit() -> None:
    """Lift the stack rlimit to its hard maximum: XLA:CPU's recursive
    compiler passes exhaust the default 8 MB on the fused programs'
    deep straight-line graphs (deterministic segfault in
    backend_compile; verified fixed by raising the limit)."""
    try:
        import resource

        _soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        resource.setrlimit(resource.RLIMIT_STACK, (hard, hard))
    except Exception:
        pass


def enable_compile_cache(path: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    raise_stack_limit()
    if os.environ.get("KAIJU_TPU_NO_COMPILE_CACHE"):
        # this environment's jaxlib segfaults inside
        # LoadedExecutable.serialize() for some large XLA:CPU
        # executables when the persistent cache writes them; the CPU
        # test lane sets this to trade warm starts for stability (the
        # TPU backend's serialize path is unaffected)
        return
    import jax

    if jax.default_backend() == "cpu":
        # XLA:CPU AOT cache entries bake in tuning pseudo-features
        # (+prefer-no-scatter/gather) that the loader compares against
        # host CPUID and rejects with SIGILL-risk errors even on the
        # exporting machine — the persistent cache is TPU-only
        return

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
