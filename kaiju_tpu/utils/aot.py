"""Ahead-of-time export cache for the fused classification programs.

The fused MEM/Greedy programs are large enough that jax's Python
tracing + StableHLO lowering takes minutes per process — the persistent
XLA compile cache only skips the backend compile, not the trace.  This
cache serializes the EXPORTED (lowered) module to disk next to the
index: a fresh process deserializes and calls it directly, skipping
tracing entirely; the backend compile of the deserialized module then
hits the persistent XLA cache.  Net effect: warmup drops from minutes
to seconds for every process after the first.

Artifacts are keyed by a content hash of the compute-path sources plus
the argument shape/dtype signature, so a code change or a new shape
bucket invalidates cleanly.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

_SRC_HASH: Optional[str] = None


def _compute_source_hash() -> str:
    import kaiju_tpu.ops.device_index
    import kaiju_tpu.ops.fused_classify
    import kaiju_tpu.ops.fused_greedy
    import kaiju_tpu.ops.fused_mem2

    h = hashlib.sha256()
    for mod in (
        kaiju_tpu.ops.fused_mem2,
        kaiju_tpu.ops.fused_classify,
        kaiju_tpu.ops.fused_greedy,
        kaiju_tpu.ops.device_index,
    ):
        try:
            with open(mod.__file__, "rb") as fh:
                h.update(fh.read())
        except OSError:
            h.update(mod.__name__.encode())
    return h.hexdigest()[:16]


def source_hash() -> str:
    global _SRC_HASH
    if _SRC_HASH is None:
        _SRC_HASH = _compute_source_hash()
    return _SRC_HASH


_MACHINE_SIG: Optional[str] = None


def machine_sig() -> str:
    """Host/chip feature identity for artifact keys: a lowered module
    exported on one CPU can carry machine-feature assumptions (XLA:CPU
    loader warns of SIGILL risk when they mismatch), so artifacts from
    a different machine must never be loaded."""
    global _MACHINE_SIG
    if _MACHINE_SIG is not None:
        return _MACHINE_SIG
    import platform

    import jax

    parts = [platform.machine()]
    try:
        parts.append(jax.devices()[0].device_kind)
    except Exception:
        pass
    if jax.default_backend() == "cpu":
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith("flags"):
                        parts.append(line.strip())
                        break
        except OSError:
            pass
    _MACHINE_SIG = hashlib.sha256(
        "|".join(parts).encode()
    ).hexdigest()[:8]
    return _MACHINE_SIG


def _args_sig(args) -> str:
    import numpy as np

    h = hashlib.sha256()
    for a in args:
        if a is None:
            h.update(b"N")
        elif isinstance(a, (int, bool)):
            h.update(f"i{int(a)}".encode())
        elif hasattr(a, "shape"):
            h.update(
                f"{tuple(a.shape)}{np.dtype(a.dtype).str}".encode()
            )
        else:
            h.update(repr(a).encode())
    return h.hexdigest()[:16]


class AotCache:
    """Per-database cache of exported fused programs."""

    def __init__(self, cache_dir: Optional[str]):
        self.dir = os.path.join(cache_dir, "aot") if cache_dir else None
        self._loaded: dict = {}

    def call(self, name: str, jit_fn, array_args: tuple, static_args: tuple):
        """Call jit_fn(*array_args, *static_args) through an exported
        artifact when one exists (the statics are baked in at export
        time); export + persist on first use.  Falls back to the plain
        jitted call if export/deserialize fails for any reason."""
        import jax

        # artifacts are platform- AND machine-specific lowered modules
        key = (
            f"{name}-{jax.default_backend()}-{machine_sig()}"
            f"-{source_hash()}"
            f"-{_args_sig(tuple(array_args) + tuple(static_args))}"
        )
        fn = self._loaded.get(key)
        if fn is None:
            fn = self._load_or_export(key, jit_fn, array_args, static_args)
            self._loaded[key] = fn
            # first call triggers the backend compile — run it on a
            # big-stack thread (XLA:CPU's recursive passes overflow the
            # main thread's stack on these programs; jaxcache)
            from .jaxcache import call_on_big_stack

            return call_on_big_stack(fn, *array_args)
        return fn(*array_args)

    def _load_or_export(self, key: str, jit_fn, array_args, static_args):
        from jax import export as jexport

        path = os.path.join(self.dir, key + ".bin") if self.dir else None
        if path and os.path.exists(path):
            try:
                with open(path, "rb") as fh:
                    exp = jexport.deserialize(bytearray(fh.read()))

                def call(*a, _exp=exp):
                    return _exp.call(*a)

                return call
            except Exception:
                pass
        try:
            exp = jexport.export(jit_fn)(*array_args, *static_args)
            if path:
                os.makedirs(self.dir, exist_ok=True)
                tmp = path + ".tmp"
                with open(tmp, "wb") as fh:
                    fh.write(exp.serialize())
                os.replace(tmp, path)

            def call(*a, _exp=exp):
                return _exp.call(*a)

            return call
        except Exception:
            def call(*a):
                return jit_fn(*a, *static_args)

            return call
