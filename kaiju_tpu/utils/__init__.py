"""Shared runtime utilities."""

from .jaxcache import enable_compile_cache

__all__ = ["enable_compile_cache"]
