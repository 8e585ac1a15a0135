"""Small host-side utilities (memory accounting, profiling helpers)."""

from .mem_usage import memory_usage

__all__ = ["memory_usage"]
