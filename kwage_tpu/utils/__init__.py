"""Small host-side utilities (memory accounting, profiling helpers)."""

from .mem_usage import memory_usage
from .profiling import device_trace, report, reset, scope

__all__ = ["memory_usage", "scope", "report", "reset", "device_trace"]
