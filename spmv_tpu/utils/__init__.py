"""Utilities: persistent compile cache, bandwidth model, profiling."""

from .cache import enable_compile_cache
from .perfmodel import bytes_moved, roofline_gflops

__all__ = ["enable_compile_cache", "bytes_moved", "roofline_gflops"]
