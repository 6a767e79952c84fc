"""Utilities: complex-safe jit boundaries, profiling, metrics."""
from .jit_tools import cjit, encode_complex, decode_complex
