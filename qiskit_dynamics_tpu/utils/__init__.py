"""Utilities: complex-safe jit boundaries, profiling, metrics."""
from .jit_tools import cjit, encode_complex, decode_complex, to_host
from .metrics import enable_metrics, disable_metrics, solve_metrics, SolveMetrics, solve_span
from .sweep_checkpoint import checkpointed_sweep
