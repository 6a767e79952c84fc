"""Solver utilities: time-argument bookkeeping and batch broadcasting.

Reference: ``/root/reference/qiskit_dynamics/solvers/solver_utils.py``.
``merge_t_args``/``trim_t_results`` implement the t_span/t_eval union-and-trim
contract; the ``_jax`` versions are jit-compilable, signaling validation errors
by NaN-poisoning and handling duplicate-endpoint edge cases with the
midpoint-shift hack required by adaptive steppers.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp
from jax.lax import cond

from ..exceptions import DynamicsError
from ..models import LindbladModel
from .results import OdeResult

__all__ = [
    "is_lindblad_model_vectorized",
    "is_lindblad_model_not_vectorized",
    "merge_t_args",
    "trim_t_results",
    "merge_t_args_jax",
    "trim_t_results_jax",
    "setup_args_lists",
]


def is_lindblad_model_vectorized(obj) -> bool:
    """True if obj is a vectorized LindbladModel."""
    return isinstance(obj, LindbladModel) and obj.vectorized


def is_lindblad_model_not_vectorized(obj) -> bool:
    """True if obj is a non-vectorized LindbladModel."""
    return isinstance(obj, LindbladModel) and not obj.vectorized


def merge_t_args(t_span, t_eval=None) -> np.ndarray:
    """Merge ``t_span`` and ``t_eval`` into one increasing/decreasing array.

    Host-side (numpy) with scipy-style validation.
    """
    if t_eval is None:
        return np.asarray(t_span)

    t_span = np.asarray(t_span)
    t_min, t_max = np.min(t_span), np.max(t_span)
    t_direction = np.sign(t_span[1] - t_span[0])
    t_eval = np.asarray(t_eval)

    if t_eval.ndim > 1:
        raise ValueError("t_eval must be 1 dimensional.")
    if np.min(t_eval) < t_min or np.max(t_eval) > t_max:
        raise ValueError("t_eval entries must lie in t_span.")
    if np.any(t_direction * np.diff(t_eval) < 0.0):
        raise ValueError("t_eval must be ordered according to the direction of integration.")

    return np.append(np.append(t_span[0], t_eval), t_span[1])


def trim_t_results(results: OdeResult, t_eval=None) -> OdeResult:
    """Remove the added t_span endpoints when ``t_eval`` was given."""
    if t_eval is None:
        return results
    results.t = results.t[1:-1]
    results.y = results.y[1:-1]
    return results


def merge_t_args_jax(t_span, t_eval=None):
    """Jit-compilable :func:`merge_t_args`; NaN-poisons on invalid input.

    Shifts duplicated endpoint entries to interval midpoints (duplicate
    adjacent times break adaptive steppers).
    """
    if t_eval is None:
        return jnp.asarray(t_span)

    t_span = jnp.asarray(t_span)
    t_eval = jnp.asarray(t_eval)
    if t_eval.ndim > 1:
        raise ValueError("t_eval must be 1 dimensional.")

    out = jnp.append(jnp.append(t_span[0], t_eval), t_span[1])

    t_min, t_max = jnp.min(t_span), jnp.max(t_span)
    out = cond(
        (jnp.min(t_eval) < t_min) | (jnp.max(t_eval) > t_max),
        lambda s: jnp.nan * s,
        lambda s: s,
        out,
    )
    t_direction = jnp.sign(t_span[1] - t_span[0])
    out = cond(
        jnp.any(t_direction * jnp.diff(t_eval) < 0.0), lambda s: jnp.nan * s, lambda s: s, out
    )
    out = cond(out[0] == out[1], lambda x: x.at[1].set((x[2] + x[0]) / 2), lambda x: x, out)
    out = cond(out[-1] == out[-2], lambda x: x.at[-2].set((x[-3] + x[-1]) / 2), lambda x: x, out)
    return out


def trim_t_results_jax(results: OdeResult, t_eval=None) -> OdeResult:
    """Jit-compilable :func:`trim_t_results` handling duplicated-time removals."""
    if t_eval is not None:
        results.y = cond(
            jnp.asarray(t_eval)[0] == results.t[0],
            lambda y: jnp.append(jnp.asarray([y[0]]), y[2:], axis=0),
            lambda y: y[1:],
            jnp.asarray(results.y),
        )
        results.y = cond(
            jnp.asarray(t_eval)[-1] == results.t[-1],
            lambda y: jnp.append(y[:-2], jnp.asarray([y[-1]]), axis=0),
            lambda y: y[:-1],
            jnp.asarray(results.y),
        )
        results.t = t_eval

    results.y = cond(
        jnp.asarray(results.t)[0] == jnp.asarray(results.t)[-1],
        lambda y: y.at[-1].set(y[0]),
        lambda y: y,
        jnp.asarray(results.y),
    )
    return results


def setup_args_lists(
    args_list: List, args_names: List[str], args_to_list: List[Callable]
) -> Tuple[List[List], bool]:
    """Broadcast a group of possibly-listed args to lists of equal length."""
    args_as_lists = []
    args_were_lists = False
    for arg, to_list in zip(args_list, args_to_list):
        arg_as_list, arg_was_list = to_list(arg)
        args_as_lists.append(arg_as_list)
        args_were_lists = args_were_lists or arg_was_list

    arg_lens = [len(x) for x in args_as_lists]
    max_len = max(arg_lens)
    for idx, arg_len in enumerate(arg_lens):
        if arg_len not in (1, max_len):
            max_name = args_names[arg_lens.index(max_len)]
            names = ", ".join(args_names[:-1]) + f", and {args_names[-1]}"
            raise DynamicsError(
                f"If one of {names} is given as a list of valid inputs, then the others must "
                f"specify only a single input, or a list of the same length. {max_name} "
                f"specifies {max_len} inputs, but {args_names[idx]} is of length {arg_len}, "
                "which is incompatible."
            )

    args_as_lists = [
        x * max_len if arg_len == 1 else x for x, arg_len in zip(args_as_lists, arg_lens)
    ]
    return args_as_lists, args_were_lists
