"""``jax.experimental.ode.odeint`` bridge (adaptive Dormand-Prince with
adjoint-based gradients).

Reference: ``/root/reference/qiskit_dynamics/solvers/jax_odeint.py``. Backwards
integration is handled by time reflection.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from jax.experimental.ode import odeint

from .results import OdeResult
from .solver_utils import merge_t_args_jax, trim_t_results_jax

__all__ = ["jax_odeint"]


def jax_odeint(rhs, t_span, y0, t_eval=None, **kwargs):
    """Adaptive solve via ``jax.experimental.ode.odeint``."""
    t_list = merge_t_args_jax(t_span, t_eval)
    t_direction = jnp.sign(jnp.asarray(t_list[-1] - t_list[0], dtype=complex))

    results = odeint(
        lambda y, t: rhs(jnp.real(t_direction * t), y) * t_direction,
        y0=jnp.asarray(y0, dtype=complex),
        t=jnp.real(t_direction) * jnp.asarray(t_list),
        **kwargs,
    )
    results = OdeResult(t=t_list, y=results)
    return trim_t_results_jax(results, t_eval)
