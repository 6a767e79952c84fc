"""Optional diffrax bridge.

Reference behavior: ``/root/reference/qiskit_dynamics/solvers/diffrax_solver.py``
(``diffrax.diffeqsolve`` with complex->real state conversion and
``t_eval -> SaveAt`` mapping). diffrax is an optional dependency; when it is
not installed, passing a diffrax solver raises a clear error.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..exceptions import DynamicsError
from .results import OdeResult
from .solver_utils import merge_t_args_jax, trim_t_results_jax

__all__ = ["diffrax_solver", "_is_diffrax_method"]


def _is_diffrax_method(method) -> bool:
    """Whether ``method`` is a diffrax solver instance (duck-typed so the
    check works without diffrax installed)."""
    return type(method).__module__.split(".")[0] == "diffrax"


def diffrax_solver(rhs, t_span, y0, method, t_eval=None, **kwargs):
    """Solve an ODE with a diffrax solver.

    The complex state is split into a (2, ...) real stack for diffrax (several
    diffrax steppers assume real dtypes), and results are recombined.
    """
    try:
        import diffrax
        from diffrax import ODETerm, SaveAt, diffeqsolve
    except ImportError as exc:
        raise DynamicsError(
            "diffrax solvers require the optional diffrax package to be installed."
        ) from exc

    t_list = merge_t_args_jax(t_span, t_eval)

    def real_rhs(t, y, args):
        complex_y = y[0] + 1j * y[1]
        dy = rhs(t, complex_y)
        return jnp.stack([jnp.real(dy), jnp.imag(dy)])

    term = ODETerm(real_rhs)
    y0 = jnp.asarray(y0, dtype=complex)
    y0_real = jnp.stack([jnp.real(y0), jnp.imag(y0)])

    if "saveat" in kwargs and t_eval is not None:
        raise DynamicsError(
            "Only one of t_eval or saveat can be specified when using a diffrax solver."
        )
    saveat = kwargs.pop("saveat", SaveAt(ts=t_list))
    stepsize_controller = kwargs.pop(
        "stepsize_controller", diffrax.PIDController(rtol=1e-8, atol=1e-8)
    )

    results = diffeqsolve(
        term,
        solver=method,
        t0=t_list[0],
        t1=t_list[-1],
        dt0=None,
        y0=y0_real,
        saveat=saveat,
        stepsize_controller=stepsize_controller,
        **kwargs,
    )

    ys = results.ys[:, 0] + 1j * results.ys[:, 1]
    sol = OdeResult(t=t_list, y=jnp.asarray(ys))
    return trim_t_results_jax(sol, t_eval)
