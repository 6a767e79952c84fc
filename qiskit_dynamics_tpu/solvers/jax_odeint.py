"""``jax.experimental.ode.odeint`` bridge (adaptive Dormand-Prince with
adjoint-based gradients).

Reference: ``/root/reference/qiskit_dynamics/solvers/jax_odeint.py``. Backwards
integration is handled by time reflection.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.ode import odeint

from .results import OdeResult
from .solver_utils import merge_t_args_jax, trim_t_results_jax

__all__ = ["jax_odeint"]


def jax_odeint(rhs, t_span, y0, t_eval=None, **kwargs):
    """Adaptive solve via ``jax.experimental.ode.odeint``."""
    t_list = merge_t_args_jax(t_span, t_eval)
    # Time is real; keep the direction real (jnp.sign of a complex value
    # lowers to z/|z|). When t_list is concrete — the usual case, even under
    # an outer jit, since t_span enters as a python/numpy constant — fold the
    # direction on the host so odeint's time axis stays a literal constant:
    # a computed `sign(...) * t` here feeds an abs/iota pattern that crashes
    # XLA:CPU's simplifier (RET_CHECK hlo_computation.cc:1726) for 1-d
    # complex states under an outer jit.
    t_arr = jnp.real(jnp.asarray(t_list))
    if isinstance(t_arr, jax.core.Tracer):
        t_direction = jnp.sign(t_arr[-1] - t_arr[0])
    else:
        t_direction = float(np.sign(np.asarray(t_arr[-1] - t_arr[0])))

    # Integrate in a real view (real/imag stacked on a leading axis): odeint's
    # error norm takes jnp.abs of the state, and abs-of-complex inside the
    # solve intermittently trips an XLA:CPU simplifier RET_CHECK
    # (hlo_computation.cc:1726, "abs f64[...]" replaced by "iota c128[...]")
    # when the whole solve sits under an outer jit. The real view keeps
    # odeint's internals complex-free; error control on the components is
    # equivalent to the complex norm up to sqrt(2).
    y0c = jnp.asarray(y0, dtype=complex)
    y0r = jnp.stack([jnp.real(y0c), jnp.imag(y0c)])

    def rhs_real(y, t):
        dy = rhs(t_direction * t, y[0] + 1j * y[1]) * t_direction
        return jnp.stack([jnp.real(dy), jnp.imag(dy)])

    out = odeint(rhs_real, y0=y0r, t=t_direction * t_arr, **kwargs)
    results = OdeResult(t=t_list, y=out[:, 0] + 1j * out[:, 1])
    return trim_t_results_jax(results, t_eval)
