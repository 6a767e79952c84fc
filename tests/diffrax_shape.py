"""A behavior-faithful fake ``diffrax`` module (diffrax is not installable
in this environment).

Implements exactly the API surface the bridge in
``solvers/diffrax_solver.py`` consumes — ``ODETerm``, ``SaveAt``,
``PIDController``, ``diffeqsolve`` — with an actual adaptive integration
under the hood (scipy DOP853 on the real-stacked state), so the bridge's
complex<->real conversion, t_eval -> SaveAt mapping, and result trimming
are exercised end to end. ``install()`` registers it in ``sys.modules`` as
``diffrax`` (the bridge detects diffrax methods by the type's module name).
"""
from __future__ import annotations

import sys
import types

import numpy as np
from scipy.integrate import solve_ivp


def build_module() -> types.ModuleType:
    mod = types.ModuleType("diffrax")

    class ODETerm:
        def __init__(self, vector_field):
            self.vector_field = vector_field

    class SaveAt:
        def __init__(self, ts=None):
            self.ts = ts

    class PIDController:
        def __init__(self, rtol=1e-8, atol=1e-8):
            self.rtol = rtol
            self.atol = atol

    class Dopri5:
        pass

    class _Solution:
        def __init__(self, ts, ys):
            self.ts = ts
            self.ys = ys

    def diffeqsolve(term, solver, t0, t1, dt0, y0, saveat, stepsize_controller, **kwargs):
        y0 = np.asarray(y0)
        shape = y0.shape

        def rhs(t, y_flat):
            dy = term.vector_field(t, y_flat.reshape(shape), None)
            return np.asarray(dy, dtype=float).ravel()

        ts = np.asarray(saveat.ts, dtype=float)
        res = solve_ivp(
            rhs, (float(t0), float(t1)), y0.ravel().astype(float),
            method="DOP853", t_eval=ts,
            rtol=stepsize_controller.rtol, atol=stepsize_controller.atol,
        )
        ys = res.y.T.reshape((len(ts),) + shape)
        return _Solution(ts=ts, ys=ys)

    for cls in (ODETerm, SaveAt, PIDController, Dopri5, _Solution):
        cls.__module__ = "diffrax"
    mod.ODETerm = ODETerm
    mod.SaveAt = SaveAt
    mod.PIDController = PIDController
    mod.Dopri5 = Dopri5
    mod.diffeqsolve = diffeqsolve

    # contract hardening: the pinned surface is exactly the names above
    # (upstream API: https://docs.kidger.site/diffrax — ODETerm, SaveAt,
    # PIDController, solver classes, diffeqsolve; consumed by
    # solvers/diffrax_solver.py, mirroring reference
    # /root/reference/qiskit_dynamics/solvers/diffrax_solver.py:61-114).
    # Accessing anything else fails LOUDLY as AssertionError — an
    # AttributeError could be silently swallowed by a duck-typing fallback
    # in package code (PEP 562 module __getattr__).
    def _contract_violation(name):
        if name.startswith("__"):
            raise AttributeError(name)
        raise AssertionError(
            f"diffrax contract violation: package accessed diffrax.{name}, "
            "which the pinned fake surface does not model. Either package "
            "code drifted from the documented diffrax API subset or the "
            "contract needs a deliberate extension (tests/diffrax_shape.py)."
        )

    mod.__getattr__ = _contract_violation
    return mod


def install():
    """Register the fake as ``diffrax``; returns an uninstall callable."""
    prior = sys.modules.get("diffrax")
    sys.modules["diffrax"] = build_module()

    def uninstall():
        if prior is None:
            sys.modules.pop("diffrax", None)
        else:
            sys.modules["diffrax"] = prior

    return uninstall
