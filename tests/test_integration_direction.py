"""Backwards integration + t_eval edge-case battery across solver methods
(mirrors the reference's test_fixed_step_solvers.py direction/t_eval
families: forward-backward round trips, descending t_eval, endpoint
inclusion)."""
import numpy as np
import pytest

from qiskit_dynamics_tpu.models import HamiltonianModel
from qiskit_dynamics_tpu.signals import Signal
from qiskit_dynamics_tpu.solvers import solve_ode, solve_lmde

X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
Z = np.diag([1.0, -1.0]).astype(complex)
Y0 = np.array([1.0, 0.0], dtype=complex)


def _ham():
    return HamiltonianModel(
        static_operator=5 * Z, operators=[X],
        signals=[Signal(0.5, carrier_freq=1.0)],
    )


CASES = [
    ("DOP853", solve_ode, dict(atol=1e-12, rtol=1e-12), 1e-10),
    ("RK4", solve_ode, dict(max_dt=0.002), 1e-9),
    ("jax_odeint", solve_ode, dict(atol=1e-12, rtol=1e-12), 1e-9),
    ("tpu_dopri5", solve_ode, dict(atol=1e-12, rtol=1e-12), 1e-9),
    ("tpu_dop853", solve_ode, dict(atol=1e-12, rtol=1e-12), 1e-9),
    # expm methods are Magnus-1 (2nd order): one-way global error O(dt^2)
    # ~ 2e-6 at dt=0.002 (the roundtrip case cancels it on the shared grid)
    ("jax_expm", solve_lmde, dict(max_dt=0.002), 1e-5),
    ("scipy_expm", solve_lmde, dict(max_dt=0.002), 1e-5),
]


@pytest.mark.parametrize("method,solve,kw,tol", CASES,
                         ids=[c[0] for c in CASES])
def test_forward_backward_roundtrip(method, solve, kw, tol):
    ham = _ham()
    fwd = solve(ham, [0.0, 1.0], Y0, method=method, **kw)
    bwd = solve(ham, [1.0, 0.0], np.asarray(fwd.y[-1]), method=method, **kw)
    np.testing.assert_allclose(np.asarray(bwd.y[-1]), Y0, atol=tol)


@pytest.mark.parametrize("method,solve,kw,tol", CASES[:4],
                         ids=[c[0] for c in CASES[:4]])
def test_backward_matches_conjugated_forward(method, solve, kw, tol):
    # psi(-t) under H equals the solution of the reversed-sign generator
    ham = _ham()
    back = solve(ham, [1.0, 0.5], Y0, method=method, **kw)
    # independent reference: DOP853 at tight tolerance
    ref = solve_ode(_ham(), [1.0, 0.5], Y0, method="DOP853",
                    atol=1e-13, rtol=1e-13)
    np.testing.assert_allclose(
        np.asarray(back.y[-1]), np.asarray(ref.y[-1]), atol=max(tol, 1e-9)
    )


@pytest.mark.parametrize("method,solve,kw,tol", CASES,
                         ids=[c[0] for c in CASES])
def test_t_eval_includes_endpoints_and_interior(method, solve, kw, tol):
    ham = _ham()
    t_eval = [0.0, 0.3, 0.7, 1.0]
    res = solve(ham, [0.0, 1.0], Y0, method=method, t_eval=t_eval, **kw)
    assert len(res.y) == len(t_eval)
    np.testing.assert_allclose(np.asarray(res.y[0]), Y0, atol=1e-12)
    # interior point cross-checked against an independent direct solve
    direct = solve_ode(_ham(), [0.0, 0.7], Y0, method="DOP853",
                       atol=1e-13, rtol=1e-13)
    np.testing.assert_allclose(
        np.asarray(res.y[2]), np.asarray(direct.y[-1]), atol=max(tol, 1e-8)
    )
    # norm preserved (unitary evolution)
    for y in res.y:
        np.testing.assert_allclose(np.linalg.norm(np.asarray(y)), 1.0, atol=1e-8)
