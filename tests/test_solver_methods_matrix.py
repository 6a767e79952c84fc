"""Per-method solver test matrix.

Mirrors the reference's abstract-base pattern
(``/root/reference/test/dynamics/test_fixed_step_solvers.py:50-305`` and
``test_solver_functions.py``): every method is pushed through the same
battery — constant-generator vs expm ground truth, time-dependent generator
vs tight DOP853, BACKWARD integration, and t_eval edge cases (interior
points, endpoints included/only, single point, descending order) — instead
of each path being tested once with hand-picked inputs.
"""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.linalg

from qiskit_dynamics_tpu import Signal
from qiskit_dynamics_tpu.models import GeneratorModel, HamiltonianModel
from qiskit_dynamics_tpu.solvers import solve_lmde, solve_ode

X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
Y = np.array([[0.0, -1j], [1j, 0.0]], dtype=complex)
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)

# (method, solve_kwargs, tolerance vs ground truth)
ODE_CASES = [
    ("DOP853", {"atol": 1e-11, "rtol": 1e-11}, 1e-9),
    ("RK45", {"atol": 1e-11, "rtol": 1e-11}, 1e-8),
    ("RK23", {"atol": 1e-10, "rtol": 1e-10}, 1e-7),
    ("BDF", {"atol": 1e-10, "rtol": 1e-10}, 1e-6),
    ("Radau", {"atol": 1e-11, "rtol": 1e-11}, 1e-8),
    ("LSODA", {"atol": 1e-11, "rtol": 1e-11}, 1e-8),
    ("RK4", {"max_dt": 0.005}, 1e-7),
    ("jax_RK4", {"max_dt": 0.005}, 1e-7),
    ("jax_odeint", {"atol": 1e-11, "rtol": 1e-11}, 1e-8),
    ("tpu_dopri5", {"atol": 1e-11, "rtol": 1e-11}, 1e-8),
    ("tpu_dop853", {"atol": 1e-11, "rtol": 1e-11}, 1e-8),
]

LMDE_CASES = [
    ("scipy_expm", {"max_dt": 0.01}, 1e-6),
    ("scipy_expm", {"max_dt": 0.01, "magnus_order": 2}, 1e-8),
    ("scipy_expm", {"max_dt": 0.01, "magnus_order": 3}, 1e-9),
    ("jax_expm", {"max_dt": 0.01}, 1e-6),
    ("jax_expm", {"max_dt": 0.01, "magnus_order": 2}, 1e-8),
    ("jax_expm", {"max_dt": 0.01, "magnus_order": 3}, 1e-9),
    ("jax_expm_parallel", {"max_dt": 0.01}, 1e-6),
    ("jax_RK4_parallel", {"max_dt": 0.005}, 1e-6),
    ("lanczos_diag", {"max_dt": 0.01, "k_dim": 2}, 1e-6),
    ("jax_lanczos_diag", {"max_dt": 0.01, "k_dim": 2}, 1e-6),
]


def _constant_model(generator):
    return GeneratorModel(static_operator=generator)


def _rabi_model():
    nu, r = 1.0, 0.2
    model = HamiltonianModel(
        static_operator=2 * np.pi * nu * Z / 2,
        operators=[2 * np.pi * r * X / 2],
        signals=[Signal(1.0, carrier_freq=nu)],
    )
    return model


def _rabi_rhs():
    nu, r = 1.0, 0.2
    Zj, Xj = jnp.asarray(Z), jnp.asarray(X)

    def rhs(t, y):  # jax-safe: also called under trace by the jax methods
        s = jnp.cos(2 * jnp.pi * nu * t)
        H = 2 * jnp.pi * nu * Zj / 2 + s * 2 * jnp.pi * r * Xj / 2
        return -1j * H @ jnp.asarray(y)

    return rhs


Y0 = np.array([0.6, 0.8j], dtype=complex)


class TestODEMethodMatrix:
    """solve_ode through every method."""

    @pytest.mark.parametrize("method,kwargs,tol", ODE_CASES)
    def test_constant_generator(self, method, kwargs, tol):
        G = -1j * 2 * np.pi * (0.3 * X + 0.2 * Y + 0.4 * Z) / 2
        res = solve_ode(
            lambda t, y: G @ y, t_span=[0.0, 1.7], y0=Y0, method=method, **kwargs
        )
        expected = scipy.linalg.expm(1.7 * G) @ Y0
        np.testing.assert_allclose(np.asarray(res.y[-1]), expected, atol=tol, rtol=0)

    @pytest.mark.parametrize("method,kwargs,tol", ODE_CASES)
    def test_backwards_integration(self, method, kwargs, tol):
        """t_span reversed: integrate from t=1.7 back to 0."""
        G = -1j * 2 * np.pi * (0.3 * X + 0.2 * Y + 0.4 * Z) / 2
        yf = scipy.linalg.expm(1.7 * G) @ Y0
        res = solve_ode(
            lambda t, y: G @ y, t_span=[1.7, 0.0], y0=yf, method=method, **kwargs
        )
        np.testing.assert_allclose(np.asarray(res.y[-1]), Y0, atol=max(tol, 1e-7), rtol=0)

    @pytest.mark.parametrize("method,kwargs,tol", ODE_CASES)
    def test_time_dependent_vs_dop853(self, method, kwargs, tol):
        rhs = _rabi_rhs()
        res = solve_ode(rhs, t_span=[0.0, 2.0], y0=Y0, method=method, **kwargs)
        ref = solve_ode(rhs, t_span=[0.0, 2.0], y0=Y0, method="DOP853", atol=1e-13, rtol=1e-13)
        np.testing.assert_allclose(
            np.asarray(res.y[-1]), np.asarray(ref.y[-1]), atol=max(tol, 1e-6), rtol=0
        )

    @pytest.mark.parametrize("method,kwargs,tol", ODE_CASES)
    def test_t_eval_interior(self, method, kwargs, tol):
        G = -1j * np.pi * X
        t_eval = [0.3, 0.9, 1.4]
        res = solve_ode(
            lambda t, y: G @ y, t_span=[0.0, 1.7], y0=Y0, method=method,
            t_eval=t_eval, **kwargs
        )
        assert len(res.y) == len(t_eval)
        np.testing.assert_allclose(np.asarray(res.t, dtype=float), t_eval, atol=1e-12)
        for t, y in zip(t_eval, res.y):
            expected = scipy.linalg.expm(t * G) @ Y0
            np.testing.assert_allclose(np.asarray(y), expected, atol=max(tol, 1e-6), rtol=0)

    @pytest.mark.parametrize("method,kwargs,tol", ODE_CASES)
    def test_t_eval_includes_endpoints(self, method, kwargs, tol):
        G = -1j * np.pi * X
        t_eval = [0.0, 0.8, 1.7]
        res = solve_ode(
            lambda t, y: G @ y, t_span=[0.0, 1.7], y0=Y0, method=method,
            t_eval=t_eval, **kwargs
        )
        assert len(res.y) == 3
        np.testing.assert_allclose(np.asarray(res.y[0]), Y0, atol=max(tol, 1e-7))
        np.testing.assert_allclose(
            np.asarray(res.y[-1]), scipy.linalg.expm(1.7 * G) @ Y0, atol=max(tol, 1e-6)
        )

    @pytest.mark.parametrize("method,kwargs,tol", ODE_CASES)
    def test_t_eval_single_point(self, method, kwargs, tol):
        G = -1j * np.pi * X
        res = solve_ode(
            lambda t, y: G @ y, t_span=[0.0, 1.7], y0=Y0, method=method,
            t_eval=[1.1], **kwargs
        )
        assert len(res.y) == 1
        np.testing.assert_allclose(
            np.asarray(res.y[0]), scipy.linalg.expm(1.1 * G) @ Y0, atol=max(tol, 1e-6)
        )

    @pytest.mark.parametrize("method,kwargs,tol", ODE_CASES[:2] + ODE_CASES[8:])
    def test_t_eval_backwards(self, method, kwargs, tol):
        """Descending t_eval with a reversed t_span."""
        G = -1j * np.pi * X
        yf = scipy.linalg.expm(1.7 * G) @ Y0
        t_eval = [1.2, 0.5]
        res = solve_ode(
            lambda t, y: G @ y, t_span=[1.7, 0.0], y0=yf, method=method,
            t_eval=t_eval, **kwargs
        )
        for t, y in zip(t_eval, res.y):
            expected = scipy.linalg.expm(t * G) @ Y0
            np.testing.assert_allclose(np.asarray(y), expected, atol=max(tol, 1e-6))


class TestLMDEMethodMatrix:
    """solve_lmde through every LMDE method, on models."""

    @pytest.mark.parametrize("method,kwargs,tol", LMDE_CASES)
    def test_constant_generator(self, method, kwargs, tol):
        # anti-Hermitian generator; Lanczos methods require a HamiltonianModel
        H = 2 * np.pi * (0.3 * X + 0.2 * Y + 0.4 * Z) / 2
        G = -1j * H
        if "lanczos" in method:
            model = HamiltonianModel(static_operator=H)
        else:
            model = _constant_model(G)
        res = solve_lmde(model, t_span=[0.0, 1.3], y0=Y0, method=method, **kwargs)
        expected = scipy.linalg.expm(1.3 * G) @ Y0
        np.testing.assert_allclose(np.asarray(res.y[-1]), expected, atol=tol, rtol=0)

    @pytest.mark.parametrize(
        "method,kwargs,tol",
        [c for c in LMDE_CASES if "lanczos" not in c[0]],
    )
    def test_time_dependent_vs_dop853(self, method, kwargs, tol):
        model = _rabi_model()
        res = solve_lmde(model, t_span=[0.0, 2.0], y0=Y0, method=method, **kwargs)
        ref = solve_lmde(
            model, t_span=[0.0, 2.0], y0=Y0, method="DOP853", atol=1e-13, rtol=1e-13
        )
        # Magnus-1 (midpoint expm) has O(dt^2) global error on an
        # oscillating generator: ~1e-4 at dt=0.01
        magnus1 = kwargs.get("magnus_order", 1) == 1 and "RK4" not in method
        np.testing.assert_allclose(
            np.asarray(res.y[-1]), np.asarray(ref.y[-1]),
            atol=5e-4 if magnus1 else max(tol, 2e-6), rtol=0,
        )

    @pytest.mark.parametrize("method,kwargs,tol", LMDE_CASES)
    def test_t_eval_interior(self, method, kwargs, tol):
        G = -1j * np.pi * X
        if "lanczos" in method:
            model = HamiltonianModel(static_operator=np.pi * X)
        else:
            model = _constant_model(G)
        t_eval = [0.4, 1.0]
        res = solve_lmde(
            model, t_span=[0.0, 1.3], y0=Y0, method=method, t_eval=t_eval, **kwargs
        )
        assert len(res.y) == 2
        for t, y in zip(t_eval, res.y):
            expected = scipy.linalg.expm(t * G) @ Y0
            np.testing.assert_allclose(np.asarray(y), expected, atol=max(tol, 1e-6))

    @pytest.mark.parametrize(
        "method,kwargs,tol",
        [c for c in LMDE_CASES if "lanczos" not in c[0]],
    )
    def test_backwards_integration(self, method, kwargs, tol):
        G = -1j * 2 * np.pi * (0.3 * X + 0.4 * Z) / 2
        model = _constant_model(G)
        yf = scipy.linalg.expm(1.3 * G) @ Y0
        res = solve_lmde(model, t_span=[1.3, 0.0], y0=yf, method=method, **kwargs)
        np.testing.assert_allclose(np.asarray(res.y[-1]), Y0, atol=max(tol, 1e-6))

    @pytest.mark.parametrize("method,kwargs,tol", LMDE_CASES[:6])
    def test_matrix_y0(self, method, kwargs, tol):
        """Propagator solve: y0 = identity."""
        G = -1j * 2 * np.pi * (0.3 * X + 0.4 * Z) / 2
        model = _constant_model(G)
        res = solve_lmde(
            model, t_span=[0.0, 1.3], y0=np.eye(2, dtype=complex), method=method, **kwargs
        )
        np.testing.assert_allclose(
            np.asarray(res.y[-1]), scipy.linalg.expm(1.3 * G), atol=tol
        )


class TestTEvalValidation:
    def test_t_eval_outside_span_raises(self):
        G = -1j * np.pi * X
        with pytest.raises(Exception):
            solve_ode(
                lambda t, y: G @ y, t_span=[0.0, 1.0], y0=Y0, method="DOP853",
                t_eval=[0.5, 1.5],
            )

    def test_t_eval_unsorted_raises(self):
        G = -1j * np.pi * X
        with pytest.raises(Exception):
            solve_ode(
                lambda t, y: G @ y, t_span=[0.0, 1.0], y0=Y0, method="DOP853",
                t_eval=[0.7, 0.2],
            )
