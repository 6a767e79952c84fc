"""Tests for Chebyshev-interpolated parameter sweeps
(solvers/sweep_interpolation.py).

The method's promise: for a solution smooth in the swept scalar, a few dozen
solved Chebyshev-Lobatto nodes reconstruct the whole sweep to a CERTIFIED
tolerance. These tests check the machinery (nesting, coefficients,
certification) and the physics-level agreement against direct per-point
solves.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu import Signal, Solver
from qiskit_dynamics_tpu.exceptions import DynamicsError
from qiskit_dynamics_tpu.solvers.sweep_interpolation import (
    SweepInterpolationInfo,
    _chebyshev_matrix,
    _lobatto_params,
    _lobatto_to_cheb_coeffs,
    interpolated_sweep_solve,
)


class TestChebyshevMachinery:
    def test_lobatto_nesting(self):
        # doubling the level keeps every old node (even indices)
        p4 = _lobatto_params(4, -1.5, 2.0)
        p5 = _lobatto_params(5, -1.5, 2.0)
        np.testing.assert_allclose(p5[0::2], p4, atol=1e-14)
        assert p4.size == 17 and p5.size == 33

    def test_coefficients_reconstruct_polynomial(self):
        # exact for polynomials of degree <= N
        n = 16
        x = np.cos(np.pi * np.arange(n + 1) / n)
        vals = 3.0 - 2.0 * x + 0.25 * x**3 + 1e-2 * x**8
        coef = _lobatto_to_cheb_coeffs(vals[:, None])[:, 0]
        xx = np.linspace(-1, 1, 201)
        recon = np.polynomial.chebyshev.chebval(xx, coef)
        expected = 3.0 - 2.0 * xx + 0.25 * xx**3 + 1e-2 * xx**8
        np.testing.assert_allclose(recon, expected, atol=1e-13)

    def test_vandermonde_matches_chebval(self):
        rng = np.random.default_rng(0)
        coef = rng.normal(size=7)
        pts = rng.uniform(2.0, 5.0, size=11)
        v = _chebyshev_matrix(pts, 2.0, 5.0, 7) @ coef
        x = 2.0 * (pts - 2.0) / 3.0 - 1.0
        np.testing.assert_allclose(v, np.polynomial.chebyshev.chebval(x, coef), atol=1e-13)

    def test_analytic_function_interpolation(self):
        # end-to-end machinery on a known analytic function via node_solver
        calls = []

        def node_solver(ps):
            calls.append(len(ps))
            return np.exp(1j * 3.0 * np.asarray(ps))[:, None] * np.array([[1.0, 0.5]])

        params = np.linspace(0.0, 2.0, 500)
        out, info = interpolated_sweep_solve(
            model=None, signals_fn=None, params=params, t_span=(0, 1), y0=None,
            tol=1e-10, min_level=3, node_solver=node_solver, full_output=True,
        )
        expected = np.exp(1j * 3.0 * params)[:, None] * np.array([[1.0, 0.5]])
        assert np.max(np.abs(out - expected)) < 1e-9
        assert info.converged and info.est_error < 1e-10
        # adaptive: solved far fewer nodes than sweep points
        assert sum(calls) == info.n_nodes < 70

    def test_non_smooth_fails_loudly(self):
        # a parameter-discontinuous "solution" must raise, not return garbage
        def node_solver(ps):
            return np.where(np.asarray(ps)[:, None] > 0.5, 1.0, -1.0).astype(complex)

        with pytest.raises(DynamicsError, match="did not reach tol"):
            interpolated_sweep_solve(
                model=None, signals_fn=None, params=np.linspace(0, 1, 50),
                t_span=(0, 1), y0=None, tol=1e-8, min_level=2, max_level=5,
                node_solver=node_solver,
            )

    def test_validations(self):
        ns = lambda ps: np.ones((len(ps), 1), dtype=complex)
        with pytest.raises(DynamicsError, match="1-d"):
            interpolated_sweep_solve(
                None, None, np.ones((3, 2)), (0, 1), None, node_solver=ns
            )
        with pytest.raises(DynamicsError, match="nonzero interval"):
            interpolated_sweep_solve(
                None, None, np.array([1.0, 1.0]), (0, 1), None, node_solver=ns
            )
        with pytest.raises(DynamicsError, match="min_level < max_level"):
            interpolated_sweep_solve(
                None, None, np.array([0.0, 1.0]), (0, 1), None,
                min_level=4, max_level=4, node_solver=ns,
            )
        with pytest.raises(DynamicsError, match="concrete"):
            jax.jit(
                lambda p: interpolated_sweep_solve(
                    None, None, p, (0, 1), None, node_solver=ns
                )
            )(jnp.linspace(0, 1, 8))


def _rabi_solver():
    """2-level qubit in the rotating frame, drive amplitude sweep."""
    nu = 5.0
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    Z = np.array([[1.0, 0.0], [0.0, -1.0]])
    static = 2 * np.pi * nu * Z / 2
    solver = Solver(
        static_hamiltonian=static,
        hamiltonian_operators=[2 * np.pi * X / 2],
        rotating_frame=static,
        rwa_cutoff_freq=1.5 * nu,
    )
    return solver, nu


class TestInterpolatedSweepPhysics:
    def test_matches_direct_sweep(self):
        solver, nu = _rabi_solver()
        y0 = np.array([1.0, 0.0], dtype=complex)
        T = 4.0

        def signals_fn(amp):
            return [Signal(lambda t: amp * 0.05, carrier_freq=nu)]

        params = np.linspace(0.1, 1.0, 200)
        out, info = interpolated_sweep_solve(
            solver.model, signals_fn, params, t_span=(0.0, T), y0=y0,
            tol=1e-9, min_level=3, rwa_signal_map=solver._rwa_signal_map,
            max_dt=0.02, full_output=True,
        )
        assert info.converged
        assert out.shape == (200, 2)

        # direct per-point reference (DOP853 at 1e-12)
        idx = [0, 57, 123, 199]
        for i in idx:
            res = solver.solve(
                t_span=[0.0, T], y0=y0,
                signals=[Signal(lambda t, a=params[i]: a * 0.05, carrier_freq=nu)],
                method="DOP853", atol=1e-12, rtol=1e-12,
            )
            err = np.max(np.abs(out[i] - np.asarray(res.y[-1])))
            assert err < 5e-8, f"point {i}: {err:.2e}"

    def test_solver_solve_sweep_chebyshev_method(self):
        solver, nu = _rabi_solver()
        y0 = np.array([1.0, 0.0], dtype=complex)

        def signals_fn(amp):
            return [Signal(lambda t: amp * 0.05, carrier_freq=nu)]

        params = np.linspace(0.2, 0.8, 64)
        out = solver.solve_sweep(
            signals_fn, params, t_span=(0.0, 2.0), y0=y0, method="chebyshev",
            tol=1e-8, min_level=3, max_dt=0.1,
        )
        direct = solver.solve_sweep(
            signals_fn, params, t_span=(0.0, 2.0), y0=y0,
            method="fused_magnus2", max_dt=0.1, precision="df32",
        )
        assert np.max(np.abs(out - np.asarray(direct))) < 1e-7


class TestInterpolatedTrajectorySweep:
    """t_eval forwards to the df32 node solver, so the certified interpolant
    covers WHOLE TRAJECTORIES: node values are (M, n_eval, dim) and the
    certification bounds the error at every evaluation time at once."""

    def test_trajectory_nodes_certified(self):
        solver, nu = _rabi_solver()
        y0 = np.array([1.0, 0.0], dtype=complex)
        T = 4.0
        t_eval = [1.0, 2.0, 3.0, 4.0]

        def signals_fn(amp):
            return [Signal(lambda t: amp * 0.05, carrier_freq=nu)]

        params = np.linspace(0.1, 1.0, 150)
        out, info = interpolated_sweep_solve(
            solver.model, signals_fn, params, t_span=(0.0, T), y0=y0,
            tol=1e-9, min_level=3, rwa_signal_map=solver._rwa_signal_map,
            max_dt=0.02, t_eval=t_eval, full_output=True,
        )
        assert info.converged
        assert out.shape == (150, 4, 2)
        for i in (0, 74, 149):
            res = solver.solve(
                t_span=[0.0, T], y0=y0,
                signals=[Signal(lambda t, a=params[i]: a * 0.05, carrier_freq=nu)],
                t_eval=t_eval, method="DOP853", atol=1e-12, rtol=1e-12,
            )
            err = np.max(np.abs(out[i] - np.asarray(res.y)))
            assert err < 5e-8, f"point {i}: {err:.2e}"


class TestInterpolatedLindbladSweep:
    """Chebyshev interpolation over an OPEN-system sweep: the df32 node
    solver handles vectorized Lindblad models, so certified calibration
    curves work for density-matrix dynamics too (T1-limited calibration)."""

    def test_vectorized_lindblad_nodes(self):
        from qiskit_dynamics_tpu.models import LindbladModel
        from qiskit_dynamics_tpu.quantum_info import DensityMatrix

        X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
        Z = np.diag([1.0, -1.0]).astype(complex)
        SM = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)
        H0 = 2 * np.pi * 5.0 * Z / 2
        solver = Solver(
            static_hamiltonian=H0,
            hamiltonian_operators=[2 * np.pi * 0.1 * X / 2],
            static_dissipators=[0.06 * SM],
            rotating_frame=H0,
            vectorized=True,
        )
        rho0 = np.diag([1.0, 0.0]).astype(complex)
        sig_fn = lambda a: [Signal(lambda t: a, carrier_freq=5.0)]
        params = np.linspace(0.2, 1.0, 120)
        out, info = interpolated_sweep_solve(
            solver.model, sig_fn, params, t_span=(0.0, 3.0), y0=rho0,
            tol=1e-9, min_level=3, max_dt=0.01, df_chunk_b=32,
            full_output=True,
        )
        assert info.converged
        assert out.shape == (120, 2, 2)
        for i in (0, 61, 119):
            ref = solver.solve(
                t_span=[0.0, 3.0], y0=DensityMatrix(rho0),
                signals=sig_fn(float(params[i])),
                method="DOP853", atol=1e-12, rtol=1e-12,
            )
            err = np.max(np.abs(out[i] - np.asarray(ref.y[-1].data)))
            assert err < 5e-8, f"point {i}: {err:.2e}"
        # physical sanity across the whole certified curve
        traces = np.einsum("bii->b", out)
        np.testing.assert_allclose(traces.real, 1.0, atol=1e-7)


class Test2DInterpolation:
    """Tensor-product 2-d sweeps (interpolated_sweep_solve_2d)."""

    def test_analytic_function_product_grid(self):
        from qiskit_dynamics_tpu.solvers.sweep_interpolation import (
            interpolated_sweep_solve_2d,
        )

        calls = []

        def node_solver(q1, q2):
            calls.append(len(q1))
            q1, q2 = np.asarray(q1), np.asarray(q2)
            return (
                np.exp(1j * (2.0 * q1 + 0.7 * q2))[:, None]
                * np.array([[1.0, 0.5]])
            )

        p1 = np.linspace(0.0, 1.5, 40)
        p2 = np.linspace(-1.0, 1.0, 30)
        out, info = interpolated_sweep_solve_2d(
            model=None, signals_fn=None, params=(p1, p2), t_span=(0, 1),
            y0=None, tol=1e-10, min_level=2, max_level=6,
            node_solver=node_solver, full_output=True,
        )
        assert out.shape == (40, 30, 2)
        expected = (
            np.exp(1j * (2.0 * p1[:, None] + 0.7 * p2[None, :]))[:, :, None]
            * np.array([1.0, 0.5])[None, None, :]
        )
        assert np.max(np.abs(out - expected)) < 1e-9
        assert info.converged and info.est_error < 1e-10
        assert sum(calls) == info.n_nodes < 40 * 30

    def test_anisotropic_refinement(self):
        """A solution nearly independent of p2 must not pay p2 nodes: the
        tail-driven refinement keeps axis 2 at min_level."""
        from qiskit_dynamics_tpu.solvers.sweep_interpolation import (
            interpolated_sweep_solve_2d,
        )

        def node_solver(q1, q2):
            q1, q2 = np.asarray(q1), np.asarray(q2)
            # strong oscillation in p1, linear (degree-1, exactly resolved)
            # dependence on p2
            return (np.exp(1j * 9.0 * q1) + 0.01 * q2)[:, None].astype(complex)

        out, info = interpolated_sweep_solve_2d(
            model=None, signals_fn=None,
            params=(np.linspace(0, 1, 20), np.linspace(0, 1, 20)),
            t_span=(0, 1), y0=None, tol=1e-10, min_level=2, max_level=7,
            node_solver=node_solver, full_output=True,
        )
        assert info.converged
        l1, l2 = info.levels
        assert l1 > 2 and l2 == 2, info.levels

    def test_scattered_points(self):
        from qiskit_dynamics_tpu.solvers.sweep_interpolation import (
            interpolated_sweep_solve_2d,
        )

        def node_solver(q1, q2):
            return np.cos(np.asarray(q1) * np.asarray(q2))[:, None].astype(complex)

        rng = np.random.default_rng(3)
        pts = rng.uniform(0.0, 2.0, size=(100, 2))
        out = interpolated_sweep_solve_2d(
            model=None, signals_fn=None, params=pts, t_span=(0, 1), y0=None,
            tol=1e-10, min_level=2, max_level=6, node_solver=node_solver,
        )
        expected = np.cos(pts[:, 0] * pts[:, 1])[:, None]
        assert out.shape == (100, 1)
        assert np.max(np.abs(out - expected)) < 1e-9

    def test_non_smooth_fails_loudly(self):
        from qiskit_dynamics_tpu.solvers.sweep_interpolation import (
            interpolated_sweep_solve_2d,
        )

        def node_solver(q1, q2):
            return np.where(
                (np.asarray(q1) + np.asarray(q2))[:, None] > 1.0, 1.0, -1.0
            ).astype(complex)

        with pytest.raises(DynamicsError, match="did not reach tol"):
            interpolated_sweep_solve_2d(
                model=None, signals_fn=None,
                params=(np.linspace(0, 1, 10), np.linspace(0, 1, 10)),
                t_span=(0, 1), y0=None, tol=1e-8, min_level=2, max_level=4,
                node_solver=node_solver,
            )

    def test_validations(self):
        from qiskit_dynamics_tpu.solvers.sweep_interpolation import (
            interpolated_sweep_solve_2d,
        )

        ns = lambda q1, q2: np.ones((len(q1), 1), dtype=complex)
        with pytest.raises(DynamicsError, match="tuple.*or"):
            interpolated_sweep_solve_2d(
                None, None, np.ones((3, 3)), (0, 1), None, node_solver=ns
            )
        with pytest.raises(DynamicsError, match="nonzero"):
            interpolated_sweep_solve_2d(
                None, None, (np.array([1.0, 1.0]), np.array([0.0, 1.0])),
                (0, 1), None, node_solver=ns,
            )

    def test_physics_amp_detuning_map(self):
        """2-d amplitude x carrier-detuning calibration map vs direct
        per-point DOP853 (the real workload this method targets)."""
        solver, nu = _rabi_solver()
        y0 = np.array([1.0, 0.0], dtype=complex)
        T = 2.0

        def signals_fn(pq):
            amp, det = pq
            return [Signal(lambda t: amp * 0.05, carrier_freq=nu + det * 0.02)]

        p1 = np.linspace(0.2, 1.0, 25)  # amplitude scale
        p2 = np.linspace(-1.0, 1.0, 21)  # detuning scale
        out, info = solver.solve_sweep(
            lambda pq: signals_fn(pq), (p1, p2), t_span=(0.0, T), y0=y0,
            method="chebyshev", tol=1e-8, min_level=2, max_level=6,
            max_dt=0.02, full_output=True,
        )
        assert out.shape == (25, 21, 2)
        assert info.converged
        for i, j in [(0, 0), (12, 7), (24, 20)]:
            res = solver.solve(
                t_span=[0.0, T], y0=y0,
                signals=[
                    Signal(
                        lambda t, a=p1[i]: a * 0.05,
                        carrier_freq=nu + p2[j] * 0.02,
                    )
                ],
                method="DOP853", atol=1e-12, rtol=1e-12,
            )
            err = np.max(np.abs(out[i, j] - np.asarray(res.y[-1])))
            assert err < 1e-6, f"({i},{j}): {err:.2e}"


def test_2d_probe_certificate_catches_aliasing():
    """An axis-2 dependence that vanishes exactly at the level-2 Lobatto
    nodes (T_8(x2) == 1 there) fools the tail heuristic — only the final
    off-node probe certificate can catch it, and must raise."""
    from qiskit_dynamics_tpu.solvers.sweep_interpolation import (
        interpolated_sweep_solve_2d,
    )

    def node_solver(q1, q2):
        q1, q2 = np.asarray(q1), np.asarray(q2)
        x2 = 2.0 * q2 - 1.0  # [0,1] -> [-1,1]
        t8 = np.polynomial.chebyshev.chebval(x2, [0] * 8 + [1])
        # q1 dependence is quadratic (exactly resolved at level 2), so the
        # very first axis-1 refinement certificate passes and convergence
        # is declared with the T_8 structure still hidden
        return (q1**2 + 1e-3 * (t8 - 1.0))[:, None].astype(complex)

    with pytest.raises(DynamicsError, match="probe certification"):
        interpolated_sweep_solve_2d(
            model=None, signals_fn=None,
            params=(np.linspace(0, 1, 10), np.linspace(0, 1, 10)),
            t_span=(0, 1), y0=None, tol=1e-9, min_level=2, max_level=4,
            node_solver=node_solver,
        )


def test_2d_map_with_trajectories():
    """2-d calibration map over WHOLE trajectories: t_eval forwards to the
    df32 node solver (arbitrary off-grid times via step splitting), and the
    tensor-Chebyshev certificate bounds every evaluation time at once."""
    solver, nu = _rabi_solver()
    y0 = np.array([1.0, 0.0], dtype=complex)
    T = 2.0
    t_eval = [0.73, 1.5, 2.0]  # first point off the max_dt grid

    def signals_fn(pq):
        amp, det = pq
        return [Signal(lambda t: amp * 0.05, carrier_freq=nu + det * 0.02)]

    p1 = np.linspace(0.2, 1.0, 9)
    p2 = np.linspace(-1.0, 1.0, 7)
    out, info = solver.solve_sweep(
        signals_fn, (p1, p2), t_span=(0.0, T), y0=y0,
        method="chebyshev", tol=1e-8, min_level=2, max_level=6,
        max_dt=0.02, t_eval=t_eval, full_output=True,
    )
    assert out.shape == (9, 7, 3, 2)
    assert info.converged
    for i, j in [(0, 0), (4, 3), (8, 6)]:
        res = solver.solve(
            t_span=[0.0, T], y0=y0,
            signals=[Signal(lambda t, a=p1[i]: a * 0.05,
                            carrier_freq=nu + p2[j] * 0.02)],
            t_eval=t_eval, method="DOP853", atol=1e-12, rtol=1e-12,
        )
        err = np.max(np.abs(out[i, j] - np.asarray(res.y)))
        assert err < 1e-6, f"({i},{j}): {err:.2e}"
