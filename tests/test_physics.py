"""Physics-level validation beyond Rabi/CR.

Each test checks a solver answer against a closed-form physics result
(reference analog: ``test_jax_transformations.py`` physics assertions and
the analytic checks sprinkled through ``test_solver_classes.py``).
"""
import numpy as np
import pytest

from qiskit_dynamics_tpu import Signal, Solver
from qiskit_dynamics_tpu.models import LindbladModel
from qiskit_dynamics_tpu.solvers import solve_lmde

X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
Y = np.array([[0.0, -1j], [1j, 0.0]], dtype=complex)
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
SM = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)  # sigma-minus (lowering)


class TestLindbladAnalytic:
    def test_t1_decay(self):
        """Amplitude damping: p1(t) = exp(-gamma t), coherence decays at gamma/2."""
        gamma = 0.35
        model = LindbladModel(
            static_hamiltonian=np.zeros((2, 2), dtype=complex),
            static_dissipators=[np.sqrt(gamma) * SM],
        )
        rho0 = np.array([[0.25, 0.4], [0.4, 0.75]], dtype=complex)
        T = 2.1
        res = solve_lmde(model, t_span=[0.0, T], y0=rho0, method="DOP853",
                         atol=1e-12, rtol=1e-12)
        rho = np.asarray(res.y[-1])
        np.testing.assert_allclose(rho[1, 1], 0.75 * np.exp(-gamma * T), atol=1e-9)
        np.testing.assert_allclose(rho[0, 1], 0.4 * np.exp(-gamma * T / 2), atol=1e-9)
        np.testing.assert_allclose(np.trace(rho), 1.0, atol=1e-10)

    def test_t2_dephasing(self):
        """Pure dephasing L = sqrt(gamma/2) Z: off-diagonals decay at gamma."""
        gamma = 0.5
        model = LindbladModel(
            static_hamiltonian=np.zeros((2, 2), dtype=complex),
            static_dissipators=[np.sqrt(gamma / 2) * Z],
        )
        rho0 = np.array([[0.5, 0.5], [0.5, 0.5]], dtype=complex)
        T = 1.7
        res = solve_lmde(model, t_span=[0.0, T], y0=rho0, method="DOP853",
                         atol=1e-12, rtol=1e-12)
        rho = np.asarray(res.y[-1])
        np.testing.assert_allclose(rho[0, 1], 0.5 * np.exp(-gamma * T), atol=1e-9)
        np.testing.assert_allclose(rho[0, 0], 0.5, atol=1e-10)

    def test_driven_damped_steady_state_trace(self):
        """Driven-damped qubit stays a valid state for all array libraries."""
        gamma = 0.2
        for vectorized in (False, True):
            solver = Solver(
                static_hamiltonian=2 * np.pi * Z / 2,
                hamiltonian_operators=[2 * np.pi * 0.1 * X / 2],
                static_dissipators=[np.sqrt(gamma) * SM],
                rotating_frame=2 * np.pi * Z / 2,
                vectorized=vectorized,
            )
            from qiskit_dynamics_tpu.quantum_info import DensityMatrix

            # DensityMatrix type: auto-flattened for vectorized models
            rho0 = DensityMatrix(np.array([[1.0, 0.0], [0.0, 0.0]], dtype=complex))
            res = solver.solve(
                t_span=[0.0, 5.0], y0=rho0,
                signals=[Signal(1.0, carrier_freq=1.0)],
                method="DOP853", atol=1e-10, rtol=1e-10,
            )
            rho = np.asarray(res.y[-1].data)
            np.testing.assert_allclose(np.trace(rho), 1.0, atol=1e-8)
            evals = np.linalg.eigvalsh(rho)
            assert evals.min() > -1e-8  # positive semidefinite


class TestRamsey:
    def test_detuning_fringe(self):
        """Free evolution in a detuned frame: Bloch vector precesses at the
        detuning; <X>(t) = cos(2 pi delta t) from |+>."""
        nu, delta = 5.0, 0.25
        solver = Solver(
            static_hamiltonian=2 * np.pi * nu * Z / 2,
            rotating_frame=2 * np.pi * (nu - delta) * Z / 2,
        )
        plus = np.array([1.0, 1.0], dtype=complex) / np.sqrt(2)
        for T in (0.3, 1.0, 2.4):
            res = solver.solve(t_span=[0.0, T], y0=plus, method="DOP853",
                               atol=1e-12, rtol=1e-12)
            psi = solver.model.rotating_frame.state_out_of_frame(T, np.asarray(res.y[-1]))
            # move back into the detuned rotating frame "by hand" at rate nu-delta
            U = np.diag(np.exp(1j * 2 * np.pi * (nu - delta) * T * np.array([0.5, -0.5])))
            psi_rot = U @ np.asarray(psi)
            x_exp = np.real(psi_rot.conj() @ X @ psi_rot)
            np.testing.assert_allclose(x_exp, np.cos(2 * np.pi * delta * T), atol=1e-8)


class TestThreeLevelLeakage:
    def _transmon3(self):
        """3-level transmon: anharmonicity separates the 1->2 transition."""
        dim = 3
        a = np.diag(np.sqrt(np.arange(1, dim)), 1)
        adag = a.conj().T
        N = np.diag(np.arange(dim)).astype(complex)
        nu, alpha = 5.0, -0.3
        H0 = 2 * np.pi * nu * N + np.pi * alpha * (N @ N - N)
        drive = 2 * np.pi * (a + adag) / 2
        solver = Solver(
            static_hamiltonian=H0,
            hamiltonian_operators=[drive],
            rotating_frame=H0,
        )
        return solver, nu, alpha

    def test_weak_drive_stays_two_level(self):
        """A slow resonant pi-pulse moves 0 -> 1 with little |2> leakage."""
        solver, nu, _ = self._transmon3()
        r = 0.005
        y0 = np.zeros(3, dtype=complex)
        y0[0] = 1.0
        res = solver.solve(
            t_span=[0.0, 1 / (2 * r) / np.sqrt(2)],  # pi for matrix element sqrt(1)
            y0=y0, signals=[Signal(2 * r * np.sqrt(2), carrier_freq=nu)],
            method="DOP853", atol=1e-12, rtol=1e-12,
        )
        pops = np.abs(np.asarray(res.y[-1])) ** 2
        assert pops[1] > 0.98
        assert pops[2] < 0.01

    def test_strong_drive_leaks(self):
        """A fast pulse at the same area leaks appreciably more into |2>."""
        solver, nu, _ = self._transmon3()
        leak = {}
        for r in (0.005, 0.1):
            y0 = np.zeros(3, dtype=complex)
            y0[0] = 1.0
            res = solver.solve(
                t_span=[0.0, 1 / (2 * r) / np.sqrt(2)],
                y0=y0, signals=[Signal(2 * r * np.sqrt(2), carrier_freq=nu)],
                method="DOP853", atol=1e-12, rtol=1e-12,
            )
            leak[r] = np.abs(np.asarray(res.y[-1])[2]) ** 2
        assert leak[0.1] > 20 * leak[0.005]


class TestRWAConsistency:
    def test_rwa_matches_full_model_weak_drive(self):
        """RWA'd model tracks the full model for weak resonant drive."""
        nu, r = 5.0, 0.01
        y0 = np.array([1.0, 0.0], dtype=complex)
        sig = lambda: [Signal(r, carrier_freq=nu)]
        full = Solver(
            static_hamiltonian=2 * np.pi * nu * Z / 2,
            hamiltonian_operators=[2 * np.pi * X / 2],
            rotating_frame=2 * np.pi * nu * Z / 2,
        )
        rwa = Solver(
            static_hamiltonian=2 * np.pi * nu * Z / 2,
            hamiltonian_operators=[2 * np.pi * X / 2],
            rotating_frame=2 * np.pi * nu * Z / 2,
            rwa_cutoff_freq=1.5 * nu,
        )
        T = 10.0
        res_f = full.solve(t_span=[0.0, T], y0=y0, signals=sig(), method="DOP853",
                           atol=1e-12, rtol=1e-12)
        res_r = rwa.solve(t_span=[0.0, T], y0=y0, signals=sig(), method="DOP853",
                          atol=1e-12, rtol=1e-12)
        pops_f = np.abs(np.asarray(res_f.y[-1])) ** 2
        pops_r = np.abs(np.asarray(res_r.y[-1])) ** 2
        # counter-rotating corrections are O((r/2nu)) ~ 1e-3
        np.testing.assert_allclose(pops_f, pops_r, atol=5e-3)
        # and both see the expected Rabi angle
        np.testing.assert_allclose(pops_r[1], np.sin(np.pi * r * T / 2) ** 2, atol=1e-3)
