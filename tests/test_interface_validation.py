"""Solver/model interface validation battery (mirrors the reference's
test_solver_functions_interface.py and the constructor-validation families
of test_generator_model.py / test_hamiltonian_model.py)."""
import numpy as np
import pytest

from qiskit_dynamics_tpu import Solver
from qiskit_dynamics_tpu.models import (
    GeneratorModel,
    HamiltonianModel,
    LindbladModel,
)
from qiskit_dynamics_tpu.signals import Signal
from qiskit_dynamics_tpu.solvers import solve_ode, solve_lmde
from qiskit_dynamics_tpu.exceptions import DynamicsError

X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
Y = np.array([[0.0, -1.0j], [1.0j, 0.0]], dtype=complex)
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
Y0 = np.array([1.0, 0.0], dtype=complex)


def _ham():
    return HamiltonianModel(
        static_operator=5 * Z, operators=[X],
        signals=[Signal(1.0, carrier_freq=1.0)],
    )


class TestSolveOdeInterface:
    def test_method_does_not_exist(self):
        with pytest.raises(DynamicsError, match="not supported"):
            solve_ode(lambda t, y: y, [0.0, 1.0], Y0, method="no_such_method")

    def test_non_odesolver_class_rejected(self):
        class NotASolver:
            pass

        with pytest.raises(DynamicsError, match="not supported"):
            solve_ode(lambda t, y: y, [0.0, 1.0], Y0, method=NotASolver)

    def test_y0_must_be_1d_or_2d(self):
        with pytest.raises(DynamicsError, match="y0 must be 1d or 2d"):
            solve_lmde(
                _ham(), [0.0, 1.0], np.zeros((2, 2, 2), dtype=complex),
                method="jax_lanczos_diag", max_dt=0.1, k_dim=2,
            )


class TestSolveLmdeInterface:
    def test_method_does_not_exist(self):
        with pytest.raises(DynamicsError, match="not supported"):
            solve_lmde(_ham(), [0.0, 1.0], Y0, method="not_a_method")

    def test_lmde_method_non_vectorized_lindblad(self):
        model = LindbladModel(
            static_hamiltonian=5 * Z, hamiltonian_operators=[X],
            hamiltonian_signals=[Signal(1.0)], static_dissipators=[0.1 * X],
            vectorized=False,
        )
        with pytest.raises(DynamicsError, match="vectorized"):
            solve_lmde(
                model, [0.0, 1.0], np.eye(2, dtype=complex),
                method="scipy_expm", max_dt=0.1,
            )

    def test_lanczos_requires_hamiltonian_model(self):
        model = GeneratorModel(
            static_operator=1j * Z, operators=[1j * X],
            signals=[Signal(1.0)],
        )
        with pytest.raises(DynamicsError, match="[Ll]anczos"):
            solve_lmde(
                model, [0.0, 1.0], Y0,
                method="lanczos_diag", max_dt=0.1, k_dim=2,
            )

    def test_lanczos_k_dim_too_large(self):
        with pytest.raises(DynamicsError, match="k_dim"):
            solve_lmde(
                _ham(), [0.0, 1.0], Y0,
                method="lanczos_diag", max_dt=0.1, k_dim=5,
            )

    def test_scipy_expm_magnus_order_validation(self):
        with pytest.raises(DynamicsError, match="magnus_order"):
            solve_lmde(
                _ham(), [0.0, 1.0], Y0,
                method="scipy_expm", max_dt=0.1, magnus_order=7,
            )

    def test_jax_expm_magnus_order_validation(self):
        with pytest.raises(DynamicsError, match="magnus_order"):
            solve_lmde(
                _ham(), [0.0, 1.0], Y0,
                method="jax_expm", max_dt=0.1, magnus_order=0,
            )


class TestGeneratorModelValidation:
    def test_both_static_operator_operators_None(self):
        with pytest.raises(DynamicsError, match="at least one of"):
            GeneratorModel(static_operator=None, operators=None)

    def test_operators_None_signals_not_None(self):
        m = GeneratorModel(static_operator=1j * Z)
        with pytest.raises(DynamicsError, match="[Ss]ignals"):
            m.signals = [Signal(1.0)]

    def test_operators_signals_length_mismatch(self):
        with pytest.raises(DynamicsError, match="same length"):
            GeneratorModel(
                operators=[1j * X, 1j * Y], signals=[Signal(1.0)]
            )

    def test_signals_bad_format(self):
        with pytest.raises(DynamicsError, match="format"):
            GeneratorModel(operators=[1j * X], signals=lambda t: t)


class TestHamiltonianModelValidation:
    def test_static_operator_not_hermitian(self):
        with pytest.raises(DynamicsError, match="Hermitian"):
            HamiltonianModel(static_operator=Z + 1j * np.eye(2))

    def test_operators_not_hermitian(self):
        with pytest.raises(DynamicsError, match="Hermitian"):
            HamiltonianModel(
                static_operator=Z, operators=[X + 0.5j * np.eye(2)],
                signals=[Signal(1.0)],
            )


class TestFrameBasisRoundTrip:
    """Solving in a non-diagonal frame returns results in the lab basis
    unless the model is flagged in_frame_basis (reference
    solver_functions.py setup/results conversion semantics)."""

    def _model(self, in_frame_basis=False):
        model = HamiltonianModel(
            static_operator=5 * Z + 0.1 * X, operators=[X],
            signals=[Signal(0.2, carrier_freq=5.0 / np.pi)],
            rotating_frame=5 * Z + 0.1 * X,
            in_frame_basis=in_frame_basis,
        )
        return model

    def test_results_match_across_bases(self):
        t_span = [0.0, 0.5]
        model_lab = self._model(False)
        res_lab = solve_ode(model_lab, t_span, Y0, method="DOP853",
                            atol=1e-12, rtol=1e-12)
        model_fb = self._model(True)
        y0_fb = model_fb.rotating_frame.state_into_frame_basis(Y0)
        res_fb = solve_ode(model_fb, t_span, y0_fb, method="DOP853",
                           atol=1e-12, rtol=1e-12)
        back = model_fb.rotating_frame.state_out_of_frame_basis(res_fb.y[-1])
        np.testing.assert_allclose(np.asarray(res_lab.y[-1]), np.asarray(back),
                                   atol=1e-9)

    def test_in_frame_basis_flag_restored_after_solve(self):
        model = self._model(False)
        assert model.in_frame_basis is False
        solve_ode(model, [0.0, 0.1], Y0, method="RK4", max_dt=0.05)
        assert model.in_frame_basis is False


class TestSolverClassValidation:
    def test_signals_length_mismatch_through_solver(self):
        solver = Solver(static_hamiltonian=5 * Z, hamiltonian_operators=[X])
        with pytest.raises(DynamicsError):
            solver.solve(
                t_span=[0.0, 0.1], y0=Y0,
                signals=[Signal(1.0), Signal(2.0)], method="RK4", max_dt=0.05,
            )

    def test_unknown_method_through_solver(self):
        solver = Solver(static_hamiltonian=5 * Z, hamiltonian_operators=[X])
        with pytest.raises(DynamicsError):
            solver.solve(
                t_span=[0.0, 0.1], y0=Y0, signals=[Signal(1.0)],
                method="bogus",
            )


class TestLMDEFrameBasisSetup:
    """Frame-basis setup/teardown helpers across model types (reference
    TestLMDEGeneratorModelSetup, test_solver_functions_interface.py:164-375).
    Expected transforms built directly from the frame eigenbasis U:
    state y0 -> U^dag y0; density matrix -> U^dag rho U; vectorized
    (column-stacked) -> (U^dag kron U^dag^bar acting as the cached
    vectorized basis adjoint) @ y0."""

    def setup_method(self, method):
        from qiskit_dynamics_tpu.models import (
            HamiltonianModel,
            LindbladModel,
        )

        rng = np.random.default_rng(11)
        d = 3
        H = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
        self.H0 = H + H.conj().T
        Hd = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
        self.Hdrive = Hd + Hd.conj().T
        self.L = rng.normal(size=(d, d)) + 1j * rng.normal(size=(d, d))
        self.d = d
        self.ham_model = HamiltonianModel(
            operators=[self.Hdrive], static_operator=self.H0,
            rotating_frame=self.H0, signals=[1.0],
        )
        self.lind_model = LindbladModel(
            static_hamiltonian=self.H0,
            hamiltonian_operators=[self.Hdrive],
            hamiltonian_signals=[1.0],
            static_dissipators=[self.L],
            rotating_frame=self.H0,
        )
        self.vec_model = LindbladModel(
            static_hamiltonian=self.H0,
            hamiltonian_operators=[self.Hdrive],
            hamiltonian_signals=[1.0],
            static_dissipators=[self.L],
            rotating_frame=self.H0,
            vectorized=True,
        )
        self.U = np.asarray(self.ham_model.rotating_frame.frame_basis)

    def _setup(self, model, y0):
        from qiskit_dynamics_tpu.solvers.solver_functions import (
            setup_generator_model_rhs_y0_in_frame_basis,
        )

        return setup_generator_model_rhs_y0_in_frame_basis(model, y0)

    def test_hamiltonian_y0_transform_and_flag(self):
        y0 = np.arange(self.d).astype(complex)
        assert not self.ham_model.in_frame_basis
        _, rhs, y0_fb, was_fb = self._setup(self.ham_model, y0)
        try:
            assert self.ham_model.in_frame_basis and not was_fb
            np.testing.assert_allclose(
                np.asarray(y0_fb), self.U.conj().T @ y0, atol=1e-12
            )
            # rhs in frame basis == U^dag (lab-frame generator action) U
            t = 0.21
            self.ham_model.in_frame_basis = False
            g_lab = np.asarray(self.ham_model(t))
            self.ham_model.in_frame_basis = True
            rhs_val = np.asarray(rhs(t, y0_fb))
            np.testing.assert_allclose(
                self.U @ rhs_val, g_lab @ (self.U @ y0_fb), atol=1e-10
            )
        finally:
            self.ham_model.in_frame_basis = was_fb

    def test_lindblad_density_matrix_conjugated(self):
        rho = np.outer(np.arange(self.d), np.arange(self.d)).astype(complex)
        _, _, rho_fb, was_fb = self._setup(self.lind_model, rho)
        try:
            np.testing.assert_allclose(
                np.asarray(rho_fb), self.U.conj().T @ rho @ self.U, atol=1e-12
            )
        finally:
            self.lind_model.in_frame_basis = was_fb

    def test_vectorized_lindblad_uses_vectorized_basis(self):
        rho = np.outer(np.arange(self.d), np.arange(self.d)).astype(complex)
        vec = rho.flatten(order="F")
        _, _, vec_fb, was_fb = self._setup(self.vec_model, vec)
        try:
            expected = (
                self.U.conj().T @ rho @ self.U
            ).flatten(order="F")
            np.testing.assert_allclose(np.asarray(vec_fb), expected, atol=1e-12)
        finally:
            self.vec_model.in_frame_basis = was_fb

    def test_already_in_frame_basis_y0_untouched(self):
        y0 = np.arange(self.d).astype(complex)
        self.ham_model.in_frame_basis = True
        try:
            _, _, y0_fb, was_fb = self._setup(self.ham_model, y0)
            assert was_fb
            np.testing.assert_allclose(np.asarray(y0_fb), y0, atol=0.0)
        finally:
            self.ham_model.in_frame_basis = False

    def test_results_conversion_roundtrip(self):
        from qiskit_dynamics_tpu.solvers.solver_functions import (
            results_y_out_of_frame_basis,
        )

        y0 = np.arange(self.d).astype(complex)
        _, _, y0_fb, was_fb = self._setup(self.ham_model, y0)
        try:
            stacked = np.asarray([y0_fb, 2 * y0_fb])  # (T, d) time stack
            out = results_y_out_of_frame_basis(self.ham_model, stacked, y0.ndim)
            np.testing.assert_allclose(np.asarray(out)[0], y0, atol=1e-12)
            np.testing.assert_allclose(np.asarray(out)[1], 2 * y0, atol=1e-12)
        finally:
            self.ham_model.in_frame_basis = was_fb

    def test_results_conversion_density_matrix(self):
        from qiskit_dynamics_tpu.solvers.solver_functions import (
            results_y_out_of_frame_basis,
        )

        rho = np.outer(np.arange(self.d), np.arange(self.d)).astype(complex)
        _, _, rho_fb, was_fb = self._setup(self.lind_model, rho)
        try:
            stacked = np.asarray([rho_fb])
            out = results_y_out_of_frame_basis(self.lind_model, stacked, rho.ndim)
            np.testing.assert_allclose(np.asarray(out)[0], rho, atol=1e-12)
        finally:
            self.lind_model.in_frame_basis = was_fb
