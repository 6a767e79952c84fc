"""Constructor/assignment validation and degenerate-population model cases.

Mirrors the reference's validation matrices (test/dynamics/models/
test_generator_model.py:36-113, test_lindblad_model.py:32-280): every
combination of absent operator groups either raises the documented
DynamicsError or evaluates to the explicit formula for the terms present.
"""
import numpy as np
import pytest

from qiskit_dynamics_tpu.models import (
    GeneratorModel,
    HamiltonianModel,
    LindbladModel,
)
from qiskit_dynamics_tpu.signals import Signal, SignalList
from qiskit_dynamics_tpu.exceptions import DynamicsError

rng = np.random.default_rng(2024)

X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
Y = np.array([[0.0, -1j], [1j, 0.0]])
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)


def rand_herm(d, seed=0):
    r = np.random.default_rng(seed)
    m = r.normal(size=(d, d)) + 1j * r.normal(size=(d, d))
    return m + m.conj().T


def rand_dm(d, seed=1):
    r = np.random.default_rng(seed)
    m = r.normal(size=(d, d)) + 1j * r.normal(size=(d, d))
    m = m @ m.conj().T
    return m / np.trace(m)


def dissipator_term(L, rho):
    return L @ rho @ L.conj().T - 0.5 * (L.conj().T @ L @ rho + rho @ L.conj().T @ L)


# --------------- GeneratorModel construction/assignment ---------------------


class TestGeneratorModelValidation:
    def test_both_static_and_operators_none(self):
        with pytest.raises(DynamicsError, match="at least one"):
            GeneratorModel(static_operator=None, operators=None)

    def test_operators_none_signals_not_none(self):
        model = GeneratorModel(static_operator=-1j * Z)
        with pytest.raises(DynamicsError, match="Signals must be None"):
            model.signals = [Signal(1.0)]

    def test_signals_length_mismatch(self):
        with pytest.raises(DynamicsError, match="same length"):
            GeneratorModel(operators=[-1j * X, -1j * Z], signals=[Signal(1.0)])

    def test_signals_bad_format(self):
        with pytest.raises(DynamicsError, match="unaccepted format"):
            GeneratorModel(operators=[-1j * X], signals=3.14)

    def test_evaluate_without_signals_raises(self):
        model = GeneratorModel(operators=[-1j * X])
        with pytest.raises(DynamicsError, match="must have signals"):
            model.evaluate(0.0)
        with pytest.raises(DynamicsError, match="must have signals"):
            model.evaluate_rhs(0.0, np.array([1.0, 0.0], dtype=complex))

    def test_properties_none_when_absent(self):
        static_only = GeneratorModel(static_operator=-1j * Z)
        assert static_only.operators is None
        assert static_only.signals is None
        ops_only = GeneratorModel(operators=[-1j * X], signals=[Signal(1.0)])
        assert ops_only.static_operator is None

    def test_signal_reassignment_order(self):
        """Signals may be set after construction, reassigned, and cleared."""
        model = GeneratorModel(operators=[-1j * X, -1j * Z])
        assert model.signals is None
        model.signals = [Signal(1.0), Signal(2.0)]
        np.testing.assert_allclose(model.evaluate(0.0), -1j * (X + 2 * Z))
        model.signals = SignalList([Signal(0.5), Signal(0.0)])
        np.testing.assert_allclose(model.evaluate(0.0), -0.5j * X)
        model.signals = None
        assert model.signals is None

    @pytest.mark.parametrize("array_library", [None, "scipy_sparse", "jax_sparse"])
    def test_static_only_all_libraries(self, array_library):
        """Static-only models evaluate to the frame-transformed constant for
        every array library (signals never required)."""
        G0 = -1j * rand_herm(3, seed=7)
        model = GeneratorModel(static_operator=G0, array_library=array_library)
        out = model.evaluate(0.31)
        out = out.todense() if hasattr(out, "todense") else np.asarray(out)
        np.testing.assert_allclose(out, G0, atol=1e-12)


# --------------- HamiltonianModel validation --------------------------------


class TestHamiltonianModelValidation:
    def test_non_hermitian_static_raises(self):
        with pytest.raises(DynamicsError, match="Hermitian"):
            HamiltonianModel(static_operator=np.array([[0.0, 1.0], [0.0, 0.0]]))

    def test_non_hermitian_operators_raises(self):
        with pytest.raises(DynamicsError, match="Hermitian"):
            HamiltonianModel(
                operators=[np.array([[0.0, 1.0], [0.0, 0.0]])], signals=[Signal(1.0)]
            )

    def test_validate_false_accepts_non_hermitian(self):
        nh = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)
        model = HamiltonianModel(static_operator=nh, validate=False)
        np.testing.assert_allclose(model.evaluate(0.0), -1j * nh)


# --------------- LindbladModel: absent-group combinations -------------------


class TestLindbladModelValidation:
    def test_all_none(self):
        with pytest.raises(DynamicsError, match="requires at least one"):
            LindbladModel()

    def test_hamiltonian_signals_without_operators(self):
        model = LindbladModel(static_hamiltonian=Z)
        with pytest.raises(DynamicsError, match="must be None"):
            model.signals = ([Signal(1.0)], None)

    def test_dissipator_signals_without_operators(self):
        model = LindbladModel(static_hamiltonian=Z)
        with pytest.raises(DynamicsError, match="must be None"):
            model.signals = (None, [Signal(1.0)])

    def test_hamiltonian_signals_length_mismatch(self):
        with pytest.raises(DynamicsError, match="same length"):
            LindbladModel(hamiltonian_operators=[X, Z], hamiltonian_signals=[Signal(1.0)])

    def test_dissipator_signals_length_mismatch(self):
        with pytest.raises(DynamicsError, match="same length"):
            LindbladModel(dissipator_operators=[X], dissipator_signals=[Signal(1.0), Signal(2.0)])

    def test_non_hermitian_hamiltonian_raises(self):
        nh = np.array([[0.0, 1.0], [0.0, 0.0]])
        with pytest.raises(DynamicsError, match="Hermitian"):
            LindbladModel(static_hamiltonian=nh)
        with pytest.raises(DynamicsError, match="Hermitian"):
            LindbladModel(hamiltonian_operators=[nh], hamiltonian_signals=[Signal(1.0)])

    def test_validate_false(self):
        nh = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)
        model = LindbladModel(static_hamiltonian=nh, validate=False)
        rho = rand_dm(2)
        expected = -1j * (nh @ rho - rho @ nh)
        np.testing.assert_allclose(model.evaluate_rhs(0.0, rho), expected, atol=1e-12)

    def test_evaluate_without_hamiltonian_signals_raises(self):
        model = LindbladModel(hamiltonian_operators=[X])
        with pytest.raises(DynamicsError, match="hamiltonian signals"):
            model.evaluate_rhs(0.0, rand_dm(2))

    def test_evaluate_without_dissipator_signals_raises(self):
        model = LindbladModel(dissipator_operators=[X])
        with pytest.raises(DynamicsError, match="dissipator signals"):
            model.evaluate_rhs(0.0, rand_dm(2))

    def test_non_vectorized_evaluate_raises(self):
        model = LindbladModel(static_hamiltonian=Z)
        with pytest.raises(NotImplementedError, match="without a given state"):
            model.evaluate(0.0)


class TestLindbladOnlyGroups:
    """Each operator group alone reproduces its explicit term (reference
    test_lindblad_model.py:206-280)."""

    rho = rand_dm(2, seed=5)

    def test_only_static_hamiltonian(self):
        H = rand_herm(2, seed=11)
        model = LindbladModel(static_hamiltonian=H)
        expected = -1j * (H @ self.rho - self.rho @ H)
        np.testing.assert_allclose(model.evaluate_rhs(0.0, self.rho), expected, atol=1e-12)

    def test_only_hamiltonian_operators(self):
        model = LindbladModel(hamiltonian_operators=[X, Y], hamiltonian_signals=[Signal(0.7), Signal(-0.3)])
        H = 0.7 * X - 0.3 * Y
        expected = -1j * (H @ self.rho - self.rho @ H)
        np.testing.assert_allclose(model.evaluate_rhs(0.0, self.rho), expected, atol=1e-12)

    def test_only_static_dissipators(self):
        L0 = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)
        L1 = 0.5 * Z
        model = LindbladModel(static_dissipators=[L0, L1])
        expected = dissipator_term(L0, self.rho) + dissipator_term(L1, self.rho)
        np.testing.assert_allclose(model.evaluate_rhs(0.0, self.rho), expected, atol=1e-12)

    def test_only_dissipator_operators(self):
        L0 = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)
        g = 0.37
        model = LindbladModel(dissipator_operators=[L0], dissipator_signals=[Signal(g)])
        expected = g * dissipator_term(L0, self.rho)
        np.testing.assert_allclose(model.evaluate_rhs(0.0, self.rho), expected, atol=1e-12)

    def test_static_vs_signalled_dissipator_consistency(self):
        """A static dissipator equals the same operator driven at constant 1
        (reference's dissipator_consistency case)."""
        L = np.array([[0.0, 0.8], [0.1j, 0.0]], dtype=complex)
        m_static = LindbladModel(static_dissipators=[L])
        m_signal = LindbladModel(dissipator_operators=[L], dissipator_signals=[Signal(1.0)])
        np.testing.assert_allclose(
            m_static.evaluate_rhs(0.5, self.rho),
            m_signal.evaluate_rhs(0.5, self.rho),
            atol=1e-12,
        )

    def test_time_dependent_dissipator_rate(self):
        """Time-dependent rate scales the dissipator term pointwise in t."""
        L = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)
        rate = lambda t: 0.2 + 0.1 * t**2
        model = LindbladModel(dissipator_operators=[L], dissipator_signals=[Signal(rate)])
        for t in (0.0, 0.7, 2.3):
            expected = rate(t) * dissipator_term(L, self.rho)
            np.testing.assert_allclose(model.evaluate_rhs(t, self.rho), expected, atol=1e-12)

    def test_all_groups_combined(self):
        H0 = rand_herm(2, seed=21)
        Ls = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)
        Ld = 0.3 * Y
        model = LindbladModel(
            static_hamiltonian=H0,
            hamiltonian_operators=[X],
            hamiltonian_signals=[Signal(0.4)],
            static_dissipators=[Ls],
            dissipator_operators=[Ld],
            dissipator_signals=[Signal(1.5)],
        )
        H = H0 + 0.4 * X
        expected = (
            -1j * (H @ self.rho - self.rho @ H)
            + dissipator_term(Ls, self.rho)
            + 1.5 * dissipator_term(Ld, self.rho)
        )
        np.testing.assert_allclose(model.evaluate_rhs(0.0, self.rho), expected, atol=1e-12)

    def test_properties_none_when_absent(self):
        model = LindbladModel(static_hamiltonian=Z)
        assert model.hamiltonian_operators is None
        assert model.static_dissipators is None
        assert model.dissipator_operators is None
        assert model.signals == (None, None)

    @pytest.mark.parametrize("array_library", [None, "scipy_sparse"])
    def test_only_groups_with_library(self, array_library):
        L = np.array([[0.0, 1.0], [0.0, 0.0]], dtype=complex)
        model = LindbladModel(static_dissipators=[L], array_library=array_library)
        expected = dissipator_term(L, self.rho)
        np.testing.assert_allclose(
            np.asarray(model.evaluate_rhs(0.0, self.rho)), expected, atol=1e-12
        )
