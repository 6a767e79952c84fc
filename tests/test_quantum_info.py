"""quantum_info type unit battery (dims, probabilities, conversions).

The native types duck-type qiskit.quantum_info (reference uses qiskit's
directly); these pin their standalone semantics.
"""
import numpy as np
import pytest

from qiskit_dynamics_tpu.quantum_info import (
    Statevector,
    DensityMatrix,
    Operator,
    SuperOp,
    QuantumState,
    BaseOperator,
)


class TestStatevector:
    def test_dims_inferred_qubits(self):
        sv = Statevector(np.zeros(8))
        assert sv.dims() == (2, 2, 2)
        assert sv.dim == 8

    def test_dims_inferred_non_power_of_two(self):
        sv = Statevector(np.zeros(3))
        assert sv.dims() == (3,)

    def test_explicit_dims(self):
        sv = Statevector(np.zeros(6), dims=(2, 3))
        assert sv.dims() == (2, 3)

    def test_probabilities(self):
        sv = Statevector(np.array([1.0, 1.0j]) / np.sqrt(2))
        np.testing.assert_allclose(sv.probabilities(), [0.5, 0.5], atol=1e-12)

    def test_from_int(self):
        sv = Statevector.from_int(2, dims=(2, 2))
        np.testing.assert_allclose(np.asarray(sv.data), [0, 0, 1, 0])

    def test_to_density_matrix(self):
        sv = Statevector(np.array([1.0, 1.0]) / np.sqrt(2))
        dm = sv.to_density_matrix()
        assert isinstance(dm, DensityMatrix)
        np.testing.assert_allclose(np.asarray(dm.data), np.full((2, 2), 0.5), atol=1e-12)

    def test_equality_and_array(self):
        a = Statevector([1.0, 0.0])
        b = Statevector([1.0, 0.0])
        assert a == b
        np.testing.assert_allclose(np.asarray(a), [1.0, 0.0])

    def test_isinstance_quantum_state(self):
        assert isinstance(Statevector([1.0, 0.0]), QuantumState)


class TestDensityMatrix:
    def test_from_statevector_input(self):
        dm = DensityMatrix(Statevector([0.0, 1.0]))
        np.testing.assert_allclose(np.asarray(dm.data), np.diag([0.0, 1.0]), atol=1e-12)

    def test_probabilities_diagonal(self):
        dm = DensityMatrix(np.diag([0.25, 0.75]))
        np.testing.assert_allclose(dm.probabilities(), [0.25, 0.75], atol=1e-12)

    def test_from_int(self):
        dm = DensityMatrix.from_int(1, dims=(2,))
        np.testing.assert_allclose(np.asarray(dm.data), np.diag([0.0, 1.0]))

    def test_dims(self):
        dm = DensityMatrix(np.eye(4) / 4)
        assert dm.dims() == (2, 2)


class TestOperators:
    def test_operator_adjoint(self):
        data = np.array([[1.0, 2.0j], [0.0, 1.0]])
        op = Operator(data)
        np.testing.assert_allclose(np.asarray(op.adjoint().data), data.conj().T)

    @pytest.mark.parametrize(
        "label,expected",
        [
            ("I", np.eye(2)),
            ("X", np.array([[0, 1], [1, 0]])),
            ("Y", np.array([[0, -1j], [1j, 0]])),
            ("Z", np.diag([1, -1])),
        ],
    )
    def test_from_label(self, label, expected):
        np.testing.assert_allclose(np.asarray(Operator.from_label(label).data), expected)

    def test_from_label_tensor(self):
        XZ = Operator.from_label("XZ")
        np.testing.assert_allclose(
            np.asarray(XZ.data),
            np.kron(np.array([[0, 1], [1, 0]]), np.diag([1, -1])),
        )

    def test_operator_dims(self):
        op = Operator(np.eye(4))
        assert op.input_dims() == (2, 2)
        assert op.output_dims() == (2, 2)

    def test_superop_dims(self):
        s = SuperOp(np.eye(4))
        assert s.input_dims() == (2,)
        assert s.output_dims() == (2,)
        assert isinstance(s, BaseOperator)

    def test_superop_from_operator(self):
        """SuperOp(U-operator) = conj(U) kron U (column-stacking convention)."""
        U = np.array([[0, 1], [1, 0]], dtype=complex)
        s = SuperOp(Operator(U))
        np.testing.assert_allclose(np.asarray(s.data), np.kron(U.conj(), U), atol=1e-12)
