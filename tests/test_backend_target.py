"""BackendV2-interface parity: target / max_circuits / configuration / defaults.

Reference: ``/root/reference/qiskit_dynamics/backend/dynamics_backend.py``
(:158-221 target construction, :522-531 properties, :585-591 accessors).
"""
import numpy as np
import pytest

from qiskit_dynamics_tpu import Solver
from qiskit_dynamics_tpu.backend import DynamicsBackend
from qiskit_dynamics_tpu.perturbation import ArrayPolynomial
from qiskit_dynamics_tpu.exceptions import DynamicsError


@pytest.fixture
def solver():
    X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
    Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
    return Solver(
        static_hamiltonian=2 * np.pi * 5.0 * Z / 2,
        hamiltonian_operators=[2 * np.pi * 0.1 * X / 2],
        hamiltonian_channels=["d0"],
        channel_carrier_freqs={"d0": 5.0},
        dt=0.1,
    )


def test_default_target_stamped(solver):
    backend = DynamicsBackend(solver=solver)
    assert backend.target is not None
    assert backend.target.dt == 0.1
    assert backend.target.num_qubits == 1
    assert backend.max_circuits is None


def test_provided_target_copied_and_stamped(solver):
    class MyTarget:
        dt = None
        num_qubits = None
        custom = "payload"

    src = MyTarget()
    backend = DynamicsBackend(solver=solver, target=src)
    assert backend.target is not src  # copied, reference :197-199
    assert backend.target.dt == 0.1
    assert backend.target.num_qubits == 1
    assert backend.target.custom == "payload"
    assert src.dt is None  # input not mutated


def test_configuration_defaults_options(solver):
    backend = DynamicsBackend(solver=solver)
    assert backend.configuration() is None
    assert backend.defaults() is None
    sentinel_conf, sentinel_defs = object(), object()
    backend.set_options(configuration=sentinel_conf, defaults=sentinel_defs)
    assert backend.configuration() is sentinel_conf
    assert backend.defaults() is sentinel_defs


def test_array_polynomial_array_library_kwarg():
    ap = ArrayPolynomial(
        constant_term=np.eye(2),
        array_coefficients=np.array([np.eye(2), 2 * np.eye(2)]),
        monomial_labels=[[0], [1]],
        array_library="jax",
    )
    import jax.numpy as jnp

    assert isinstance(ap.array_coefficients, jnp.ndarray)
    out = ap(np.array([1.0, 2.0]))
    assert np.allclose(np.asarray(out), (1 + 1 + 4) * np.eye(2))

    # numpy library: storage untouched
    ap_np = ArrayPolynomial(constant_term=np.eye(2), array_library="numpy")
    assert isinstance(ap_np.constant_term, np.ndarray)

    with pytest.raises(DynamicsError):
        ArrayPolynomial(constant_term=np.eye(2), array_library="torch")


def test_array_polynomial_scipy_sparse_densifies_with_warning():
    from scipy.sparse import csr_matrix

    with pytest.warns(UserWarning, match="densified"):
        ap = ArrayPolynomial(
            constant_term=csr_matrix(np.eye(2)),
            array_coefficients=[csr_matrix(2.0 * np.eye(2))],
            monomial_labels=[[0]],
            array_library="scipy_sparse",
        )
    assert isinstance(ap.constant_term, np.ndarray)
    out = ap(np.array([3.0]))
    assert np.allclose(np.asarray(out), 7.0 * np.eye(2))


def test_measure_calibrations_attempted_on_provided_target():
    """The reference adds default measure calibrations to user-provided
    targets too (ref dynamics_backend.py:202-215); with qiskit absent the
    helper must no-op gracefully on native stand-ins."""
    calls = []

    class RecordingTarget:
        dt = None
        num_qubits = None

        def instruction_schedule_map(self):
            calls.append("ism")
            raise RuntimeError("native stand-in without qiskit")

    X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
    solver = Solver(
        static_hamiltonian=np.pi * np.diag([1.0, -1.0]),
        hamiltonian_operators=[np.pi * X],
        hamiltonian_channels=["d0"],
        channel_carrier_freqs={"d0": 1.0},
        dt=0.1,
    )
    backend = DynamicsBackend(solver=solver, target=RecordingTarget())
    # the helper attempted the calibration walk (qiskit importable or not,
    # construction survives a target that cannot register instructions)
    assert backend.target.dt == 0.1
