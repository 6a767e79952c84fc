"""Real-dependency parity harness (VERDICT r3 item 6).

qiskit, diffrax, and qutip are NOT installable in the build environment
(zero egress), so their interop branches are normally exercised against the
strict shape-faithful fakes in ``tests/qiskit_shapes.py`` /
``tests/diffrax_shape.py`` (contract surface pinned by
``tests/test_interop_contracts.py`` — if package code consumes more of a
dependency than the fakes model, THOSE tests fail loudly). This module is
the other half of the evidence: whenever the real packages ARE importable
(downstream CI, a user environment), the same interop branches run against
them — every test skips cleanly here and self-activates there.

Reference parity targets:
``/root/reference/test/dynamics/test_dynamics_backend.py:678+`` (real
fake-provider backends), ``test_qiskit_experiments.py``, and the diffrax
bridge's real SaveAt/complex handling
(``/root/reference/qiskit_dynamics/solvers/diffrax_solver.py:61-114``).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu import Signal, Solver, solve_ode

X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
NU = 5.0


def _rabi_solver(**kwargs):
    return Solver(
        static_hamiltonian=2 * np.pi * NU * Z / 2,
        hamiltonian_operators=[2 * np.pi * 0.1 * X / 2],
        rotating_frame=2 * np.pi * NU * Z / 2,
        **kwargs,
    )


class TestRealDiffrax:
    """The diffrax bridge against the real package (fake-verified here:
    ``tests/diffrax_shape.py``; contracts in ``test_interop_contracts.py``)."""

    def test_dopri5_matches_native(self):
        diffrax = pytest.importorskip("diffrax")
        sol = solve_ode(
            lambda t, y: -0.5 * y,
            t_span=[0.0, 1.0],
            y0=np.array([1.0 + 0j]),
            method=diffrax.Dopri5(),
            t_eval=[0.0, 0.5, 1.0],
        )
        np.testing.assert_allclose(
            np.asarray(sol.y[-1]), [np.exp(-0.5)], rtol=1e-6
        )
        assert len(sol.y) == 3  # real SaveAt honors every t_eval point

    def test_complex_rhs_roundtrip(self):
        """Real diffrax rejects complex state; the bridge must split/recombine
        (ref diffrax_solver.py:61-114)."""
        diffrax = pytest.importorskip("diffrax")
        G = -1j * 2 * np.pi * 0.3 * X / 2
        sol = solve_ode(
            lambda t, y: jnp.asarray(G) @ y,
            t_span=[0.0, 1.0],
            y0=np.array([1.0, 0.0], dtype=complex),
            method=diffrax.Tsit5(),
        )
        ref = solve_ode(
            lambda t, y: G @ y, t_span=[0.0, 1.0],
            y0=np.array([1.0, 0.0], dtype=complex),
            method="DOP853", atol=1e-12, rtol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(sol.y[-1]), np.asarray(ref.y[-1]), atol=1e-6
        )


class TestRealQiskit:
    """DynamicsBackend / quantum_info against real qiskit (fake-verified
    here: ``tests/qiskit_shapes.py``)."""

    def test_statevector_dispatch(self):
        qi = pytest.importorskip("qiskit.quantum_info")
        solver = _rabi_solver()
        res = solver.solve(
            t_span=[0.0, 1.0],
            y0=qi.Statevector([1.0, 0.0]),
            signals=[Signal(0.5, carrier_freq=NU)],
            method="DOP853", atol=1e-10, rtol=1e-10,
        )
        assert isinstance(res.y[-1], qi.Statevector)
        ref = solver.solve(
            t_span=[0.0, 1.0], y0=np.array([1.0, 0.0], dtype=complex),
            signals=[Signal(0.5, carrier_freq=NU)],
            method="DOP853", atol=1e-10, rtol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(res.y[-1].data), np.asarray(ref.y[-1]), atol=1e-8
        )

    def test_backend_run_pulse_schedule(self):
        pulse = pytest.importorskip("qiskit.pulse")
        from qiskit_dynamics_tpu.backend import DynamicsBackend

        solver = _rabi_solver(
            hamiltonian_channels=["d0"],
            channel_carrier_freqs={"d0": NU},
            dt=0.1,
        )
        backend = DynamicsBackend(solver=solver, subsystem_dims=[2])
        with pulse.build() as sched:
            pulse.play(
                pulse.Gaussian(duration=32, amp=0.5, sigma=8),
                pulse.DriveChannel(0),
            )
            pulse.acquire(1, pulse.AcquireChannel(0), pulse.MemorySlot(0))
        result = backend.run(sched, shots=256, seed_simulator=7).result()
        counts = result.get_counts()
        assert sum(counts.values()) == 256

    def test_target_is_real_target(self):
        transpiler = pytest.importorskip("qiskit.transpiler")
        from qiskit_dynamics_tpu.backend import DynamicsBackend

        solver = _rabi_solver(
            hamiltonian_channels=["d0"],
            channel_carrier_freqs={"d0": NU},
            dt=0.1,
        )
        backend = DynamicsBackend(solver=solver, subsystem_dims=[2])
        assert isinstance(backend.target, transpiler.Target)
        assert backend.target.dt == backend.dt

    def test_circuit_lowering(self):
        qiskit = pytest.importorskip("qiskit")
        pulse = pytest.importorskip("qiskit.pulse")
        from qiskit_dynamics_tpu.backend import DynamicsBackend

        solver = _rabi_solver(
            hamiltonian_channels=["d0"],
            channel_carrier_freqs={"d0": NU},
            dt=0.1,
        )
        backend = DynamicsBackend(solver=solver, subsystem_dims=[2])
        with pulse.build() as xcal:
            pulse.play(
                pulse.Gaussian(duration=32, amp=0.8, sigma=8),
                pulse.DriveChannel(0),
            )
        circ = qiskit.QuantumCircuit(1, 1)
        circ.x(0)
        circ.measure(0, 0)
        circ.add_calibration("x", [0], xcal)
        result = backend.run(circ, shots=128, seed_simulator=3).result()
        assert sum(result.get_counts().values()) == 128


class TestRealQutip:
    """Qobj coercion against real qutip (duck-typed stand-in covered in
    ``test_interop_contracts.TestQutipCoercion``)."""

    def test_qobj_operators(self):
        qutip = pytest.importorskip("qutip")
        from qiskit_dynamics_tpu.models import HamiltonianModel

        model = HamiltonianModel(
            static_operator=qutip.Qobj(2 * np.pi * NU * Z / 2),
            operators=[qutip.Qobj(2 * np.pi * 0.1 * X / 2)],
            signals=[Signal(1.0, carrier_freq=NU)],
        )
        out = np.asarray(model(0.1))
        assert out.shape == (2, 2)
