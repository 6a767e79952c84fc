"""Contract tests for the interop fakes (VERDICT r2 item 7).

qiskit/diffrax/qutip cannot be installed in this environment, so the interop
branches are exercised against shape-faithful fakes. These tests make the
fakes' contract surfaces EXPLICIT and loud: a strict fake raises
``AssertionError`` (not ``AttributeError``, which duck-typing fallbacks can
silently swallow) whenever package code touches an attribute outside the
pinned surface, with each surface cited to upstream API docs in the fake
modules. If package code starts consuming more of qiskit/diffrax than the
fakes model, these tests fail instead of silently passing against a drifted
double.

The complementary half is ``tests/test_real_deps.py``: the same interop
branches run against the REAL packages whenever they are importable (skip
cleanly otherwise), so the fake-vs-real evidence gap closes automatically
in any environment that has them.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu import Signal, Solver, solve_ode


class TestDiffraxContract:
    def test_bridge_runs_against_strict_fake(self):
        from tests.diffrax_shape import install

        uninstall = install()
        try:
            import diffrax

            sol = solve_ode(
                lambda t, y: -0.5 * y,
                t_span=[0.0, 1.0],
                y0=np.array([1.0 + 0j]),
                method=diffrax.Dopri5(),
                t_eval=[0.0, 0.5, 1.0],
            )
            np.testing.assert_allclose(
                np.abs(np.asarray(sol.y[-1])), np.exp(-0.5), rtol=1e-6
            )
        finally:
            uninstall()

    def test_unmodeled_attribute_fails_loudly(self):
        from tests.diffrax_shape import install

        uninstall = install()
        try:
            import diffrax

            with pytest.raises(AssertionError, match="contract violation"):
                _ = diffrax.Tsit5  # not part of the pinned surface
        finally:
            uninstall()


class TestSymbolicPulseContract:
    def test_converter_consumes_only_pinned_surface(self):
        from tests.qiskit_shapes import strict_symbolic_pulse, fake_gaussian_pulse
        from qiskit_dynamics_tpu.pulse import (
            DriveChannel,
            InstructionToSignals,
            Play,
            Schedule,
        )

        pulse = strict_symbolic_pulse(64, 0.5, 16.0)
        sched = Schedule(Play(pulse, DriveChannel(0)))
        converter = InstructionToSignals(dt=0.1, carriers={"d0": 5.0})
        (signal,) = converter.get_signals(sched)
        # same samples as the plain fake
        ref_pulse = fake_gaussian_pulse(64, 0.5, 16.0)
        ref_sched = Schedule(Play(ref_pulse, DriveChannel(0)))
        (ref_signal,) = converter.get_signals(ref_sched)
        np.testing.assert_allclose(
            np.asarray(signal.samples), np.asarray(ref_signal.samples), atol=1e-12
        )

    def test_strictness_canary(self):
        from tests.qiskit_shapes import strict_symbolic_pulse

        pulse = strict_symbolic_pulse(16, 0.1, 4.0)
        assert not hasattr(pulse, "get_waveform")  # probe_ok -> AttributeError
        with pytest.raises(AssertionError, match="contract violation"):
            _ = pulse.pulse_type  # outside the pinned surface


class TestQuantumInfoContract:
    def test_solver_consumes_only_data_and_dims(self, monkeypatch):
        from tests.qiskit_shapes import FAKE_QISKIT_TYPES, strict_statevector
        from qiskit_dynamics_tpu.solvers import solver_classes

        monkeypatch.setattr(solver_classes, "_QISKIT", FAKE_QISKIT_TYPES)
        X = np.array([[0.0, 1.0], [1.0, 0.0]])
        solver = Solver(
            static_hamiltonian=np.diag([1.0, -1.0]),
            hamiltonian_operators=[X],
        )
        y0 = strict_statevector([1.0, 0.0])
        res = solver.solve(
            t_span=[0.0, 0.1],
            y0=y0,
            signals=[Signal(0.1, carrier_freq=0.0)],
            method="DOP853",
            atol=1e-10,
            rtol=1e-10,
        )
        yf = res.y[-1]
        assert type(yf).__name__.endswith("Statevector")
        np.testing.assert_allclose(np.linalg.norm(np.asarray(yf.data)), 1.0, atol=1e-8)

    def test_strictness_canary(self):
        from tests.qiskit_shapes import strict_statevector

        sv = strict_statevector([1.0, 0.0])
        with pytest.raises(AssertionError, match="contract violation"):
            _ = sv.probabilities


class TestQutipCoercion:
    """qutip ``Qobj`` coercion (duck-typed on ``.full()``), reference:
    ``/root/reference/qiskit_dynamics/arraylias/register_functions/asarray.py:36-59``."""

    class Qobj:  # minimal duck-typed stand-in (qutip not installable)
        def __init__(self, arr):
            self._arr = np.asarray(arr, dtype=complex)

        def full(self):
            return self._arr

    def test_asarray_coerces_qobj(self):
        from qiskit_dynamics_tpu.unified import asarray

        q = self.Qobj([[0.0, 1.0], [1.0, 0.0]])
        out = asarray(q)
        assert isinstance(out, np.ndarray) and out.dtype == complex
        np.testing.assert_array_equal(out, q.full())
        # lists of Qobj coerce elementwise
        out2 = asarray([q, q])
        assert out2.shape == (2, 2, 2)

    def test_model_accepts_qobj_operators(self):
        X = self.Qobj([[0.0, 1.0], [1.0, 0.0]])
        Z = self.Qobj([[1.0, 0.0], [0.0, -1.0]])
        solver = Solver(static_hamiltonian=Z, hamiltonian_operators=[X])
        res = solver.solve(
            t_span=[0.0, 0.2],
            y0=np.array([1.0, 0.0], dtype=complex),
            signals=[Signal(0.5, carrier_freq=0.0)],
            method="DOP853",
            atol=1e-10,
            rtol=1e-10,
        )
        ref = Solver(
            static_hamiltonian=np.diag([1.0, -1.0]),
            hamiltonian_operators=[np.array([[0.0, 1.0], [1.0, 0.0]])],
        ).solve(
            t_span=[0.0, 0.2],
            y0=np.array([1.0, 0.0], dtype=complex),
            signals=[Signal(0.5, carrier_freq=0.0)],
            method="DOP853",
            atol=1e-10,
            rtol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(res.y[-1]), np.asarray(ref.y[-1]), atol=1e-9
        )


class TestOdeSolverSubclassPassthrough:
    """Reference parity: arbitrary scipy ``OdeSolver`` subclasses pass
    through ``method=`` (``/root/reference/qiskit_dynamics/solvers/solver_functions.py:129-217``)."""

    def test_custom_odesolver_subclass(self):
        from scipy.integrate import RK45

        calls = []

        class TaggedRK45(RK45):
            def __init__(self, *args, **kwargs):
                calls.append(1)
                super().__init__(*args, **kwargs)

        res = solve_ode(
            lambda t, y: -1j * y,
            t_span=[0.0, 1.0],
            y0=np.array([1.0 + 0j]),
            method=TaggedRK45,
            atol=1e-10,
            rtol=1e-10,
        )
        assert calls, "custom OdeSolver subclass was not instantiated"
        np.testing.assert_allclose(
            np.asarray(res.y[-1]), [np.exp(-1j)], atol=1e-8
        )

    def test_unknown_method_rejected(self):
        from qiskit_dynamics_tpu.exceptions import DynamicsError

        with pytest.raises(DynamicsError):
            solve_ode(
                lambda t, y: y, t_span=[0.0, 1.0], y0=np.array([1.0]),
                method="no_such_method",
            )
