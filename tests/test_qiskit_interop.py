"""qiskit interop surface, exercised against structural fakes.

qiskit is not installable in this environment, so every duck-typed branch is
driven with the shape-accurate doubles in ``tests/qiskit_shapes.py`` (each
mirrors the attribute contract of the corresponding qiskit object, cited
there). These tests fail if the duck-typing in the package drifts.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu import Solver
from qiskit_dynamics_tpu.backend import DynamicsBackend
from qiskit_dynamics_tpu.exceptions import DynamicsError
from qiskit_dynamics_tpu.pulse import InstructionToSignals, Schedule
from qiskit_dynamics_tpu.pulse.library import Constant, Gaussian
from qiskit_dynamics_tpu.pulse.pulse_to_signals import get_samples
from qiskit_dynamics_tpu.pulse.schedule import (
    Acquire,
    AcquireChannel,
    DriveChannel,
    MemorySlot,
    Play,
)

from qiskit_shapes import (
    FAKE_QISKIT_TYPES,
    FakeBackendV1,
    FakeBackendV2,
    FakeDefaults,
    FakeDensityMatrix,
    FakeOperator,
    FakePulseBackendConfiguration,
    FakeQuantumCircuit,
    FakeStatevector,
    FakeSuperOp,
    FakeTarget,
    FakeUChannelLO,
    fake_gaussian_pulse,
    two_transmon_hamiltonian_dict,
)


class TestSymbolicPulseSampling:
    """JAX-traceable sampling of sympy-envelope (qiskit SymbolicPulse-shaped)
    pulses — reference: pulse_to_signals.py:329-391."""

    def test_matches_native_gaussian(self):
        duration, amp, sigma = 64, 0.5, 12.0
        fake = fake_gaussian_pulse(duration, amp, sigma)
        native = Gaussian(duration=duration, amp=amp, sigma=sigma)
        np.testing.assert_allclose(
            np.asarray(get_samples(fake), dtype=complex),
            np.asarray(native.get_waveform().samples),
            atol=1e-12,
        )

    def test_jit_and_grad_through_schedule(self):
        duration, sigma = 64, 12.0
        converter = InstructionToSignals(dt=0.1, carriers={"d0": 5.0})

        def max_sample(amp):
            pulse = fake_gaussian_pulse(duration, amp, sigma)
            sched = Schedule(Play(pulse, DriveChannel(0)))
            sig = converter.get_signals(sched)[0]
            return jnp.max(jnp.abs(jnp.asarray(sig.samples)))

        val = jax.jit(max_sample)(0.5)
        np.testing.assert_allclose(float(val), 0.5 * float(max_sample(1.0)), rtol=1e-6)
        grad = jax.grad(max_sample)(0.5)
        np.testing.assert_allclose(float(grad), float(max_sample(1.0)), rtol=1e-6)

    def test_unassigned_parameters_raise(self):
        pulse = fake_gaussian_pulse(16, 0.1, 4.0)
        pulse.is_parameterized = lambda: True
        with pytest.raises(DynamicsError, match="unassigned"):
            get_samples(pulse)

    def test_missing_symbol_raises(self):
        pulse = fake_gaussian_pulse(16, 0.1, 4.0)
        del pulse.parameters["sigma"]
        with pytest.raises(DynamicsError, match="sigma"):
            get_samples(pulse)


class TestQiskitShapedSchedule:
    """InstructionToSignals consumes qiskit Schedules duck-typed:
    ``(start, inst)`` pairs with ``inst.channel.name`` and class NAMES
    matching the qiskit instruction set. Build a foreign schedule out of
    locally-defined classes with those names and check it converts exactly
    like the equivalent native schedule."""

    def _foreign_schedule(self, pulse):
        class _Chan:
            def __init__(self, name):
                self.name = name

        class Play:
            def __init__(self, pulse, channel):
                self.pulse = pulse
                self.channel = channel
                self.duration = pulse.duration

        class ShiftPhase:
            def __init__(self, phase, channel):
                self.phase = phase
                self.channel = channel
                self.duration = 0

        class SetFrequency:
            def __init__(self, frequency, channel):
                self.frequency = frequency
                self.channel = channel
                self.duration = 0

        d0 = _Chan("d0")

        class _Sched:
            channels = [d0]
            instructions = [
                (0, ShiftPhase(np.pi / 3, d0)),
                (0, Play(pulse, d0)),
                (pulse.duration, SetFrequency(5.05, d0)),
                (pulse.duration, Play(pulse, d0)),
            ]

        return _Sched()

    def test_matches_native_conversion(self):
        from qiskit_dynamics_tpu.pulse.library import Gaussian
        from qiskit_dynamics_tpu.pulse.schedule import (
            Play as NativePlay,
            SetFrequency as NativeSetFrequency,
            ShiftPhase as NativeShiftPhase,
        )

        dur, amp, sigma = 32, 0.4, 8.0
        converter = InstructionToSignals(dt=0.1, carriers={"d0": 5.0})

        foreign = self._foreign_schedule(fake_gaussian_pulse(dur, amp, sigma))
        sig_f = converter.get_signals(foreign)[0]

        native = Schedule()
        g = Gaussian(duration=dur, amp=amp, sigma=sigma)
        native.append(NativeShiftPhase(np.pi / 3, DriveChannel(0)))
        native.append(NativePlay(g, DriveChannel(0)))
        native.insert(dur, NativeSetFrequency(5.05, DriveChannel(0)))
        native.insert(dur, NativePlay(g, DriveChannel(0)))
        sig_n = converter.get_signals(native)[0]

        np.testing.assert_allclose(
            np.asarray(sig_f.samples), np.asarray(sig_n.samples), atol=1e-12
        )
        assert float(sig_f.carrier_freq) == float(sig_n.carrier_freq)


def _fake_v2_backend(with_target_freqs=True, with_defaults=True, meas=False):
    ham = two_transmon_hamiltonian_dict()
    if meas:
        ham["h_str"] = ham["h_str"] + ["X0||M0"]
    config = FakePulseBackendConfiguration(
        hamiltonian=ham,
        dt=0.222e-9,
        u_channel_lo=[[FakeUChannelLO(1, 1.0)], [FakeUChannelLO(0, 1.0)]],
        num_qubits=2,
    )
    target = FakeTarget([5.0e9, 5.1e9] if with_target_freqs else None)
    defaults = (
        FakeDefaults(
            qubit_freq_est=[4.9e9, 5.05e9], meas_freq_est=[6.5e9, 6.6e9]
        )
        if with_defaults
        else None
    )
    return FakeBackendV2(target, configuration=config, defaults=defaults)


class TestFromBackend:
    """Target/defaults/u_channel_lo channel-frequency resolution —
    reference: dynamics_backend.py:593-802, 1047-1135."""

    def test_v2_target_frequencies_win(self):
        backend = DynamicsBackend.from_backend(_fake_v2_backend())
        freqs = backend.options.solver._channel_carrier_freqs
        # target frequencies (5.0/5.1 GHz), not the defaults' 4.9/5.05
        assert freqs["d0"] == 5.0e9 and freqs["d1"] == 5.1e9
        assert freqs["u0"] == 5.1e9 and freqs["u1"] == 5.0e9
        assert backend.options.subsystem_dims == [2, 2]

    def test_v2_defaults_fallback(self):
        backend = DynamicsBackend.from_backend(_fake_v2_backend(with_target_freqs=False))
        freqs = backend.options.solver._channel_carrier_freqs
        assert freqs["d0"] == 4.9e9 and freqs["d1"] == 5.05e9

    def test_v1_legacy(self):
        ham = two_transmon_hamiltonian_dict()
        config = FakePulseBackendConfiguration(
            hamiltonian=ham, dt=0.222e-9,
            u_channel_lo=[[FakeUChannelLO(1, 1.0)], [FakeUChannelLO(0, 1.0)]],
        )
        defaults = FakeDefaults(qubit_freq_est=[5.0e9, 5.1e9])
        backend = DynamicsBackend.from_backend(FakeBackendV1(config, defaults))
        freqs = backend.options.solver._channel_carrier_freqs
        assert freqs["d0"] == 5.0e9 and freqs["u0"] == 5.1e9

    def test_meas_channel_frequencies(self):
        backend = DynamicsBackend.from_backend(_fake_v2_backend(meas=True))
        freqs = backend.options.solver._channel_carrier_freqs
        assert freqs["m0"] == 6.5e9

    def test_meas_without_defaults_raises(self):
        fake = _fake_v2_backend(meas=True, with_defaults=False)
        with pytest.raises(DynamicsError, match="meas_freq_est"):
            DynamicsBackend.from_backend(fake)

    def test_no_frequency_source_raises(self):
        fake = _fake_v2_backend(with_target_freqs=False, with_defaults=False)
        with pytest.raises(DynamicsError, match="frequencies not available"):
            DynamicsBackend.from_backend(fake)

    def test_subsystem_list_restricts(self):
        backend = DynamicsBackend.from_backend(_fake_v2_backend(), subsystem_list=[0])
        # only qubit 0 kept: d1/u-channel couplings are dropped by the parser
        channels = backend.options.solver._hamiltonian_channels
        assert "d1" not in channels and "d0" in channels

    def test_missing_hamiltonian_raises(self):
        class NoPulseBackend:
            pass

        with pytest.raises(DynamicsError, match="from_config"):
            DynamicsBackend.from_backend(NoPulseBackend())


def _rabi_backend(**options):
    nu = 5.0
    X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
    Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
    r = 0.1
    solver = Solver(
        static_hamiltonian=2 * np.pi * nu * Z / 2,
        hamiltonian_operators=[2 * np.pi * r * X / 2],
        hamiltonian_channels=["d0"],
        channel_carrier_freqs={"d0": nu},
        dt=0.1,
        rotating_frame=2 * np.pi * nu * Z / 2,
    )
    return DynamicsBackend(solver=solver, subsystem_dims=[2], **options), r


@pytest.fixture
def qiskit_types_patched(monkeypatch):
    """Resolve the solver's optional-qiskit type table to the fakes.

    ``solver_classes._QISKIT`` is None when qiskit is absent; patching it
    exercises the exact dispatch paths real qiskit objects would take."""
    from qiskit_dynamics_tpu.solvers import solver_classes

    monkeypatch.setattr(solver_classes, "_QISKIT", FAKE_QISKIT_TYPES)
    yield


class TestQiskitQuantumInfoDispatch:
    """quantum_info-typed initial states through Solver.solve — reference
    type table: solver_classes.py:430-470, 741-816."""

    def _solver(self):
        X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
        Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
        from qiskit_dynamics_tpu import Signal

        solver = Solver(
            static_hamiltonian=np.pi * Z,
            hamiltonian_operators=[np.pi * X / 2],
        )
        signals = [Signal(0.1, carrier_freq=1.0)]
        return solver, signals

    def test_fake_statevector_roundtrip(self, qiskit_types_patched):
        solver, signals = self._solver()
        y0 = FakeStatevector(np.array([1.0, 0.0], dtype=complex))
        res = solver.solve(
            t_span=[0.0, 1.0], y0=y0, signals=signals, method="DOP853",
            atol=1e-12, rtol=1e-12,
        )
        assert isinstance(res.y[-1], FakeStatevector)
        ref = solver.solve(
            t_span=[0.0, 1.0], y0=np.array([1.0, 0.0], dtype=complex),
            signals=signals, method="DOP853", atol=1e-12, rtol=1e-12,
        )
        np.testing.assert_allclose(res.y[-1].data, np.asarray(ref.y[-1]), atol=1e-10)

    def test_fake_statevector_on_lindblad_becomes_density_matrix(
        self, qiskit_types_patched
    ):
        X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
        Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
        from qiskit_dynamics_tpu import Signal

        solver = Solver(
            static_hamiltonian=np.pi * Z,
            hamiltonian_operators=[np.pi * X / 2],
            static_dissipators=[0.1 * np.array([[0, 1], [0, 0]], dtype=complex)],
        )
        y0 = FakeStatevector(np.array([0.0, 1.0], dtype=complex))
        res = solver.solve(
            t_span=[0.0, 1.0], y0=y0, signals=[Signal(0.1, carrier_freq=1.0)],
            method="DOP853", atol=1e-10, rtol=1e-10,
        )
        assert isinstance(res.y[-1], FakeDensityMatrix)
        # amplitude damping from |1>: trace preserved, ground pop grows
        rho = res.y[-1].data
        np.testing.assert_allclose(np.trace(rho), 1.0, atol=1e-8)
        # decay rate |0.1|^2 = 0.01 over t=1 -> ground pop ~1% (+ drive)
        assert np.real(rho[0, 0]) > 0.005

    def test_fake_operator_propagator(self, qiskit_types_patched):
        solver, signals = self._solver()
        y0 = FakeOperator(np.eye(2, dtype=complex))
        res = solver.solve(
            t_span=[0.0, 1.0], y0=y0, signals=signals, method="DOP853",
            atol=1e-12, rtol=1e-12,
        )
        assert isinstance(res.y[-1], FakeOperator)
        U = res.y[-1].data
        np.testing.assert_allclose(U @ U.conj().T, np.eye(2), atol=1e-8)

    def test_fake_superop_vectorized_lindblad(self, qiskit_types_patched):
        X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
        Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)
        from qiskit_dynamics_tpu import Signal

        solver = Solver(
            static_hamiltonian=np.pi * Z,
            hamiltonian_operators=[np.pi * X / 2],
            static_dissipators=[0.1 * np.array([[0, 1], [0, 0]], dtype=complex)],
            vectorized=True,
        )
        y0 = FakeSuperOp(np.eye(4, dtype=complex))
        res = solver.solve(
            t_span=[0.0, 1.0], y0=y0, signals=[Signal(0.1, carrier_freq=1.0)],
            method="DOP853", atol=1e-10, rtol=1e-10,
        )
        assert isinstance(res.y[-1], FakeSuperOp)
        # trace preservation: vec(I)^dag . S . vec(rho) == tr(rho)
        S = res.y[-1].data
        vec_id = np.eye(2).ravel(order="F")
        np.testing.assert_allclose(vec_id @ S, vec_id, atol=1e-6)


class TestDiffraxBridge:
    """The optional diffrax bridge, driven with a behavior-faithful fake
    module (tests/diffrax_shape.py) — exercises complex<->real conversion,
    t_eval -> SaveAt mapping, and the module-name method detection."""

    def test_solve_via_fake_diffrax(self):
        import diffrax_shape

        uninstall = diffrax_shape.install()
        try:
            import diffrax

            from qiskit_dynamics_tpu.solvers import solve_ode

            G = -1j * np.pi * np.array([[0.0, 1.0], [1.0, 0.0]])
            y0 = np.array([1.0, 0.0], dtype=complex)
            t_eval = [0.4, 1.0]
            res = solve_ode(
                lambda t, y: G @ y, t_span=[0.0, 1.3], y0=y0,
                method=diffrax.Dopri5(), t_eval=t_eval,
            )
            import scipy.linalg

            assert len(res.y) == 2
            for t, y in zip(t_eval, res.y):
                np.testing.assert_allclose(
                    np.asarray(y), scipy.linalg.expm(t * G) @ y0, atol=1e-7
                )
        finally:
            uninstall()

    def test_saveat_and_t_eval_conflict(self):
        import diffrax_shape

        uninstall = diffrax_shape.install()
        try:
            import diffrax

            from qiskit_dynamics_tpu.solvers import solve_ode

            G = -1j * np.pi * np.array([[0.0, 1.0], [1.0, 0.0]])
            with pytest.raises(DynamicsError, match="saveat"):
                solve_ode(
                    lambda t, y: G @ y, t_span=[0.0, 1.0],
                    y0=np.array([1.0, 0.0], dtype=complex),
                    method=diffrax.Dopri5(), t_eval=[0.5],
                    saveat=diffrax.SaveAt(ts=[0.5]),
                )
        finally:
            uninstall()

    def test_missing_diffrax_clean_error(self):
        """Without diffrax installed, a diffrax-shaped method raises a clear
        DynamicsError (not an opaque ImportError deep in a trace)."""
        from qiskit_dynamics_tpu.solvers.diffrax_solver import diffrax_solver

        class NotReallyDiffrax:
            pass

        NotReallyDiffrax.__module__ = "diffrax"
        with pytest.raises(DynamicsError, match="optional diffrax package"):
            diffrax_solver(
                lambda t, y: y, t_span=[0.0, 1.0],
                y0=np.array([1.0, 0.0], dtype=complex), method=NotReallyDiffrax(),
            )


class TestCircuitExecution:
    """QuantumCircuit-shaped inputs to DynamicsBackend.run — reference:
    dynamics_backend.py:429, 1022-1044 and test_dynamics_backend.py:287+."""

    def _pi_circuit(self, r):
        n_samples = 50
        amp = 1.0 / (r * n_samples * 0.1)
        x_cal = Schedule(name="x_cal")
        x_cal.append(Play(Constant(duration=n_samples, amp=amp), DriveChannel(0)))

        circ = FakeQuantumCircuit(num_qubits=1, num_clbits=1)
        circ.x(0)
        circ.measure(0, 0)
        circ.add_calibration("x", [0], x_cal)
        return circ

    def test_pi_pulse_circuit_counts(self):
        backend, r = _rabi_backend(seed_simulator=42)
        circ = self._pi_circuit(r)
        res = backend.run(
            circ, solver_options={"method": "DOP853", "atol": 1e-10, "rtol": 1e-10}
        ).result()
        counts = res.get_counts()
        assert counts.get("1", 0) > 1000

    def test_circuit_memslot_count_in_results(self):
        backend, r = _rabi_backend(seed_simulator=42)
        circ = self._pi_circuit(r)
        circ.num_clbits = 2
        circ.cregs[0].size = 2
        res = backend.run(
            circ, solver_options={"method": "DOP853", "atol": 1e-10, "rtol": 1e-10}
        ).result()
        counts = res.get_counts()
        # two memory slots: the measured qubit populates slot 0, slot 1 idles
        assert all(len(key) == 2 for key in counts)
        assert counts.get("01", 0) > 1000

    def test_sequential_gates_advance_clock(self):
        backend, r = _rabi_backend(seed_simulator=7)
        n_samples = 50
        amp = 1.0 / (r * n_samples * 0.1)
        x_cal = Schedule(name="x_cal")
        x_cal.append(Play(Constant(duration=n_samples, amp=amp), DriveChannel(0)))

        circ = FakeQuantumCircuit(num_qubits=1, num_clbits=1)
        circ.x(0)
        circ.x(0)  # two pi pulses = identity
        circ.measure(0, 0)
        circ.add_calibration("x", [0], x_cal)
        res = backend.run(
            circ, solver_options={"method": "DOP853", "atol": 1e-10, "rtol": 1e-10}
        ).result()
        counts = res.get_counts()
        assert counts.get("0", 0) > 1000

    def test_measure_calibration_used(self):
        backend, r = _rabi_backend(seed_simulator=11)
        n_samples = 50
        amp = 1.0 / (r * n_samples * 0.1)
        x_cal = Schedule(name="x_cal")
        x_cal.append(Play(Constant(duration=n_samples, amp=amp), DriveChannel(0)))
        meas_cal = Schedule(name="meas")
        meas_cal.append(Acquire(4, AcquireChannel(0), mem_slot=MemorySlot(0)))

        circ = FakeQuantumCircuit(num_qubits=1, num_clbits=1)
        circ.x(0)
        circ.measure(0, 0)
        circ.add_calibration("x", [0], x_cal)
        circ.add_calibration("measure", [0], meas_cal)
        res = backend.run(
            circ, solver_options={"method": "DOP853", "atol": 1e-10, "rtol": 1e-10}
        ).result()
        assert res.get_counts().get("1", 0) > 1000

    def test_missing_calibration_raises(self):
        backend, _ = _rabi_backend()
        circ = FakeQuantumCircuit(num_qubits=1, num_clbits=1)
        circ.x(0)
        circ.measure(0, 0)
        with pytest.raises(DynamicsError, match="calibration"):
            backend.run(circ)
