"""Structural test doubles for the qiskit interop surface.

qiskit cannot be installed in this environment (zero-egress container), so
every duck-typed interop branch is exercised against these fakes instead.
Each fake reproduces exactly the attribute/method contract the production
code consumes (mirroring the reference objects, cited per class); if the
duck-typing in qiskit_dynamics_tpu drifts from that contract, these tests
break — which is the point.

These are TEST doubles: nothing in the package imports this module.
"""
from __future__ import annotations

from types import SimpleNamespace
from typing import Dict, List, Optional

import numpy as np
import sympy


# ---------------------------------------------------------------------------
# qiskit.pulse.SymbolicPulse shape: sympy ``envelope`` expression +
# ``parameters`` dict (reference consumption: pulse_to_signals.py:329-391)


class FakeSymbolicPulse:
    """Shape of ``qiskit.pulse.SymbolicPulse`` after parameter assignment."""

    def __init__(self, envelope: sympy.Expr, parameters: Dict, name: str = "pulse"):
        self.envelope = envelope
        self.parameters = parameters
        self.duration = parameters["duration"]
        self.name = name

    def is_parameterized(self) -> bool:
        return False


def fake_gaussian_pulse(duration: int, amp, sigma) -> FakeSymbolicPulse:
    """A lifted-Gaussian with the same formula as qiskit's ``Gaussian``."""
    t, a, s, d = sympy.symbols("t amp sigma duration")
    center = d / 2
    gauss = sympy.exp(-(((t - center) / s) ** 2) / 2)
    zero = sympy.exp(-((((-1) - center) / s) ** 2) / 2)
    envelope = a * (gauss - zero) / (1 - zero)
    return FakeSymbolicPulse(
        envelope, {"duration": duration, "amp": amp, "sigma": sigma}, name="Gaussian"
    )


# ---------------------------------------------------------------------------
# qiskit.quantum_info shapes (reference consumption:
# solver_classes.py:708-816 — .data / .dims() / constructor contracts)


class FakeQuantumState:
    """Shape of ``qiskit.quantum_info.states.quantum_state.QuantumState``."""

    def __init__(self, data, dims=None):
        self.data = np.asarray(data)
        self._dims = tuple(dims) if dims is not None else (self.data.shape[0],)

    def dims(self):
        return self._dims


class FakeStatevector(FakeQuantumState):
    pass


class FakeDensityMatrix(FakeQuantumState):
    def __init__(self, data, dims=None):
        if isinstance(data, FakeStatevector):
            psi = data.data
            if dims is None:
                dims = data.dims()
            data = np.outer(psi, psi.conj())
        super().__init__(data, dims)


class FakeOperator:
    """Shape of ``qiskit.quantum_info.Operator``."""

    def __init__(self, data, input_dims=None, output_dims=None):
        self.data = np.asarray(data)
        self._input_dims = tuple(input_dims) if input_dims else (self.data.shape[1],)
        self._output_dims = tuple(output_dims) if output_dims else (self.data.shape[0],)

    def input_dims(self):
        return self._input_dims

    def output_dims(self):
        return self._output_dims


class FakeQuantumChannel(FakeOperator):
    pass


class FakeSuperOp(FakeQuantumChannel):
    """Shape of ``qiskit.quantum_info.SuperOp`` (column-stacking).

    Constructible from another channel (Kraus -> superop conversion), as
    ``initial_state_converter`` does with ``SuperOp(obj)``.
    """

    def __init__(self, data, input_dims=None, output_dims=None):
        if isinstance(data, FakeKraus):
            dim = data.kraus_ops[0].shape[0]
            sup = np.zeros((dim * dim, dim * dim), dtype=complex)
            for K in data.kraus_ops:
                sup += np.kron(K.conj(), K)
            super().__init__(sup, input_dims or (dim,), output_dims or (dim,))
            return
        if isinstance(data, FakeSuperOp):
            super().__init__(data.data, data.input_dims(), data.output_dims())
            return
        super().__init__(data, input_dims, output_dims)


class FakeKraus(FakeQuantumChannel):
    """Kraus-form channel convertible to FakeSuperOp."""

    def __init__(self, kraus_ops):
        self.kraus_ops = [np.asarray(K) for K in kraus_ops]
        dim = self.kraus_ops[0].shape[0]
        super().__init__(np.eye(dim), (dim,), (dim,))


FAKE_QISKIT_TYPES = {
    "QuantumState": FakeQuantumState,
    "Statevector": FakeStatevector,
    "DensityMatrix": FakeDensityMatrix,
    "Operator": FakeOperator,
    "SuperOp": FakeSuperOp,
    "QuantumChannel": FakeQuantumChannel,
}


# ---------------------------------------------------------------------------
# qiskit.providers backend shapes (reference consumption:
# dynamics_backend.py:593-802, 1047-1135)


class FakeUChannelLO:
    """Shape of ``qiskit.providers.models.UchannelLO``."""

    def __init__(self, q: int, scale: complex):
        self.q = q
        self.scale = scale


class FakePulseBackendConfiguration:
    """Shape of ``PulseBackendConfiguration`` (hamiltonian/dt/u_channel_lo)."""

    def __init__(
        self,
        hamiltonian: Dict,
        dt: float,
        u_channel_lo: Optional[List[List[FakeUChannelLO]]] = None,
        num_qubits: Optional[int] = None,
    ):
        self.hamiltonian = hamiltonian
        self.dt = dt
        self.u_channel_lo = u_channel_lo or []
        self.num_qubits = num_qubits


class FakeDefaults:
    """Shape of ``PulseDefaults`` (qubit_freq_est/meas_freq_est)."""

    def __init__(self, qubit_freq_est: List[float], meas_freq_est: Optional[List[float]] = None):
        self.qubit_freq_est = qubit_freq_est
        self.meas_freq_est = meas_freq_est if meas_freq_est is not None else []


class FakeTarget:
    """Shape of ``qiskit.transpiler.Target`` (qubit_properties only)."""

    def __init__(self, qubit_frequencies: Optional[List[float]] = None, dt: Optional[float] = None):
        if qubit_frequencies is None:
            self.qubit_properties = None
        else:
            self.qubit_properties = [
                SimpleNamespace(frequency=f) for f in qubit_frequencies
            ]
        self.dt = dt


class FakeBackendV1:
    """Legacy BackendV1 shape: configuration() + defaults() methods."""

    def __init__(self, configuration, defaults):
        self._configuration = configuration
        self._defaults = defaults

    def configuration(self):
        return self._configuration

    def defaults(self):
        return self._defaults


class FakeBackendV2:
    """BackendV2 shape: ``target`` attribute; configuration/defaults optional."""

    version = 2

    def __init__(self, target, configuration=None, defaults=None):
        self.target = target
        self._configuration = configuration
        self._defaults = defaults

    def configuration(self):
        if self._configuration is None:
            raise AttributeError("no configuration")
        return self._configuration

    def defaults(self):
        if self._defaults is None:
            raise AttributeError("no defaults")
        return self._defaults


def two_transmon_hamiltonian_dict() -> Dict:
    """A 2-transmon backend hamiltonian string dict (reference grammar)."""
    return {
        "h_str": [
            "2*np.pi*v0*0.5*Z0",
            "2*np.pi*v1*0.5*Z1",
            "2*np.pi*j*0.5*(Sp0*Sm1+Sm0*Sp1)",
            "X0||D0",
            "X1||D1",
            "X0||U0",
            "X1||U1",
        ],
        "qub": {"0": 2, "1": 2},
        "vars": {"v0": 5.0e9, "v1": 5.1e9, "j": 0.01e9},
    }


# ---------------------------------------------------------------------------
# qiskit.QuantumCircuit shape (reference consumption:
# dynamics_backend.py:1022-1044 — cregs sizes + calibration lowering)


class FakeCreg:
    def __init__(self, size: int):
        self.size = size


class FakeInstruction:
    def __init__(self, name: str, params=()):
        self.name = name
        self.params = list(params)


class FakeCircuitInstruction:
    """Shape of qiskit's CircuitInstruction (operation/qubits/clbits)."""

    def __init__(self, operation: FakeInstruction, qubits, clbits=()):
        self.operation = operation
        self.qubits = list(qubits)
        self.clbits = list(clbits)


class FakeQuantumCircuit:
    """Shape of ``qiskit.QuantumCircuit`` as DynamicsBackend consumes it.

    ``data`` is a list of FakeCircuitInstruction with integer qubit indices;
    ``calibrations`` maps ``gate name -> {(qubits, params): schedule}`` with
    native Schedules as values (matching qiskit's calibration table layout).
    """

    def __init__(self, num_qubits: int, num_clbits: int = 0):
        self.num_qubits = num_qubits
        self.num_clbits = num_clbits
        self.cregs = [FakeCreg(num_clbits)] if num_clbits else []
        self.data: List[FakeCircuitInstruction] = []
        self.calibrations: Dict = {}

    # -- circuit-building helpers mirroring qiskit's API -------------------
    def append_gate(self, name: str, qubits, params=()):
        self.data.append(FakeCircuitInstruction(FakeInstruction(name, params), qubits))

    def x(self, qubit: int):
        self.append_gate("x", [qubit])

    def measure(self, qubit: int, clbit: int):
        self.data.append(
            FakeCircuitInstruction(FakeInstruction("measure"), [qubit], [clbit])
        )

    def add_calibration(self, gate: str, qubits, schedule, params=()):
        self.calibrations.setdefault(gate, {})[
            (tuple(qubits), tuple(np.atleast_1d(params)))
        ] = schedule


# ---------------------------------------------------------------------------
# contract hardening (VERDICT r2 item 7): strict fakes that FAIL LOUDLY
# (AssertionError, not AttributeError — the package could silently catch the
# latter in a duck-typing fallback) when production code touches an
# attribute outside the pinned contract surface.


def strict_fake(cls, declared, probe_ok=()):
    """Subclass ``cls`` whose instances allow only the ``declared`` attribute
    surface (dunder/underscore access passes through). ``probe_ok`` names are
    part of the contract as LEGITIMATE duck-typing probes: they raise a plain
    ``AttributeError`` (so ``hasattr``/``getattr(..., default)`` dispatch
    works); everything else raises ``AssertionError`` — loud, so a package
    fallback path cannot silently swallow the contract drift. The subclass
    keeps ``cls.__name__`` so the package's type-name duck-typing matches."""

    class Strict(cls):
        def __getattribute__(self, name):
            if name.startswith("_") or name in declared:
                return super().__getattribute__(name)
            if name in probe_ok:
                raise AttributeError(name)
            raise AssertionError(
                f"interop contract violation: {cls.__name__}.{name} "
                "accessed, but the pinned contract (see the fake's "
                "docstring citation) does not model it. Either the "
                "package drifted or the contract needs a deliberate "
                "extension."
            )

    Strict.__name__ = cls.__name__
    Strict.__qualname__ = cls.__name__
    return Strict


#: pinned attribute surfaces, cited to the upstream API each fake mirrors
CONTRACTS = {
    # qiskit.pulse.SymbolicPulse (qiskit api: qiskit.pulse.library.SymbolicPulse;
    # reference consumption: pulse_to_signals.py:329-391)
    "SymbolicPulse": {"envelope", "parameters", "duration", "name", "is_parameterized"},
    # qiskit.quantum_info.Statevector (api: data/dims; reference consumption:
    # solver_classes.py:708-816, dynamics_backend.py:805-934)
    "Statevector": {"data", "dims"},
    "DensityMatrix": {"data", "dims"},
    # qiskit.providers.BackendV2 surface consumed by from_backend
    # (reference: dynamics_backend.py:593-802, :1047-1135)
    "BackendV2": {"target", "configuration", "defaults", "name"},
}


def strict_symbolic_pulse(duration, amp, sigma):
    # get_waveform / samples are legitimate duck-typing probes in the
    # converter's dispatch (pulse_to_signals.py: Waveform vs SymbolicPulse)
    pulse = fake_gaussian_pulse(duration, amp, sigma)
    cls = strict_fake(
        FakeSymbolicPulse, CONTRACTS["SymbolicPulse"],
        probe_ok={"get_waveform", "samples"},
    )
    return cls(pulse.envelope, pulse.parameters, name=pulse.name)


def strict_statevector(data, dims=None):
    return strict_fake(FakeStatevector, CONTRACTS["Statevector"])(data, dims=dims)


def strict_density_matrix(data, dims=None):
    return strict_fake(FakeDensityMatrix, CONTRACTS["DensityMatrix"])(data, dims=dims)
