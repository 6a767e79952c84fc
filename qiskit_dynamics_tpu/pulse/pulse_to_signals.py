"""Schedule -> Signal conversion.

Reference: ``/root/reference/qiskit_dynamics/pulse/pulse_to_signals.py``.
Walks the schedule in temporal order tracking, per channel, the phase ``phi``
(ShiftPhase/SetPhase), the digital frequency deviation ``dnu``
(ShiftFrequency/SetFrequency, implemented digitally against a fixed analog
carrier), and the phase-accumulation correction ``phi_a`` keeping the combined
carrier continuous across frequency changes. ``Play`` appends
``wave * exp(i 2 pi dnu t + i phi + i 2 pi phi_a)`` samples.

Works with both native Schedules and qiskit Schedules (duck-typed: both expose
``(start_time, instruction)`` pairs with ``.channel.name``).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional
from warnings import warn

import numpy as np

from ..exceptions import DynamicsError
from ..signals import DiscreteSignal
from .schedule import Schedule, Play, ShiftPhase, SetPhase, ShiftFrequency, SetFrequency
from .library import Waveform

__all__ = ["InstructionToSignals", "get_samples"]


def get_samples(pulse):
    """Samples of a parametric pulse at interval midpoints.

    Resolution order:

    1. ``Waveform`` (native or qiskit-shaped): raw samples.
    2. Symbolic pulses (anything exposing a sympy ``envelope`` expression and
       a ``parameters`` dict — qiskit ``SymbolicPulse`` included): the
       envelope is lambdified ONCE per (expression, backend) pair and
       evaluated at the sample midpoints. When any parameter is a JAX tracer
       the jax lambdify backend is used, so schedules containing parametric
       pulses stay jit- and grad-transformable (reference:
       ``pulse_to_signals.py:329-391``).
    3. ``get_waveform()`` fallback (host-side sampling; breaks under trace).
    """
    if isinstance(pulse, Waveform):
        return pulse.samples
    envelope = getattr(pulse, "envelope", None)
    parameters = getattr(pulse, "parameters", None)
    # qiskit-style symbolic pulses carry a sympy EXPRESSION (native pulses
    # have a callable envelope method and sample via get_waveform below)
    if envelope is not None and not callable(envelope) and isinstance(parameters, dict):
        return _sample_symbolic_pulse(pulse, envelope, parameters)
    if hasattr(pulse, "get_waveform"):
        wf = pulse.get_waveform()
        return np.asarray(wf.samples) if not _is_traced(wf.samples) else wf.samples
    raise DynamicsError(f"Cannot extract samples from pulse of type {type(pulse)}.")


def _sample_symbolic_pulse(pulse, envelope, parameters: dict):
    """Evaluate a symbolic-envelope pulse at sample midpoints, trace-aware."""
    if callable(getattr(pulse, "is_parameterized", None)) and pulse.is_parameterized():
        raise DynamicsError(
            "Cannot sample a symbolic pulse with unassigned parameters."
        )
    backend = "jax" if any(_is_traced(v) for v in parameters.values()) else "numpy"
    fn, names = _lambdified_envelope(_as_sympy(envelope), backend)
    args = []
    for name in names:
        if name == "t":
            args.append(np.arange(0, int(parameters["duration"])) + 0.5)
            continue
        if name not in parameters:
            raise DynamicsError(
                f"Symbolic pulse parameter '{name}' has no assigned value."
            )
        args.append(parameters[name])
    return fn(*args)


def _as_sympy(expr):
    """Coerce symengine expressions (qiskit may use them) to sympy."""
    import sympy

    if isinstance(expr, sympy.Expr):
        return expr
    return sympy.sympify(str(expr))


@functools.lru_cache(maxsize=None)
def _lambdified_envelope(expr, backend: str):
    """lru-cached lambdify of a pulse envelope; returns (fn, arg names).

    ``t`` is always the first argument; remaining free symbols follow in
    name-sorted order. Caching matters: parametric sweeps re-sample the same
    expression thousands of times with different values.
    """
    import sympy

    symbols = sorted(expr.free_symbols, key=lambda s: s.name)
    ordered = [s for s in symbols if s.name == "t"] + [
        s for s in symbols if s.name != "t"
    ]
    modules = "jax" if backend == "jax" else "numpy"
    fn = sympy.lambdify(ordered, expr, modules=modules)
    return fn, tuple(s.name for s in ordered)


def _is_traced(x):
    import jax

    return isinstance(x, jax.core.Tracer)


def _inst_name(inst) -> str:
    return type(inst).__name__


class InstructionToSignals:
    """Converts pulse schedules to lists of :class:`.DiscreteSignal`.

    Args:
        dt: sample width.
        carriers: dict mapping channel names to analog carrier frequencies.
        channels: channel names to convert, in output order. If None, all
            channels in the schedule are converted (schedule order).
    """

    def __init__(
        self,
        dt: float,
        carriers: Optional[Dict[str, float]] = None,
        channels: Optional[List[str]] = None,
    ):
        self._dt = dt
        self._channels = channels
        self._carriers = carriers or {}

    def get_signals(self, schedule) -> List[DiscreteSignal]:
        """Convert a schedule into per-channel DiscreteSignals."""
        signals, phases, frequency_shifts, phase_accumulations = {}, {}, {}, {}

        if self._channels is not None and hasattr(schedule, "filter"):
            try:
                schedule = schedule.filter(channels=self._channels)
            except Exception:
                # qiskit schedules need Channel objects; fall back to name match below
                pass

        for chan in schedule.channels:
            name = chan.name
            if self._channels is not None and name not in self._channels:
                continue
            phases[name] = 0.0
            frequency_shifts[name] = 0.0
            phase_accumulations[name] = 0.0
            signals[name] = DiscreteSignal(
                samples=np.zeros((0,), dtype=complex),
                dt=self._dt,
                name=name,
                carrier_freq=self._carriers.get(name, 0.0),
            )

        for start_sample, inst in schedule.instructions:
            chan = inst.channel.name if hasattr(inst, "channel") else None
            if chan not in signals:
                continue
            kind = _inst_name(inst)

            if kind == "Play":
                inst_samples = get_samples(inst.pulse)
                times = self._dt * (start_sample + np.arange(len(inst_samples)))
                samples = inst_samples * np.exp(
                    2.0j * np.pi * frequency_shifts[chan] * times
                    + 1.0j * phases[chan]
                    + 2.0j * np.pi * phase_accumulations[chan]
                )
                signals[chan].add_samples(start_sample, samples)
            elif kind == "ShiftPhase":
                phases[chan] += inst.phase
            elif kind == "SetPhase":
                phases[chan] = inst.phase
            elif kind == "ShiftFrequency":
                frequency_shifts[chan] += inst.frequency
                phase_accumulations[chan] -= inst.frequency * start_sample * self._dt
                _nyquist_warn(frequency_shifts[chan], self._dt, chan)
            elif kind == "SetFrequency":
                carrier = float(np.asarray(signals[chan].carrier_freq))
                phase_accumulations[chan] -= (
                    (inst.frequency - (frequency_shifts[chan] + carrier))
                    * start_sample
                    * self._dt
                )
                frequency_shifts[chan] = inst.frequency - carrier
                _nyquist_warn(frequency_shifts[chan], self._dt, chan)

        # zero-pad all channels to a common duration
        max_duration = max((sig.duration for sig in signals.values()), default=0)
        for sig in signals.values():
            if sig.duration < max_duration:
                sig.add_samples(
                    start_sample=sig.duration,
                    samples=np.zeros(max_duration - sig.duration, dtype=complex),
                )

        if self._channels is None:
            return list(signals.values())

        return [
            signals.get(
                name,
                DiscreteSignal(
                    samples=np.zeros((0,), dtype=complex),
                    dt=self._dt,
                    name=name,
                    carrier_freq=self._carriers.get(name, 0.0),
                ),
            )
            for name in self._channels
        ]

    @staticmethod
    def get_awg_signals(signals: List[DiscreteSignal], if_modulation: float) -> List[DiscreteSignal]:
        r"""Create AWG I/Q output pairs for IQ-mixer upconversion.

        For each signal the I and Q outputs carry the real and imaginary parts
        of ``Omega(t) exp(i w_if t)``: I keeps the complex samples, Q gets
        ``-i * samples``, both carried at ``carrier + if_modulation``
        (reference ``pulse_to_signals.py:246-298``).
        """
        new_signals = []
        for sig in signals:
            new_freq = sig.carrier_freq + if_modulation
            samples_i = sig.samples
            samples_q = np.imag(samples_i) - 1.0j * np.real(samples_i)
            name = sig.name or ""
            new_signals.append(
                DiscreteSignal(sig.dt, samples_i, sig.start_time, new_freq, sig.phase,
                               name + "_i")
            )
            new_signals.append(
                DiscreteSignal(sig.dt, samples_q, sig.start_time, new_freq, sig.phase,
                               name + "_q")
            )
        return new_signals


def _nyquist_warn(frequency_shift, dt, channel):
    if isinstance(frequency_shift, (int, float)) and np.abs(frequency_shift) > 0.5 / dt:
        warn(
            "Due to SetFrequency/ShiftFrequency instructions, the digital carrier frequency "
            f"of channel {channel} exceeds the Nyquist frequency of the sample size dt; "
            "aliasing effects will occur."
        )
