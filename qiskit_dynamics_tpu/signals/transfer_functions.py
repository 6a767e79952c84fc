"""Signal transfer functions.

Behavioral parity with ``/root/reference/qiskit_dynamics/signals/transfer_functions.py``:
``Convolution`` (discrete, kernel normalized to unit sum), ``FFTConvolution``
(implemented here — the reference leaves it as ``NotImplementedError``),
``Sampler`` (midpoint resampling) and ``IQMixer`` (two-sideband upconversion).
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Callable, List, Union

import numpy as np
import jax.numpy as jnp

from ..exceptions import DynamicsError
from .signals import Signal, DiscreteSignal

__all__ = ["BaseTransferFunction", "Convolution", "FFTConvolution", "Sampler", "IQMixer"]


class BaseTransferFunction(ABC):
    """Base class for signal transformations."""

    @property
    @abstractmethod
    def n_inputs(self) -> int:
        """Number of input signals."""

    def __call__(self, *args, **kwargs) -> Union[Signal, List[Signal]]:
        if len(args) != self.n_inputs:
            raise DynamicsError(
                f"{type(self).__name__} expected {self.n_inputs} input signals "
                f"but {len(args)} were given."
            )
        return self._apply(*args, **kwargs)

    @abstractmethod
    def _apply(self, *args, **kwargs) -> Union[Signal, List[Signal]]:
        """Apply the transformation."""


class Convolution(BaseTransferFunction):
    """Discrete convolution ``(f*g)(n) = sum_k f(k) g(n-k)``.

    The kernel is normalized to unit sum before convolving. The output is a
    carrier-free ``DiscreteSignal`` (the carrier is folded into the samples
    before convolution).
    """

    def __init__(self, func: Callable):
        self._func = func

    @property
    def n_inputs(self):
        return 1

    def _apply(self, signal: Signal) -> Signal:
        if not isinstance(signal, DiscreteSignal):
            raise DynamicsError("Transfer function not defined on input.")
        dt = signal.dt
        times = dt * jnp.arange(signal.duration)
        kernel = jnp.asarray([self._func(dt * i) for i in range(signal.duration)])
        kernel = kernel / jnp.sum(kernel)
        sig_samples = signal(times)
        convolved = jnp.convolve(kernel, sig_samples)
        return DiscreteSignal(dt, convolved, carrier_freq=0.0, phase=0.0)


class FFTConvolution(BaseTransferFunction):
    """Convolution via FFT — O(n log n) in the number of samples.

    Matches ``Convolution`` semantics (unit-sum kernel, full output length)
    but computes the linear convolution with zero-padded FFTs.
    """

    def __init__(self, func: Callable):
        self._func = func

    @property
    def n_inputs(self):
        return 1

    def _apply(self, signal: Signal) -> Signal:
        if not isinstance(signal, DiscreteSignal):
            raise DynamicsError("Transfer function not defined on input.")
        dt = signal.dt
        n = signal.duration
        times = dt * jnp.arange(n)
        kernel = jnp.asarray([self._func(dt * i) for i in range(n)])
        kernel = kernel / jnp.sum(kernel)
        sig_samples = signal(times)
        out_len = 2 * n - 1
        fft_len = int(2 ** np.ceil(np.log2(max(out_len, 1))))
        conv = jnp.fft.ifft(
            jnp.fft.fft(kernel, fft_len) * jnp.fft.fft(sig_samples, fft_len)
        )[:out_len]
        if not (jnp.iscomplexobj(kernel) or jnp.iscomplexobj(sig_samples)):
            conv = jnp.real(conv)
        return DiscreteSignal(dt, conv, carrier_freq=0.0, phase=0.0)


class Sampler(BaseTransferFunction):
    """Resample a signal via midpoint sampling (``DiscreteSignal.from_Signal``)."""

    def __init__(self, dt: float, n_samples: int, start_time: float = 0.0):
        self._dt = dt
        self._n_samples = n_samples
        self._start_time = start_time

    @property
    def n_inputs(self):
        return 1

    def _apply(self, signal: Signal) -> Signal:
        return DiscreteSignal.from_Signal(
            signal, dt=self._dt, n_samples=self._n_samples, start_time=self._start_time
        )


class IQMixer(BaseTransferFunction):
    """IQ mixer: upconverts I/Q envelopes to ``w_lo +/- w_if`` sidebands.

    Output is a carrier-free ``Signal`` whose envelope carries all oscillation,
    per the reference formula (``transfer_functions.py:167-231``).
    """

    def __init__(self, lo: float):
        self._lo = lo

    @property
    def n_inputs(self):
        return 2

    def _apply(self, si: Signal, sq: Signal) -> Signal:
        if float(si.carrier_freq) != float(sq.carrier_freq):
            raise DynamicsError("IQ mixer requires the same sideband frequencies for I and Q.")

        phi_i, phi_q = si.phase, sq.phase
        wp = 2 * np.pi * (self._lo + si.carrier_freq)
        wm = 2 * np.pi * (self._lo - si.carrier_freq)

        def mixer_func(t):
            osc_i = jnp.cos(wp * t + phi_i) + jnp.cos(wm * t + phi_i)
            osc_q = jnp.cos(wp * t + phi_q - np.pi / 2) + jnp.cos(wm * t + phi_q + np.pi / 2)
            return si.envelope(t) * osc_i / 2 + sq.envelope(t) * osc_q / 2

        return Signal(mixer_func, carrier_freq=0.0, phase=0.0)
