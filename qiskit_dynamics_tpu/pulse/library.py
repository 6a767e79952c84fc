"""Native pulse shape library.

Implements the standard qiskit-pulse parametric shapes (lifted Gaussian
family) with midpoint sampling: samples are the envelope evaluated at
``t = (arange(duration) + 0.5)`` in units of samples — matching the
reference's SymbolicPulse sampling (``pulse_to_signals.py:329-391``).

"Lifted" means the Gaussian is shifted and rescaled so it is exactly zero one
sample outside the pulse window:
``lifted(t) = (g(t) - g(t_zero)) / (1 - g(t_zero))`` with
``g(t) = exp(-((t - center)/sigma)^2 / 2)``.

Shapes may be parameterized by JAX tracers (for jit/grad over pulse
parameters); sampling dispatches through the host/trace-unified namespace.
"""
from __future__ import annotations

from typing import Optional, Union

import numpy as np

from ..unified import unp

__all__ = ["Waveform", "SymbolicPulse", "Gaussian", "GaussianSquare", "Drag", "Constant"]


def _lifted_gaussian(t, center, t_zero, sigma):
    gauss = unp.exp(-(((t - center) / sigma) ** 2) / 2)
    offset = unp.exp(-(((t_zero - center) / sigma) ** 2) / 2)
    return (gauss - offset) / (1 - offset)


class Waveform:
    """Explicit sample array."""

    def __init__(self, samples, name: Optional[str] = None):
        self.samples = unp.asarray(samples)
        self.name = name

    @property
    def duration(self) -> int:
        return self.samples.shape[0]

    def __repr__(self):
        return f"Waveform(duration={self.duration})"


class SymbolicPulse:
    """Base class for parametric pulses; subclasses define ``envelope(t)``."""

    def __init__(self, duration: int, name: Optional[str] = None):
        self.duration = int(duration)
        self.name = name

    def envelope(self, t):
        """Envelope value at time ``t`` (in samples)."""
        raise NotImplementedError

    def get_waveform(self) -> Waveform:
        """Sample the envelope at interval midpoints."""
        times = np.arange(self.duration) + 0.5
        return Waveform(self.envelope(times), name=self.name)

    def __repr__(self):
        return f"{type(self).__name__}(duration={self.duration})"


class Gaussian(SymbolicPulse):
    """Lifted Gaussian: ``amp e^{i angle} lifted(t; duration/2, -1, sigma)``."""

    def __init__(self, duration, amp, sigma, angle=0.0, name=None):
        super().__init__(duration, name=name)
        self.amp = amp
        self.sigma = sigma
        self.angle = angle

    def envelope(self, t):
        return (
            self.amp
            * unp.exp(1j * self.angle)
            * _lifted_gaussian(t, self.duration / 2, -1.0, self.sigma)
        )


class GaussianSquare(SymbolicPulse):
    """Flat top of length ``width`` with lifted-Gaussian rise/fall edges."""

    def __init__(self, duration, amp, sigma, width=None, angle=0.0, risefall_sigma_ratio=None,
                 name=None):
        super().__init__(duration, name=name)
        if width is None and risefall_sigma_ratio is None:
            raise ValueError("Either width or risefall_sigma_ratio must be specified.")
        if width is None:
            width = duration - 2 * risefall_sigma_ratio * sigma
        self.amp = amp
        self.sigma = sigma
        self.width = width
        self.angle = angle

    def envelope(self, t):
        risefall = (self.duration - self.width) / 2
        t = unp.asarray(t)
        rise = _lifted_gaussian(t, risefall, -1.0, self.sigma)
        fall = _lifted_gaussian(t, risefall + self.width, self.duration + 1.0, self.sigma)
        shape = unp.where(
            t < risefall, rise, unp.where(t < risefall + self.width, unp.ones_like(rise), fall)
        )
        return self.amp * unp.exp(1j * self.angle) * shape


class Drag(SymbolicPulse):
    """DRAG pulse: lifted Gaussian plus ``i beta`` times its derivative."""

    def __init__(self, duration, amp, sigma, beta, angle=0.0, name=None):
        super().__init__(duration, name=name)
        self.amp = amp
        self.sigma = sigma
        self.beta = beta
        self.angle = angle

    def envelope(self, t):
        center = self.duration / 2
        gauss = _lifted_gaussian(t, center, -1.0, self.sigma)
        deriv = -(t - center) / (self.sigma**2) * gauss
        return self.amp * unp.exp(1j * self.angle) * (gauss + 1j * self.beta * deriv)


class Constant(SymbolicPulse):
    """Constant envelope ``amp e^{i angle}`` over the pulse window."""

    def __init__(self, duration, amp, angle=0.0, name=None):
        super().__init__(duration, name=name)
        self.amp = amp
        self.angle = angle

    def envelope(self, t):
        t = unp.asarray(t)
        window = ((t >= 0) & (t <= self.duration)).astype(float)
        return self.amp * unp.exp(1j * self.angle) * window
