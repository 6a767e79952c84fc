"""ExpansionModel internals battery (mirrors the reference's
test_dyson_magnus_solvers.py DCT/Chebyshev internals family:
_construct_DCT, multi-interval DCT, signal-envelope DCT approximation,
constructor validation, save/load, jit/grad through approximate_signals)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu.exceptions import DynamicsError
from qiskit_dynamics_tpu.signals import Signal
from qiskit_dynamics_tpu.solvers.perturbative_solvers.expansion_model import (
    ExpansionModel,
    _cheb_basis,
    _construct_DCT,
    _multi_interval_DCT,
    _signal_envelope_DCT,
)

X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
Z = np.diag([1.0, -1.0]).astype(complex)


class TestDCTInternals:
    def test_construct_DCT_reproduces_polynomial(self):
        # a degree-2 polynomial is represented exactly by a degree-2 DCT
        M, pts = _construct_DCT(2, domain=[0.0, 1.0])
        f = lambda t: 2.0 * t**2 - t + 0.5
        coeffs = M @ f(pts)
        t = np.linspace(0.0, 1.0, 13)
        approx = sum(
            c * _cheb_basis(t - 0.0, d, 1.0) for d, c in enumerate(coeffs)
        )
        np.testing.assert_allclose(approx, f(t), atol=1e-12)

    def test_multi_interval_DCT_shapes_and_accuracy(self):
        dt, n_int, deg = 0.5, 4, 3
        f = lambda t: np.sin(2 * np.pi * 0.3 * t)
        coeffs = _multi_interval_DCT(f, deg, t0=0.0, dt=dt, n_intervals=n_int)
        assert coeffs.shape == (deg + 1, n_int)
        # reconstruct on interval 2
        t = np.linspace(1.0, 1.5, 9)
        approx = sum(
            coeffs[d, 2] * _cheb_basis(t - 1.0, d, dt) for d in range(deg + 1)
        )
        np.testing.assert_allclose(approx, f(t), atol=2e-3)

    def test_signal_envelope_DCT_tracks_envelope(self):
        sig = Signal(lambda t: t**2, carrier_freq=1.7, phase=0.4)
        dt, n_int, deg = 0.25, 3, 3
        coeffs = _signal_envelope_DCT(
            sig, reference_freq=1.7, degree=deg, t0=0.5, dt=dt, n_intervals=n_int
        )
        # coefficients reconstruct env(t) * e^{i phase-ish}: check the
        # degree-0 magnitude grows with t^2 across intervals
        mags = np.abs(coeffs[0, :])
        assert mags[0] < mags[1] < mags[2]


class TestExpansionModelValidation:
    def _kwargs(self, **over):
        kw = dict(
            operators=[-1j * 2 * np.pi * 0.02 * X / 2],
            rotating_frame=-1j * 2 * np.pi * 5.0 * Z / 2,
            dt=0.1,
            carrier_freqs=[5.0],
            chebyshev_orders=[1],
            expansion_method="dyson",
            expansion_order=3,
        )
        kw.update(over)
        return kw

    def test_carrier_freq_length_mismatch(self):
        with pytest.raises(DynamicsError, match="carrier_freqs"):
            ExpansionModel(**self._kwargs(carrier_freqs=[5.0, 1.0]))

    def test_chebyshev_orders_length_mismatch(self):
        with pytest.raises(DynamicsError, match="chebyshev_orders"):
            ExpansionModel(**self._kwargs(chebyshev_orders=[1, 2]))

    def test_requires_order_or_terms(self):
        with pytest.raises(DynamicsError):
            ExpansionModel(**self._kwargs(expansion_order=None))

    def test_save_load_roundtrip(self, tmp_path):
        model = ExpansionModel(**self._kwargs())
        path = os.path.join(tmp_path, "em.npz")
        model.save(path)
        loaded = ExpansionModel.load(path)
        np.testing.assert_allclose(np.asarray(model.Udt), np.asarray(loaded.Udt))
        sigs = [Signal(0.5, carrier_freq=5.0)]
        c1 = np.asarray(model.approximate_signals(sigs, 0.0, 3))
        c2 = np.asarray(loaded.approximate_signals(sigs, 0.0, 3))
        np.testing.assert_allclose(c1, c2, atol=1e-12)


class TestApproximateSignalsJax:
    def test_jit_grad_through_approximate_signals(self):
        model = ExpansionModel(
            operators=[-1j * 2 * np.pi * 0.02 * X / 2],
            rotating_frame=-1j * 2 * np.pi * 5.0 * Z / 2,
            dt=0.1,
            carrier_freqs=[5.0],
            chebyshev_orders=[1],
            expansion_method="dyson",
            expansion_order=2,
        )

        def f(amp):
            sigs = [Signal(amp, carrier_freq=5.0)]
            c = model.approximate_signals(sigs, 0.0, 4)
            return jnp.sum(jnp.abs(jnp.asarray(c)) ** 2)

        v = jax.jit(f)(0.6)
        np.testing.assert_allclose(v, f(0.6), rtol=1e-6)
        g = jax.grad(f)(0.6)
        eps = 1e-5
        fd = (f(0.6 + eps) - f(0.6 - eps)) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-4)
