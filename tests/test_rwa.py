"""Rotating-wave approximation: hand-verifiable correctness battery.

Reference analog: ``/root/reference/test/dynamics/models/
test_rotating_wave_approximation.py`` (mask values vs hand-computed ops).
Here the checks are convention-independent: for carriers/frame frequencies
that are exact multiples of a base frequency and a cutoff below the base, the
RWA generator must (a) be TIME-STATIONARY in the frame basis and (b) equal
the period-average of the full frame-basis generator — which is exactly what
"keep only resonant terms" means.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu.models import (
    GeneratorModel,
    HamiltonianModel,
    LindbladModel,
    rotating_wave_approximation,
)
from qiskit_dynamics_tpu.signals import Signal

X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
Y = np.array([[0.0, -1j], [1j, 0.0]], dtype=complex)
Z = np.array([[1.0, 0.0], [0.0, -1.0]], dtype=complex)

NU = 3.0
PERIOD = 1.0 / NU


def _period_average(f, t_start, n=1024):
    """Trapezoid average of a matrix-valued periodic function over one period."""
    ts = t_start + np.linspace(0.0, PERIOD, n, endpoint=False)
    return sum(np.asarray(f(t)) for t in ts) / n


class TestRWAPeriodAverage:
    """RWA == period-average of the full frame-basis generator."""

    def _models(self, model_cls, extra=None):
        H0 = 2 * np.pi * NU * Z / 2 + 0.2 * X  # off-diag static: tests static masking
        kwargs = dict(
            static_operator=-1j * H0 if model_cls is GeneratorModel else H0,
            operators=np.array([-1j * 2 * np.pi * X / 2])
            if model_cls is GeneratorModel
            else np.array([2 * np.pi * X / 2]),
            signals=[Signal(1.0, carrier_freq=NU, phase=0.3)],
            rotating_frame=np.diag(-1j * np.pi * NU * np.array([1.0, -1.0]))
            if model_cls is GeneratorModel
            else 2 * np.pi * NU * Z / 2,
        )
        full = model_cls(**kwargs)
        rwa = rotating_wave_approximation(full, cutoff_freq=0.5 * NU)
        full.in_frame_basis = True
        rwa.in_frame_basis = True
        return full, rwa

    @pytest.mark.parametrize("model_cls", [GeneratorModel, HamiltonianModel])
    def test_stationary_and_average(self, model_cls):
        full, rwa = self._models(model_cls)
        # (a) the RWA generator is stationary in the frame basis
        g1 = np.asarray(rwa.evaluate(0.123))
        g2 = np.asarray(rwa.evaluate(0.779))
        np.testing.assert_allclose(g1, g2, atol=1e-12)
        # (b) it equals the period-average of the full generator
        avg = _period_average(full.evaluate, t_start=0.0)
        np.testing.assert_allclose(g1, avg, atol=1e-8)

    @pytest.mark.parametrize("model_cls", [GeneratorModel, HamiltonianModel])
    def test_rhs_consistency(self, model_cls):
        """evaluate_rhs of the RWA model == avg-generator @ y."""
        full, rwa = self._models(model_cls)
        y = np.array([0.3 + 0.1j, -0.7 + 0.2j])
        avg = _period_average(full.evaluate, t_start=0.0)
        np.testing.assert_allclose(
            np.asarray(rwa.evaluate_rhs(0.4, y)), avg @ y, atol=1e-8
        )


class TestRWASignalMap:
    def test_map_matches_reconstruction(self):
        """Applying the signal map == building the RWA with the new signals."""
        H0 = 2 * np.pi * NU * Z / 2
        def build(amp, phase):
            return HamiltonianModel(
                static_operator=H0,
                operators=np.array([2 * np.pi * X / 2]),
                signals=[Signal(amp, carrier_freq=NU, phase=phase)],
                rotating_frame=H0,
            )

        base = build(1.0, 0.0)
        rwa, sig_map = rotating_wave_approximation(
            base, cutoff_freq=0.5 * NU, return_signal_map=True
        )
        # new signals through the map
        new_sigs = [Signal(0.37, carrier_freq=NU, phase=0.9)]
        rwa.signals = sig_map(new_sigs)
        # direct construction with the new signals
        rwa_direct = rotating_wave_approximation(build(0.37, 0.9), cutoff_freq=0.5 * NU)
        t, y = 0.31, np.array([0.5, 0.5j])
        np.testing.assert_allclose(
            np.asarray(rwa.evaluate_rhs(t, y)),
            np.asarray(rwa_direct.evaluate_rhs(t, y)),
            atol=1e-12,
        )

    def test_map_phase_shift(self):
        """The mapped list doubles: originals + phase -pi/2 copies."""
        H0 = 2 * np.pi * NU * Z / 2
        ham = HamiltonianModel(
            static_operator=H0,
            operators=np.array([2 * np.pi * X / 2]),
            signals=[Signal(1.0, carrier_freq=NU)],
            rotating_frame=H0,
        )
        _, sig_map = rotating_wave_approximation(
            ham, cutoff_freq=0.5 * NU, return_signal_map=True
        )
        mapped = sig_map(ham.signals)
        assert len(mapped) == 2
        ts = np.linspace(0.0, 1.0, 7)
        orig = np.asarray([float(ham.signals[0](t)) for t in ts])
        copy = np.asarray([float(mapped[1](t)) for t in ts])
        # phase -pi/2: cos(wt) -> cos(wt - pi/2) = sin(wt)
        expected = np.cos(2 * np.pi * NU * ts - np.pi / 2)
        np.testing.assert_allclose(copy, expected, atol=1e-12)
        np.testing.assert_allclose(orig, np.cos(2 * np.pi * NU * ts), atol=1e-12)


class TestRWALindblad:
    def test_hamiltonian_part_average(self):
        """Lindblad RWA: the Hamiltonian part obeys the period-average rule."""
        H0 = 2 * np.pi * NU * Z / 2
        lind = LindbladModel(
            static_hamiltonian=H0,
            hamiltonian_operators=np.array([2 * np.pi * X / 2]),
            hamiltonian_signals=[Signal(1.0, carrier_freq=NU)],
            static_dissipators=np.array([0.1 * np.array([[0, 1], [0, 0]], dtype=complex)]),
            rotating_frame=H0,
        )
        rwa = rotating_wave_approximation(lind, cutoff_freq=0.5 * NU)
        lind.in_frame_basis = True
        rwa.in_frame_basis = True
        h1 = np.asarray(rwa.evaluate_hamiltonian(0.11))
        h2 = np.asarray(rwa.evaluate_hamiltonian(0.67))
        np.testing.assert_allclose(h1, h2, atol=1e-12)
        avg = _period_average(lind.evaluate_hamiltonian, t_start=0.0)
        np.testing.assert_allclose(h1, avg, atol=1e-8)

    def test_dissipator_carrier_masked(self):
        """A dissipator driven at a fast carrier is averaged out of the RHS."""
        H0 = 2 * np.pi * NU * Z / 2
        L = np.array([[0, 1], [0, 0]], dtype=complex)
        lind = LindbladModel(
            static_hamiltonian=H0,
            dissipator_operators=np.array([0.3 * L]),
            dissipator_signals=[Signal(1.0, carrier_freq=10 * NU)],
            rotating_frame=None,
        )
        rwa = rotating_wave_approximation(lind, cutoff_freq=0.5 * NU)
        rho = np.array([[0.25, 0.1], [0.1, 0.75]], dtype=complex)
        avg_full = _period_average(
            lambda t: lind.evaluate_rhs(t, rho), t_start=0.0, n=4096
        )
        avg_rwa = _period_average(lambda t: rwa.evaluate_rhs(t, rho), t_start=0.0, n=4096)
        np.testing.assert_allclose(avg_rwa, avg_full, atol=1e-6)

    def test_solution_agreement_weak_drive(self):
        """RWA solution error on a weak-drive Lindblad solve is O(r/nu)."""
        from qiskit_dynamics_tpu.solvers import solve_ode

        nu, r = 5.0, 0.02
        H0 = 2 * np.pi * nu * Z / 2
        def make(rwa_cut=None):
            m = LindbladModel(
                static_hamiltonian=H0,
                hamiltonian_operators=np.array([2 * np.pi * r * X / 2]),
                hamiltonian_signals=[Signal(1.0, carrier_freq=nu)],
                static_dissipators=np.array(
                    [0.01 * np.array([[0, 1], [0, 0]], dtype=complex)]
                ),
                rotating_frame=H0,
            )
            return m if rwa_cut is None else rotating_wave_approximation(m, rwa_cut)

        rho0 = np.array([[1.0, 0.0], [0.0, 0.0]], dtype=complex)
        T = 10.0
        full = solve_ode(make(), [0.0, T], rho0, method="DOP853", atol=1e-10, rtol=1e-10)
        rwa = solve_ode(make(1.5 * nu), [0.0, T], rho0, method="DOP853", atol=1e-10, rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(full.y[-1]), np.asarray(rwa.y[-1]), atol=5 * r / nu
        )


class TestRWAConfigurations:
    """RWA across model configurations (reference
    test_rotating_wave_approximation.py families: with/without frame,
    without static operator, without operators, in_frame_basis, and the
    jit/grad-able signal map)."""

    def test_generator_model_no_rotating_frame(self):
        rng = np.random.default_rng(4)
        op = rng.standard_normal((3, 3)) * 1j
        model = GeneratorModel(
            static_operator=1j * np.diag([1.0, 2.0, 3.0]),
            operators=[op], signals=[Signal(1.0, carrier_freq=10.0)],
        )
        rwa = rotating_wave_approximation(model, cutoff_freq=5.0)
        # fast carrier removed entirely: high-freq term averages out
        vals = [np.asarray(rwa.evaluate(t)) for t in np.linspace(0.0, 1.0, 7)]
        for v in vals[1:]:
            np.testing.assert_allclose(v, vals[0], atol=1e-10)

    def test_generator_model_no_static_operator(self):
        op = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex) * 1j
        model = GeneratorModel(
            operators=[op], signals=[Signal(1.0, carrier_freq=0.01)],
        )
        rwa = rotating_wave_approximation(model, cutoff_freq=1.0)
        # slow carrier survives the cutoff
        t = 0.3
        expect = np.cos(2 * np.pi * 0.01 * t) * op
        np.testing.assert_allclose(np.asarray(rwa.evaluate(t)), expect, atol=1e-8)

    def test_rotating_frame_no_operators(self):
        H0 = np.diag([1.0, -1.0]).astype(complex)
        model = GeneratorModel(
            static_operator=-1j * H0, rotating_frame=-1j * H0
        )
        rwa = rotating_wave_approximation(model, cutoff_freq=2.0)
        # static generator fully removed by its own frame
        np.testing.assert_allclose(
            np.asarray(rwa.evaluate(0.7)), np.zeros((2, 2)), atol=1e-10
        )

    def test_in_frame_basis_output_matches(self):
        rng = np.random.default_rng(8)
        h = rng.standard_normal((3, 3))
        H0 = (h + h.T) / 2
        op_h = rng.standard_normal((3, 3))
        op = (op_h + op_h.T) / 2
        common = dict(
            static_operator=-1j * H0, operators=[-1j * op],
            signals=[Signal(1.0, carrier_freq=0.1)], rotating_frame=-1j * H0,
        )
        m_lab = GeneratorModel(**common, in_frame_basis=False)
        m_fb = GeneratorModel(**common, in_frame_basis=True)
        rwa_lab = rotating_wave_approximation(m_lab, cutoff_freq=1.0)
        rwa_fb = rotating_wave_approximation(m_fb, cutoff_freq=1.0)
        t = 0.43
        U = np.asarray(m_fb.rotating_frame.frame_basis)
        np.testing.assert_allclose(
            U @ np.asarray(rwa_fb.evaluate(t)) @ U.conj().T,
            np.asarray(rwa_lab.evaluate(t)),
            atol=1e-8,
        )

    def test_lindblad_static_hamiltonian_only(self):
        H0 = np.diag([1.0, 2.0]).astype(complex)
        model = LindbladModel(static_hamiltonian=H0, rotating_frame=H0)
        rwa = rotating_wave_approximation(model, cutoff_freq=3.0)
        rho = np.array([[0.25, 0.1], [0.1, 0.75]], dtype=complex)
        # frame removes H0: rhs vanishes
        np.testing.assert_allclose(
            np.asarray(rwa.evaluate_rhs(0.9, rho)), np.zeros((2, 2)), atol=1e-10
        )

    def test_signal_map_jit_and_grad(self):
        X = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=complex)
        Z = np.diag([1.0, -1.0]).astype(complex)
        model = HamiltonianModel(
            static_operator=5 * Z, operators=[X],
            signals=[Signal(1.0, carrier_freq=5.0 / np.pi)],
            rotating_frame=5 * Z,
        )
        rwa, sig_map = rotating_wave_approximation(
            model, cutoff_freq=3.0, return_signal_map=True
        )

        def f(amp):
            sigs = sig_map([Signal(amp, carrier_freq=5.0 / np.pi)])
            m = rwa.copy() if hasattr(rwa, "copy") else rwa
            m.signals = sigs
            g = m.evaluate(0.21)
            return jnp.sum(jnp.abs(g) ** 2)

        v = jax.jit(f)(0.8)
        np.testing.assert_allclose(v, f(0.8), rtol=1e-6)
        g = jax.grad(f)(0.8)
        eps = 1e-5
        fd = (f(0.8 + eps) - f(0.8 - eps)) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-4, atol=1e-8)
