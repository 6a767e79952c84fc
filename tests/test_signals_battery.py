"""Per-class signal behavior battery (mirrors the reference's
test/dynamics/signals/test_signals.py class structure: envelope /
complex_value / __call__ / conjugate, scalar and vectorized, for every
signal type, plus subscripting, iteration and jax transformations)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu.signals import (
    Signal,
    DiscreteSignal,
    SignalSum,
    DiscreteSignalSum,
    SignalList,
)

TWO_PI = 2 * np.pi


class TestSignalBehavior:
    """Callable-envelope Signal."""

    def setup_method(self):
        self.sig = Signal(lambda t: 0.25 * t**2, carrier_freq=0.5, phase=0.3)

    def test_envelope_scalar(self):
        np.testing.assert_allclose(self.sig.envelope(2.0), 1.0, rtol=1e-7)

    def test_envelope_vectorized(self):
        t = np.array([0.0, 1.0, 2.0, 3.0])
        np.testing.assert_allclose(self.sig.envelope(t), 0.25 * t**2, rtol=1e-7)
        t2 = t.reshape(2, 2)
        np.testing.assert_allclose(self.sig.envelope(t2), 0.25 * t2**2, rtol=1e-7)

    def test_complex_value(self):
        t = 1.7
        expect = 0.25 * t**2 * np.exp(1j * (TWO_PI * 0.5 * t + 0.3))
        np.testing.assert_allclose(self.sig.complex_value(t), expect, rtol=1e-7)

    def test_complex_value_vectorized(self):
        t = np.linspace(0.0, 3.0, 7)
        expect = 0.25 * t**2 * np.exp(1j * (TWO_PI * 0.5 * t + 0.3))
        np.testing.assert_allclose(self.sig.complex_value(t), expect, rtol=1e-7)

    def test_call_is_real_part(self):
        t = np.linspace(0.0, 3.0, 7)
        np.testing.assert_allclose(
            self.sig(t), np.real(self.sig.complex_value(t)), rtol=1e-7
        )

    def test_conjugate(self):
        t = np.linspace(0.0, 3.0, 7)
        conj = self.sig.conjugate()
        np.testing.assert_allclose(
            conj.complex_value(t), np.conj(self.sig.complex_value(t)), atol=1e-12
        )

    def test_properties_settable(self):
        s = Signal(1.0, carrier_freq=1.0, phase=0.0)
        s.carrier_freq = 2.0
        s.phase = np.pi / 2
        np.testing.assert_allclose(
            s.complex_value(0.25), np.exp(1j * (TWO_PI * 2 * 0.25 + np.pi / 2)),
            rtol=1e-7,
        )


class TestConstantBehavior:
    """Constant signals (scalar constructor)."""

    def setup_method(self):
        self.sig = Signal(3.0)

    def test_is_constant(self):
        assert self.sig.is_constant

    def test_envelope(self):
        np.testing.assert_allclose(self.sig.envelope(1.23), 3.0)
        np.testing.assert_allclose(
            self.sig.envelope(np.array([0.1, 0.2])), [3.0, 3.0]
        )

    def test_complex_value_and_call(self):
        np.testing.assert_allclose(self.sig.complex_value(5.0), 3.0 + 0j)
        np.testing.assert_allclose(self.sig(5.0), 3.0)

    def test_conjugate_complex_constant(self):
        s = Signal(2.0 + 1.0j)
        np.testing.assert_allclose(
            s.conjugate().complex_value(0.7), 2.0 - 1.0j, atol=1e-12
        )


class TestDiscreteSignalBehavior:
    def setup_method(self):
        self.samples = np.array([1.0, 2.0, 3.0, 4.0], dtype=complex)
        self.sig = DiscreteSignal(
            dt=0.5, samples=self.samples, start_time=1.0,
            carrier_freq=0.25, phase=0.1,
        )

    def test_envelope_piecewise_constant(self):
        # sample j covers [start + j dt, start + (j+1) dt)
        np.testing.assert_allclose(self.sig.envelope(1.1), 1.0)
        np.testing.assert_allclose(self.sig.envelope(1.6), 2.0)
        np.testing.assert_allclose(self.sig.envelope(2.4), 3.0)
        np.testing.assert_allclose(self.sig.envelope(2.9), 4.0)

    def test_envelope_outside_is_zero(self):
        np.testing.assert_allclose(self.sig.envelope(0.5), 0.0)
        np.testing.assert_allclose(self.sig.envelope(3.5), 0.0)

    def test_envelope_vectorized(self):
        t = np.array([[1.1, 1.6], [2.4, 0.0]])
        np.testing.assert_allclose(self.sig.envelope(t), [[1.0, 2.0], [3.0, 0.0]])

    def test_complex_value(self):
        t = 1.6
        expect = 2.0 * np.exp(1j * (TWO_PI * 0.25 * t + 0.1))
        np.testing.assert_allclose(self.sig.complex_value(t), expect, rtol=1e-7)

    def test_call_vectorized(self):
        t = np.array([1.1, 2.4, 2.9])
        np.testing.assert_allclose(
            self.sig(t), np.real(self.sig.complex_value(t)), rtol=1e-7
        )

    def test_properties(self):
        assert self.sig.duration == 4
        assert self.sig.dt == 0.5
        assert self.sig.start_time == 1.0
        np.testing.assert_allclose(np.asarray(self.sig.samples), self.samples)

    def test_conjugate(self):
        t = np.array([1.1, 1.6, 2.4])
        conj = self.sig.conjugate()
        np.testing.assert_allclose(
            conj.complex_value(t), np.conj(self.sig.complex_value(t)), atol=1e-12
        )

    def test_add_samples(self):
        s = DiscreteSignal(dt=1.0, samples=np.array([1.0, 2.0]), carrier_freq=0.0)
        s.add_samples(2, np.array([5.0, 6.0]))
        assert s.duration == 4
        np.testing.assert_allclose(s.envelope(2.5), 5.0)
        np.testing.assert_allclose(s.envelope(3.5), 6.0)

    def test_add_samples_beyond_end_pads_zero(self):
        s = DiscreteSignal(dt=1.0, samples=np.array([1.0]), carrier_freq=0.0)
        s.add_samples(3, np.array([7.0]))
        np.testing.assert_allclose(s.envelope(1.5), 0.0)
        np.testing.assert_allclose(s.envelope(3.5), 7.0)

    def test_from_Signal(self):
        smooth = Signal(lambda t: t, carrier_freq=0.4, phase=0.2)
        disc = DiscreteSignal.from_Signal(smooth, dt=0.1, n_samples=10)
        assert disc.duration == 10
        # midpoint sampling of the envelope
        np.testing.assert_allclose(disc.envelope(0.55), 0.55, rtol=1e-7)
        assert disc.carrier_freq == 0.4 and disc.phase == 0.2


class TestSignalSumBehavior:
    def setup_method(self):
        self.s1 = Signal(lambda t: t, carrier_freq=1.0, phase=0.1)
        self.s2 = Signal(0.5, carrier_freq=0.0)
        self.ssum = self.s1 + self.s2

    def test_type_and_len(self):
        assert isinstance(self.ssum, SignalSum)
        assert len(self.ssum) == 2

    def test_complex_value_is_componentwise_sum(self):
        t = np.linspace(0.0, 2.0, 9)
        expect = self.s1.complex_value(t) + self.s2.complex_value(t)
        np.testing.assert_allclose(self.ssum.complex_value(t), expect, rtol=1e-7)

    def test_call(self):
        t = np.linspace(0.0, 2.0, 9)
        np.testing.assert_allclose(
            self.ssum(t), np.real(self.ssum.complex_value(t)), rtol=1e-7
        )

    def test_subscript_and_iter(self):
        comps = [c for c in self.ssum]
        assert len(comps) == 2
        t = 0.7
        np.testing.assert_allclose(
            self.ssum[0].complex_value(t), self.s1.complex_value(t), rtol=1e-7
        )
        np.testing.assert_allclose(
            self.ssum[1].complex_value(t), self.s2.complex_value(t), rtol=1e-7
        )

    def test_algebra_sub_neg_scalar(self):
        t = np.linspace(0.0, 1.5, 5)
        diff = self.s1 - self.s2
        np.testing.assert_allclose(
            diff.complex_value(t),
            self.s1.complex_value(t) - self.s2.complex_value(t),
            rtol=1e-7,
        )
        neg = -self.s1
        np.testing.assert_allclose(
            neg.complex_value(t), -self.s1.complex_value(t), rtol=1e-7
        )
        sc = 2.0 * self.s1
        np.testing.assert_allclose(
            sc.complex_value(t), 2.0 * self.s1.complex_value(t), rtol=1e-7
        )

    def test_product_two_sidebands(self):
        # signal product -> sum + difference frequency components
        a = Signal(lambda t: t, carrier_freq=1.0)
        b = Signal(0.5, carrier_freq=0.3)
        prod = a * b
        assert isinstance(prod, SignalSum) and len(prod) == 2
        t = np.linspace(0.1, 2.0, 7)
        np.testing.assert_allclose(
            prod(t), a(t) * b(t), rtol=1e-6, atol=1e-8
        )

    def test_flatten(self):
        t = np.linspace(0.0, 2.0, 9)
        flat = self.ssum.flatten()
        np.testing.assert_allclose(
            flat.complex_value(t), self.ssum.complex_value(t), rtol=1e-7
        )

    def test_conjugate(self):
        t = np.linspace(0.0, 2.0, 9)
        np.testing.assert_allclose(
            self.ssum.conjugate().complex_value(t),
            np.conj(self.ssum.complex_value(t)),
            atol=1e-12,
        )


class TestDiscreteSignalSumBehavior:
    def setup_method(self):
        self.d1 = DiscreteSignal(
            dt=0.5, samples=np.array([1.0, 2.0]), carrier_freq=0.5
        )
        self.d2 = DiscreteSignal(
            dt=0.5, samples=np.array([0.5j, -1.0]), carrier_freq=1.5
        )
        self.dsum = self.d1 + self.d2

    def test_type(self):
        assert isinstance(self.dsum, DiscreteSignalSum)
        assert len(self.dsum) == 2

    def test_complex_value(self):
        t = np.array([0.1, 0.6, 0.9])
        expect = self.d1.complex_value(t) + self.d2.complex_value(t)
        np.testing.assert_allclose(self.dsum.complex_value(t), expect, rtol=1e-6)

    def test_subscript(self):
        t = np.array([0.1, 0.6])
        np.testing.assert_allclose(
            self.dsum[1].complex_value(t), self.d2.complex_value(t), rtol=1e-6
        )

    def test_from_SignalSum_samples(self):
        smooth = Signal(lambda t: t, carrier_freq=0.4) + Signal(0.3, carrier_freq=1.0)
        dss = DiscreteSignalSum.from_SignalSum(smooth, dt=0.25, n_samples=8)
        t = np.array([0.3, 1.1, 1.9])
        # envelopes sampled at interval midpoints
        np.testing.assert_allclose(
            dss.complex_value(t),
            sum(
                DiscreteSignal.from_Signal(c, dt=0.25, n_samples=8).complex_value(t)
                for c in smooth.components
            ),
            rtol=1e-6,
        )


class TestSignalListBehavior:
    def test_call_and_complex_value(self):
        sl = SignalList([Signal(1.0, carrier_freq=0.5), Signal(lambda t: t)])
        t = 0.65
        vals = np.asarray(sl(t))
        np.testing.assert_allclose(vals[0], np.real(np.exp(1j * TWO_PI * 0.5 * t)), rtol=1e-6)
        np.testing.assert_allclose(vals[1], t, rtol=1e-6)

    def test_drift(self):
        sl = SignalList([Signal(2.0) + Signal(1.0, carrier_freq=1.0), Signal(0.5)])
        drift = np.asarray(sl.drift)
        np.testing.assert_allclose(drift, [2.0, 0.5], rtol=1e-7)

    def test_flatten_preserves_values(self):
        sl = SignalList([Signal(1.0, carrier_freq=0.5) + Signal(0.5), Signal(2.0)])
        t = np.array([0.0, 0.3, 0.9])
        np.testing.assert_allclose(
            np.asarray(sl.flatten()(t)), np.asarray(sl(t)), rtol=1e-6
        )


class TestSignalsUnderJaxTransforms:
    def test_jit_eval_each_type(self):
        sigs = [
            Signal(lambda t: t**2, carrier_freq=1.0, phase=0.2),
            Signal(1.5, carrier_freq=0.5),
            DiscreteSignal(dt=0.5, samples=np.array([1.0, 2.0]), carrier_freq=1.0),
            Signal(lambda t: t, carrier_freq=1.0) + Signal(0.5),
        ]
        for sig in sigs:
            f = jax.jit(lambda t, s=sig: s(t))
            np.testing.assert_allclose(f(0.4), sig(0.4), rtol=1e-6, atol=1e-7)

    def test_grad_through_carrier_freq_construction(self):
        def val(freq):
            return Signal(1.0, carrier_freq=freq)(0.25)

        g = jax.grad(val)(1.0)
        expect = -TWO_PI * 0.25 * np.sin(TWO_PI * 0.25)
        np.testing.assert_allclose(g, expect, rtol=1e-5)

    def test_grad_through_discrete_samples(self):
        def val(amp):
            s = DiscreteSignal(
                dt=1.0, samples=jnp.array([amp, 2 * amp]), carrier_freq=0.0
            )
            return s(0.5) + s(1.5)

        np.testing.assert_allclose(jax.grad(val)(0.7), 3.0, rtol=1e-6)

    def test_vmap_over_time(self):
        sig = Signal(lambda t: t, carrier_freq=0.5, phase=0.1)
        t = jnp.linspace(0.0, 2.0, 11)
        np.testing.assert_allclose(
            jax.vmap(sig)(t), sig(np.asarray(t)), rtol=1e-6, atol=1e-7
        )


def test_discrete_envelope_boundary_jit_eager_consistent():
    """Regression: XLA rewrites division-by-constant into reciprocal
    multiplication, which rounds differently from numpy true division at
    exact cell boundaries (0.3/0.1 = 2.99..96 vs 0.3*10.0 = 3.0) — the
    envelope lookup must give the SAME sample index eagerly and under jit."""
    s = DiscreteSignal(dt=0.1, samples=np.arange(1.0, 7.0), carrier_freq=0.0)
    boundaries = np.array([0.1, 0.2, 0.3, 0.4, 0.5])
    eager = np.asarray(s.envelope(boundaries))
    jitted = np.asarray(jax.jit(s.envelope)(boundaries))
    np.testing.assert_array_equal(eager, jitted)
