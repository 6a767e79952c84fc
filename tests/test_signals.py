"""Signal layer tests (parity with reference semantics, plus jit/pytree checks)."""
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
    Convolution,
    FFTConvolution,
    Sampler,
    IQMixer,
    to_SignalSum,
)


def test_constant_signal():
    sig = Signal(3.0)
    assert sig.is_constant
    assert np.allclose(sig(0.5), 3.0)
    assert np.allclose(sig(np.linspace(0, 1, 7)), 3.0)


def test_signal_call_matches_formula():
    nu, phi = 1.7, 0.3
    env = lambda t: 2.0 * t + 1j * t**2
    sig = Signal(env, carrier_freq=nu, phase=phi)
    t = np.linspace(0.0, 2.0, 11)
    expected = np.real(env(t) * np.exp(1j * (2 * np.pi * nu * t + phi)))
    np.testing.assert_allclose(sig(t), expected, rtol=1e-12)
    np.testing.assert_allclose(sig.complex_value(t), env(t) * np.exp(1j * (2 * np.pi * nu * t + phi)))


def test_discrete_signal_lookup():
    samples = np.array([1.0, 2.0, 3.0])
    sig = DiscreteSignal(dt=0.5, samples=samples, start_time=1.0)
    # inside support
    np.testing.assert_allclose(sig.envelope(1.1), 1.0)
    np.testing.assert_allclose(sig.envelope(1.6), 2.0)
    np.testing.assert_allclose(sig.envelope(2.4), 3.0)
    # outside support -> 0
    np.testing.assert_allclose(sig.envelope(0.5), 0.0)
    np.testing.assert_allclose(sig.envelope(3.0), 0.0)
    # vectorized
    np.testing.assert_allclose(sig.envelope(np.array([0.0, 1.2, 2.7])), [0.0, 1.0, 0.0])


def test_discrete_signal_from_signal_midpoint():
    base = Signal(lambda t: t, carrier_freq=2.0, phase=0.1)
    disc = DiscreteSignal.from_Signal(base, dt=0.1, n_samples=10)
    np.testing.assert_allclose(disc.samples, (np.arange(10) + 0.5) * 0.1)
    assert float(disc.carrier_freq) == 2.0


def test_signal_sum_and_envelope_shape():
    s1 = Signal(lambda t: t, carrier_freq=1.0)
    s2 = Signal(2.0, carrier_freq=3.0)
    ssum = s1 + s2
    assert isinstance(ssum, SignalSum)
    assert len(ssum) == 2
    t = np.linspace(0, 1, 5)
    assert ssum.envelope(t).shape == (5, 2)
    np.testing.assert_allclose(ssum(t), s1(t) + s2(t), rtol=1e-12)


def test_signal_multiply_sidebands():
    s1 = Signal(lambda t: t + 1, carrier_freq=2.0, phase=0.1)
    s2 = Signal(lambda t: t**2, carrier_freq=1.0, phase=-0.2)
    prod = s1 * s2
    t = np.linspace(0, 1.0, 9)
    np.testing.assert_allclose(prod(t), s1(t) * s2(t), rtol=1e-10, atol=1e-12)
    # two sideband terms
    assert len(prod) == 2
    np.testing.assert_allclose(np.sort(np.asarray(prod.carrier_freq)), [1.0, 3.0])


def test_discrete_signal_sum_fast_paths():
    rng = np.random.default_rng(42)
    a = DiscreteSignal(dt=0.2, samples=rng.normal(size=5) + 1j * rng.normal(size=5),
                       carrier_freq=1.1, phase=0.2)
    b = DiscreteSignal(dt=0.2, samples=rng.normal(size=5), carrier_freq=0.7, phase=-0.5)
    t = np.linspace(-0.1, 1.2, 31)

    ssum = a + b
    assert isinstance(ssum, DiscreteSignalSum)
    np.testing.assert_allclose(ssum(t), a(t) + b(t), rtol=1e-10, atol=1e-12)

    prod = a * b
    assert isinstance(prod, DiscreteSignalSum)
    np.testing.assert_allclose(prod(t), a(t) * b(t), rtol=1e-10, atol=1e-12)


def test_signal_list_drift_and_call():
    s1 = Signal(lambda t: t, carrier_freq=1.0)
    const = Signal(2.5)
    slist = SignalList([s1 + const, const])
    t = np.linspace(0, 1, 4)
    vals = slist(t)
    assert vals.shape == (4, 2)
    np.testing.assert_allclose(slist.drift, [2.5, 2.5])


def test_conjugate():
    sig = Signal(lambda t: t + 1j * t, carrier_freq=1.0, phase=0.3)
    conj = sig.conjugate()
    t = np.linspace(0, 1, 5)
    np.testing.assert_allclose(conj.complex_value(t), np.conj(sig.complex_value(t)), rtol=1e-12)


def test_discrete_signal_jit_and_pytree():
    sig = DiscreteSignal(dt=0.1, samples=np.arange(5.0), carrier_freq=1.0)

    @jax.jit
    def eval_sig(s, t):
        return s(t)

    np.testing.assert_allclose(eval_sig(sig, 0.25), sig(0.25))
    # pytree roundtrip
    leaves, treedef = jax.tree_util.tree_flatten(sig)
    sig2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_allclose(sig2(0.25), sig(0.25))


def test_discrete_signal_sum_jit_grad():
    samples = jnp.asarray(np.random.default_rng(1).normal(size=(8, 3)))
    dsum = DiscreteSignalSum(dt=0.1, samples=samples, carrier_freq=jnp.asarray([1.0, 2.0, 3.0]))

    def f(samps):
        s = DiscreteSignalSum(dt=0.1, samples=samps, carrier_freq=jnp.asarray([1.0, 2.0, 3.0]))
        return jnp.sum(s(jnp.linspace(0.0, 0.8, 16)))

    g = jax.grad(f)(samples)
    assert g.shape == samples.shape
    assert np.all(np.isfinite(g))


def test_sampler_and_convolution():
    sig = Signal(lambda t: np.exp(-t), carrier_freq=0.5)
    disc = Sampler(dt=0.1, n_samples=20)(sig)
    assert isinstance(disc, DiscreteSignal)
    assert disc.duration == 20

    conv = Convolution(lambda t: np.exp(-(t**2)))(disc)
    fconv = FFTConvolution(lambda t: np.exp(-(t**2)))(disc)
    n = min(conv.duration, fconv.duration)
    np.testing.assert_allclose(conv.samples[:n], fconv.samples[:n], rtol=1e-8, atol=1e-10)


def test_iq_mixer():
    lo = 5.0
    si = Signal(lambda t: jnp.ones_like(t), carrier_freq=0.5, phase=0.1)
    sq = Signal(lambda t: jnp.ones_like(t), carrier_freq=0.5, phase=0.2)
    rf = IQMixer(lo)(si, sq)
    t = np.linspace(0, 1, 11)
    wp, wm = 2 * np.pi * (lo + 0.5), 2 * np.pi * (lo - 0.5)
    expected = (np.cos(wp * t + 0.1) + np.cos(wm * t + 0.1)) / 2 + (
        np.cos(wp * t + 0.2 - np.pi / 2) + np.cos(wm * t + 0.2 + np.pi / 2)
    ) / 2
    np.testing.assert_allclose(rf(t), expected, rtol=1e-8, atol=1e-10)


def test_to_signalsum():
    assert isinstance(to_SignalSum(3.0), SignalSum)
    d = DiscreteSignal(dt=0.1, samples=[1.0, 2.0])
    ds = to_SignalSum(d)
    assert isinstance(ds, DiscreteSignalSum)
    np.testing.assert_allclose(ds(0.15), d(0.15))
