"""Signal edge-case battery.

Reference analog: ``/root/reference/test/dynamics/signals/test_signals.py``
edge coverage — sample-window clipping, ``add_samples`` semantics, SignalSum
``flatten`` identity, ``sort_signals`` partial order, algebra identities
against direct pointwise evaluation.
"""
import numpy as np
import pytest

from qiskit_dynamics_tpu.signals import (
    Signal,
    DiscreteSignal,
    SignalSum,
    DiscreteSignalSum,
    SignalList,
)
from qiskit_dynamics_tpu.signals.signals import sort_signals, to_SignalSum
from qiskit_dynamics_tpu.exceptions import DynamicsError


class TestDiscreteSignalEdges:
    def test_envelope_outside_window_is_zero(self):
        """Before start_time and after the samples the envelope is 0."""
        sig = DiscreteSignal(dt=0.5, samples=[1.0, 2.0, 3.0], start_time=1.0)
        assert complex(sig.envelope(0.0)) == 0.0
        assert complex(sig.envelope(0.99)) == 0.0
        assert complex(sig.envelope(1.1)) == 1.0
        assert complex(sig.envelope(2.4)) == 3.0
        assert complex(sig.envelope(2.6)) == 0.0
        assert complex(sig.envelope(100.0)) == 0.0

    def test_sample_boundary_left_inclusive(self):
        """Sample i covers [t0 + i dt, t0 + (i+1) dt)."""
        sig = DiscreteSignal(dt=1.0, samples=[10.0, 20.0])
        assert complex(sig.envelope(0.0)) == 10.0
        assert complex(sig.envelope(1.0)) == 20.0
        assert complex(sig.envelope(0.999)) == 10.0

    def test_add_samples_contiguous(self):
        sig = DiscreteSignal(dt=1.0, samples=[1.0, 2.0])
        sig.add_samples(2, [3.0, 4.0])
        np.testing.assert_allclose(np.asarray(sig.samples), [1, 2, 3, 4])

    def test_add_samples_gap_zero_filled(self):
        sig = DiscreteSignal(dt=1.0, samples=[1.0])
        sig.add_samples(3, [9.0])
        np.testing.assert_allclose(np.asarray(sig.samples), [1, 0, 0, 9])

    def test_add_samples_overlap_raises(self):
        sig = DiscreteSignal(dt=1.0, samples=[1.0, 2.0])
        with pytest.raises(DynamicsError):
            sig.add_samples(1, [5.0])

    def test_conjugate(self):
        sig = DiscreteSignal(
            dt=0.3, samples=[1 + 2j, -0.5j], carrier_freq=2.0, phase=0.7
        )
        conj = sig.conjugate()
        ts = np.linspace(0.0, 0.6, 5)
        np.testing.assert_allclose(
            np.asarray(conj.complex_value(ts)),
            np.conj(np.asarray(sig.complex_value(ts))),
            atol=1e-12,
        )


class TestSignalSumEdges:
    def test_flatten_matches_sum(self):
        """flatten() merges terms at the average carrier; values preserved."""
        s = Signal(lambda t: t, carrier_freq=1.0, phase=0.2) + Signal(
            0.5, carrier_freq=3.0
        )
        flat = s.flatten()
        assert isinstance(flat, Signal) and not isinstance(flat, SignalSum)
        ts = np.linspace(0.0, 2.0, 11)
        np.testing.assert_allclose(
            np.asarray([complex(flat.complex_value(t)) for t in ts]),
            np.asarray([complex(s.complex_value(t)) for t in ts]),
            atol=1e-12,
        )

    def test_flatten_single_term_returns_component(self):
        sig = Signal(1.0, carrier_freq=2.0)
        s = SignalSum(sig)
        assert s.flatten() is sig

    def test_empty_sum(self):
        s = SignalSum()
        assert len(s) == 0
        assert complex(s.flatten().complex_value(1.3)) == 0.0

    def test_subtraction_and_negation(self):
        a = Signal(2.0, carrier_freq=1.0)
        b = Signal(0.5, carrier_freq=1.0)
        d = a - b
        ts = np.linspace(0, 1, 7)
        np.testing.assert_allclose(
            [float(d(t)) for t in ts],
            [float(a(t)) - float(b(t)) for t in ts],
            atol=1e-12,
        )

    def test_multiply_matches_pointwise(self):
        """Signal products (sum-of-sidebands) equal pointwise multiplication."""
        a = Signal(lambda t: 1.0 + 0.3 * t, carrier_freq=1.5, phase=0.4)
        b = Signal(lambda t: np.cos(t), carrier_freq=2.25, phase=-0.1)
        prod = a * b
        for t in np.linspace(0.0, 3.0, 13):
            np.testing.assert_allclose(
                float(prod(t)), float(a(t)) * float(b(t)), atol=1e-10
            )

    def test_multiply_discrete_pair_stays_discrete(self):
        a = DiscreteSignal(dt=0.5, samples=[1.0, 2.0, 1.5], carrier_freq=1.0)
        b = DiscreteSignal(dt=0.5, samples=[0.5, -1.0, 2.0], carrier_freq=2.0)
        prod = a * b
        assert isinstance(prod, DiscreteSignalSum)
        for t in [0.1, 0.6, 1.2]:
            np.testing.assert_allclose(
                float(prod(t)), float(a(t)) * float(b(t)), atol=1e-10
            )


class TestSortAndCoerce:
    def test_sort_signals_order(self):
        const = Signal(1.0)
        disc = DiscreteSignal(dt=1.0, samples=[1.0])
        sig = Signal(lambda t: t, carrier_freq=1.0)
        ssum = sig + Signal(1.0, carrier_freq=2.0)
        dsum = disc + DiscreteSignal(dt=1.0, samples=[2.0])
        for lo, hi in [(const, disc), (disc, sig), (sig, ssum), (ssum, dsum)]:
            assert sort_signals(hi, lo) == (lo, hi)
            assert sort_signals(lo, hi) == (lo, hi)

    def test_to_signalsum_scalar(self):
        s = to_SignalSum(2.5)
        assert isinstance(s, SignalSum) and len(s) == 1
        assert float(s(0.7)) == 2.5

    def test_to_signalsum_discrete_preserves_values(self):
        d = DiscreteSignal(dt=0.5, samples=[1.0, -2.0], carrier_freq=1.0, phase=0.3)
        s = to_SignalSum(d)
        assert isinstance(s, DiscreteSignalSum)
        for t in [0.1, 0.7]:
            np.testing.assert_allclose(float(s(t)), float(d(t)), atol=1e-12)

    def test_to_signalsum_bad_input_raises(self):
        with pytest.raises(DynamicsError):
            to_SignalSum(np.array([1.0, 2.0]))


class TestSignalListEdges:
    def test_drift_extracts_constants(self):
        sl = SignalList(
            [Signal(2.0) + Signal(1.0, carrier_freq=1.0), Signal(3.0), Signal(0.5, carrier_freq=2.0)]
        )
        np.testing.assert_allclose(np.asarray(sl.drift), [2.0, 3.0, 0.0], atol=1e-12)

    def test_flatten_components(self):
        sl = SignalList([Signal(1.0, carrier_freq=1.0) + Signal(2.0, carrier_freq=3.0)])
        flat = sl.flatten()
        ts = np.linspace(0, 1, 5)
        np.testing.assert_allclose(
            np.asarray([np.asarray(sl(t)) for t in ts]),
            np.asarray([np.asarray(flat(t)) for t in ts]),
            atol=1e-12,
        )


class TestDraw:
    """Signal.draw plotting (matplotlib Agg; reference signals.py:196-254)."""

    @pytest.fixture(autouse=True)
    def _agg(self):
        import matplotlib

        matplotlib.use("Agg")
        yield

    def test_draw_functions(self):
        import matplotlib.pyplot as plt

        sig = Signal(lambda t: 1.0 + 0.1 * t, carrier_freq=2.0, phase=0.3)
        for function in ["signal", "envelope", "complex_value"]:
            fig, ax = plt.subplots()
            sig.draw(0.0, 1.0, 25, function=function, axis=ax)
            assert len(ax.lines) >= 1
            xdata = ax.lines[0].get_xdata()
            assert len(xdata) == 25 and xdata[0] == 0.0 and xdata[-1] == 1.0
            plt.close(fig)

    def test_draw_unknown_function_raises(self):
        sig = Signal(1.0, carrier_freq=1.0)
        with pytest.raises(DynamicsError):
            sig.draw(0.0, 1.0, 10, function="nope")

    def test_draw_discrete_and_sum(self):
        import matplotlib.pyplot as plt

        for sig in [
            DiscreteSignal(dt=0.25, samples=[1.0, -1.0, 0.5], carrier_freq=1.0),
            Signal(1.0, carrier_freq=1.0) + Signal(0.3, carrier_freq=2.0),
        ]:
            fig, ax = plt.subplots()
            sig.draw(0.0, 0.75, 10, axis=ax)
            assert len(ax.lines) >= 1
            plt.close(fig)


class TestSumSubscriptIteration:
    """Reference analog: TestSignalSum subscript/iterator cases
    (test_signals.py:860-911)."""

    def _sum(self):
        return (
            Signal(lambda t: t, carrier_freq=1.0)
            + Signal(2.0, carrier_freq=2.0)
            + Signal(0.5, carrier_freq=3.0)
        )

    def test_signal_sum_int_subscript(self):
        s = self._sum()
        assert isinstance(s[0], Signal)
        assert float(s[1].carrier_freq) == 2.0

    def test_signal_sum_slice_and_list_subscript(self):
        s = self._sum()
        sub = s[1:]
        assert isinstance(sub, SignalSum) and len(sub) == 2
        np.testing.assert_allclose(
            np.asarray(sub(0.3)), np.asarray(s[1](0.3) + s[2](0.3)), atol=1e-12
        )
        picked = s[[0, 2]]
        assert len(picked) == 2
        assert float(picked[1].carrier_freq) == 3.0

    def test_signal_sum_iterates_components(self):
        freqs = [float(c.carrier_freq) for c in self._sum()]
        assert freqs == [1.0, 2.0, 3.0]

    def test_discrete_sum_int_subscript_is_discrete_signal(self):
        d = DiscreteSignalSum(
            dt=0.5,
            samples=np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]),
            carrier_freq=[1.0, 2.0],
            phase=[0.0, 0.5],
        )
        comp = d[1]
        assert isinstance(comp, DiscreteSignal)
        np.testing.assert_allclose(np.asarray(comp.samples), [2.0, 4.0, 6.0])
        assert float(comp.carrier_freq) == 2.0
        assert float(comp.phase) == 0.5
        with pytest.raises(IndexError):
            d[2]

    def test_discrete_sum_slice_subscript_stays_sum(self):
        d = DiscreteSignalSum(
            dt=0.5,
            samples=np.array([[1.0, 2.0, 3.0]]),
            carrier_freq=[1.0, 2.0, 3.0],
        )
        sub = d[1:]
        assert isinstance(sub, DiscreteSignalSum) and len(sub) == 2
        ts = np.array([0.1, 0.4])
        np.testing.assert_allclose(
            np.asarray(sub(ts)), np.asarray(d[1](ts)) + np.asarray(d[2](ts)), atol=1e-12
        )


class TestSumConstruction:
    def test_sum_with_plain_numbers(self):
        """Adding a constant number produces a constant-signal term
        (reference: test_construction_with_numbers)."""
        s = Signal(1.0, carrier_freq=1.0) + 2.0
        assert isinstance(s, SignalSum) and len(s) == 2
        np.testing.assert_allclose(float(s[1](1.234)), 2.0)
        s2 = 3 + Signal(1.0, carrier_freq=1.0)
        np.testing.assert_allclose(
            float(s2(0.1)), 3.0 + np.cos(2 * np.pi * 0.1), atol=1e-12
        )
        s3 = 2.0 * Signal(1.0)
        np.testing.assert_allclose(float(s3(0.0)), 2.0)

    def test_empty_discrete_signal_to_sum(self):
        """A zero-sample DiscreteSignal still sums/evaluates (reference:
        test_empty_DiscreteSignal_to_sum)."""
        empty = DiscreteSignal(dt=1.0, samples=[])
        s = empty + Signal(1.0)
        np.testing.assert_allclose(float(s(0.5)), 1.0, atol=1e-12)

    def test_vectorized_2d_times(self):
        """All classes evaluate on 2d time arrays elementwise."""
        ts = np.array([[0.1, 0.2], [0.3, 0.4]])
        sig = Signal(lambda t: t, carrier_freq=1.0, phase=0.1)
        expected = np.vectorize(lambda t: complex(sig.complex_value(t)))(ts)
        np.testing.assert_allclose(np.asarray(sig.complex_value(ts)), expected, atol=1e-12)
        d = DiscreteSignal(dt=0.25, samples=[1.0, 2.0, 3.0], carrier_freq=0.5)
        expected_d = np.vectorize(lambda t: complex(d.complex_value(t)))(ts)
        np.testing.assert_allclose(np.asarray(d.complex_value(ts)), expected_d, atol=1e-12)
        tot = sig + d
        np.testing.assert_allclose(
            np.asarray(tot(ts)), np.asarray(sig(ts)) + np.asarray(d(ts)), atol=1e-12
        )


class TestSignalGradients:
    def test_grad_wrt_carrier_freq_through_construction(self):
        """d/dnu of Signal(1.0, carrier_freq=nu)(t) = -2 pi t sin(2 pi nu t)
        (reference: test_jit_grad_carrier_freq_construct)."""
        import jax

        t, nu = 0.37, 1.3

        def value(freq):
            return Signal(1.0, carrier_freq=freq)(t)

        g = jax.grad(value)(nu)
        expected = -2 * np.pi * t * np.sin(2 * np.pi * nu * t)
        np.testing.assert_allclose(float(g), expected, atol=1e-12)

    def test_grad_wrt_discrete_samples(self):
        import jax
        import jax.numpy as jnp

        def value(samples):
            sig = DiscreteSignal(dt=0.5, samples=samples, carrier_freq=0.0)
            return sig(0.6)

        g = jax.grad(value)(jnp.array([0.5, 0.25]))
        np.testing.assert_allclose(np.asarray(g), [0.0, 1.0], atol=1e-12)
