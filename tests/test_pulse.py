"""Tests for the pulse layer: instruction semantics of schedule->signal
conversion (reference model: ``test/dynamics/pulse/test_pulse_to_signals.py``)."""
import numpy as np
import jax.numpy as jnp
import pytest

from qiskit_dynamics_tpu.pulse import (
    Schedule,
    Play,
    ShiftPhase,
    SetPhase,
    ShiftFrequency,
    SetFrequency,
    Delay,
    DriveChannel,
    ControlChannel,
    Waveform,
    Gaussian,
    GaussianSquare,
    Drag,
    Constant,
    InstructionToSignals,
)

DT = 0.222


def _const_samples(n, amp=1.0):
    return Waveform(np.full(n, amp, dtype=complex))


class TestInstructionToSignals:
    def test_play_samples(self):
        sched = Schedule(Play(_const_samples(5, 0.5), DriveChannel(0)))
        sig = InstructionToSignals(DT, carriers={"d0": 5.0}).get_signals(sched)[0]
        np.testing.assert_allclose(np.asarray(sig.samples), 0.5 * np.ones(5))
        assert float(sig.carrier_freq) == 5.0

    def test_shift_phase(self):
        sched = Schedule()
        sched.append(Play(_const_samples(3), DriveChannel(0)))
        sched.append(ShiftPhase(np.pi / 2, DriveChannel(0)))
        sched.append(Play(_const_samples(3), DriveChannel(0)))
        sig = InstructionToSignals(DT).get_signals(sched)[0]
        samples = np.asarray(sig.samples)
        np.testing.assert_allclose(samples[:3], 1.0)
        np.testing.assert_allclose(samples[3:], np.exp(1j * np.pi / 2) * np.ones(3), atol=1e-12)

    def test_set_phase_overrides(self):
        sched = Schedule()
        sched.append(ShiftPhase(1.0, DriveChannel(0)))
        sched.append(SetPhase(0.25, DriveChannel(0)))
        sched.append(Play(_const_samples(2), DriveChannel(0)))
        sig = InstructionToSignals(DT).get_signals(sched)[0]
        np.testing.assert_allclose(np.asarray(sig.samples), np.exp(0.25j) * np.ones(2), atol=1e-12)

    def test_shift_frequency_phase_continuity(self):
        """Digital frequency shift keeps the combined carrier continuous: the
        envelope picks up exp(2pi i dnu (t - t_shift))."""
        n0, n1, dnu = 4, 4, 0.1
        sched = Schedule()
        sched.append(Play(_const_samples(n0), DriveChannel(0)))
        sched.append(ShiftFrequency(dnu, DriveChannel(0)))
        sched.append(Play(_const_samples(n1), DriveChannel(0)))
        sig = InstructionToSignals(DT).get_signals(sched)[0]
        samples = np.asarray(sig.samples)
        t_shift = n0 * DT
        times = DT * (n0 + np.arange(n1))
        expected = np.exp(2j * np.pi * dnu * (times - t_shift))
        np.testing.assert_allclose(samples[n0:], expected, atol=1e-12)

    def test_set_frequency(self):
        carrier, new_freq = 5.0, 5.2
        sched = Schedule()
        sched.append(SetFrequency(new_freq, DriveChannel(0)))
        sched.append(Play(_const_samples(3), DriveChannel(0)))
        sig = InstructionToSignals(DT, carriers={"d0": carrier}).get_signals(sched)[0]
        samples = np.asarray(sig.samples)
        times = DT * np.arange(3)
        # from t=0, envelope rotates at new_freq - carrier
        np.testing.assert_allclose(
            samples, np.exp(2j * np.pi * (new_freq - carrier) * times), atol=1e-12
        )

    def test_channel_selection_and_padding(self):
        sched = Schedule()
        sched.append(Play(_const_samples(2), DriveChannel(0)))
        sched.append(Play(_const_samples(5), ControlChannel(1)))
        sigs = InstructionToSignals(DT, channels=["d0", "u1"]).get_signals(sched)
        assert [s.name for s in sigs] == ["d0", "u1"]
        assert sigs[0].duration == sigs[1].duration == 5
        np.testing.assert_allclose(np.asarray(sigs[0].samples)[2:], 0.0)

    def test_missing_channel_empty_signal(self):
        sched = Schedule(Play(_const_samples(2), DriveChannel(0)))
        sigs = InstructionToSignals(DT, channels=["d0", "d9"]).get_signals(sched)
        assert len(sigs) == 2
        assert sigs[1].duration == 0

    def test_gaussian_pulse_samples(self):
        g = Gaussian(duration=16, amp=0.3, sigma=4)
        sched = Schedule(Play(g, DriveChannel(0)))
        sig = InstructionToSignals(DT).get_signals(sched)[0]
        samples = np.asarray(sig.samples)
        assert len(samples) == 16
        assert np.argmax(np.abs(samples)) in (7, 8)

    def test_awg_signals(self):
        sched = Schedule(Play(_const_samples(3, 0.5 + 0.5j), DriveChannel(0)))
        sig = InstructionToSignals(DT, carriers={"d0": 5.0}).get_signals(sched)
        pairs = InstructionToSignals.get_awg_signals(sig, if_modulation=0.1)
        assert len(pairs) == 2
        assert float(pairs[0].carrier_freq) == 5.1
        np.testing.assert_allclose(
            np.asarray(pairs[1].samples), -1j * np.asarray(pairs[0].samples).real
            + np.asarray(pairs[0].samples).imag, atol=1e-12
        )

    def test_nyquist_warning(self):
        sched = Schedule()
        sched.append(ShiftFrequency(10.0 / DT, DriveChannel(0)))
        sched.append(Play(_const_samples(2), DriveChannel(0)))
        with pytest.warns(UserWarning, match="Nyquist"):
            InstructionToSignals(DT).get_signals(sched)

    def test_delay_advances_time(self):
        sched = Schedule()
        sched.append(Play(_const_samples(2), DriveChannel(0)))
        sched.append(Delay(3, DriveChannel(0)))
        sched.append(Play(_const_samples(2), DriveChannel(0)))
        sig = InstructionToSignals(DT).get_signals(sched)[0]
        samples = np.asarray(sig.samples)
        assert len(samples) == 7
        np.testing.assert_allclose(samples[2:5], 0.0)
        np.testing.assert_allclose(samples[5:], 1.0)

    def test_phase_and_frequency_shift_combine(self):
        """phi from ShiftPhase multiplies the continuity-corrected dnu phase."""
        n0, n1, phi, dnu = 3, 4, 0.7, 0.05
        sched = Schedule()
        sched.append(ShiftPhase(phi, DriveChannel(0)))
        sched.append(Play(_const_samples(n0), DriveChannel(0)))
        sched.append(ShiftFrequency(dnu, DriveChannel(0)))
        sched.append(Play(_const_samples(n1), DriveChannel(0)))
        samples = np.asarray(InstructionToSignals(DT).get_signals(sched)[0].samples)
        np.testing.assert_allclose(samples[:n0], np.exp(1j * phi), atol=1e-12)
        times = DT * (n0 + np.arange(n1))
        expected = np.exp(1j * phi + 2j * np.pi * dnu * (times - n0 * DT))
        np.testing.assert_allclose(samples[n0:], expected, atol=1e-12)

    def test_set_then_shift_frequency_accumulates(self):
        carrier, nu1, delta, n0, n1 = 5.0, 5.1, 0.04, 3, 3
        sched = Schedule()
        sched.append(SetFrequency(nu1, DriveChannel(0)))
        sched.append(Play(_const_samples(n0), DriveChannel(0)))
        sched.append(ShiftFrequency(delta, DriveChannel(0)))
        sched.append(Play(_const_samples(n1), DriveChannel(0)))
        sig = InstructionToSignals(DT, carriers={"d0": carrier}).get_signals(sched)[0]
        samples = np.asarray(sig.samples)
        t_first = DT * np.arange(n0)
        np.testing.assert_allclose(
            samples[:n0], np.exp(2j * np.pi * (nu1 - carrier) * t_first), atol=1e-12
        )
        t_second = DT * (n0 + np.arange(n1))
        expected = np.exp(
            2j * np.pi * ((nu1 - carrier + delta) * t_second - delta * n0 * DT)
        )
        np.testing.assert_allclose(samples[n0:], expected, atol=1e-12)

    def test_channel_states_independent(self):
        """Phase/frequency state is tracked per channel."""
        sched = Schedule()
        sched.append(ShiftPhase(np.pi, DriveChannel(0)))
        sched.append(Play(_const_samples(2), DriveChannel(0)))
        sched.append(Play(_const_samples(2), ControlChannel(0)))
        sigs = InstructionToSignals(DT, channels=["d0", "u0"]).get_signals(sched)
        np.testing.assert_allclose(np.asarray(sigs[0].samples)[:2], -1.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(sigs[1].samples)[:2], 1.0, atol=1e-12)


class TestScheduleOps:
    def test_insert_explicit_time(self):
        sched = Schedule()
        sched.insert(5, Play(_const_samples(2), DriveChannel(0)))
        samples = np.asarray(InstructionToSignals(DT).get_signals(sched)[0].samples)
        assert len(samples) == 7
        np.testing.assert_allclose(samples[:5], 0.0)
        np.testing.assert_allclose(samples[5:], 1.0)

    def test_shift_and_add(self):
        a = Schedule(Play(_const_samples(2, 0.5), DriveChannel(0)))
        b = Schedule(Play(_const_samples(3, 0.25), DriveChannel(0)))
        combined = a + b  # b scheduled after a
        assert combined.duration == 5
        samples = np.asarray(InstructionToSignals(DT).get_signals(combined)[0].samples)
        np.testing.assert_allclose(samples[:2], 0.5)
        np.testing.assert_allclose(samples[2:], 0.25)
        shifted = a.shift(4)
        assert shifted.duration == 6
        assert shifted.instructions[0][0] == 4
        # original untouched
        assert a.duration == 2

    def test_or_merges_in_parallel(self):
        a = Schedule(Play(_const_samples(2), DriveChannel(0)))
        b = Schedule(Play(_const_samples(4), ControlChannel(1)))
        merged = a | b
        assert merged.duration == 4
        assert {ch.name for ch in merged.channels} == {"d0", "u1"}

    def test_filter_and_ch_duration(self):
        sched = Schedule()
        sched.append(Play(_const_samples(2), DriveChannel(0)))
        sched.append(Play(_const_samples(5), ControlChannel(1)))
        assert sched.ch_duration("d0") == 2
        assert sched.ch_duration("u1") == 5
        only_d = sched.filter(channels=[DriveChannel(0)])
        assert [ch.name for ch in only_d.channels] == ["d0"]
        assert only_d.duration == 2
        # string names accepted too
        assert sched.filter(channels=["u1"]).duration == 5

    def test_append_aligns_on_shared_channel_only(self):
        """append waits for the instruction's own channels, not the whole
        schedule: the reference aligns per channel through timeslots."""
        sched = Schedule()
        sched.append(Play(_const_samples(5), DriveChannel(0)))
        sched.append(Play(_const_samples(2), ControlChannel(1)))
        (t0, _), (t1, _) = sched.instructions
        assert t0 == 0 and t1 == 0


class TestPulseLibrary:
    def test_gaussian_square_width_vs_risefall(self):
        from qiskit_dynamics_tpu.pulse import GaussianSquare

        p1 = GaussianSquare(duration=20, amp=0.4, sigma=3, width=8)
        p2 = GaussianSquare(duration=20, amp=0.4, sigma=3, risefall_sigma_ratio=2)
        np.testing.assert_allclose(
            np.asarray(p1.get_waveform().samples),
            np.asarray(p2.get_waveform().samples),
        )
        # flat top at amp over the width window
        t_mid = np.array([10.0])
        np.testing.assert_allclose(p1.envelope(t_mid), 0.4, atol=1e-12)

    def test_gaussian_square_requires_width_or_ratio(self):
        from qiskit_dynamics_tpu.pulse import GaussianSquare

        with pytest.raises(ValueError, match="width or risefall"):
            GaussianSquare(duration=20, amp=0.4, sigma=3)

    def test_drag_center_real_and_beta_imag(self):
        from qiskit_dynamics_tpu.pulse import Drag

        d = Drag(duration=16, amp=0.3, sigma=4, beta=1.5)
        center = d.envelope(np.array([8.0]))[0]
        assert abs(center.imag) < 1e-12
        np.testing.assert_allclose(center.real, 0.3, atol=1e-12)
        off = d.envelope(np.array([4.0]))[0]
        g = Gaussian(duration=16, amp=0.3, sigma=4).envelope(np.array([4.0]))[0]
        # imag part = beta * (-(t-c)/sigma^2) * gaussian
        np.testing.assert_allclose(off.imag, 1.5 * (4.0 / 16.0) * g.real, atol=1e-12)

    def test_constant_window(self):
        c = Constant(duration=8, amp=0.2, angle=np.pi / 2)
        vals = c.envelope(np.array([-0.5, 4.0, 8.5]))
        np.testing.assert_allclose(vals[0], 0.0, atol=1e-12)
        np.testing.assert_allclose(vals[1], 0.2j, atol=1e-12)
        np.testing.assert_allclose(vals[2], 0.0, atol=1e-12)

    def test_waveform_midpoint_symmetry(self):
        g = Gaussian(duration=16, amp=1.0, sigma=4)
        samples = np.asarray(g.get_waveform().samples)
        np.testing.assert_allclose(samples, samples[::-1], atol=1e-12)

    def test_angle_rotates_envelope(self):
        g0 = Gaussian(duration=8, amp=0.5, sigma=2)
        g1 = Gaussian(duration=8, amp=0.5, sigma=2, angle=np.pi / 3)
        np.testing.assert_allclose(
            np.asarray(g1.get_waveform().samples),
            np.exp(1j * np.pi / 3) * np.asarray(g0.get_waveform().samples),
            atol=1e-12,
        )


class TestMultiChannelLayouts:
    """Cross-channel timing semantics (reference test_pulse_to_signals.py:
    uneven lengths, different start times, gaps)."""

    def _convert(self, sched, channels):
        conv = InstructionToSignals(
            dt=0.1, carriers={ch: 0.0 for ch in channels}, channels=channels
        )
        return conv.get_signals(sched)

    def test_uneven_pulse_length_zero_padded(self):
        sched = Schedule()
        sched = sched.insert(0, Play(Waveform(np.ones(10)), DriveChannel(0)))
        sched = sched.insert(0, Play(Waveform(0.5 * np.ones(4)), DriveChannel(1)))
        s0, s1 = self._convert(sched, ["d0", "d1"])
        np.testing.assert_allclose(s0.envelope(0.95), 1.0)
        np.testing.assert_allclose(s1.envelope(0.35), 0.5)
        # short channel zero-padded to the schedule duration
        np.testing.assert_allclose(s1.envelope(0.75), 0.0)

    def test_different_start_times(self):
        sched = Schedule()
        sched = sched.insert(0, Play(Waveform(np.ones(4)), DriveChannel(0)))
        sched = sched.insert(6, Play(Waveform(np.ones(4)), DriveChannel(1)))
        s0, s1 = self._convert(sched, ["d0", "d1"])
        np.testing.assert_allclose(s1.envelope(0.35), 0.0)  # before start
        np.testing.assert_allclose(s1.envelope(0.65), 1.0)
        np.testing.assert_allclose(s0.envelope(0.65), 0.0)  # d0 finished

    def test_channel_with_gap(self):
        sched = Schedule()
        sched = sched.insert(0, Play(Waveform(np.ones(2)), DriveChannel(0)))
        sched = sched.insert(6, Play(Waveform(2.0 * np.ones(2)), DriveChannel(0)))
        (s0,) = self._convert(sched, ["d0"])
        np.testing.assert_allclose(s0.envelope(0.15), 1.0)
        np.testing.assert_allclose(s0.envelope(0.45), 0.0)  # the gap
        np.testing.assert_allclose(s0.envelope(0.65), 2.0)

    def test_requested_channel_order_defines_output_order(self):
        sched = Schedule()
        sched = sched.insert(0, Play(Waveform(np.ones(2)), DriveChannel(0)))
        sched = sched.insert(0, Play(Waveform(2 * np.ones(2)), DriveChannel(1)))
        sigs = self._convert(sched, ["d1", "d0"])
        np.testing.assert_allclose(sigs[0].envelope(0.15), 2.0)
        np.testing.assert_allclose(sigs[1].envelope(0.15), 1.0)

    def test_carriers_map_applied_per_channel(self):
        sched = Schedule()
        sched = sched.insert(0, Play(Waveform(np.ones(4)), DriveChannel(0)))
        sched = sched.insert(0, Play(Waveform(np.ones(4)), DriveChannel(1)))
        conv = InstructionToSignals(
            dt=0.1, carriers={"d0": 1.0, "d1": 2.5}, channels=["d0", "d1"]
        )
        s0, s1 = conv.get_signals(sched)
        assert s0.carrier_freq == 1.0 and s1.carrier_freq == 2.5

    def test_jax_tracer_mode_all_pulse_types(self):
        # symbolic pulses sample under jit (tracer-aware lambdified envelopes)
        import jax

        def build_and_sample(amp):
            sched = Schedule()
            t = 0
            for pulse in (
                Gaussian(duration=16, amp=amp, sigma=4),
                GaussianSquare(duration=16, amp=amp, sigma=2, width=8),
                Drag(duration=16, amp=amp, sigma=4, beta=0.5),
                Constant(duration=8, amp=amp),
            ):
                sched = sched.insert(t, Play(pulse, DriveChannel(0)))
                t += pulse.duration
            conv = InstructionToSignals(dt=0.1, carriers={"d0": 0.0}, channels=["d0"])
            (sig,) = conv.get_signals(sched)
            ts = jnp.linspace(0.05, 5.55, 23)
            return jnp.sum(jnp.abs(sig(ts)))

        jitted = jax.jit(build_and_sample)(0.5)
        eager = build_and_sample(0.5)
        np.testing.assert_allclose(jitted, eager, rtol=1e-6)


class TestDirectiveInstructions:
    """Directive-type instructions (barriers: `.channels`, no `.channel`)
    produce no samples and must not disturb conversion — the converter skips
    any instruction without a single-channel binding (reference behavior:
    `test/dynamics/pulse/test_pulse_to_signals.py` barrier battery)."""

    def test_barrier_aligns_but_emits_nothing(self):
        import numpy as np
        from qiskit_dynamics_tpu.pulse import (
            Schedule, Play, DriveChannel, Gaussian, InstructionToSignals,
        )

        class RelativeBarrier:
            """Stand-in for qiskit's directive: channels plural, no samples."""
            def __init__(self, *channels):
                self.channels = channels
            @property
            def duration(self):
                return 0

        d0, d1 = DriveChannel(0), DriveChannel(1)
        pulse = Gaussian(duration=16, amp=0.5, sigma=4)

        # barrier aligns d1's play to d0's stop time but adds no samples...
        barred = Schedule(name="barred")
        barred.append(Play(pulse, d0))
        barred.append(RelativeBarrier(d0, d1))
        barred.append(Play(pulse, d1))

        # ...equivalent to inserting the d1 play explicitly at t=16
        shifted = Schedule(name="shifted")
        shifted.append(Play(pulse, d0))
        shifted.insert(16, Play(pulse, d1))

        conv = InstructionToSignals(dt=0.1, carriers={"d0": 5.0, "d1": 5.1},
                                    channels=["d0", "d1"])
        sig_barred = conv.get_signals(barred)
        sig_shifted = conv.get_signals(shifted)
        for a, b in zip(sig_barred, sig_shifted):
            np.testing.assert_allclose(np.asarray(a.samples), np.asarray(b.samples))
        # and the barrier itself changed the timing vs a bare append
        plain = Schedule(name="plain")
        plain.append(Play(pulse, d0))
        plain.append(Play(pulse, d1))
        assert plain.ch_duration("d1") == 16 and barred.ch_duration("d1") == 32
