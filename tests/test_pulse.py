"""Tests for the pulse layer: instruction semantics of schedule->signal
conversion (reference model: ``test/dynamics/pulse/test_pulse_to_signals.py``)."""
import numpy as np
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
