"""Pulse front end: native schedules, pulse shapes, and signal conversion."""
from .schedule import (
    Channel,
    DriveChannel,
    ControlChannel,
    MeasureChannel,
    AcquireChannel,
    MemorySlot,
    Play,
    ShiftPhase,
    SetPhase,
    ShiftFrequency,
    SetFrequency,
    Delay,
    Acquire,
    Schedule,
    block_to_schedule,
)
from .library import Waveform, SymbolicPulse, Gaussian, GaussianSquare, Drag, Constant
from .pulse_to_signals import InstructionToSignals, get_samples
