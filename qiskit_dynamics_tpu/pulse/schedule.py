"""Native pulse schedule representation.

The reference delegates schedule structure to qiskit-pulse
(``/root/reference/qiskit_dynamics/pulse/pulse_to_signals.py`` imports
``qiskit.pulse``); this framework ships a native, dependency-free subset with
the same semantics: channels addressed by name (``d0``, ``u1``, ``m0``,
``a0``), timed instructions (``Play``, ``ShiftPhase``, ``SetPhase``,
``ShiftFrequency``, ``SetFrequency``, ``Delay``, ``Acquire``), and a
``Schedule`` container of ``(start_time, instruction)`` pairs measured in
samples. Qiskit schedules duck-type through the same converter when qiskit is
installed.
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from ..exceptions import DynamicsError

__all__ = [
    "Channel",
    "DriveChannel",
    "ControlChannel",
    "MeasureChannel",
    "AcquireChannel",
    "MemorySlot",
    "Play",
    "ShiftPhase",
    "SetPhase",
    "ShiftFrequency",
    "SetFrequency",
    "Delay",
    "Acquire",
    "Schedule",
    "block_to_schedule",
]


class Channel:
    """A named pulse channel."""

    prefix = "c"

    def __init__(self, index: int):
        self.index = index

    @property
    def name(self) -> str:
        """Channel name, e.g. ``d0``."""
        return f"{self.prefix}{self.index}"

    def __eq__(self, other):
        return isinstance(other, Channel) and other.name == self.name

    def __hash__(self):
        return hash(self.name)

    def __repr__(self):
        return self.name


class DriveChannel(Channel):
    """Qubit drive channel (``d<i>``)."""

    prefix = "d"


class ControlChannel(Channel):
    """Two-qubit control channel (``u<i>``)."""

    prefix = "u"


class MeasureChannel(Channel):
    """Measurement stimulus channel (``m<i>``)."""

    prefix = "m"


class AcquireChannel(Channel):
    """Acquisition channel (``a<i>``)."""

    prefix = "a"


class MemorySlot:
    """Classical memory slot for measurement results."""

    def __init__(self, index: int):
        self.index = index

    @property
    def name(self):
        return f"mem{self.index}"

    def __repr__(self):
        return self.name


def _to_channel(channel) -> Channel:
    if isinstance(channel, Channel):
        return channel
    if isinstance(channel, str):
        prefix, idx = channel[0], int(channel[1:])
        cls = {"d": DriveChannel, "u": ControlChannel, "m": MeasureChannel, "a": AcquireChannel}.get(
            prefix
        )
        if cls is None:
            raise DynamicsError(f"Unsupported channel name {channel}.")
        return cls(idx)
    raise DynamicsError(f"Invalid channel specification {channel}.")


class Instruction:
    """Base timed instruction."""

    duration = 0

    @property
    def channels(self) -> List[Channel]:
        """Channels this instruction acts on."""
        return [self.channel] if hasattr(self, "channel") else []


class Play(Instruction):
    """Play a pulse envelope on a channel."""

    def __init__(self, pulse, channel):
        self.pulse = pulse
        self.channel = _to_channel(channel)

    @property
    def duration(self):
        return self.pulse.duration

    def __repr__(self):
        return f"Play({self.pulse}, {self.channel})"


class ShiftPhase(Instruction):
    """Shift the channel phase by ``phase`` radians."""

    def __init__(self, phase: float, channel):
        self.phase = phase
        self.channel = _to_channel(channel)


class SetPhase(Instruction):
    """Set the channel phase to ``phase`` radians."""

    def __init__(self, phase: float, channel):
        self.phase = phase
        self.channel = _to_channel(channel)


class ShiftFrequency(Instruction):
    """Shift the channel frequency by ``frequency``."""

    def __init__(self, frequency: float, channel):
        self.frequency = frequency
        self.channel = _to_channel(channel)


class SetFrequency(Instruction):
    """Set the channel frequency to ``frequency``."""

    def __init__(self, frequency: float, channel):
        self.frequency = frequency
        self.channel = _to_channel(channel)


class Delay(Instruction):
    """Idle for ``duration`` samples on a channel."""

    def __init__(self, duration: int, channel):
        self.duration = duration
        self.channel = _to_channel(channel)


class Acquire(Instruction):
    """Acquire measurement data for ``duration`` samples."""

    def __init__(self, duration: int, channel, mem_slot: Optional[MemorySlot] = None):
        self.duration = duration
        if isinstance(channel, int):
            channel = AcquireChannel(channel)
        self.channel = _to_channel(channel) if isinstance(channel, str) else channel
        if isinstance(mem_slot, int):
            mem_slot = MemorySlot(mem_slot)
        self.mem_slot = mem_slot

    @property
    def acquire_channel(self):
        """The acquisition channel."""
        return self.channel


class Schedule:
    """A time-ordered collection of instructions (times in samples).

    ``append`` schedules an instruction at the current stop time of its
    channels; ``insert`` schedules at an explicit start time.
    """

    def __init__(self, *instructions, name: Optional[str] = None):
        self.name = name
        self.metadata: dict = {}
        self._timeslots: List[Tuple[int, Instruction]] = []
        for inst in instructions:
            if isinstance(inst, tuple):
                self.insert(inst[0], inst[1], inplace=True)
            else:
                self.append(inst, inplace=True)

    # --- construction ------------------------------------------------------
    def append(self, instruction: Instruction, inplace: bool = True) -> "Schedule":
        """Schedule at the current stop time of the instruction's channels."""
        start = max(
            (self.ch_duration(ch.name) for ch in instruction.channels), default=self.duration
        )
        return self.insert(start, instruction, inplace=inplace)

    def insert(self, start_time: int, instruction: Instruction, inplace: bool = True) -> "Schedule":
        """Schedule at an explicit start time."""
        target = self if inplace else self.copy()
        target._timeslots.append((int(start_time), instruction))
        target._timeslots.sort(key=lambda pair: pair[0])
        return target

    def copy(self) -> "Schedule":
        sched = Schedule(name=self.name)
        sched._timeslots = list(self._timeslots)
        return sched

    def shift(self, time: int) -> "Schedule":
        """Return a copy shifted by ``time`` samples."""
        sched = Schedule(name=self.name)
        sched._timeslots = [(t + time, inst) for t, inst in self._timeslots]
        return sched

    def __or__(self, other: "Schedule") -> "Schedule":
        sched = self.copy()
        for t, inst in other.instructions:
            sched.insert(t, inst, inplace=True)
        return sched

    def __add__(self, other: "Schedule") -> "Schedule":
        return self | other.shift(self.duration)

    # --- inspection --------------------------------------------------------
    @property
    def instructions(self) -> List[Tuple[int, Instruction]]:
        """Sorted ``(start_time, instruction)`` pairs."""
        return sorted(self._timeslots, key=lambda pair: pair[0])

    @property
    def channels(self) -> List[Channel]:
        """Unique channels appearing in the schedule."""
        seen = {}
        for _, inst in self._timeslots:
            for ch in inst.channels:
                seen[ch.name] = ch
        return list(seen.values())

    @property
    def duration(self) -> int:
        """Total schedule duration in samples."""
        return max((t + inst.duration for t, inst in self._timeslots), default=0)

    def ch_duration(self, channel_name: str) -> int:
        """Stop time of a specific channel."""
        return max(
            (
                t + inst.duration
                for t, inst in self._timeslots
                if any(ch.name == channel_name for ch in inst.channels)
            ),
            default=0,
        )

    def filter(self, channels=None) -> "Schedule":
        """Keep only instructions on the given channels."""
        if channels is None:
            return self
        names = {ch.name if isinstance(ch, Channel) else str(ch) for ch in channels}
        sched = Schedule(name=self.name)
        sched._timeslots = [
            (t, inst)
            for t, inst in self._timeslots
            if any(ch.name in names for ch in inst.channels)
        ]
        return sched

    def __repr__(self):
        lines = ", ".join(f"({t}, {inst!r})" for t, inst in self.instructions[:4])
        more = "..." if len(self._timeslots) > 4 else ""
        return f"Schedule({lines}{more})"


def block_to_schedule(block) -> Schedule:
    """Convert a qiskit ScheduleBlock to a Schedule; native Schedules pass through."""
    if isinstance(block, Schedule):
        return block
    try:
        from qiskit.pulse.transforms import block_to_schedule as qiskit_b2s

        return qiskit_b2s(block)
    except ImportError as exc:
        raise DynamicsError(
            "block_to_schedule requires qiskit for ScheduleBlock inputs."
        ) from exc
