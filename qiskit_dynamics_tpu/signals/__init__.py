"""Signals: time-dependent model coefficients."""
from .signals import (
    Signal,
    DiscreteSignal,
    SignalCollection,
    SignalSum,
    DiscreteSignalSum,
    SignalList,
    signal_add,
    signal_multiply,
    to_SignalSum,
)
from .transfer_functions import (
    BaseTransferFunction,
    Convolution,
    FFTConvolution,
    Sampler,
    IQMixer,
)
