"""Framework exception types.

Replaces the reference's use of ``QiskitError`` (raised throughout
``/root/reference/qiskit_dynamics``) with a framework-native exception so the
core has zero qiskit dependency.
"""


class DynamicsError(Exception):
    """Base error for qiskit_dynamics_tpu."""


# Alias kept so user code written against the reference's error type ports over.
QiskitError = DynamicsError
