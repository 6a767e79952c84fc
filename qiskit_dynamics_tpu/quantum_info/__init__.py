"""Minimal quantum-info types (qiskit-free).

The reference uses ``qiskit.quantum_info`` types for the ``Solver`` /
``DynamicsBackend`` type-handling tables
(``/root/reference/qiskit_dynamics/solvers/solver_classes.py:430-470``). This
module provides a native, dependency-free subset with the same construction
and ``.data`` semantics; when qiskit is installed, its types duck-type through
the same code paths.
"""
from .states import QuantumState, Statevector, DensityMatrix
from .operators import BaseOperator, Operator, QuantumChannel, SuperOp
