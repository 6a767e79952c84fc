"""Backend / serving layer: pulse-level simulator with a backend interface.

Reference: ``/root/reference/qiskit_dynamics/backend/__init__.py``.
"""
from .dynamics_backend import DynamicsBackend, default_experiment_result_function
from .dynamics_job import DynamicsJob
from .results import Result, ExperimentResult, ExperimentResultData
from .string_parser import parse_backend_hamiltonian_dict

__all__ = [
    "DynamicsBackend",
    "DynamicsJob",
    "Result",
    "ExperimentResult",
    "ExperimentResultData",
    "default_experiment_result_function",
    "parse_backend_hamiltonian_dict",
]
