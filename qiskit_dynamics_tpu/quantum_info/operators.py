"""Operator types: Operator and SuperOp (column-stacking convention)."""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .states import _infer_dims

__all__ = ["BaseOperator", "Operator", "QuantumChannel", "SuperOp"]


class BaseOperator:
    """Base class for operator types."""

    def __init__(self, data, input_dims=None, output_dims=None):
        self._data = np.asarray(data)
        if input_dims is None:
            input_dims = _infer_dims(self._data.shape[-1])
        elif isinstance(input_dims, int):
            input_dims = (input_dims,)
        if output_dims is None:
            output_dims = _infer_dims(self._data.shape[-2])
        elif isinstance(output_dims, int):
            output_dims = (output_dims,)
        self._input_dims = tuple(input_dims)
        self._output_dims = tuple(output_dims)

    @property
    def data(self) -> np.ndarray:
        """Underlying array."""
        return self._data

    def input_dims(self) -> Tuple[int, ...]:
        """Input subsystem dimensions."""
        return self._input_dims

    def output_dims(self) -> Tuple[int, ...]:
        """Output subsystem dimensions."""
        return self._output_dims

    def __array__(self, dtype=None, copy=None):
        return np.asarray(self._data, dtype=dtype)

    def __repr__(self):
        return f"{type(self).__name__}({self._data})"


class Operator(BaseOperator):
    """A matrix operator."""

    def adjoint(self) -> "Operator":
        """Hermitian adjoint."""
        return Operator(self._data.conj().T, self._output_dims, self._input_dims)

    @classmethod
    def from_label(cls, label: str) -> "Operator":
        """Build from a Pauli-label string like 'XZI'."""
        singles = {
            "I": np.eye(2, dtype=complex),
            "X": np.array([[0, 1], [1, 0]], dtype=complex),
            "Y": np.array([[0, -1j], [1j, 0]]),
            "Z": np.array([[1, 0], [0, -1]], dtype=complex),
        }
        mat = np.eye(1, dtype=complex)
        for ch in label:
            mat = np.kron(mat, singles[ch])
        return cls(mat)


class QuantumChannel(BaseOperator):
    """Base class for quantum channel representations."""


class SuperOp(QuantumChannel):
    """Superoperator in column-stacking convention.

    Construction accepts a raw ``(d^2, d^2)`` array, another SuperOp, or an
    ``Operator`` U (vectorized as ``conj(U) kron U``).
    """

    def __init__(self, data, input_dims=None, output_dims=None):
        if isinstance(data, SuperOp):
            input_dims = input_dims or data.input_dims()
            output_dims = output_dims or data.output_dims()
            data = data.data
        elif isinstance(data, Operator):
            u = data.data
            input_dims = input_dims or data.input_dims()
            output_dims = output_dims or data.output_dims()
            data = np.kron(u.conj(), u)
        data = np.asarray(data)
        d_in = int(round(np.sqrt(data.shape[-1])))
        d_out = int(round(np.sqrt(data.shape[-2])))
        if input_dims is None:
            input_dims = _infer_dims(d_in)
        if output_dims is None:
            output_dims = _infer_dims(d_out)
        super().__init__(data, input_dims, output_dims)
