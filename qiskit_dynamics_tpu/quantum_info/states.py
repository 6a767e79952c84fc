"""State types: Statevector and DensityMatrix."""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["QuantumState", "Statevector", "DensityMatrix"]


def _infer_dims(dim: int) -> Tuple[int, ...]:
    """Default subsystem dims: powers of two when possible, else one system."""
    if dim > 0 and (dim & (dim - 1)) == 0 and dim > 1:
        n = dim.bit_length() - 1
        return (2,) * n
    return (dim,)


class QuantumState:
    """Base class for quantum states."""

    def __init__(self, data, dims=None):
        self._data = np.asarray(data)
        if dims is None:
            dims = _infer_dims(self._data.shape[0])
        elif isinstance(dims, int):
            dims = (dims,)
        self._dims = tuple(dims)

    @property
    def data(self) -> np.ndarray:
        """Underlying array."""
        return self._data

    def dims(self) -> Tuple[int, ...]:
        """Subsystem dimensions."""
        return self._dims

    @property
    def dim(self) -> int:
        """Total dimension."""
        return int(np.prod(self._dims))

    def __array__(self, dtype=None, copy=None):
        return np.asarray(self._data, dtype=dtype)

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self._dims == other._dims
            and np.allclose(self._data, other._data)
        )

    def __repr__(self):
        return f"{type(self).__name__}({self._data}, dims={self._dims})"


class Statevector(QuantumState):
    """Pure state vector."""

    def probabilities(self) -> np.ndarray:
        """Measurement probabilities in the computational basis."""
        return np.abs(self._data) ** 2

    def to_density_matrix(self) -> "DensityMatrix":
        """Outer-product density matrix."""
        return DensityMatrix(np.outer(self._data, self._data.conj()), dims=self._dims)

    @classmethod
    def from_int(cls, i: int, dims) -> "Statevector":
        """Computational basis state |i> with the given subsystem dims."""
        if isinstance(dims, int):
            dims = (dims,)
        dim = int(np.prod(dims))
        data = np.zeros(dim, dtype=complex)
        data[i] = 1.0
        return cls(data, dims=dims)


class DensityMatrix(QuantumState):
    """Mixed state density matrix."""

    def __init__(self, data, dims=None):
        if isinstance(data, Statevector):
            dims = dims if dims is not None else data.dims()
            data = np.outer(data.data, data.data.conj())
        super().__init__(data, dims=dims)

    def probabilities(self) -> np.ndarray:
        """Measurement probabilities in the computational basis."""
        return np.real(np.diag(self._data))

    @classmethod
    def from_int(cls, i: int, dims) -> "DensityMatrix":
        """Computational basis state |i><i|."""
        return Statevector.from_int(i, dims).to_density_matrix()
