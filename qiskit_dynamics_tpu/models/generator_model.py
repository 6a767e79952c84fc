"""Generator models: dy/dt = Lambda(t, y) with Lambda(t, y) = G(t) y.

TPU-first re-design of
``/root/reference/qiskit_dynamics/models/generator_model.py``. Operators are
rotated into the frame eigenbasis ONCE at construction (with the frame diagonal
subtracted from the static term), so the per-step RHS is: signal eval ->
linear combo -> diagonal-phase frame sandwich — all fused by XLA into a single
device computation. Models are registered pytrees and can cross jit boundaries.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import List, Optional, Union
from warnings import warn

import numpy as np
import jax
import jax.numpy as jnp

from ..unified import unp
from jax.tree_util import register_pytree_node
from scipy.sparse import issparse, diags
from scipy.sparse.linalg import norm as spnorm

from ..exceptions import DynamicsError
from ..signals import Signal, SignalList
from .rotating_frame import RotatingFrame
from .operator_collections import OperatorCollection, ScipySparseOperatorCollection

__all__ = ["BaseGeneratorModel", "GeneratorModel"]


class BaseGeneratorModel(ABC):
    r"""Interface for a linear time-dependent differential equation
    ``dy/dt = Lambda(t, y)``."""

    def __init__(self, array_library: Optional[str] = None):
        self._array_library = array_library

    @property
    @abstractmethod
    def dim(self) -> int:
        """The matrix dimension."""

    @property
    @abstractmethod
    def rotating_frame(self) -> RotatingFrame:
        """The rotating frame."""

    @property
    @abstractmethod
    def in_frame_basis(self) -> bool:
        """Whether the model is evaluated in the frame eigenbasis."""

    @property
    def array_library(self) -> Optional[str]:
        """Array library used to store/evaluate the model."""
        return self._array_library

    @abstractmethod
    def evaluate(self, time):
        r"""Evaluate the map ``Lambda(t, .)`` if possible."""

    @abstractmethod
    def evaluate_rhs(self, time, y):
        r"""Evaluate ``Lambda(t, y)``."""

    def __call__(self, time, y=None):
        return self.evaluate(time) if y is None else self.evaluate_rhs(time, y)


class GeneratorModel(BaseGeneratorModel):
    r"""Model for ``G(t) = G_d + Sigma_j s_j(t) G_j``, optionally in a rotating frame.

    With a rotating frame ``F``, the evaluated generator is
    ``e^{-tF}(G(t) - F)e^{tF}`` and the RHS is the corresponding frame sandwich.
    """

    def __init__(
        self,
        static_operator=None,
        operators=None,
        signals: Optional[Union[SignalList, List[Signal]]] = None,
        rotating_frame: Optional[Union[RotatingFrame, np.ndarray]] = None,
        in_frame_basis: bool = False,
        array_library: Optional[str] = None,
    ):
        if static_operator is None and operators is None:
            raise DynamicsError(
                f"{type(self).__name__} requires at least one of static_operator or "
                "operators to be specified at construction."
            )

        from ..unified import dequtip

        static_operator = dequtip(static_operator)
        operators = dequtip(operators)
        self._rotating_frame = RotatingFrame(rotating_frame)
        self._in_frame_basis = in_frame_basis

        static_operator = _static_operator_into_frame_basis(
            static_operator, self._rotating_frame, array_library
        )
        operators = _operators_into_frame_basis(operators, self._rotating_frame, array_library)

        self._operator_collection = _get_operator_collection(
            static_operator=static_operator, operators=operators, array_library=array_library
        )

        self._signals = None
        self.signals = signals
        super().__init__(array_library=array_library)

    # --- properties -------------------------------------------------------
    @property
    def dim(self) -> int:
        return self._operator_collection.dim

    @property
    def rotating_frame(self) -> RotatingFrame:
        return self._rotating_frame

    @property
    def in_frame_basis(self) -> bool:
        return self._in_frame_basis

    @in_frame_basis.setter
    def in_frame_basis(self, in_frame_basis: bool):
        self._in_frame_basis = in_frame_basis

    @property
    def static_operator(self):
        """The static operator (in the in_frame_basis-selected basis)."""
        if self._operator_collection.static_operator is None:
            return None
        if self._in_frame_basis:
            return self._operator_collection.static_operator
        return self._rotating_frame.operator_out_of_frame_basis(
            self._operator_collection.static_operator
        )

    @property
    def operators(self):
        """The model operators (in the in_frame_basis-selected basis)."""
        if self._operator_collection.operators is None:
            return None
        if self._in_frame_basis:
            return self._operator_collection.operators
        return self._rotating_frame.operator_out_of_frame_basis(
            self._operator_collection.operators
        )

    @property
    def signals(self) -> SignalList:
        """The model signals."""
        return self._signals

    @signals.setter
    def signals(self, signals):
        if signals is None:
            self._signals = None
            return
        if self._operator_collection.operators is None:
            raise DynamicsError("Signals must be None if operators is None.")
        if isinstance(signals, (list, tuple)):
            signals = SignalList(list(signals))
        if not isinstance(signals, SignalList):
            raise DynamicsError("Signals specified in unaccepted format.")
        ops = self._operator_collection.operators
        len_ops = len(ops) if isinstance(ops, list) else ops.shape[0]
        if len(signals) != len_ops:
            raise DynamicsError("Signals needs to have the same length as operators.")
        self._signals = signals

    # --- evaluation ---------------------------------------------------------
    def evaluate(self, time):
        """Evaluate the generator matrix ``G(t)`` (frame-transformed)."""
        if self._signals is None and self._operator_collection.operators is not None:
            raise DynamicsError(
                f"{type(self).__name__} with non-empty operators must have signals to be "
                "evaluated."
            )
        sig_vals = self._signals(time) if self._signals is not None else None
        op_combo = self._operator_collection(sig_vals)
        return self._rotating_frame.operator_into_frame(
            time,
            op_combo,
            operator_in_frame_basis=True,
            return_in_frame_basis=self._in_frame_basis,
        )

    def evaluate_rhs(self, time, y):
        """Evaluate ``G(t) @ y`` via the frame sandwich (the hot loop)."""
        if self._signals is None:
            if self._operator_collection.operators is not None:
                raise DynamicsError(
                    f"{type(self).__name__} with non-empty operators must have signals to be "
                    "evaluated."
                )
            sig_vals = None
        else:
            sig_vals = self._signals(time)

        out = self._rotating_frame.state_out_of_frame(
            time, y, y_in_frame_basis=self._in_frame_basis, return_in_frame_basis=True
        )
        out = self._operator_collection(sig_vals, out)
        return self._rotating_frame.state_into_frame(
            time, out, y_in_frame_basis=True, return_in_frame_basis=self._in_frame_basis
        )

    # --- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self._operator_collection, self._signals, self._rotating_frame), (
            self._in_frame_basis,
            self._array_library,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = object.__new__(cls)
        obj._in_frame_basis, obj._array_library = aux
        obj._operator_collection, obj._signals, obj._rotating_frame = leaves
        return obj


def _static_operator_into_frame_basis(static_operator, rotating_frame, array_library=None):
    """Move the static operator into the frame basis, subtracting the frame diagonal."""
    if static_operator is None:
        if rotating_frame.frame_operator is None:
            return None
        if array_library == "scipy_sparse":
            return -diags(np.asarray(rotating_frame.frame_diag), format="csr")
        return unp.diag(-rotating_frame.frame_diag)
    if array_library == "scipy_sparse":
        static_operator = np.asarray(static_operator)
        return np.asarray(
            rotating_frame.generator_into_frame(
                t=0.0, operator=unp.asarray(static_operator), return_in_frame_basis=True
            )
        )
    return rotating_frame.generator_into_frame(
        t=0.0, operator=unp.asarray(static_operator), return_in_frame_basis=True
    )


def _operators_into_frame_basis(operators, rotating_frame, array_library=None):
    """Move an operator stack into the frame basis."""
    if operators is None:
        return None
    if array_library == "scipy_sparse":
        return [
            np.asarray(rotating_frame.operator_into_frame_basis(unp.asarray(op)))
            for op in operators
        ]
    return rotating_frame.operator_into_frame_basis(unp.asarray(operators))


def _get_operator_collection(static_operator, operators, array_library=None):
    """Pick the collection implementation by array_library."""
    if array_library == "scipy_sparse":
        return ScipySparseOperatorCollection(
            static_operator=static_operator, operators=operators
        )
    if array_library == "jax_sparse" and jax.default_backend() not in ("cpu",):
        warn("Using sparse mode with JAX is primarily recommended for use on CPU.", stacklevel=2)
    return OperatorCollection(
        static_operator=static_operator, operators=operators, array_library=array_library
    )


def is_hermitian(operator, tol: float = 1e-10) -> bool:
    """Whether an operator is Hermitian within tolerance."""
    if issparse(operator):
        return spnorm(operator - operator.conj().T) < tol
    if type(operator).__name__ == "BCOO":
        operator = operator.todense()
    operator = np.asarray(operator)
    return np.linalg.norm(operator.conj().T - operator) < tol


register_pytree_node(GeneratorModel, GeneratorModel.tree_flatten, GeneratorModel.tree_unflatten)
